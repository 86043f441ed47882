"""Build planner: parallelism and merge-topology decisions."""

from __future__ import annotations

from fastbloom_spark import BloomConfig
from fastbloom_spark.plans import plan_bloom_build


def test_small_job_few_partitions():
    cfg = BloomConfig.from_false_pos(0.01, expected_items=100_000)
    plan = plan_bloom_build(cfg, input_partitions=64,
                            default_parallelism=32, expected_items=100_000)
    assert plan.build_partitions == 2  # 100k rows -> 2 x 50k tasks
    assert plan.merge_strategy == "driver_collect"


def test_large_rows_cost_model_parallelism():
    cfg = BloomConfig.from_false_pos(0.001, expected_items=16_000_000)
    plan = plan_bloom_build(cfg, input_partitions=64,
                            default_parallelism=32,
                            expected_items=16_000_000)
    # P* = sqrt(n * TR / (rate * m_bytes)) ~ 24 for flat at this geometry
    assert 16 <= plan.build_partitions <= 32
    assert plan.merge_strategy == "driver_collect"


def test_block64_wants_fewer_partials():
    """A 5x faster kernel shifts the optimum toward fewer, bigger tasks."""
    flat = BloomConfig.from_false_pos(0.001, expected_items=16_000_000)
    blk = BloomConfig.block64_from_false_pos(0.001,
                                             expected_items=16_000_000)
    p_flat = plan_bloom_build(flat, input_partitions=64,
                              default_parallelism=32,
                              expected_items=16_000_000)
    p_blk = plan_bloom_build(blk, input_partitions=64,
                             default_parallelism=32,
                             expected_items=16_000_000)
    assert p_blk.build_partitions < p_flat.build_partitions
    assert p_blk.merge_strategy == "driver_collect"


def test_huge_filter_triggers_sharded_merge():
    # 10^9 items at fp 1e-3 -> m ~ 1.8 GB; even a handful of partials
    # exceed the single-node budget
    cfg = BloomConfig.from_false_pos(0.001, expected_items=1_000_000_000)
    plan = plan_bloom_build(cfg, input_partitions=2000,
                            default_parallelism=512,
                            expected_items=1_000_000_000)
    assert plan.build_partitions == 512  # parallelism NOT sacrificed
    assert plan.merge_strategy == "range_sharded"
    assert plan.partial_state_bytes > (1 << 30)


def test_unknown_n_defaults_to_parallelism():
    cfg = BloomConfig.with_num_bits(1 << 20, num_hashes=5)
    plan = plan_bloom_build(cfg, input_partitions=10,
                            default_parallelism=32, expected_items=None)
    assert plan.build_partitions == 10
