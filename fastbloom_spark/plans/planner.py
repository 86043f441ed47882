"""Build planner — the engine's cost model for sketch jobs.

The reference's "planner" is its optimal-parameter math (fastbloom
``src/builder.rs:247-276``: choose m, k from n, fp). At cluster scale two
more decisions join it, both driven by the same arithmetic:

* **build parallelism**: every extra build partition adds one m/8-byte
  partial to merge traffic, but divides kernel wall time. Small tasks
  (< ~50k rows) are all fixed cost; huge partial states (> budget) are all
  transport.
* **merge topology**: below ~1 GiB of raw partial state, a single Arrow
  collect + driver OR is the fastest merge (zero shuffle). Above it, the
  range-sharded merge keeps every node's footprint at m/8 / shards and the
  driver's at exactly m/8.

``plan_bloom_build`` centralizes those choices so the operator layer
(`operators/bloom.py`) and any caller reasoning about a job (tests, bench,
capacity planning) agree.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..config import BloomConfig

#: below this many rows per task, fixed per-partial costs dominate
MIN_ROWS_PER_TASK = 50_000

#: raw partial-state bytes above which the merge must not converge on one node
DRIVER_MERGE_BUDGET = 1 << 30


@dataclass(frozen=True)
class BuildPlan:
    config: BloomConfig
    build_partitions: int
    merge_strategy: str  # "driver_collect" | "range_sharded"
    partial_state_bytes: int

    @property
    def per_partial_bytes(self) -> int:
        return self.config.num_words * 8


def plan_bloom_build(
    cfg: BloomConfig,
    *,
    input_partitions: int,
    default_parallelism: int,
    expected_items: int | None = None,
) -> BuildPlan:
    """Choose build parallelism and merge topology for a global Bloom build."""
    p_build = min(input_partitions, max(default_parallelism, 1))
    state_budget_parts = max(1, DRIVER_MERGE_BUDGET // (cfg.num_words * 8))
    if expected_items:
        p_build = min(p_build, max(1, int(expected_items) // MIN_ROWS_PER_TASK))
    p_build = max(p_build, 1)
    state_bytes = p_build * cfg.num_words * 8
    strategy = ("driver_collect" if p_build <= state_budget_parts
                else "range_sharded")
    return BuildPlan(
        config=cfg,
        build_partitions=p_build,
        merge_strategy=strategy,
        partial_state_bytes=state_bytes,
    )
