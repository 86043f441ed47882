"""Similarity search: exact cosine top-k, RHP-LSH ANN recall, near-dup pairs,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastbloom_spark.operators.multimodal import (
    decode_image,
    fake_codec,
    media_dedup_exact,
    media_features,
    synth_media_table,
)
from fastbloom_spark.operators.similarity import (
    ann_topk_rhp,
    cosine_topk,
    embedding_near_dup_pairs,
)


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def corpus_np(embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def exact_topk_np(ids, mat, queries, k):
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    scores = qn @ mn.T
    out = {}
    for qi in range(queries.shape[0]):
        order = np.lexsort((ids, -scores[qi]))[:k]
        out[qi] = [int(ids[i]) for i in order]
    return out


def test_cosine_topk_matches_numpy_oracle(spark, embeddings, corpus_np):
    ids, mat = corpus_np
    queries = mat[:5] + 0.01  # perturbed corpus vectors as queries
    got = cosine_topk(embeddings.repartition(7), "vec_id", "embedding",
                      queries, k=10)
    got_ids = {}
    for r in got.collect():
        got_ids.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    want = exact_topk_np(ids, mat, queries, 10)
    for qi in range(5):
        mine = [v for _, v in sorted(got_ids[qi])]
        assert mine == want[qi], qi


def test_cosine_topk_self_query_rank1(spark, embeddings, corpus_np):
    ids, mat = corpus_np
    queries = mat[10:13]  # exact corpus vectors
    got = cosine_topk(embeddings, "vec_id", "embedding", queries, k=3)
    top1 = {r.query_id: r.vec_id for r in got.collect() if r.rank == 1}
    for qi in range(3):
        assert top1[qi] == int(ids[10 + qi])


def test_ivf_recall_vs_exact(spark, embeddings, corpus_np):
    """IVF is the general ANN path: decent recall even on this
    weak-similarity corpus (top-10 cosine ~0.3)."""
    from fastbloom_spark.operators.similarity import ivf_topk

    ids, mat = corpus_np
    queries = mat[:8]
    k = 10
    want = exact_topk_np(ids, mat, queries, k)
    got = ivf_topk(embeddings, "vec_id", "embedding", queries, k=k,
                   n_centroids=16, nprobe=6, seed=42)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(by_q.get(qi, set()) & set(want[qi])) / k
               for qi in range(8)]
    assert np.mean(recalls) >= 0.6, recalls
    # self-vector always found (it shares the query's own cell)
    top1 = {r.query_id: r.vec_id for r in got.collect() if r.rank == 1}
    for qi in range(8):
        assert top1[qi] == int(ids[qi])


def test_rhp_ann_on_high_similarity_corpus(spark):
    """RHP-LSH is the high-similarity tool: near-perfect recall when true
    neighbors are close (the near-dup retrieval regime it exists for)."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
        for j in range(3):  # 3 close variants per base vector
            rows.append((1000 + 10 * i + j,
                         (v + 0.05 * rng.standard_normal(32)).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = base[:10]
    got = ann_topk_rhp(df, "vec_id", "embedding", queries, k=4,
                       num_planes=10, multiprobe_bits=2, seed=42)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    hits = 0
    for qi in range(10):
        expected = {qi, 1000 + 10 * qi, 1000 + 10 * qi + 1,
                    1000 + 10 * qi + 2}
        hits += len(by_q.get(qi, set()) & expected)
    assert hits / 40 >= 0.8, hits / 40


def test_embedding_near_dup_pairs_finds_planted(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((50, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
        if i < 10:  # planted near-dups: tiny perturbation
            rows.append((1000 + i, (v + 0.01 * rng.standard_normal(16))
                         .tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = embedding_near_dup_pairs(df, "vec_id", "embedding",
                                     threshold=0.98, num_planes=10, seed=1)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, 1000 + i) for i in range(10)}
    assert len(got & planted) >= 8, got & planted
    # verify no false accepts: every reported pair really has cosine>=0.98
    vecs = {i: np.array(v) for i, v in rows}
    for a, b in got:
        va, vb = vecs[a], vecs[b]
        c = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert c >= 0.98 - 1e-6


# ------------------------------------------------------------- multimodal --


def test_media_table_and_features(spark):
    media = synth_media_table(spark, 300, num_partitions=4)
    assert media.count() == 300
    feats = media_features(media, feature_dim=16)
    rows = feats.collect()
    assert len(rows) == 300
    for r in rows[:20]:
        assert len(r.feature) == 16
        assert abs(sum(r.feature) - 1.0) < 0.01  # normalized histogram
    # determinism across partitionings
    feats2 = media_features(synth_media_table(spark, 300, num_partitions=9),
                            feature_dim=16)
    a = {r.media_id: tuple(r.feature) for r in rows}
    b = {r.media_id: tuple(r.feature) for r in feats2.collect()}
    assert a == b


def test_decode_codec_contract(spark):
    # non-BMP bytes with no codec: honestly unsupported -> raises
    payload = b"\x01\x02\x03" * 50
    with pytest.raises(NotImplementedError):
        decode_image(payload)
    # pluggable codec path unchanged
    img = decode_image(payload, codec=fake_codec)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    # real BMP decodes natively, no codec needed
    from fastbloom_spark.functions.codecs import encode_bmp
    real = np.arange(9 * 7 * 3, dtype=np.uint8).reshape(9, 7, 3)
    assert (decode_image(encode_bmp(real)) == real).all()


def test_media_dedup_exact(spark):
    media = synth_media_table(spark, 100, num_partitions=3)
    # payloads are unique by construction -> all dup_count 1
    out = media_dedup_exact(media)
    assert out.count() == 100
    assert out.agg(F.max("dup_count")).collect()[0][0] == 1


def test_cosine_topk_k_exceeds_corpus(spark):
    rng = np.random.default_rng(5)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(6)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = cosine_topk(df, "vec_id", "embedding",
                      np.array([rows[0][1]]), k=50)
    assert out.count() == 6  # clamped to corpus size


def test_ann_zero_multiprobe(spark):
    rng = np.random.default_rng(6)
    base = rng.standard_normal((20, 16))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)],
        ["vec_id", "embedding"])
    out = ann_topk_rhp(df, "vec_id", "embedding", base[:3], k=3,
                       num_planes=8, multiprobe_bits=0, seed=2)
    top1 = {r.query_id: r.vec_id for r in out.collect() if r.rank == 1}
    for qi in range(3):  # self-vector always shares its own bucket
        assert top1[qi] == qi


def test_embedding_near_dup_degenerate_corpus_bounded(spark):
    """A constant-embedding corpus collapses into one RHP bucket; the
    bucket cap keeps the self-join from going quadratic while planted
    near-dups in small buckets are still found."""
    rng = np.random.default_rng(3)
    const = rng.standard_normal(16)
    rows = [(i, (const + 0.0).tolist()) for i in range(400)]
    a = rng.standard_normal(16)
    rows += [(9001, a.tolist()), (9002, (a + 0.001).tolist())]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = embedding_near_dup_pairs(df, "vec_id", "embedding",
                                     threshold=0.99, num_planes=8,
                                     max_bucket_size=50)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (9001, 9002) in got
    # the 400-row constant cluster (79800 pairs if quadratic) was capped
    assert len(got) < 200


def test_resize_media_shapes_and_determinism(spark):
    from fastbloom_spark.operators.multimodal import (fake_codec,
                                                      resize_media,
                                                      synth_media_table)

    media = synth_media_table(spark, 30, seed=3)
    small = resize_media(media, out_width=4, out_height=4, codec=fake_codec)
    rows = small.collect()
    assert len(rows) == 30
    assert all(r.width == 4 and r.height == 4 for r in rows)
    assert all(r.n_bytes == 4 * 4 * 3 == len(bytes(r.payload))
               for r in rows)
    again = {r.media_id: bytes(r.payload) for r in resize_media(
        media, out_width=4, out_height=4, codec=fake_codec).collect()}
    assert all(bytes(r.payload) == again[r.media_id] for r in rows)
    # codec-less path decodes real containers only: the synthetic sha-chain
    # payloads are not BMPs, so the task raises the honest unsupported-format
    # error (Spark surfaces worker exceptions as PythonException)
    import pytest as _pytest
    with _pytest.raises(Exception, match="unsupported image container"):
        resize_media(media).collect()


def test_sample_frames_jvm_plumbing(spark):
    from fastbloom_spark.operators.multimodal import (sample_frames,
                                                      synth_media_table)

    media = synth_media_table(spark, 60, seed=3)  # 128-byte payloads
    frames = sample_frames(media, frame_bytes=32, every_n=2)
    rows = frames.collect()
    # only video rows explode; 128/32 = 4 frames, every 2nd -> idx 0, 2
    vids = {r.media_id for r in media.filter("kind = 'video'").collect()}
    assert {r.media_id for r in rows} == vids
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
        assert len(bytes(r.frame)) == 32
    assert all(sorted(v) == [0, 2] for v in by_id.values())
    # frame content is the right slice of the payload
    payloads = {r.media_id: bytes(r.payload)
                for r in media.filter("kind = 'video'").collect()}
    for r in rows:
        start = r.frame_idx * 32
        assert bytes(r.frame) == payloads[r.media_id][start:start + 32]


def test_ivf_index_persistence_and_pruning(spark, tmp_path):
    """write_ivf_index -> ivf_topk_from_index: results match the in-memory
    ivf_topk for the same centroids, and the corpus scan PRUNES to the
    probed cell partitions (PartitionFilters on the parquet scan)."""
    from fastbloom_spark.operators.similarity import (ivf_topk,
                                                      ivf_topk_from_index,
                                                      write_ivf_index)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf")
    centroids = write_ivf_index(emb, "vec_id", "embedding", path,
                                n_centroids=8, seed=7)
    q = np.array([r.embedding for r in emb.limit(3).collect()],
                 dtype=np.float64)

    from_index = ivf_topk_from_index(spark, path, "vec_id", "embedding",
                                     q, k=5, nprobe=3)
    in_memory = ivf_topk(emb, "vec_id", "embedding", q, k=5,
                         nprobe=3, centroids=centroids)
    got = sorted(tuple(r) for r in from_index.collect())
    want = sorted(tuple(r) for r in in_memory.collect())
    assert got == want

    # partition pruning reaches the scan: fewer than all 8 cells read
    plan = from_index._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan


def test_kmeans_sample_covers_all_partitions_one_job(spark):
    """The quantizer sampler runs ONE job (no up-front count) and draws
    from EVERY partition — a partition-ordered corpus cannot bias the
    quantizer to one shard (the CollectLimit failure mode)."""
    from fastbloom_spark.operators.similarity import kmeans_centroids

    n, dim = 60_000, 8
    # partition-ordered corpus: each range partition holds one "shard";
    # vectors encode their shard in coordinate 0 so shard coverage is
    # observable in the trained centroids
    big = spark.range(0, n, 1, 8).select(
        F.col("id").alias("vec_id"),
        F.array((F.col("id") < (n // 2)).cast("double") * 2 - 1,
                *[(F.rand(seed=i) * 0.1) for i in range(dim - 1)])
        .alias("embedding")).persist()
    big.count()

    sc = spark.sparkContext
    sc.setJobGroup("kmeans_jobs", "count kmeans jobs", False)
    cents = kmeans_centroids(big, "embedding", 4, sample_rows=2000, seed=3)
    jobs = sc.statusTracker().getJobIdsForGroup("kmeans_jobs")
    sc.setLocalProperty("spark.jobGroup.id", None)
    big.unpersist()
    assert cents.shape == (4, dim)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-9)
    # no count job: the head-per-partition sample is a single collect
    assert len(jobs) <= 2, jobs
    # both halves of the corpus (coord0 = +1 and -1 shards) reached the
    # quantizer — a first-partitions-only sample would see only +1
    assert cents[:, 0].max() > 0.5 and cents[:, 0].min() < -0.5, cents[:, 0]


def test_embedding_dedup_clusters_to_min_id(spark):
    """embedding_dedup: a planted 3-chain of near-identical vectors keeps
    only its min id; distant vectors survive."""
    from fastbloom_spark.operators.similarity import embedding_dedup

    rng = np.random.default_rng(5)
    base = rng.standard_normal(16)
    rows = []
    for i, eps in [(1, 0.0), (2, 0.01), (3, 0.02)]:  # tight cluster
        v = base + eps * rng.standard_normal(16)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    for i in range(10, 30):  # random singletons
        v = rng.standard_normal(16)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    kept = sorted(r.vec_id for r in embedding_dedup(
        df, "vec_id", "embedding", threshold=0.98, num_planes=8,
        seed=11).collect())
    assert 1 in kept and 2 not in kept and 3 not in kept
    assert set(range(10, 30)) <= set(kept)


def test_rademacher_ann_recall_and_determinism(spark):
    """Rademacher ±1 planes (mix64-derived, engine-replayable) keep the
    angular-LSH recall of Gaussian planes on the near-dup regime, and the
    bucketing is bit-deterministic (integer-quantized dots — no float
    ties)."""
    rng = np.random.default_rng(23)
    base = rng.standard_normal((60, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
        for j in range(3):
            rows.append((1000 + 10 * i + j,
                         (v + 0.05 * rng.standard_normal(32)).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = base[:10]
    kw = dict(k=4, num_planes=10, multiprobe_bits=2, seed=42,
              planes_kind="rademacher", quant=1024)
    got = ann_topk_rhp(df, "vec_id", "embedding", queries, **kw)
    rows1 = sorted(map(tuple, got.collect()))
    by_q = {}
    for qid, vid, *_ in rows1:
        by_q.setdefault(qid, set()).add(vid)
    hits = sum(len(by_q.get(qi, set())
                   & {qi, 1000 + 10 * qi, 1000 + 10 * qi + 1,
                      1000 + 10 * qi + 2}) for qi in range(10))
    assert hits / 40 >= 0.8, hits / 40
    # bit-determinism: a second run returns identical rows
    rows2 = sorted(map(tuple,
                       ann_topk_rhp(df, "vec_id", "embedding", queries,
                                    **kw).collect()))
    assert rows1 == rows2


def test_rademacher_planes_replayable():
    """Plane entries derive from the documented mix64 chain — the contract
    the SQL oracle replays (and Gaussian planes cannot honor)."""
    from fastbloom_spark.kernel import mix64
    from fastbloom_spark.operators.similarity import rademacher_planes

    P = rademacher_planes(8, 16, seed=7)
    base = int(mix64(np.uint64(7)))
    for p in range(8):
        for i in range(16):
            bit = int(mix64(np.uint64((base ^ (p * (1 << 32) + i))
                                      & ((1 << 64) - 1)))) & 1
            assert P[p, i] == (1.0 if bit else -1.0)


def test_multiprobe_levels_expand_generically(spark):
    """multiprobe_bits=3 probes strictly more buckets than 2 (the flip set
    is generated for ANY level, not capped at 2)."""
    rng = np.random.default_rng(5)
    rows = [(i, v.tolist()) for i, v in
            enumerate(rng.standard_normal((40, 16)))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = np.array([r[1] for r in rows[:2]])
    counts = {}
    for mp in (2, 3):
        got = ann_topk_rhp(df, "vec_id", "embedding", queries, k=40,
                           num_planes=8, multiprobe_bits=mp, seed=9)
        counts[mp] = got.count()
    assert counts[3] >= counts[2]
    # structural check on the flip-set arithmetic: 1+C(8,1)+C(8,2)+C(8,3)
    from itertools import combinations
    sets = {mp: 1 + sum(len(list(combinations(range(8), j)))
                        for j in range(1, mp + 1)) for mp in (2, 3)}
    assert sets[3] == sets[2] + 56


def test_cosine_topk_negative_ids_and_exact_ties(spark):
    """Negative ids are legal (no sentinel masking), and exact duplicate
    vectors across partitions rank by ASCENDING id at the top-k boundary
    — the partial selection agrees with the rounded (score desc, id asc)
    window the oracle uses."""
    import numpy as np

    from fastbloom_spark.operators.similarity import cosine_topk

    base = np.eye(4)[0]
    rows = [(-5, base.tolist()), (-9, base.tolist()), (3, base.tolist()),
            (7, np.eye(4)[1].tolist()), (8, np.eye(4)[2].tolist())]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .repartition(3)
    got = cosine_topk(emb, "vec_id", "embedding",
                      np.array([base]), k=3).collect()
    ids = [r.vec_id for r in sorted(got, key=lambda r: r.rank)]
    # three exact score-1.0 ties -> ascending id order, negatives included
    assert ids == [-9, -5, 3], ids


def test_media_dedup_null_payloads_survive(spark):
    """NULL payloads are unknown content: each stays its own group
    (payload-level sibling of the text dedup NULL fix)."""
    media = spark.createDataFrame(
        [(1, b"aa"), (2, b"aa"), (3, None), (4, None)],
        "media_id long, payload binary")
    out = {(r.keeper_media_id): (r.payload_sha256, r.dup_count)
           for r in media_dedup_exact(media).collect()}
    assert out[1][1] == 2            # the real dup pair groups
    assert out[3] == (None, 1) and out[4] == (None, 1)


def test_media_features_null_payload_is_null(spark):
    """NULL payload -> NULL feature vector, never a zero vector that
    masquerades as real content."""
    from fastbloom_spark.operators.multimodal import media_features

    media = spark.createDataFrame(
        [(1, "image", b"\x10\x20\x30"), (2, "image", None)],
        "media_id long, kind string, payload binary")
    rows = {r.media_id: r.feature
            for r in media_features(media, feature_dim=16).collect()}
    assert rows[1] is not None and sum(rows[1]) > 0
    assert rows[2] is None
