"""spark-submit --py-files deployment contract (north rule)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

from fastbloom_spark.deploy import make_pyfiles_zip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_is_deterministic_and_complete(tmp_path):
    a = make_pyfiles_zip(str(tmp_path / "a.zip"))
    b = make_pyfiles_zip(str(tmp_path / "b.zip"))
    assert open(a, "rb").read() == open(b, "rb").read()
    names = zipfile.ZipFile(a).namelist()
    assert "fastbloom_spark/__init__.py" in names
    assert "fastbloom_spark/operators/bloom.py" in names
    assert not any("__pycache__" in n or n.endswith(".pyc") for n in names)


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_job(tmp_path):
    """The real deployment path: spark-submit with ONLY the zip on the
    python path (cwd moved away so the repo isn't importable)."""
    zip_path = make_pyfiles_zip(str(tmp_path / "fastbloom_spark.zip"))
    ckpt = str(tmp_path / "ckpt")
    env = dict(os.environ, PYTHONPATH="")
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "build_bloom.py"),
         "/root/testdata/sf0.001/documents.parquet", "text",
         "0.01", "42", ckpt],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
        env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["rows"] == 500
    assert out["k"] >= 1 and out["m"] % 64 == 0
    assert os.path.isdir(ckpt)


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_dedup_job(tmp_path):
    """Corpus dedup pipeline via spark-submit --py-files: exact then
    MinHash near-dup, counts reported on stdout."""
    zip_path = make_pyfiles_zip(str(tmp_path / "fastbloom_spark.zip"))
    out_dir = str(tmp_path / "deduped")
    env = dict(os.environ, PYTHONPATH="")
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "dedup_corpus.py"),
         "/root/testdata/sf0.001/documents.parquet", "doc_id", "text",
         "0.7", out_dir],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
        env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["rows_in"] == 500
    assert 0 < out["after_near_dedup"] <= out["after_exact_dedup"] <= 500
    assert os.path.isdir(out_dir)


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_streaming_dedup_job(tmp_path):
    """Streaming Bloom dedup via spark-submit: drain-available trigger,
    restart resumes state (second run over appended duplicates emits
    nothing new)."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    zip_path = make_pyfiles_zip(str(tmp_path / "fastbloom_spark.zip"))
    src = tmp_path / "src"
    src.mkdir()
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    pq.write_table(tbl, str(src / "a.parquet"))
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    env = dict(os.environ, PYTHONPATH="")
    args = ["spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "streaming_dedup.py"),
            str(src), "text", str(1 << 14), "5", "42", out_dir, ckpt,
            "doc_id"]
    p1 = subprocess.run(args, capture_output=True, text=True, timeout=300,
                        cwd=str(tmp_path), env=env)
    assert p1.returncode == 0, p1.stderr[-3000:]
    n1 = json.loads([l for l in p1.stdout.splitlines()
                     if l.startswith("{")][-1])["emitted_total"]
    # replay the same rows as a new file: state must suppress all of them
    pq.write_table(tbl, str(src / "b.parquet"))
    p2 = subprocess.run(args, capture_output=True, text=True, timeout=300,
                        cwd=str(tmp_path), env=env)
    assert p2.returncode == 0, p2.stderr[-3000:]
    n2 = json.loads([l for l in p2.stdout.splitlines()
                     if l.startswith("{")][-1])["emitted_total"]
    assert n1 > 0
    assert n2 == n1  # replay emitted nothing


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_build_block64_xxh64(tmp_path):
    """The build job's layout/digest arguments reach the filter config."""
    zip_path = make_pyfiles_zip(str(tmp_path / "fastbloom_spark.zip"))
    ckpt = str(tmp_path / "ckpt_blk")
    env = dict(os.environ, PYTHONPATH="")
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "build_bloom.py"),
         "/root/testdata/sf0.001/documents.parquet", "text",
         "0.01", "42", ckpt, "block64", "xxh64"],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
        env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["rows"] == 500
    assert out["layout"] == "block64" and out["digest"] == "xxh64"


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_index_job(tmp_path):
    """Skip-index job over the zip-only deployment path: builds the
    bucketed table + index and reports pruning for a member probe."""
    import duckdb

    zip_path = make_pyfiles_zip(str(tmp_path / "fastbloom_spark.zip"))
    out_path = str(tmp_path / "indexed")
    probe = duckdb.sql(
        "SELECT text FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE doc_id = 7").fetchone()[0]
    env = dict(os.environ, PYTHONPATH="")
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "build_index.py"),
         "/root/testdata/sf0.001/documents.parquet", out_path,
         "text", "doc_id", "8", "0.01", "zones=n_chars", probe],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
        env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["rows"] == 500 and out["num_buckets"] == 8
    assert out["probe_rows_matched"] >= 1      # zero-FN: the row is found
    assert 1 <= out["buckets_survived"] <= 2   # FPR-bounded over-read
    # versioned atomic publish: exactly one committed version dir with the
    # bloom rows + zones inside it
    vroot = f"{out_path}/index_versions"
    versions = sorted(os.listdir(vroot))
    assert len(versions) == 1, versions
    vdir = f"{vroot}/{versions[0]}"
    assert os.path.isfile(f"{vdir}/_COMMITTED")
    assert os.path.isdir(f"{vdir}/bloom")
    assert os.path.isdir(f"{vdir}/zones/n_chars")


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pipeline_job(tmp_path):
    """The composed corpus pipeline via spark-submit --py-files: packed
    output partitioned by split, per-stage counts + fill stats on
    stdout; packed rows never exceed capacity except oversize-solo."""
    import pyarrow.parquet as pq

    zip_path = make_pyfiles_zip(str(tmp_path / "fastbloom_spark.zip"))
    src = str(tmp_path / "docs.parquet")
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    pq.write_table(tbl, src)
    out_dir = str(tmp_path / "packed")
    env = dict(os.environ, PYTHONPATH="")
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "run_pipeline.py"),
         src, out_dir, "-", "0.2", "5", "128", "8"],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
        env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["rows_in"] == 500
    assert 0 < out["rows_packed"] <= 500
    assert out["rows_packed"] == out["rows_in"] - out["rows_dropped"]
    assert set(out["splits"]) <= {"train", "val", "test"}
    assert sum(out["splits"].values()) == out["rows_packed"]
    assert out["blocks"] > 0 and 0 < out["fill_ratio"]
    # read the table back: split-partitioned, capacity law holds
    import duckdb

    over = duckdb.sql(
        f"""SELECT count(*) FROM (
              SELECT split, shard, block_id, sum(n_tokens) AS t,
                     max(oversize::INT) AS over
              FROM parquet_scan('{out_dir}/*/*.parquet',
                                hive_partitioning=1)
              GROUP BY ALL)
            WHERE t > 128 AND over = 0""").fetchone()[0]
    assert over == 0
