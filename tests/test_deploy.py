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
