"""End-to-end launch-mode evidence (north_rule: "launched via spark-submit
--py-files on multi-executor clusters"): zip the package, spark-submit the
driver script from a neutral cwd with PYTHONPATH cleared, so every import on
driver AND executors must resolve from the --py-files zip."""

import os
import subprocess
import zipfile

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files(tmp_path, corpus_path):
    zip_path = tmp_path / "longqc_spark.zip"
    pkg = os.path.join(REPO, "longqc_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    out = tmp_path / "qc_out"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", str(zip_path),
        os.path.join(REPO, "tools", "submit_qc.py"),
        "--input", corpus_path,
        "--out", str(out),
        "--buckets", "4",
        "--report",
        "--compact",
        "--expire-keep", "1",
    ]
    r = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600
    )
    combined = r.stdout + r.stderr
    assert r.returncode == 0, combined[-3000:]
    assert "committed 4/4 buckets" in combined, combined[-3000:]
    assert "compacted" in combined and "reclaimed roots" in combined, combined[-3000:]

    # after compaction+expiry the manifest points at the compacted root
    import json

    with open(os.path.join(out, "manifest.json")) as f:
        root = json.load(f).get("data_root", "data")
    labels = pd.read_parquet(os.path.join(out, root))
    ref = pd.read_parquet(corpus_path)
    assert len(labels) == len(ref)
    assert set(labels.columns) >= {"url", "keep", "scrubbed_text"}
    assert os.path.exists(os.path.join(out, "report.json"))
    assert os.path.exists(os.path.join(out, "report.html"))
