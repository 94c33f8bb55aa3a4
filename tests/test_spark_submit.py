"""Deployment-shape test: the real ``spark-submit --py-files`` path.

Packages ``nacc_form_validator_spark`` into a zip, submits
``jobs/run_quality_filter.py`` in a FRESH JVM exactly as the north-rule
deployment does, and checks (a) the decisions output, (b) checkpoint
resume: a second submit over the same output writes zero rows because
every url-hash bucket is already committed.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_package(dest):
    zpath = os.path.join(dest, "nfvs.zip")
    pkg = os.path.join(REPO, "nacc_form_validator_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(zpath, inp, outp, extra=()):
    cmd = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "run_quality_filter.py"),
        "--input", inp, "--output", outp, "--buckets", "8", *extra,
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=420)
    assert out.returncode == 0, out.stderr[-4000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, (out.stdout[-2000:], out.stderr[-2000:])
    return json.loads(lines[-1])


def test_spark_submit_pyfiles_and_resume(spark, tmp_path):
    if not os.path.exists(SPARK_SUBMIT):
        pytest.skip("spark-submit not on this machine")
    from nacc_form_validator_spark.sources.pages import pages_from_documents
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inp = str(tmp_path / "pages")
    pages_from_documents(docs).write.parquet(inp)
    n_pages = spark.read.parquet(inp).count()

    zpath = _zip_package(str(tmp_path))
    outp = str(tmp_path / "decisions")

    first = _submit(zpath, inp, outp)
    assert first["rows_written"] == n_pages
    written = spark.read.parquet(outp)
    assert written.count() == n_pages
    assert {"passed", "findings", "part_bucket"} <= set(written.columns)

    # resume: all buckets committed -> nothing left to do
    second = _submit(zpath, inp, outp)
    assert second["rows_written"] == 0
