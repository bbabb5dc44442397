"""End-to-end spark-submit --py-files packaging test.

North-rule requirement: the engine must be "packaged for spark-submit
--py-files".  This test builds dist/proj_spark.zip, then launches a
REAL spark-submit subprocess from a scratch cwd (so the repo checkout
is not on any import path) and checks the job's JSON output —
proving the zip alone carries everything executors and the driver
need (kernels, grids CSV data files, pandas-UDF closures).
"""
import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

def _find_spark_submit():
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not present"
)
def test_spark_submit_pyfiles(tmp_path):
    submit = _find_spark_submit()
    if submit is None:
        pytest.skip("spark-submit not on PATH")
    sys.path.insert(0, ROOT)
    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "proj_spark.zip"))
    job = os.path.join(ROOT, "tools", "example_job.py")
    out_path = str(tmp_path / "result.json")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    proc = subprocess.run(
        [
            submit,
            "--master",
            "local[2]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            job,
            SF_DIR,
            out_path,
        ],
        cwd=str(tmp_path),  # NOT the repo root
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(open(out_path).read())
    assert result["rows"] > 0
    assert 0 < result["tiles"] <= result["rows"]
    # deterministic spot value: recompute in-process for comparison
    import duckdb

    rows = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert result["rows"] == rows
    # both projection paths produced identical x sums: +init=demo:webmerc
    # (resolved from the zip's bundled catalog) is spherical mercator,
    # same as the explicit +proj=merc +a=6378137 +es=0 string
    assert result["x_sum_init"] == result["x_sum"]
