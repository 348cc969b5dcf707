"""spark-submit --py-files packaging smoke (north_rule: "run via
spark-submit --py-files").

Builds dist/sparkdedup.zip with tools/package.sh, then runs a full
featurize -> search pipeline through ``spark-submit --py-files`` from
a NEUTRAL working directory, asserting the engine imported from the
staged zip (not the repo checkout) and produced the planted corpus's
deterministic edge/cluster counts. This is the only test that
exercises the deployment artifact end-to-end.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

JOB = """
from pyspark.sql import SparkSession
spark = SparkSession.builder.getOrCreate()
import sparkdedup
assert "sparkdedup.zip" in sparkdedup.__file__, sparkdedup.__file__
from sparkdedup.corpus import files_table
cfg = sparkdedup.DedupConfig(similarity="similar", containment=True)
sigs, invalid = sparkdedup.build_signatures(
    spark, cfg, files_table(spark, n=200, seed=3))
res = sparkdedup.search_clusters(sigs, invalid, cfg)
print("SMOKE_EDGES", res.edges.count(),
      "CLUSTERS", res.clusters.select("cluster_id").distinct().count())
print("SMOKE_FROM", sparkdedup.__file__)
"""


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_runs_pipeline(tmp_path):
    subprocess.run(["bash", str(REPO / "tools" / "package.sh")],
                   check=True, capture_output=True)
    zip_path = REPO / "dist" / "sparkdedup.zip"
    assert zip_path.exists()
    job = tmp_path / "job.py"
    job.write_text(JOB)
    p = subprocess.run(
        ["spark-submit", "--master", "local[8]",
         "--py-files", str(zip_path),
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.showConsoleProgress=false",
         str(job)],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=420,
        errors="replace")
    assert p.returncode == 0, p.stderr[-2000:]
    out = p.stdout
    # deterministic planted corpus (n=200, seed=3): counts are exact
    assert "SMOKE_EDGES 71 CLUSTERS 22" in out, out[-2000:]
    assert "sparkdedup.zip" in out.split("SMOKE_FROM", 1)[1]


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
