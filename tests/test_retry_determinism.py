"""Task-retry determinism (C3 + the SPARK-23207 class of hazard).

Injects a REAL task failure into the first attempt of every partition of a
Python stage and asserts the retried job produces byte-identical results
to an unfailed run — the property that value-hash salting (operators/
skew.py) and deterministic stages are designed to guarantee. Runs in a
subprocess because retries need the ``local[N, F]`` master form, and the
suite's shared session was created without it.
"""

from __future__ import annotations

import os
import subprocess
import sys

SCRIPT = r"""
import os, sys, tempfile
sys.path.insert(0, os.environ["REPO_ROOT"])
from resume_ocr_spark.session import get_spark
from resume_ocr_spark.operators import skew
from pyspark.sql import functions as F

spark = get_spark(app_name="chaos_retry", cores=4, shuffle_partitions=4,
                  task_retries=3)
marker_dir = tempfile.mkdtemp(prefix="chaos_markers_")

def make_flaky(mdir):
    def flaky(batches):
        # fail the FIRST attempt of each task; retried attempts pass
        # through (mdir travels in the serialized closure — driver env
        # vars do not reach the Python workers)
        import os as _os

        from pyspark import TaskContext
        tc = TaskContext.get()
        marker = _os.path.join(mdir, f"p{tc.partitionId()}")
        if not _os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("injected failure (first attempt)")
        for pdf in batches:
            yield pdf
    return flaky

flaky = make_flaky(marker_dir)
df = spark.range(0, 5000, 1, 4).withColumn("v", F.col("id") % 7)
aggs = {"count_rows": F.count("*"), "sum_id": F.sum("id")}

flaky_out = df.mapInPandas(flaky, schema="id long, v long")
got = sorted(tuple(r) for r in skew.salted_agg(flaky_out, "v", aggs).collect())
want = sorted(tuple(r) for r in skew.salted_agg(df, "v", aggs).collect())

n_failures = len(os.listdir(marker_dir))
assert n_failures >= 4, f"no failures injected ({n_failures})"
assert got == want, f"retry changed results:\n{got}\nvs\n{want}"
print(f"RETRY_OK failures_injected={n_failures}")
"""


def test_injected_task_failures_are_retried_deterministically():
    env = dict(os.environ,
               REPO_ROOT=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT], env=env,
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RETRY_OK" in proc.stdout, proc.stdout
