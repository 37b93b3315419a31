"""SparkSession factory with scale-oriented defaults.

Sandbox runs local[N] on one 32-core/128GiB box; on a real cluster the same
builder config applies (AQE handles runtime re-planning and skew-join
splitting; Arrow batch size bounds Python-UDF memory when batches carry
multi-MB media payloads)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import ARROW_MAX_RECORDS_PER_BATCH


def get_spark(
    app_name: str = "resume_ocr_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    task_retries: int | None = None,
) -> SparkSession:
    # one BLAS thread per Python worker: Spark already parallelizes across
    # workers, and N workers × M BLAS threads oversubscribes the box
    # (observed: local[32] slower than local[8] on the OCR stage without this)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 32)
    # C3 retry budget: local mode IGNORES spark.task.maxFailures — retries
    # require the local[N, F] master form. F=2 means one retry, enough for
    # transient task faults; every stage is deterministic (value-hash salts,
    # seeded corpus, pure codecs) so a retried task reproduces its output
    # exactly (tests/test_retry_determinism.py injects failures to prove it).
    task_retries = task_retries or int(
        os.environ.get("SPARK_GRAFT_TASK_RETRIES", "2"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}, {task_retries}]")
        .config("spark.task.maxFailures", str(task_retries))  # cluster parity
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
