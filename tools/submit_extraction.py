"""spark-submit entry point: run (or resume) an extraction run.

    spark-submit --py-files dist/resume_ocr_spark.zip tools/submit_extraction.py \
        --warehouse <path> --output <path> --run-id <id> \
        [--query "..."] [--chunk-size N] [--ocr-partitions N]

Exits nonzero if every document failed (the reference's all-failed gate,
app/routers/analysis.py:518-539).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--query", default=None)  # ranked vs summary mode
    ap.add_argument("--chunk-size", type=int, default=None)
    ap.add_argument("--ocr-partitions", type=int, default=None)
    ap.add_argument("--log-dir", default="logs")
    args = ap.parse_args()

    import os

    from resume_ocr_spark import applog, pipeline
    from resume_ocr_spark.textproc import normalize_query, query_terms

    # S7 rotating app-log sink (reference: app/config/logging_config.py)
    applog.setup_logging(args.log_dir)
    applog.log_run_event(args.run_id, "run_start",
                         warehouse=args.warehouse, output=args.output)

    # P12 query normalization then driver-side validation (reference F9,
    # llm_service.py:158-235 — rejects the whole run before executor work)
    args.query = normalize_query(args.query)
    if args.query is not None:
        if len(args.query) > 2500:
            print("invalid query: longer than 2500 chars", file=sys.stderr)
            return 2
        if not query_terms(args.query):
            print("invalid query: no content terms", file=sys.stderr)
            return 2

    # S5 health gate: warehouse reachability before any stage runs
    # (reference: app/services/database_service.py:21-58 — 503 when down)
    manifest = os.path.join(args.warehouse, "documents_raw", "manifest.json")
    if not os.path.exists(manifest):
        print(f"warehouse unreachable: {manifest} missing", file=sys.stderr)
        return 3

    spark = SparkSession.builder.getOrCreate()
    result = pipeline.run_extraction(
        spark, args.warehouse, args.output, run_id=args.run_id,
        query=args.query, chunk_size=args.chunk_size,
        ocr_partitions=args.ocr_partitions,
    )
    summary = pipeline.run_summary(spark, args.output, args.run_id).collect()[0]
    n_ok = result.filter(F.col("doc_error").isNull()).count()
    applog.log_run_event(
        args.run_id, "run_complete",
        buckets=summary["buckets_complete"], docs=summary["docs_processed"],
        ocr_pages=summary["ocr_pages"],
        parse_failures=summary["parse_failures"], ok_docs=n_ok)
    print(f"run={args.run_id} buckets={summary['buckets_complete']} "
          f"docs={summary['docs_processed']} ocr_pages={summary['ocr_pages']} "
          f"parse_failures={summary['parse_failures']} ok_docs={n_ok}")
    if n_ok == 0 and summary["docs_processed"] > 0:
        applog.log_run_event(args.run_id, "all_failed")
        print("all documents failed", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
