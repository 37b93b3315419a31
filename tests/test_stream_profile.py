"""streaming.stream_profile: per-batch sketch deltas must merge to the
batch answer regardless of how the stream was sliced, new files must cost
only their own delta, and re-draining an unchanged source must be a
checkpointed no-op."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


@pytest.mark.usefixtures("spark")
def test_stream_profile_incremental_equals_batch(spark, tmp_path):
    from resume_ocr_spark import streaming as streamops
    from resume_ocr_spark.operators import sketches as sk
    from resume_ocr_spark.operators.dedup import _tokens

    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .select("doc_id", "lang", "text"))
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    for part in range(2):
        (docs.filter(F.col("doc_id") % 3 == part).coalesce(1)
         .write.parquet(os.path.join(src, f"part{part}")))

    n1 = streamops.stream_profile(spark, src, out, cp,
                                  max_files_per_trigger=1)
    assert n1 >= 2  # one-file micro-batches

    def batch_profile(frame):
        words = (frame.select("lang", F.explode(_tokens("text"))
                              .alias("word"))
                 .filter("word <> ''"))
        est = sk.hll_distinct(words, "word", ["lang"])
        tot = words.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words")).join(
            frame.groupBy("lang").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs")), "lang")
        return sorted(map(tuple, est.join(tot, "lang").collect()))

    two_thirds = docs.filter(F.col("doc_id") % 3 != 2)
    got = sorted(map(tuple,
                     streamops.profile_from_state(spark, out).collect()))
    assert got == batch_profile(two_thirds)

    # a third file lands: the re-drain processes ONLY the delta, and the
    # merged state now equals the full-corpus batch answer
    (docs.filter(F.col("doc_id") % 3 == 2).coalesce(1)
     .write.parquet(os.path.join(src, "part2")))
    n2 = streamops.stream_profile(spark, src, out, cp,
                                  max_files_per_trigger=1)
    assert n2 == 1
    got_all = sorted(map(tuple,
                         streamops.profile_from_state(spark, out).collect()))
    assert got_all == batch_profile(docs)

    # unchanged source: checkpoint makes the drain a no-op, state unchanged
    n3 = streamops.stream_profile(spark, src, out, cp,
                                  max_files_per_trigger=1)
    assert n3 == 0
    again = sorted(map(tuple,
                       streamops.profile_from_state(spark, out).collect()))
    assert again == got_all
