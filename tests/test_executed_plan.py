"""Executed-plan regression guard (VERDICT r3 #4): pin the flagship's
RUNTIME (AQE-final) plan so regressions can't hide behind the pre-execution
explain.

Measured ground truth (this test documents it): the round-3 audit note
claiming "AQE converts the two SortMergeJoins to broadcast at runtime" was
an artifact — it inspected a count()-wrapped query execution whose column
pruning shrank the payload side below the broadcast threshold. Executing
the REAL frame (collect of the full payload) keeps exactly two
SortMergeJoins: analyze's LeftOuter self-joins on doc_id, where BOTH sides
are corpus-sized and co-partitioned — the correct 100 TB plan (broadcast
there would scale with the corpus and OOM). Every dimension-shaped join
still executes as broadcast. The pin: never MORE than those two SMJs, and
never a cartesian."""

import re

import pytest


@pytest.mark.usefixtures("spark")
def test_extract_pipeline_final_plan_join_strategies(spark):
    import __spark_entry__ as entrymod

    df = entrymod.extract_pipeline(spark, "/root/testdata/sf0.001")
    # collect() (not count()) — count() wraps the frame in a NEW aggregate
    # query execution with different pruning, leaving this frame's own AQE
    # plan unfinalized (and measuring the wrong plan — see module docstring)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final, "AQE did not finalize the plan"
    # key suffix is #NNN for strings but #NNNL for bigints — the L must be
    # optional or long-keyed SMJs silently escape the pin (review r4);
    # the raw-occurrence backstop catches any shape the regex misses
    smj = re.findall(
        r"SortMergeJoin \[(\w+)#\d+L?\], \[(\w+)#\d+L?\], (\w+)", final)
    assert final.count("SortMergeJoin") == len(smj), (
        "a SortMergeJoin printed in a shape the key regex does not parse")
    assert len(smj) <= 2, f"new SortMergeJoins appeared: {smj}"
    for left_key, right_key, join_type in smj:
        # only the co-partitioned corpus-sized self-joins may sort-merge
        assert (left_key, right_key) == ("doc_id", "doc_id"), smj
        assert join_type == "LeftOuter", smj
    assert "BroadcastHashJoin" in final
    # no data-sized cartesian either (the only nested-loop the engine ever
    # plans is similarity's intentional 1-row probe broadcast)
    assert "CartesianProduct" not in final


@pytest.mark.usefixtures("spark")
def test_curation_pipeline_final_plan_broadcast_and_bounded_exchanges(spark):
    import __spark_entry__ as entrymod

    df = entrymod.curation_pipeline(spark, "/root/testdata/sf0.001")
    df.collect()  # see above: collect executes THIS frame's plan
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final
    # the funnel's contract: corpus-wide shuffles stay bounded regardless
    # of input size (curate.py docstring — two corpus exchanges + the
    # model-side exchanges, never one per stage)
    n_shuffles = len(re.findall(r"Exchange hashpartitioning", final))
    assert n_shuffles <= 6, f"curation shuffle count grew: {n_shuffles}"


@pytest.mark.usefixtures("spark")
def test_outlink_graph_final_plan_single_exchange_no_python(spark):
    """The link-extraction pass is the full-corpus scan of the graph
    family: it must be one map-side-combined hash exchange and nothing
    else — no joins, no Python, no second shuffle. AQE toString prints
    the initial plan after the final one, so assertions parse only the
    final section."""
    import __spark_entry__ as entrymod

    df = entrymod.outlink_graph(spark, "/root/testdata/sf0.001")
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in s
    final = s.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Exchange hashpartitioning", final)) == 1
    assert "partial_count" in final  # map-side combine before the shuffle
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "CartesianProduct", "BroadcastNestedLoopJoin", "Python"):
        assert op not in final, op


@pytest.mark.usefixtures("spark")
def test_pagerank_step_final_plan_shapes(spark):
    """One power iteration's scale invariants: the per-destination
    contribution sum is partially aggregated BEFORE its exchange (in-degree
    skew absorbed map-side), the dangling scalar travels as a 1-row
    IdentityBroadcast (never a data-sized cartesian), and no Python
    appears anywhere. Join *strategies* are AQE's size-dependent choice
    (broadcast at test scale, SMJ at corpus scale) so they are not pinned
    — shapes are."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from resume_ocr_spark.operators import linkgraph

    edges = entrymod.outlink_graph(spark, "/root/testdata/sf0.001")
    e = edges.select(F.col("src_domain").alias("src"),
                     F.col("dst_domain").alias("dst"),
                     F.col("weight").cast("double").alias("w"))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    frac = (e.join(out_w, "src")
            .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
            .repartition("src").localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("domain"))
             .union(e.select(F.col("dst").alias("domain")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    danglers = nodes.join(
        e.select(F.col("src").alias("domain")).distinct(),
        "domain", "left_anti").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    step = linkgraph._pagerank_step(nodes, frac, danglers, ranks, n, 0.85)
    step.collect()
    s = step._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in s
    final = s.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "Python" not in final
    assert "partial_sum" in final  # map-side combine on the contrib agg
    # the only nested-loop is the intentional 1-row dangling-mass probe
    bnlj = final.count("BroadcastNestedLoopJoin")
    assert bnlj <= 1, final
    if bnlj:
        assert "IdentityBroadcastMode" in final
