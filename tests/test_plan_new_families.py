"""Executed-plan pins for the terminal round-5 families — the shuffle
budget each operator's 100 TB story quotes, asserted on the AQE-final
runtime plan so a regression (an accidental extra exchange, a
corpus-sized join downgraded from broadcast) fails CI, not the cluster.

Budgets pinned here (matching the operator docstrings):
- build_postings: exactly ONE Exchange (the (term, doc_id) hash agg).
- winnow_fingerprints: exactly ONE Exchange (the per-doc window
  clustering) — plus the distinct's re-use of it must not add a second
  corpus exchange beyond the distinct agg itself.
- index_bm25: no SortMergeJoin wider than the doc_id sidecar join; the
  1-row stats crossJoin stays a BroadcastNestedLoopJoin.
- multi_phrase_matches: ONE candidate-pivot Exchange beyond the
  postings build.
"""

import re

import pytest
from pyspark.sql import functions as F

from resume_ocr_spark.operators import postings, textstats

SF = "/root/testdata/sf0.001"


def _final_plan(df):
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # the AQE toString prints the Final Plan followed by the Initial
    # Plan; count operators in the FINAL section only
    return plan.split("== Initial Plan ==")[0]


def _n_exchanges(plan):
    # count shuffle exchanges only (broadcast exchanges are the cheap
    # dimension path); AQE prints "Exchange hashpartitioning"/"rangepartitioning"
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_postings_build_single_exchange(docs):
    plan = _final_plan(postings.build_postings(docs))
    assert _n_exchanges(plan) == 1, plan[:2000]
    assert "CartesianProduct" not in plan


def test_winnow_exchange_budget(docs):
    plan = _final_plan(textstats.winnow_fingerprints(docs))
    # window clustering + the distinct agg re-shuffle: ≤ 2, never more
    assert _n_exchanges(plan) <= 2, plan[:2000]
    assert "CartesianProduct" not in plan


def test_index_bm25_join_strategies(docs):
    post = postings.build_postings(docs)
    dl = postings.doc_lengths(docs)
    plan = _final_plan(postings.index_bm25(
        post, dl, "spark query window merge zeppelin"))
    # the 1-row stats fold is the ONLY nested-loop; every other join is
    # broadcast or the doc_id-keyed sidecar join
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    smj = re.findall(
        r"SortMergeJoin \[(\w+)#\d+L?\], \[(\w+)#\d+L?\]", plan)
    for lk, rk in smj:
        assert (lk, rk) == ("doc_id", "doc_id"), smj


def test_multi_phrase_exchange_budget(docs):
    post = postings.build_postings(
        docs, terms=["big", "data", "merge", "window", "fast", "query"])
    plan = _final_plan(postings.multi_phrase_matches(
        post, ["big data merge", "window fast query"]))
    # postings build agg + candidate pivot agg — never a per-phrase pass
    assert _n_exchanges(plan) <= 2, plan[:2000]
    assert "CartesianProduct" not in plan
