"""BPE tokenizer (operators/bpe.py): training determinism, apply semantics,
the distinct-word Spark path vs a pure-Python recompute, and BPE-fed
sequence packing parity."""

import pytest
from pyspark.sql import functions as F

from resume_ocr_spark.operators import bpe


def test_learn_merges_picks_most_frequent_pair_first():
    # 'ab' appears 5x (3 in 'aab' positions + ...), hand-check tiny corpus:
    freqs = {"abab": 3, "abc": 2, "xy": 1}
    merges = bpe.learn_merges(freqs, num_merges=2)
    # pair counts round 1: (a,b): 3*2 + 2 = 8; (b,a): 3; (b,c): 2; (x,y): 1
    assert merges[0] == ("a", "b")
    # round 2 on merged words {ab ab:3, ab c:2, x y:1}:
    # (ab,ab): 3; (ab,c): 2; (x,y): 1
    assert merges[1] == ("ab", "ab")


def test_learn_merges_lexicographic_tiebreak_and_min_count():
    # (a,b) and (c,d) both occur twice -> lexicographic winner first
    merges = bpe.learn_merges({"ab": 2, "cd": 2}, num_merges=10)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("c", "d")
    # nothing left with count >= 2 -> early stop
    assert len(merges) == 2


def test_encode_word_reconstructs_and_respects_ranks():
    merges = [("e", "r"), ("er", "s"), ("t", "h"), ("th", "e")]
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("ers", "theers", "therapist", "x", "zzz"):
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks) == w
    assert bpe.encode_word("ers", ranks) == ["ers"]
    assert bpe.encode_word("theers", ranks) == ["the", "ers"]
    # overlap: leftmost-first within a pass
    assert bpe.encode_word("aaaaa", {("a", "a"): 0, ("aa", "aa"): 1}) \
        == ["aaaa", "a"]


def test_norm_words_matches_dedup_normalization():
    assert bpe.norm_words("Hello, World! 42") == ["hello", "world", "42"]
    assert bpe.norm_words("") == []
    assert bpe.norm_words(None) == []
    assert bpe.norm_words("--- ---") == []


def test_trained_tokens_compress_real_text():
    texts = ["the therapist and the theater the thesis " * 20]
    freqs = {}
    for w in bpe.norm_words(texts[0]):
        freqs[w] = freqs.get(w, 0) + 1
    merges = bpe.learn_merges(freqs, num_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    assert ("t", "h") in ranks or ("h", "e") in ranks
    # frequent words collapse to fewer symbols than their length
    assert len(bpe.encode_word("the", ranks)) == 1


@pytest.mark.usefixtures("spark")
def test_spark_counts_match_python_recompute(spark, small_corpus):
    docs, _ = small_corpus
    rows = [(d["doc_id"], " ".join(
        s["text"] or "" for s in d["spans"] if s["kind"] == "text"))
        for d in docs[:25]]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    merges = bpe.train_bpe(df, num_merges=60, sample_docs=10)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r["doc_id"]: (r["n_words"], r["bpe_tokens"])
           for r in bpe.with_bpe_token_counts(df, merges).collect()}
    assert set(got) == {r[0] for r in rows}
    for doc_id, text in rows:
        words = bpe.norm_words(text)
        expect = sum(len(bpe.encode_word(w, ranks)) for w in words)
        assert got[doc_id] == (len(words), expect), doc_id


@pytest.mark.usefixtures("spark")
def test_empty_and_null_text_total(spark):
    df = spark.createDataFrame(
        [(1, "hello hello world"), (2, ""), (3, None), (4, "!!! ...")],
        "doc_id long, text string")
    merges = [("l", "l"), ("h", "e")]
    got = {r["doc_id"]: (r["n_words"], r["bpe_tokens"])
           for r in bpe.with_bpe_token_counts(df, merges).collect()}
    assert got[2] == (0, 0) and got[3] == (0, 0) and got[4] == (0, 0)
    assert got[1][0] == 3 and got[1][1] > 0


@pytest.mark.usefixtures("spark")
def test_no_merges_counts_characters(spark):
    df = spark.createDataFrame([(1, "abc de")], "doc_id long, text string")
    row = bpe.with_bpe_token_counts(df, []).collect()[0]
    assert (row["n_words"], row["bpe_tokens"]) == (2, 5)


@pytest.mark.usefixtures("spark")
def test_pack_sequences_bpe_parity(spark, small_corpus):
    docs, _ = small_corpus
    rows = [(i, " ".join(
        s["text"] or "" for s in d["spans"] if s["kind"] == "text"))
        for i, d in enumerate(docs[:20])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.train_bpe(df, num_merges=40, sample_docs=10)
    ranks = {p: i for i, p in enumerate(merges)}
    budget, shards = 64, 4
    got = {r["doc_id"]: (r["shard"], r["seq_id"], r["n_tokens"],
                         r["seq_offset"])
           for r in bpe.pack_sequences_bpe(
               df, merges, budget=budget, shards=shards).collect()}
    # python recompute of the per-shard windowed cumsum
    counts = {i: sum(len(bpe.encode_word(w, ranks))
                     for w in bpe.norm_words(t)) for i, t in rows}
    by_shard: dict[int, list[int]] = {}
    for i, _ in rows:
        by_shard.setdefault(i % shards, []).append(i)
    for shard, ids in by_shard.items():
        prev = 0
        for i in sorted(ids):
            assert got[i] == (shard, prev // budget, counts[i],
                              prev % budget), i
            prev += counts[i]


@pytest.mark.usefixtures("spark")
def test_shuffle_join_path_matches_broadcast_path(spark):
    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(12)],
        "doc_id long, text string")
    merges = bpe.train_bpe(df, num_merges=20, sample_docs=12)
    a = sorted(map(tuple, bpe.with_bpe_token_counts(
        df, merges, broadcast_encoded=True).collect()))
    b = sorted(map(tuple, bpe.with_bpe_token_counts(
        df, merges, broadcast_encoded=False).collect()))
    assert a == b


def test_train_bpe_validates_sample():
    with pytest.raises(ValueError):
        bpe.train_bpe(None, sample_docs=0)
    with pytest.raises(ValueError):
        bpe.learn_merges({}, num_merges=-1)
