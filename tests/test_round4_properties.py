"""Hypothesis property tests for the round-4 operators (pure-Python cores:
BPE encode/train, perceptual-hash primitives). Spark paths are covered by
the contract gate and the module test files; these pin the algorithmic
invariants over arbitrary inputs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from resume_ocr_spark.operators import bpe, imagehash

WORDS = st.text(alphabet="abcdefz019", min_size=0, max_size=24)
CORPORA = st.dictionaries(
    st.text(alphabet="abcde", min_size=1, max_size=8),
    st.integers(1, 50), min_size=0, max_size=20)


class TestBpeProperties:
    @given(WORDS, CORPORA)
    @settings(max_examples=60, deadline=None)
    def test_encode_reconstructs_word(self, word, freqs):
        merges = bpe.learn_merges(freqs, num_merges=30)
        ranks = {p: i for i, p in enumerate(merges)}
        toks = bpe.encode_word(word, ranks)
        assert "".join(toks) == word
        if word:
            assert 1 <= len(toks) <= len(word)
            assert all(toks)  # no empty symbols

    @given(WORDS, CORPORA)
    @settings(max_examples=60, deadline=None)
    def test_one_merge_per_step_equals_per_pass_apply(self, word, freqs):
        """The SQL oracle's one-lowest-rank-leftmost-merge-per-step form
        must equal the engine's all-occurrences-per-pass encode_word for
        every word × trained merge table (the equivalence the
        bpe_token_counts gate rests on)."""
        merges = bpe.learn_merges(freqs, num_merges=30)
        ranks = {p: i for i, p in enumerate(merges)}
        toks = list(word)
        while len(toks) > 1:
            best = None  # (rank, pos)
            for i in range(len(toks) - 1):
                r = ranks.get((toks[i], toks[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                break
            i = best[1]
            toks = toks[:i] + [toks[i] + toks[i + 1]] + toks[i + 2:]
        assert toks == bpe.encode_word(word, ranks) or word == ""

    @given(CORPORA)
    @settings(max_examples=40, deadline=None)
    def test_training_is_deterministic_and_merges_are_useful(self, freqs):
        a = bpe.learn_merges(freqs, num_merges=25)
        b = bpe.learn_merges(dict(reversed(list(freqs.items()))),
                             num_merges=25)
        assert a == b  # iteration order of the freq dict never matters
        assert len(a) == len(set(a))  # a pair is never learned twice
        # each merge's parts are buildable from chars + earlier merges
        known = {c for w in freqs for c in w}
        for x, y in a:
            assert x in known and y in known
            known.add(x + y)

    @given(st.text(alphabet="aàb 漢.x-", max_size=40))
    @settings(max_examples=60, deadline=None)
    def test_norm_words_only_emits_ascii_alnum_runs(self, text):
        for w in bpe.norm_words(text):
            assert w and all(c in "abcdefghijklmnopqrstuvwxyz0123456789"
                             for c in w)


IMAGES = st.integers(0, 2**32 - 1)


class TestImagehashProperties:
    @given(IMAGES, st.integers(8, 40), st.integers(8, 40))
    @settings(max_examples=40, deadline=None)
    def test_area_resize_preserves_weighted_mean(self, seed, h, w):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        out = imagehash._area_resize(img, 8, 8)
        re = np.minimum((np.arange(1, 9) * h) // 8, h)
        ce = np.minimum((np.arange(1, 9) * w) // 8, w)
        areas = np.outer(np.diff(np.concatenate(([0], re))),
                         np.diff(np.concatenate(([0], ce))))
        assert np.isclose((out * areas).sum() / areas.sum(), img.mean())
        assert out.shape == (8, 8)

    @given(IMAGES)
    @settings(max_examples=30, deadline=None)
    def test_hashes_fit_in_i64_and_are_deterministic(self, seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(52, 104)).astype(np.uint8)
        for fn in (imagehash.phash64, imagehash.dhash64):
            h1, h2 = fn(img), fn(img.copy())
            assert h1 == h2
            assert -(2**63) <= h1 < 2**63

    @given(IMAGES, st.integers(0, 63))
    @settings(max_examples=40, deadline=None)
    def test_single_band_agreement_detects_low_hamming(self, seed, bit):
        """Pigeonhole property the pairing relies on: flipping up to 3 bits
        of a 64-bit hash leaves at least one of the 4 16-bit bands
        untouched."""
        rng = np.random.RandomState(seed)
        h = int(rng.randint(0, 2**63, dtype=np.int64))
        flipped = h ^ (1 << bit)
        bands_equal = sum(
            ((h >> (16 * b)) & 0xFFFF) == ((flipped >> (16 * b)) & 0xFFFF)
            for b in range(4))
        assert bands_equal >= 3
