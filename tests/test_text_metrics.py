"""Metric parity tests.

Expected values for normalize/EM cases are computed against the reference
implementation's semantics (reference src/evaluation.py:138-194) — several were
verified by running the reference functions by hand on these inputs.
"""

import numpy as np
import pytest

from lako_tpu.text import (
    SimpleTokenizer,
    calculate_matches,
    count_inversions,
    ems,
    has_answer,
    includ_ems,
    normalize_answer,
    ranking_stats,
    stem_ems,
)
from lako_tpu.text.normalize import STOP_WORDS


class TestNormalizeAnswer:
    def test_basic(self):
        assert normalize_answer("The Cat.") == "cat"
        assert normalize_answer("An apple!") == "apple"
        assert normalize_answer("  multiple   spaces ") == "multiple spaces"

    def test_punct_before_articles(self):
        # punctuation removed first, so "a-frame" -> "aframe" (no article split)
        assert normalize_answer("a-frame") == "aframe"

    def test_article_inside_word_kept(self):
        assert normalize_answer("theater") == "theater"
        assert normalize_answer("animal") == "animal"

    def test_stopword_removal_is_substring(self):
        # Reference removes stop words as substrings of the running text
        # (src/evaluation.py:140-145): "it" inside "sitting" is removed too once
        # "it" appears as a standalone token. Verified against the reference impl.
        assert normalize_answer("it is sitting", dele_sw=True) == "sting"

    def test_stopword_removal_plain(self):
        assert normalize_answer("riding horse", dele_sw=True) == "riding horse"

    def test_stopwords_contents(self):
        for w in ("yes", "no", "the", "of", "with", "km", "ll"):
            assert w in STOP_WORDS
        assert "horse" not in STOP_WORDS


class TestEM:
    GOLD = {"surfing": 1.0, "surfboarding": 0.6, "wave riding": 0.3}

    def test_exact(self):
        assert ems("Surfing", self.GOLD) == 1.0
        assert ems("surfboarding!", self.GOLD) == 0.6
        assert ems("skiing", self.GOLD) == 0.0

    def test_weighted_max(self):
        # picks the best-valued match, not the first
        gold = {"cat": 0.3, "the cat": 1.0}
        assert ems("cat", gold) == 1.0  # "the cat" normalizes to "cat"

    def test_include(self):
        assert includ_ems("riding", self.GOLD) == 0.3  # substring of "wave riding"
        assert includ_ems("big wave riding today", self.GOLD) == 0.3
        assert includ_ems("ski", self.GOLD) == 0.0

    def test_stem(self):
        # Porter: "surfing"->"surf" on both sides; "surfer" stays "surfer" (no match).
        # Expected values verified against the reference implementation.
        assert stem_ems("they are surfing", self.GOLD) == 1.0
        assert stem_ems("surfer", self.GOLD) == 0.0
        assert stem_ems("rides", self.GOLD) == 0.3  # ride stem in "wave riding"
        assert stem_ems("snowboard", self.GOLD) == 0.0

    def test_stem_prefers_high_value(self):
        gold = {"ride": 0.3, "riding": 1.0}
        assert stem_ems("rider ride", gold) == 1.0


class TestHasAnswer:
    def test_subsequence(self):
        tok = SimpleTokenizer()
        assert has_answer(["polar bear"], "A polar bear on ice.", tok)
        assert not has_answer(["polar bear"], "A bear near a polar station? No.", tok)
        assert has_answer(["café"], "we sat at the Café.", tok)

    def test_calculate_matches(self):
        data = [
            {"answers": ["dog"], "ctxs": [{"text": "a cat"}, {"text": "a dog runs"}]},
            {"answers": ["dog"], "ctxs": [{"text": "dog!"}, {"text": "nothing"}]},
            {"answers": ["dog"], "ctxs": [{"text": "cat"}, {"text": "fish"}]},
        ]
        top_k_hits, scores = calculate_matches(data)
        assert top_k_hits == [1, 2]
        assert scores[0] == [False, True]


class TestRankingMetrics:
    def test_inversions(self):
        assert count_inversions([0, 1, 2, 3]) == 0
        assert count_inversions([3, 2, 1, 0]) == 6
        assert count_inversions([1, 0, 2]) == 1
        # cross-check vs brute force
        rng = np.random.default_rng(1)
        for _ in range(10):
            arr = rng.permutation(20)
            brute = sum(
                1
                for i in range(len(arr))
                for j in range(i + 1, len(arr))
                if arr[i] > arr[j]
            )
            assert count_inversions(arr) == brute

    def test_ranking_stats(self):
        inversions, avg_topk, idx_topk = [], {2: []}, {2: []}
        # gold order is identity; predicted scores reversed for row 1
        scores = np.array([[3.0, 2.0, 1.0, 0.5], [0.5, 1.0, 2.0, 3.0]])
        ranking_stats(scores, inversions, avg_topk, idx_topk)
        assert inversions == [0, 6]
        assert avg_topk[2] == [1.0, 0.0]
        assert idx_topk[2] == [2, 4]


class TestMultiprocessMatches:
    def test_calculate_matches_parallel_equals_serial(self):
        data = [
            {"answers": ["dog"], "ctxs": [{"text": "a cat"}, {"text": "a dog"}]},
            {"answers": ["cat", "dog"], "ctxs": [{"text": "cat!"}, {"text": "x"}]},
            {"answers": ["fish"], "ctxs": [{"text": "cat"}, {"text": "dog"}]},
        ] * 4
        serial = calculate_matches(data, workers_num=1)
        parallel = calculate_matches(data, workers_num=3)
        assert serial == parallel
