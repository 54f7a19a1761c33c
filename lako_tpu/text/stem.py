"""Stemming + word tokenization used by stem-EM and candidate mining.

The reference relies on NLTK's WordPunctTokenizer + PorterStemmer
(train_reader.py:24-25,56-57); we use the same algorithms, memoized — stemming is
on the hot path of the O(questions × corpus) candidate miner.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

try:
    from nltk.stem.porter import PorterStemmer
    from nltk.tokenize import WordPunctTokenizer

    _STEMMER = PorterStemmer()
    _TOKENIZER = WordPunctTokenizer()
    HAVE_NLTK = True
except Exception:  # pragma: no cover - environment without nltk
    import warnings

    import regex as _re

    HAVE_NLTK = False
    warnings.warn(
        "nltk is unavailable: stem-EM and the ans_attention bonus fall back to "
        "exact-token matching (identity stemmer). Metrics and retriever "
        "distillation targets will differ from the reference's Porter-stemmed "
        "semantics (src/evaluation.py:182-194).",
        RuntimeWarning,
        stacklevel=2,
    )

    class _FallbackTokenizer:
        _rx = _re.compile(r"\w+|[^\w\s]+")

        def tokenize(self, text):
            return self._rx.findall(text)

    _TOKENIZER = _FallbackTokenizer()

    class _IdentityStemmer:
        def stem(self, w):
            return w

    _STEMMER = _IdentityStemmer()


@lru_cache(maxsize=1 << 20)
def porter_stem(word: str) -> str:
    return _STEMMER.stem(word)


def word_tokenize(text: str) -> List[str]:
    return _TOKENIZER.tokenize(text)


def stem_set(text: str) -> set:
    """Set of stems of whitespace tokens (matches the reference's candidate-mining
    ``set(map(stem, sentence.split(" ")))`` at data_process/vqa2_deal.py:102)."""
    return {porter_stem(w) for w in text.split(" ")}
