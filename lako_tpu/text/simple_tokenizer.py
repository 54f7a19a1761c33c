"""DPR-style regex tokenizer used by retrieval hit@k evaluation.

Semantics match reference src/evaluation.py:31-51 (alpha-numeric runs or single
non-whitespace chars, unicode-aware).
"""

from __future__ import annotations

import regex


class SimpleTokenizer:
    ALPHA_NUM = r"[\p{L}\p{N}\p{M}]+"
    NON_WS = r"[^\p{Z}\p{C}]"

    def __init__(self):
        self._regexp = regex.compile(
            f"({self.ALPHA_NUM})|({self.NON_WS})",
            flags=regex.IGNORECASE + regex.UNICODE + regex.MULTILINE,
        )

    def tokenize(self, text: str, uncased: bool = False):
        matches = self._regexp.finditer(text)
        if uncased:
            return [m.group().lower() for m in matches]
        return [m.group() for m in matches]
