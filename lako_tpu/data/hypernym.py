"""S3VQA-style hypernym→hyponym question rewriting dataset.

Reference: data_process/data/okvqa.py:26-303 — a side experiment where a
question's hypernym span is located, detected hyponyms are encoded as
candidates, and a rewritten question substitutes the winning hyponym. This
implementation is tokenizer-agnostic (works with our BERT-style tokenizers) and
produces fixed-shape numpy batches.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np


def find_sub_list(sub: Sequence[int], seq: Sequence[int]) -> Optional[Tuple[int, int]]:
    """First occurrence of ``sub`` in ``seq`` as inclusive (start, end) indices."""
    n = len(sub)
    if n == 0:
        return None
    for i, tok in enumerate(seq):
        if tok == sub[0] and list(seq[i : i + n]) == list(sub):
            return i, i + n - 1
    return None


def substitute_hypernym(question: str, hypernym: str, hyponym: str) -> str:
    """Case-insensitive replacement of the hypernym span with the hyponym,
    preserving the reference's edge-space handling (okvqa.py:108-115)."""
    hypo = hyponym
    if hypernym and hypernym[0] == " ":
        hypo = " " + hyponym
    if hypernym and hypernym[-1] == " ":
        hypo = hyponym + " "
    return re.sub(re.escape(hypernym), hypo, question, flags=re.IGNORECASE)


@dataclass
class HypernymConfig:
    max_question_len: int = 32
    max_hypernym_len: int = 8
    max_hyponym_len: int = 8
    max_hyponyms: int = 32
    default_hypo_score: float = 0.5


class HypernymDataset:
    """Rows: {question, hypernym, hyponym, detections: [str], hypo_scores?}.
    Only rows whose gold hyponym is among the detections are kept (reference
    okvqa.py:79)."""

    def __init__(self, rows: Sequence[dict], tokenizer, cfg: HypernymConfig = None):
        self.cfg = cfg or HypernymConfig()
        self.tokenizer = tokenizer
        self.data: List[dict] = []
        for row in rows:
            ex = self._build(row)
            if ex is not None:
                self.data.append(ex)

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, i: int) -> dict:
        return self.data[i]

    def _encode(self, text: str, max_len: int, add_special: bool) -> List[int]:
        ids = self.tokenizer.encode(text, add_special=add_special)[:max_len]
        return ids

    def _build(self, row: dict) -> Optional[dict]:
        cfg = self.cfg
        if row["hyponym"] not in row["detections"]:
            return None
        q_ids = self._encode(row["question"], cfg.max_question_len, True)
        hyper_ids = self._encode(row["hypernym"], cfg.max_hypernym_len, False)
        span = find_sub_list(hyper_ids, q_ids)
        if span is None:
            return None

        question_ids = np.full(cfg.max_question_len, self.tokenizer.pad_id, np.int32)
        question_ids[: len(q_ids)] = q_ids

        hypo_ids = np.full((cfg.max_hyponyms, cfg.max_hyponym_len),
                           self.tokenizer.pad_id, np.int32)
        hypo_mask = np.zeros(cfg.max_hyponyms, bool)
        scores = row.get("hypo_scores") or {}
        hypo_scores = np.zeros(cfg.max_hyponyms, np.float32)
        label = -1
        for j, det in enumerate(row["detections"][: cfg.max_hyponyms]):
            ids = self._encode(det, cfg.max_hyponym_len, False)
            hypo_ids[j, : len(ids)] = ids
            hypo_mask[j] = True
            hypo_scores[j] = float(scores.get(det, cfg.default_hypo_score))
            if det == row["hyponym"]:
                label = j
        if label < 0:
            return None

        rewritten = substitute_hypernym(row["question"], row["hypernym"],
                                        row["hyponym"])
        return {
            "question_ids": question_ids,
            "hypernym_span": np.asarray(span, np.int32),
            "hyponym_ids": hypo_ids,
            "hyponym_mask": hypo_mask,
            "hyponym_scores": hypo_scores,
            "label": np.int32(label),
            "rewritten_question": rewritten,
        }

    def batch(self, indices: Sequence[int]) -> dict:
        items = [self.data[i] for i in indices]
        return {
            k: np.stack([it[k] for it in items])
            for k in ("question_ids", "hypernym_span", "hyponym_ids",
                      "hyponym_mask", "hyponym_scores", "label")
        }
