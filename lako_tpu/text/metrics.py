"""Reader and retriever evaluation metrics.

Reader metrics (EM / include-EM / stem-EM) follow reference src/evaluation.py:166-194;
ground truths are ``{answer_string: soft_score}`` dicts, so each metric returns the
best *weighted* match, not a boolean. Retrieval-document matching follows the DPR
code path (src/evaluation.py:59-125); retriever ranking metrics follow
src/evaluation.py:200-229.
"""

from __future__ import annotations

from concurrent.futures import ProcessPoolExecutor
from typing import Dict, Iterable, List, Mapping, Sequence

import numpy as np

from lako_tpu.text.normalize import normalize_answer
from lako_tpu.text.simple_tokenizer import SimpleTokenizer
from lako_tpu.text.stem import word_tokenize, porter_stem

# ---------------------------------------------------------------------------
# Reader metrics
# ---------------------------------------------------------------------------


def exact_match_score(prediction: str, ground_truth: str, value: float) -> float:
    return (normalize_answer(prediction) == normalize_answer(ground_truth)) * value


def includ_match_score(prediction: str, ground_truth: str, value: float) -> float:
    p = normalize_answer(prediction)
    g = normalize_answer(ground_truth)
    return ((p in g) or (g in p)) * value


def ems(prediction: str, ground_truths: Mapping[str, float]) -> float:
    return max(exact_match_score(prediction, k, v) for k, v in ground_truths.items())


def includ_ems(prediction: str, ground_truths: Mapping[str, float]) -> float:
    return max(includ_match_score(prediction, k, v) for k, v in ground_truths.items())


def stem_ems(
    prediction: str,
    ground_truths: Mapping[str, float],
    dele_sw: bool = False,
) -> float:
    """Porter-stemmed overlap EM: score of the highest-valued ground truth sharing
    any stem with the prediction (reference src/evaluation.py:182-194)."""
    ans_tokens = word_tokenize(normalize_answer(prediction, dele_sw))
    stem_ans = set(porter_stem(t) for t in ans_tokens)
    ordered = sorted(ground_truths.items(), key=lambda x: x[1], reverse=True)
    for ground_truth, value in ordered:
        gt_tokens = word_tokenize(normalize_answer(ground_truth))
        if any(porter_stem(t) in stem_ans for t in gt_tokens):
            return value
    return 0.0


# ---------------------------------------------------------------------------
# Retrieval document matching (DPR-style)
# ---------------------------------------------------------------------------

import unicodedata


def _nfd(text: str) -> str:
    return unicodedata.normalize("NFD", text)


def has_answer(answers: Iterable[str], text: str, tokenizer: SimpleTokenizer) -> bool:
    """True if any answer appears as a token subsequence of the document."""
    text_toks = tokenizer.tokenize(_nfd(text), uncased=True)
    for answer in answers:
        ans_toks = tokenizer.tokenize(_nfd(answer), uncased=True)
        n = len(ans_toks)
        for i in range(0, len(text_toks) - n + 1):
            if ans_toks == text_toks[i : i + n]:
                return True
    return False


def _check_answer(example) -> List[bool]:
    tokenizer = SimpleTokenizer()
    answers = example["answers"]
    hits = []
    for doc in example["ctxs"]:
        text = doc["text"]
        hits.append(False if text is None else has_answer(answers, text, tokenizer))
    return hits


def calculate_matches(data: List[dict], workers_num: int = 1):
    """Per-question doc hits + cumulative top-k hit counts.

    Returns ``(top_k_hits, questions_doc_hits)`` like the reference's QAMatchStats
    (src/evaluation.py:59-91).
    """
    if workers_num > 1:
        with ProcessPoolExecutor(max_workers=workers_num) as pool:
            scores = list(pool.map(_check_answer, data))
    else:
        scores = [_check_answer(ex) for ex in data]

    n_docs = len(data[0]["ctxs"])
    top_k_hits = [0] * n_docs
    for question_hits in scores:
        best_hit = next((i for i, x in enumerate(question_hits) if x), None)
        if best_hit is not None:
            top_k_hits[best_hit:] = [v + 1 for v in top_k_hits[best_hit:]]
    return top_k_hits, scores


# ---------------------------------------------------------------------------
# Retriever ranking metrics
# ---------------------------------------------------------------------------


def count_inversions(arr: Sequence[int]) -> int:
    """Number of pairs out of order. O(n log n) merge-count (the reference's O(n²)
    double loop at src/evaluation.py:207-214 is a bottleneck at n=500)."""
    a = list(arr)

    def _merge_count(lo, hi):
        if hi - lo <= 1:
            return 0
        mid = (lo + hi) // 2
        inv = _merge_count(lo, mid) + _merge_count(mid, hi)
        merged = []
        i, j = lo, mid
        while i < mid and j < hi:
            if a[i] <= a[j]:
                merged.append(a[i]); i += 1
            else:
                inv += mid - i
                merged.append(a[j]); j += 1
        merged.extend(a[i:mid]); merged.extend(a[j:hi])
        a[lo:hi] = merged
        return inv

    return _merge_count(0, len(a))


def ranking_stats(
    scores: np.ndarray,
    inversions: list,
    avg_topk: Dict[int, list],
    idx_topk: Dict[int, list],
) -> None:
    """Accumulate inversion / top-k-overlap stats for a batch of predicted scores
    against gold rank order (reference eval_batch/score, src/evaluation.py:200-229).

    ``scores[i]`` are predicted scores for passages already sorted by gold score
    descending, so ``argsort(-scores)`` maps predicted rank → gold rank.
    """
    for s in np.asarray(scores):
        x = np.argsort(-s)
        inversions.append(count_inversions(x))
        for k in avg_topk:
            avg_topk[k].append((x[:k] < k).mean())
        for k in idx_topk:
            below_k = x < k
            idx_topk[k].append(len(x) - int(np.argmax(below_k[::-1])))
