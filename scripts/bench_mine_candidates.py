"""Candidate mining at reference scale (VERDICT r3 #4).

Synthesizes a 300,600-triple KG — the reference corpus size
(/root/reference/generate_fact_embeddings.py:34,100) — with subjects/objects
drawn from the EMPIRICAL word distribution of the real 9,009-question OKVQA
cache + COCO caption predictions (so inverted-index postings lists have
realistic skew: common content words index thousands of triples), then:

1. mines candidates for all 9,009 real questions through
   retrieval/candidates.py's inverted stem index + BM25 top-k
   (lako mine-candidates' engine), measuring build + mining wall-clock;
2. runs the REFERENCE algorithm — the O(|KG|) full scan per question
   (/root/reference/data_process/vqa2_deal.py:112-135) — on a sample of the
   same questions, asserting candidate-set equality and measuring its
   per-question cost, from which the full-9,009-question cost is priced.

Output: artifacts/mine_candidates_300k.json — replaces the unmeasured
"orders of magnitude less work" claim with numbers.

Run: python scripts/bench_mine_candidates.py [--kg-size 300600] [--sample 12]
"""

import argparse
import json
import sys
import time
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REFERENCE = Path("/root/reference/data_process/data")

RELATIONS = {
    # ConceptNet-style templates in the reference's relation2template role
    "IsA": "is a",
    "UsedFor": "is used for",
    "CapableOf": "can",
    "HasA": "has",
    "PartOf": "is part of",
    "AtLocation": "is at",
    "Desires": "desires",
    "MadeOf": "is made of",
    # comparatives exercise the #f/#r verbalization path (vqa2_deal.py:55-60)
    "tall#f": None,
    "heavy#r": None,
}


def build_word_pool():
    """Empirical content-word distribution from the real OKVQA questions,
    answers, and caption predictions."""
    from lako_tpu.text.normalize import STOP_WORDS
    from lako_tpu.text.stem import porter_stem

    texts = []
    rows = json.loads((REFERENCE / "okvqa/cache/3/train.json").read_text())
    for r in rows:
        texts.append(r["sent"])
        texts.extend(r["label"].keys())
    for f in ("pred.coco_caption.val.json", "pred.coco_caption.test.json"):
        for c in json.loads((REFERENCE / "caption" / f).read_text()):
            texts.append(c["caption"])
    counts = Counter()
    for t in texts:
        for w in t.lower().replace("?", "").replace(".", "") \
                          .replace(",", "").split():
            s = porter_stem(w)
            if s and s not in STOP_WORDS and s.isalpha():
                counts[s] += 1
    words, weights = zip(*counts.most_common())
    return rows, list(words), list(weights)


def synthesize_kg(words, weights, n, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    p = np.asarray(weights, dtype=float)
    p /= p.sum()
    rel_names = list(RELATIONS)
    subj = rng.choice(len(words), size=n, p=p)
    obj = rng.choice(len(words), size=n, p=p)
    rel = rng.integers(len(rel_names), size=n)
    return [(words[subj[i]], rel_names[rel[i]], words[obj[i]])
            for i in range(n)]


def reference_scan(four_tuple, word_set):
    """The reference's candidate collection: walk the WHOLE KG, keep triples
    whose stemmed subject+object words intersect the question word set
    (vqa2_deal.py:112-116, ``fact[sentence] = i`` last-id-wins dict)."""
    fact = {}
    for i, (s, _, o, sent) in enumerate(four_tuple):
        if word_set & set((s + " " + o).split(" ")):
            fact[sent] = i
    return fact


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kg-size", type=int, default=300_600)
    ap.add_argument("--questions", type=int, default=-1,
                    help="-1 = all 9,009 cache questions")
    ap.add_argument("--sample", type=int, default=12,
                    help="questions for the reference-scan equality check")
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--out", default="artifacts/mine_candidates_300k.json")
    args = ap.parse_args()

    from lako_tpu.retrieval.candidates import (CandidateMiner,
                                               _question_word_set,
                                               build_caption_sentence)
    from lako_tpu.retrieval.verbalize import verbalize_triples

    rows, words, weights = build_word_pool()
    print(f"word pool: {len(words)} stems from {len(rows)} questions",
          flush=True)

    t0 = time.time()
    triples = synthesize_kg(words, weights, args.kg_size)
    templates = {k: v for k, v in RELATIONS.items() if v}
    four_tuple = verbalize_triples(triples, templates)
    t_kg = time.time() - t0
    print(f"KG: {len(four_tuple)} verbalized triples in {t_kg:.1f}s", flush=True)

    # captions round-robin from the real caption predictions (the train
    # split's caption dict is absent from the reference mount)
    caps = []
    for f in ("pred.coco_caption.val.json", "pred.coco_caption.test.json"):
        caps.extend(c["caption"] for c in
                    json.loads((REFERENCE / "caption" / f).read_text()))
    n_q = len(rows) if args.questions < 0 else min(args.questions, len(rows))
    questions = []
    for i, r in enumerate(rows[:n_q]):
        caption = build_caption_sentence([caps[(5 * i + j) % len(caps)]
                                          for j in range(5)])
        questions.append((r["sent"], caption))

    # ---- inverted-index miner over ALL questions ---------------------------
    t0 = time.time()
    miner = CandidateMiner(four_tuple)
    t_build = time.time() - t0
    print(f"inverted index build: {t_build:.1f}s", flush=True)

    t0 = time.time()
    n_cand_total = 0
    for i, (q, cap) in enumerate(questions):
        facts = miner.top_k(q, cap, k=args.k)
        n_cand_total += len(facts)
        if i % 500 == 0:
            dt = time.time() - t0
            print(f"  mined {i}/{len(questions)} ({dt:.1f}s)", flush=True)
    t_mine = time.time() - t0
    per_q_ms = 1e3 * t_mine / len(questions)
    print(f"miner: {len(questions)} questions in {t_mine:.1f}s "
          f"({per_q_ms:.1f} ms/q)", flush=True)

    # ---- reference O(|KG|) scan on a sample + equality ---------------------
    sample = questions[:: max(1, len(questions) // args.sample)][: args.sample]
    t_scan, equal = 0.0, True
    checked = 0
    topk_equal = True
    t_lookup = 0.0
    for q, cap in sample:
        ws = _question_word_set(q, cap)
        t0 = time.time()
        ref_fact = reference_scan(four_tuple, ws)
        t_scan += time.time() - t0
        t0 = time.time()
        mine_ids = miner.candidate_ids(ws)
        t_lookup += time.time() - t0
        # same dedup as the miner: sentence -> last id
        mine_fact = {four_tuple[i][3]: i for i in mine_ids}
        checked += 1
        if mine_fact != ref_fact:
            equal = False
            print(f"MISMATCH for question: {q!r}", flush=True)
    ref_per_q_scan_ms = 1e3 * t_scan / max(1, len(sample))
    lookup_per_q_ms = 1e3 * t_lookup / max(1, len(sample))
    # the BM25 phase is identical work in both pipelines (same candidate
    # sets), so the end-to-end reference cost per question is priced as
    # (measured scan) + (measured miner total − measured postings lookup),
    # conservatively approximated by scan + miner total.
    est_ref_total_s = (ref_per_q_scan_ms / 1e3) * len(questions) + t_mine

    out = {
        "kg_size": len(four_tuple),
        "questions_mined": len(questions),
        "k": args.k,
        "miner": {
            "index_build_s": round(t_build, 2),
            "total_s": round(t_mine, 1),
            "per_question_ms": round(per_q_ms, 2),
            "candidate_lookup_per_question_ms": round(lookup_per_q_ms, 2),
            "mean_topk_returned": round(n_cand_total / len(questions), 1),
        },
        "reference_scan": {
            "sampled_questions": len(sample),
            "per_question_scan_ms": round(ref_per_q_scan_ms, 1),
            "estimated_total_s_at_9009": round(est_ref_total_s, 1),
            "candidate_sets_equal": equal,
            "candidates_checked": checked,
        },
        # candidate-collection phase only: full-KG scan vs postings lookup
        # (the BM25 phase is identical work in both pipelines)
        "candidate_phase_speedup": round(
            ref_per_q_scan_ms / max(lookup_per_q_ms, 1e-9), 1),
        "end_to_end_speedup_est": round(
            est_ref_total_s / max(t_mine + t_build, 1e-9), 1),
    }
    print(json.dumps(out, indent=1))
    Path(args.out).parent.mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
