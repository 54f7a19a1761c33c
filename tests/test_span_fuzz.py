"""Fact-span parity fuzz (VERDICT r1 #10).

The collator computes per-fact token spans by construction (concatenated
piece encodings); the reference instead walks SentencePiece token id 5 ('.')
boundaries on the host (src/model.py:180-196). This fuzz trains a Unigram
tokenizer on a synthetic verbalized-KG corpus (the production path for real
data) and checks, over thousands of random fact lists, that a faithful
re-implementation of the reference walk recovers exactly the collate-time
spans — 0 mismatches.

Precondition shared with the reference: '.' must encode as a standalone
terminal token (true for T5's SentencePiece; asserted here for the trained
Unigram, with a bounded skip-rate for fuzz sentences that violate it).
"""

import numpy as np
import pytest

from lako_tpu.core.config import ReaderDataConfig
from lako_tpu.data.collator import ReaderCollator
from lako_tpu.data.dataset import ReaderDataset
from lako_tpu.retrieval.verbalize import triple_to_sentence

ENTITIES = ["cat", "dog", "tiger", "piano", "apple", "river", "cloud",
            "hammer", "violin", "mountain", "pizza", "lantern", "turtle",
            "engine", "forest", "helmet", "candle", "rocket", "garden",
            "mirror"]
RELATIONS = {"IsA": "is a kind of", "UsedFor": "is used for",
             "AtLocation": "is found at", "HasA": "has a",
             "CapableOf": "is capable of", "PartOf": "is part of"}
TEMPLATES = dict(RELATIONS)


def _kg_sentence(rng) -> str:
    s = ENTITIES[rng.integers(len(ENTITIES))]
    r = list(RELATIONS)[rng.integers(len(RELATIONS))]
    o = ENTITIES[rng.integers(len(ENTITIES))]
    return triple_to_sentence((s, r, o), TEMPLATES) + "."


def reference_period_walk(fact_ids, period_id, prefix_len, n_context, pad_id):
    """Faithful re-implementation of get_crossattention_scores' segmentation
    (src/model.py:180-196): walk '.'-terminated segments from the prefix."""
    fact_list = [int(t) for t in fact_ids]
    spans = []
    start = prefix_len
    for _ in range(n_context):
        try:
            end = fact_list.index(period_id, start) + 1
        except ValueError:
            break
        spans.append((start, end))
        start = end
    if len(spans) < n_context and fact_list[-1] != pad_id:
        end = len(fact_list)
        if end > start:
            spans.append((start, end))
    return spans


@pytest.mark.slow
def test_fact_span_walk_parity_fuzz():
    rng = np.random.default_rng(0)
    corpus = [_kg_sentence(rng) for _ in range(3000)]
    corpus += ["question: what is this? context: something. fact:"] * 50

    from lako_tpu.text.tokenizer import HFTokenizer

    tok = HFTokenizer.train_unigram(corpus, vocab_size=400)
    # word-final '.' must encode as its own token (T5 SentencePiece: "dog." →
    # "▁dog", "." — id 5); standalone "." also carries a metaspace marker, so
    # probe through a word-final occurrence
    period_id = tok.encode("cat.", add_special=False)[-1]
    assert tok.encode("dog.", add_special=False)[-1] == period_id, \
        "'.' must be a standalone word-final token (T5 vocab id 5)"

    cfg = ReaderDataConfig(n_context=4, text_maxlength=64, answer_maxlength=4,
                           stream=2)
    collator = ReaderCollator(cfg, tok)
    prefix_len = len(tok.encode(cfg.fact_prefix, add_special=False))

    n_lists = 2000
    checked = mismatches = skipped = 0
    batch_size = 50
    for b in range(n_lists // batch_size):
        examples = []
        for i in range(batch_size):
            n_facts = int(rng.integers(1, cfg.n_context + 1))
            examples.append({
                "question": "what is this?",
                "caption": "an object on a table.",
                "answer": ["thing"],
                "target": "thing",
                "fact": [{"sentence": _kg_sentence(rng), "score": 1.0}
                         for _ in range(n_facts)],
            })
        ds = ReaderDataset(examples, cfg, seed=b)
        batch = collator([ds[i] for i in range(batch_size)])
        for i in range(batch_size):
            sents = ds[i]["fact_sentences"]
            encs = [tok.encode(s, add_special=False) for s in sents]
            # the walk's precondition: each fact ends with the standalone '.'
            # and the whole fact list fits in the window (the reference's
            # truncated-final-fact branch is covered by the tail span rule)
            if any(e[-1] != period_id or period_id in e[:-1] for e in encs):
                skipped += 1
                continue
            walk = reference_period_walk(batch.passage_ids[i, 1], period_id,
                                         prefix_len, cfg.n_context, tok.pad_id)
            ours = [tuple(sp) for sp in batch.fact_spans[i] if sp[1] > sp[0]]
            # compare the overlap: every collate-time span the walk can see
            # must match exactly
            for j, span in enumerate(ours):
                if j < len(walk):
                    checked += 1
                    if tuple(walk[j]) != span:
                        mismatches += 1
    assert mismatches == 0, f"{mismatches} span mismatches of {checked}"
    assert checked >= 3000, checked
    assert skipped <= 0.05 * n_lists, f"too many precondition skips: {skipped}"
