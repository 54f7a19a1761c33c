"""Synthetic OKVQA-format fixtures matching the reference data schema
(test_reader.py:93-105 / fact_retrieval.py:108-114):
{question, target, answer: {str: score}, img_id, caption, fact: [{sentence, id, score}]}.

The world is closed and deterministic: questions ask about an animal's sound; the
correct fact states it. A tiny model can overfit this, which makes train-loop
smoke tests meaningful.
"""

from __future__ import annotations

import numpy as np

ANIMALS = ["cat", "dog", "cow", "duck", "frog", "bee", "owl", "wolf"]
SOUNDS = ["meow", "woof", "moo", "quack", "croak", "buzz", "hoot", "howl"]


def make_examples(n: int, n_facts: int = 5, seed: int = 0):
    rng = np.random.default_rng(seed)
    examples = []
    for i in range(n):
        a = int(rng.integers(len(ANIMALS)))
        animal, sound = ANIMALS[a], SOUNDS[a]
        facts = []
        gold_pos = int(rng.integers(n_facts))
        for j in range(n_facts):
            if j == gold_pos:
                sent = f"{animal} says {sound}."
                fid = a
            else:
                other = int(rng.integers(len(ANIMALS)))
                sent = f"{ANIMALS[other]} says {SOUNDS[other]}."
                fid = other
            facts.append({"sentence": sent, "id": fid, "score": 1.0 / (j + 1)})
        examples.append({
            "question": f"what sound does the {animal} make?",
            "target": sound,
            "answer": {sound: 1.0},
            "img_id": f"COCO_train2014_{i:012d}",
            "caption": f"a {animal} sitting on the grass.",
            "fact": facts,
        })
    return examples


def corpus_sentences():
    return [f"{a} says {s}." for a, s in zip(ANIMALS, SOUNDS)]


def make_tokenizer(style: str = "t5"):
    from lako_tpu.text.tokenizer import WordVocabTokenizer

    corpus = corpus_sentences() + [
        "question: what sound does the animal make? context: a animal sitting on the grass. fact:",
    ]
    return WordVocabTokenizer.build(corpus, style=style)
