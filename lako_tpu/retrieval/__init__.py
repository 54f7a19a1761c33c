from lako_tpu.retrieval.bm25 import BM25Okapi, BM25L, BM25Plus
from lako_tpu.retrieval.verbalize import verbalize_triples, triple_to_sentence
from lako_tpu.retrieval.index import DenseIndex
from lako_tpu.retrieval.eval import hit_at_k
from lako_tpu.retrieval.candidates import CandidateMiner

__all__ = [
    "BM25Okapi", "BM25L", "BM25Plus",
    "verbalize_triples", "triple_to_sentence",
    "DenseIndex", "hit_at_k", "CandidateMiner",
]
