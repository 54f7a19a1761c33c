"""lako_tpu — a TPU-native (JAX / XLA / pjit / Pallas) knowledge-based VQA framework.

Provides the full capability surface of hackerchenzhuo/LaKo (late knowledge-to-text
injection for OK-VQA / VQA2.0): a Fusion-in-Decoder T5 reader, a BERT bi-encoder
retriever distilled from decoder cross-attention scores, BM25 + dense MIPS retrieval
over a verbalized knowledge-graph corpus, and the complete preprocessing, training,
evaluation, and pipeline-orchestration stack — redesigned SPMD-first for TPU.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name == "LakoService":
        from lako_tpu.serve import LakoService

        return LakoService
    if name == "FiDT5":
        from lako_tpu.models.t5 import FiDT5

        return FiDT5
    if name == "Retriever":
        from lako_tpu.models.retriever import Retriever

        return Retriever
    if name == "DenseIndex":
        from lako_tpu.retrieval.index import DenseIndex

        return DenseIndex
    raise AttributeError(name)
