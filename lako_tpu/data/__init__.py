from lako_tpu.data.dataset import ReaderDataset, format_passages
from lako_tpu.data.collator import ReaderBatch, ReaderCollator, RetrieverBatch, RetrieverCollator, TextCollator
from lako_tpu.data.loader import load_reader_data, batch_iterator

__all__ = [
    "ReaderDataset",
    "format_passages",
    "ReaderBatch",
    "ReaderCollator",
    "RetrieverBatch",
    "RetrieverCollator",
    "TextCollator",
    "load_reader_data",
    "batch_iterator",
]
