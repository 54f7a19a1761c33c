"""Data loading and host-sharded batching.

``load_reader_data`` mirrors reference src/data.py:151-175 (JSON/JSONL, modulo
sharding by rank, default fact scores) — but here the sharding is actually used:
each JAX process loads its ``k % process_count == process_index`` slice
(completing what the reference wired but never called, SURVEY.md §2.7).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Iterator, List, Optional

import numpy as np


def load_reader_data(
    data_path: str,
    global_rank: int = -1,
    world_size: int = -1,
    maxload: int = -1,
) -> List[dict]:
    path = Path(data_path)
    if path.suffix == ".jsonl":
        rows = [json.loads(line) for line in path.read_text().splitlines() if line]
    else:
        rows = json.loads(path.read_text())
    examples = []
    for k, example in enumerate(rows):
        if maxload > 0 and len(examples) >= maxload:
            break
        if global_rank > -1 and k % world_size != global_rank:
            continue
        if "id" not in example:
            example["id"] = k
        for c in example.get("fact", []):
            if "score" not in c:
                # parity quirk: reference assigns 1/(k+1) by *example* index
                # (src/data.py:167-169)
                c["score"] = 1.0 / (k + 1)
        examples.append(example)
    return examples


def batch_iterator(
    dataset,
    batch_size: int,
    collate: Callable,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    pad_final: bool = True,
    prefetch: int = 0,
    num_batches: Optional[int] = None,
) -> Iterator:
    """Yield collated fixed-shape batches.

    Train: shuffle + drop_last (reference RandomSampler path, train_reader.py:40-48).
    Eval: sequential; the final partial batch is padded to full size with
    ``valid=False`` rows so the jitted step never recompiles.
    prefetch > 0 runs collation on a background thread with a bounded queue, so
    host tokenization overlaps device compute (the role of the reference's
    DataLoader num_workers, train_reader.py:46).

    ``num_batches`` forces EXACTLY that many batches, truncating extra data
    or emitting all-``valid=False`` padding batches past the end. Multi-host
    SPMD needs this: every process must join every compiled collective call,
    so per-process shard-size differences must not change the batch count.
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    def produce() -> Iterator:
        produced = 0
        for start in range(0, n, batch_size):
            if num_batches is not None and produced >= num_batches:
                return
            idx = order[start : start + batch_size]
            if len(idx) < batch_size:
                if drop_last:
                    break
                if not pad_final:
                    yield collate([dataset[int(i)] for i in idx])
                    produced += 1
                    continue
            yield collate([dataset[int(i)] for i in idx], pad_to=batch_size)
            produced += 1
        while num_batches is not None and produced < num_batches:
            yield collate([], pad_to=batch_size)   # all rows valid=False
            produced += 1

    if prefetch <= 0:
        yield from produce()
        return

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()
    err: list = []

    def worker():
        try:
            for batch in produce():
                q.put(batch)
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item
