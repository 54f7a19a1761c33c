"""ctypes bindings for the native (C++) host engines.

``NativeIndex`` mirrors :class:`DenseIndex`'s search/rerank API on the host CPU —
the faiss-cpu role of the reference (src/index.py) — for accelerator-less
environments. Builds on demand with ``make -C native`` (g++, no external deps).

Measured honestly (LaKo-scale corpus, 300,600×256, 64 queries, top-500): a
BLAS-backed ``numpy`` matmul + argpartition is ~15× faster than this scalar
scan for BATCH queries. NativeIndex's niche is streaming selection with O(k)
extra memory (numpy materializes the (Q, N) score matrix) and zero-BLAS
deployments; on-device :class:`DenseIndex` is the production path.

``bm25_topn_native`` is the candidate-mining hot loop (reference
vqa2_deal.py:124-135): measured 3.3× over the Python postings implementation
at 3,000 candidate docs / query.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "liblako_native.so"
_lib = None


def build_native(force: bool = False) -> Path:
    """Compile liblako_native.so (idempotent)."""
    if force or not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    build_native()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.lako_mips_topk.restype = ctypes.c_int
    lib.lako_mips_topk.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.lako_mips_rerank.restype = ctypes.c_int
    lib.lako_mips_rerank.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.lako_bm25_topn.restype = ctypes.c_longlong
    lib.lako_bm25_topn.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    _lib = lib
    return lib


def bm25_topn_native(
    docs_tokens: "list[list[int]]",
    query_tokens: "list[int]",
    n: int,
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
) -> np.ndarray:
    """BM25Okapi top-n doc indices via the C++ engine (formula-identical to
    lako_tpu.retrieval.bm25.BM25Okapi; the candidate-mining hot loop,
    reference vqa2_deal.py:124-135)."""
    lib = _load()
    offsets = np.zeros(len(docs_tokens) + 1, dtype=np.int64)
    for i, d in enumerate(docs_tokens):
        offsets[i + 1] = offsets[i] + len(d)
    flat = np.fromiter((t for d in docs_tokens for t in d), dtype=np.int64,
                       count=int(offsets[-1]))
    q = np.asarray(query_tokens, dtype=np.int64)
    out = np.empty(min(n, len(docs_tokens)), dtype=np.int64)
    wrote = lib.lako_bm25_topn(
        _iptr(flat), _iptr(offsets), len(docs_tokens),
        _iptr(q), len(q), k1, b, epsilon, _iptr(out), len(out),
    )
    if wrote < 0:
        raise RuntimeError("lako_bm25_topn failed")
    return out[:wrote]


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class _IdRowMixin:
    """id → embedding-row inversion shared by the host index classes.

    search() maps rows through ``self.ids`` on the way out, so rerank() must
    invert that mapping on the way in; indexing rows with raw ids is only
    correct when ids are exactly positional."""

    _id_to_row = None
    _ids_positional = None

    def _rows_for_ids(self, candidate_ids: np.ndarray) -> np.ndarray:
        if self._ids_positional is None:
            self._ids_positional = bool(np.array_equal(
                self.ids, np.arange(self.n, dtype=self.ids.dtype)))
        cand = np.asarray(candidate_ids, dtype=np.int64)
        if self._ids_positional:
            return cand
        if self._id_to_row is None:
            self._id_to_row = {int(i): r for r, i in enumerate(self.ids)}
        flat = cand.reshape(-1)
        try:
            rows = np.fromiter((self._id_to_row[int(i)] for i in flat),
                               dtype=np.int64, count=flat.size)
        except KeyError as e:
            raise KeyError(f"candidate id {e} not present in index ids") from None
        return rows.reshape(cand.shape)


class HostIndex(_IdRowMixin):
    """Best-of-host exact MIPS: chunked BLAS matmul + running top-k merge.

    Memory stays O(Q × (chunk + k)) instead of numpy's naive O(Q × N) score
    matrix, at full GEMM throughput. This is the recommended host path; the
    pure-C++ :class:`NativeIndex` remains for zero-BLAS deployments.
    """

    def __init__(self, embeddings: np.ndarray, ids: Optional[np.ndarray] = None,
                 chunk_size: int = 65536):
        self._emb = np.ascontiguousarray(embeddings, dtype=np.float32)
        self.n, self.dim = self._emb.shape
        self.ids = np.arange(self.n, dtype=np.int64) if ids is None \
            else np.asarray(ids, dtype=np.int64)
        self.chunk = chunk_size

    def search(self, queries: np.ndarray, k: int,
               batch_size: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(queries, dtype=np.float32)
        Q = len(q)
        k = min(k, self.n)
        best_scores = np.full((Q, k), -np.inf, dtype=np.float32)
        best_idx = np.zeros((Q, k), dtype=np.int64)
        for s in range(0, self.n, self.chunk):
            block = self._emb[s : s + self.chunk]
            scores = q @ block.T  # BLAS GEMM
            kk = min(k, scores.shape[1])
            part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            part_scores = np.take_along_axis(scores, part, axis=1)
            cat_scores = np.concatenate([best_scores, part_scores], axis=1)
            cat_idx = np.concatenate([best_idx, part + s], axis=1)
            keep = np.argpartition(-cat_scores, k - 1, axis=1)[:, :k]
            best_scores = np.take_along_axis(cat_scores, keep, axis=1)
            best_idx = np.take_along_axis(cat_idx, keep, axis=1)
        order = np.argsort(-best_scores, axis=1)
        best_scores = np.take_along_axis(best_scores, order, axis=1)
        best_idx = np.take_along_axis(best_idx, order, axis=1)
        return self.ids[best_idx], best_scores

    def rerank(self, candidate_ids: np.ndarray, queries: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray]:
        cand = np.asarray(candidate_ids, dtype=np.int64)
        q = np.ascontiguousarray(queries, dtype=np.float32)
        gathered = self._emb[self._rows_for_ids(cand)]   # (B, C, d)
        scores = np.einsum("bcd,bd->bc", gathered, q)
        order = np.argsort(-scores, axis=1)
        return (np.take_along_axis(cand, order, axis=1),
                np.take_along_axis(scores, order, axis=1).astype(np.float32))


class NativeIndex(_IdRowMixin):
    """Host-CPU exact MIPS with the DenseIndex search/rerank interface."""

    def __init__(self, embeddings: np.ndarray, ids: Optional[np.ndarray] = None,
                 n_threads: int = 0):
        self._emb = np.ascontiguousarray(embeddings, dtype=np.float32)
        self.n, self.dim = self._emb.shape
        self.ids = np.arange(self.n, dtype=np.int64) if ids is None \
            else np.asarray(ids, dtype=np.int64)
        self.n_threads = n_threads
        _load()

    def search(self, queries: np.ndarray, k: int,
               batch_size: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(queries, dtype=np.float32)
        nq = len(q)
        k = min(k, self.n)
        out_ids = np.empty((nq, k), dtype=np.int64)
        out_scores = np.empty((nq, k), dtype=np.float32)
        rc = _load().lako_mips_topk(
            _fptr(self._emb), self.n, self.dim, _fptr(q), nq, k,
            _iptr(out_ids), _fptr(out_scores), self.n_threads,
        )
        if rc != 0:
            raise RuntimeError(f"lako_mips_topk failed rc={rc}")
        return self.ids[out_ids], out_scores

    def rerank(self, candidate_ids: np.ndarray, queries: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(queries, dtype=np.float32)
        rows = np.ascontiguousarray(
            self._rows_for_ids(candidate_ids), dtype=np.int64)
        nq, c = rows.shape
        out_rows = np.empty((nq, c), dtype=np.int64)
        out_scores = np.empty((nq, c), dtype=np.float32)
        rc = _load().lako_mips_rerank(
            _fptr(self._emb), self.n, self.dim, _fptr(q), nq,
            _iptr(rows), c, _iptr(out_rows), _fptr(out_scores), self.n_threads,
        )
        if rc != 0:
            raise RuntimeError(f"lako_mips_rerank failed rc={rc}")
        return self.ids[out_rows], out_scores
