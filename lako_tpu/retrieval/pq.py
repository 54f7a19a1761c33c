"""Product-quantized MIPS index.

Covers the reference's faiss ``IndexPQ`` path (src/index.py:22-25,
``--n-subquantizers``/``--n-bits``): the corpus is compressed to
``m`` uint8 codes per vector (k-means codebook per subspace) and queries score
by asymmetric distance. At LaKo scale (300,600 × 256) PQ-32x8 shrinks the
corpus 32× (307 MB f32 → 9.6 MB of codes + 0.26 MB codebooks), useful when the
corpus must share HBM with a large model.

TPU shape of the search: faiss scores PQ with a per-query lookup table
LUT[q,m,c] = <q_sub_m, codebook[m,c]> summed at each vector's codes — a
gather-dominated host loop. Here the identical math is reorganized for the
MXU: score(q, x) = Σ_m <q_m, book[m, code_m(x)]> = <q, x̂> where x̂ is the
reconstruction, so we stream the corpus codes chunk-by-chunk, decompress each
chunk with one vectorized gather (chunk, d), and take exact inner products via
a single matmul + running top-k merge (same streaming scan as
``DenseIndex``'s ``_chunked_topk``). HBM holds only the uint8 codes; the f32
reconstruction exists one chunk at a time.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _kmeans(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Lloyd's k-means (k centroids over x) — small subspace problems.

    Distances via the ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖² expansion (the ‖x‖² term is
    constant per row and dropped from the argmin), so each iteration is one
    (n, d)·(d, k) matmul instead of an (n, k, d) broadcast."""
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=k, replace=len(x) < k)].copy()
    for _ in range(iters):
        d = (centroids ** 2).sum(1)[None, :] - 2.0 * (x @ centroids.T)
        assign = d.argmin(1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                centroids[j] = members.mean(0)
    return centroids


class PQIndex:
    """Train/encode/search with m subquantizers of 2^nbits centroids each."""

    def __init__(self, codebooks: np.ndarray, codes: np.ndarray,
                 ids: Optional[np.ndarray] = None,
                 chunk_size: int = 65536):
        """codebooks: (m, k, dsub); codes: (n, m) uint8."""
        self.codebooks = np.asarray(codebooks, np.float32)
        self.codes = np.asarray(codes)
        self.m, self.k, self.dsub = self.codebooks.shape
        self.n = len(self.codes)
        self.dim = self.m * self.dsub
        self.ids = np.arange(self.n, dtype=np.int64) if ids is None else ids
        self.chunk_size = min(chunk_size, self.n)
        if self.codes.max(initial=0) >= self.k:
            raise ValueError(
                f"codes reference centroid {int(self.codes.max())} but "
                f"codebooks have only k={self.k} centroids per subspace")
        # codes stay narrow in HBM (the whole point); widened per chunk
        # in-scan. uint8 covers n_bits<=8; wider codebooks (n_bits>8 from
        # _encode) keep uint16 — force-casting to uint8 would wrap codes
        # >=256 and silently decompress against the wrong centroids.
        code_dtype = jnp.uint8 if self.k <= 256 else jnp.uint16
        self._codes_dev = jax.device_put(jnp.asarray(self.codes, code_dtype))
        self._books_dev = jax.device_put(jnp.asarray(self.codebooks))
        self._search = _cached_pq_search(self.chunk_size, self.n, self.m,
                                         self.k, self.dsub)

    @classmethod
    def train(cls, embeddings: np.ndarray, n_subquantizers: int = 32,
              n_bits: int = 8, ids: Optional[np.ndarray] = None,
              train_size: int = 16384, iters: int = 10, seed: int = 0) -> "PQIndex":
        n, d = embeddings.shape
        m = n_subquantizers
        assert d % m == 0, (d, m)
        dsub, k = d // m, 2 ** n_bits
        rng = np.random.default_rng(seed)
        sample = embeddings[rng.choice(n, size=min(train_size, n), replace=False)]
        books = np.stack([
            _kmeans(sample[:, j * dsub:(j + 1) * dsub].astype(np.float32),
                    k, iters, seed + j)
            for j in range(m)
        ])
        codes = cls._encode(embeddings, books)
        return cls(books, codes, ids)

    @staticmethod
    def _encode(x: np.ndarray, books: np.ndarray,
                row_batch: int = 65536) -> np.ndarray:
        """Nearest-centroid codes per subspace, batched over rows so the
        (rows, k) distance buffer stays bounded at corpus scale."""
        m, k, dsub = books.shape
        codes = np.empty((len(x), m), dtype=np.uint8 if k <= 256 else np.uint16)
        c_norm = (books ** 2).sum(-1)  # (m, k)
        for s in range(0, len(x), row_batch):
            xb = x[s:s + row_batch].astype(np.float32)
            for j in range(m):
                sub = xb[:, j * dsub:(j + 1) * dsub]
                d = c_norm[j][None, :] - 2.0 * (sub @ books[j].T)
                codes[s:s + row_batch, j] = d.argmin(1)
        return codes

    def search(self, queries: np.ndarray, k: int,
               batch_size: int = 2048) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, d) queries → (ids, scores) sorted descending. Scores are exact
        inner products against the PQ reconstruction (= faiss asymmetric PQ
        scoring); approximation error comes only from quantization."""
        from lako_tpu.retrieval.index import _validate_k

        _validate_k(k, self.n)
        out_ids, out_scores = [], []
        for s in range(0, len(queries), batch_size):
            q = jnp.asarray(queries[s:s + batch_size], jnp.float32)
            scores, idx = self._search(self._books_dev, self._codes_dev, q, k)
            out_scores.append(np.asarray(scores, np.float32))
            out_ids.append(self.ids[np.asarray(idx)])
        return np.concatenate(out_ids), np.concatenate(out_scores)

    def nbytes(self) -> int:
        """Index payload (codes + codebooks), the HBM/disk footprint claim."""
        return self.codes.nbytes + self.codebooks.nbytes

    def save(self, dir_path: str) -> None:
        p = Path(dir_path)
        p.mkdir(parents=True, exist_ok=True)
        np.save(p / "codebooks.npy", self.codebooks)
        np.save(p / "codes.npy", self.codes)
        np.save(p / "ids.npy", self.ids)
        (p / "meta.json").write_text(json.dumps(
            {"m": self.m, "k": self.k, "dsub": self.dsub, "n": self.n}))

    @classmethod
    def load(cls, dir_path: str) -> "PQIndex":
        p = Path(dir_path)
        return cls(np.load(p / "codebooks.npy"), np.load(p / "codes.npy"),
                   np.load(p / "ids.npy"))


def _cached_pq_search(chunk_size: int, n: int, m: int, k_cent: int, dsub: int):
    """One jitted streaming program per index geometry (program_cache keyed
    like DenseIndex's, so loop iterations reuse the compile)."""
    from lako_tpu.core.program_cache import cached_program

    def build():
        return jax.jit(functools.partial(_chunked_pq_topk, chunk_size, n),
                       static_argnums=(3,))

    return cached_program(("pq_search", chunk_size, n, m, k_cent, dsub), build)


def _decompress(books: jax.Array, chunk_codes: jax.Array) -> jax.Array:
    """(m, K, dsub) books + (c, m) codes → (c, m·dsub) reconstructions."""
    c = chunk_codes.astype(jnp.int32)
    recon = jax.vmap(lambda b, idx: jnp.take(b, idx, axis=0),
                     in_axes=(0, 1), out_axes=1)(books, c)  # (c, m, dsub)
    return recon.reshape(c.shape[0], -1)


def _chunked_pq_topk(chunk_size: int, n: int, books: jax.Array,
                     codes: jax.Array, queries: jax.Array, k: int):
    """Streaming top-k over decompressed chunks (mirror of index._chunked_topk;
    HIGHEST matmul precision so scores equal the f32 reconstruction dot —
    pinned by tests/test_retrieval.py's LUT-equality check)."""
    Q = queries.shape[0]
    prec = jax.lax.Precision.HIGHEST
    n_chunks = (n + chunk_size - 1) // chunk_size
    if n_chunks <= 1:
        recon = _decompress(books, codes)
        scores = jnp.einsum("qd,nd->qn", queries, recon,
                            precision=prec).astype(jnp.float32)
        return jax.lax.top_k(scores, k)

    pad = n_chunks * chunk_size - n
    codes_p = jnp.pad(codes, ((0, pad), (0, 0)))
    code_chunks = codes_p.reshape(n_chunks, chunk_size, -1)

    def scan_body(carry, xs):
        best_scores, best_idx = carry
        chunk_codes, chunk_i = xs
        recon = _decompress(books, chunk_codes)
        scores = jnp.einsum("qd,cd->qc", queries, recon,
                            precision=prec).astype(jnp.float32)
        base = chunk_i * chunk_size
        idx = base + jnp.arange(chunk_size)[None, :]
        scores = jnp.where(idx < n, scores, -jnp.inf)
        cat_scores = jnp.concatenate([best_scores, scores], axis=1)
        cat_idx = jnp.concatenate(
            [best_idx, jnp.broadcast_to(idx, (Q, chunk_size))], axis=1)
        top_scores, pos = jax.lax.top_k(cat_scores, k)
        top_idx = jnp.take_along_axis(cat_idx, pos, axis=1)
        return (top_scores, top_idx), None

    init = (jnp.full((Q, k), -jnp.inf, jnp.float32),
            jnp.zeros((Q, k), jnp.int32))
    (scores, idx), _ = jax.lax.scan(
        scan_body, init, (code_chunks, jnp.arange(n_chunks)))
    return scores, idx
