"""Native C++ MIPS engine: build, parity vs numpy, and parity vs DenseIndex."""

import numpy as np
import pytest

from lako_tpu.retrieval.native import NativeIndex, build_native, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def test_topk_matches_numpy():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(5000, 64)).astype(np.float32)
    q = rng.normal(size=(17, 64)).astype(np.float32)
    idx = NativeIndex(emb)
    ids, scores = idx.search(q, k=10)
    ref = q @ emb.T
    for i in range(len(q)):
        expect_ids = np.argsort(-ref[i], kind="stable")[:10]
        np.testing.assert_allclose(scores[i], ref[i][expect_ids], rtol=1e-5)
        # ids may differ on exact ties; compare scores via ids
        np.testing.assert_allclose(ref[i][ids[i]], ref[i][expect_ids], rtol=1e-5)


def test_topk_matches_dense_index():
    from lako_tpu.retrieval.index import DenseIndex

    rng = np.random.default_rng(1)
    emb = rng.normal(size=(800, 32)).astype(np.float32)
    q = rng.normal(size=(5, 32)).astype(np.float32)
    n_ids, n_scores = NativeIndex(emb).search(q, k=7)
    d_ids, d_scores = DenseIndex(emb).search(q, k=7)
    np.testing.assert_array_equal(n_ids, d_ids)
    np.testing.assert_allclose(n_scores, d_scores, rtol=1e-4)


def test_rerank():
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(100, 16)).astype(np.float32)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    cand = rng.integers(0, 100, size=(3, 9)).astype(np.int64)
    idx = NativeIndex(emb)
    ids, scores = idx.rerank(cand, q)
    for b in range(3):
        ref = {int(i): float(q[b] @ emb[i]) for i in cand[b]}
        assert set(ids[b]) == set(cand[b])
        assert (np.diff(scores[b]) <= 1e-6).all()
        np.testing.assert_allclose(scores[b][0], max(ref.values()), rtol=1e-5)


def test_custom_ids():
    rng = np.random.default_rng(3)
    emb = rng.normal(size=(50, 8)).astype(np.float32)
    ids = np.arange(1000, 1050)
    idx = NativeIndex(emb, ids=ids)
    out_ids, _ = idx.search(rng.normal(size=(1, 8)).astype(np.float32), k=3)
    assert all(1000 <= i < 1050 for i in out_ids[0])
