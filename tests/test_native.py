"""Native C++ MIPS engine: build, parity vs numpy, and parity vs DenseIndex."""

import numpy as np
import pytest

from lako_tpu.retrieval.native import (HostIndex, NativeIndex, build_native,
                                       native_available)

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


class TestNativeBM25:
    def test_matches_python_bm25(self):
        from lako_tpu.retrieval.bm25 import BM25Okapi
        from lako_tpu.retrieval.native import bm25_topn_native

        rng = np.random.default_rng(11)
        for _ in range(15):
            n_docs = int(rng.integers(3, 40))
            docs = [list(rng.integers(0, 50, size=rng.integers(2, 15)))
                    for _ in range(n_docs)]
            query = list(rng.integers(0, 60, size=rng.integers(1, 8)))
            py = BM25Okapi([[str(t) for t in d] for d in docs])
            scores = py.get_scores([str(t) for t in query])
            expect = np.argsort(-scores, kind="stable")
            got = bm25_topn_native(docs, query, n=5)
            # compare by score (ties can reorder)
            np.testing.assert_allclose(
                scores[got], np.sort(scores)[::-1][: len(got)], atol=1e-9)

    def test_miner_native_path_matches_python(self):
        from lako_tpu.retrieval.candidates import CandidateMiner
        from lako_tpu.retrieval.verbalize import verbalize_triples

        triples = [("cat", "is_a", "animal"), ("dog", "is_a", "animal"),
                   ("cat", "chases", "mouse"), ("wave", "part_of", "ocean")]
        miner = CandidateMiner(verbalize_triples(triples, {"is_a": "is a kind of"}))
        native = miner.top_k("what is the cat?", "a cat and a dog.", k=10)
        # force the python path
        import lako_tpu.retrieval.candidates as C
        orig = C.CandidateMiner._bm25_top_n
        C.CandidateMiner._bm25_top_n = staticmethod(
            lambda dt, q, docs, n: __import__(
                "lako_tpu.retrieval.bm25", fromlist=["BM25Okapi"]
            ).BM25Okapi(dt).get_top_n(q, docs, n=n))
        try:
            python = miner.top_k("what is the cat?", "a cat and a dog.", k=10)
        finally:
            C.CandidateMiner._bm25_top_n = staticmethod(orig)
        assert [f["id"] for f in native] == [f["id"] for f in python]


class TestHostIndex:
    def test_matches_dense_index(self):
        from lako_tpu.retrieval.index import DenseIndex
        from lako_tpu.retrieval.native import HostIndex

        rng = np.random.default_rng(21)
        emb = rng.normal(size=(3000, 24)).astype(np.float32)
        q = rng.normal(size=(6, 24)).astype(np.float32)
        h_ids, h_sc = HostIndex(emb, chunk_size=700).search(q, k=9)
        d_ids, d_sc = DenseIndex(emb).search(q, k=9)
        np.testing.assert_array_equal(h_ids, d_ids)
        np.testing.assert_allclose(h_sc, d_sc, rtol=1e-5)

    def test_rerank_matches(self):
        from lako_tpu.retrieval.index import DenseIndex
        from lako_tpu.retrieval.native import HostIndex

        rng = np.random.default_rng(22)
        emb = rng.normal(size=(80, 8)).astype(np.float32)
        cand = rng.integers(0, 80, size=(3, 7))
        q = rng.normal(size=(3, 8)).astype(np.float32)
        h_ids, _ = HostIndex(emb).rerank(cand, q)
        d_ids, _ = DenseIndex(emb).rerank(cand, q)
        np.testing.assert_array_equal(h_ids, d_ids)


def test_host_rerank_non_positional_ids():
    """HostIndex/NativeIndex rerank with offset external ids (id→row inversion)."""
    rng = np.random.default_rng(11)
    emb = rng.normal(size=(16, 8)).astype(np.float32)
    ids = np.arange(500, 516, dtype=np.int64)
    q = rng.normal(size=(2, 8)).astype(np.float32)
    cand = np.array([[503, 510, 507], [515, 501, 504]])
    for idx in filter(None, [
        HostIndex(emb, ids=ids),
        NativeIndex(emb, ids=ids) if native_available() else None,
    ]):
        out_ids, out_scores = idx.rerank(cand, q)
        for b in range(2):
            ref = {i: float(q[b] @ emb[i - 500]) for i in cand[b]}
            assert list(out_ids[b]) == sorted(ref, key=lambda i: -ref[i])
