import numpy as np
import pytest

import jax.numpy as jnp

from lako_tpu.retrieval import (
    BM25L,
    BM25Okapi,
    BM25Plus,
    CandidateMiner,
    DenseIndex,
    hit_at_k,
    triple_to_sentence,
    verbalize_triples,
)
from lako_tpu.retrieval.candidates import build_caption_sentence
from lako_tpu.retrieval.index import add_facts_to_examples
from lako_tpu.retrieval.verbalize import corpus_sentences


def _dense_bm25_okapi(corpus, query, k1=1.5, b=0.75, epsilon=0.25):
    """Straight transcription of the rank_bm25 reference algorithm (dense scan)
    as an independent oracle."""
    import math
    from collections import Counter

    n = len(corpus)
    doc_freqs = [Counter(d) for d in corpus]
    doc_len = np.array([len(d) for d in corpus], dtype=float)
    avgdl = doc_len.sum() / n
    nd = Counter()
    for f in doc_freqs:
        nd.update(f.keys())
    idf = {w: math.log(n - df + 0.5) - math.log(df + 0.5) for w, df in nd.items()}
    avg_idf = sum(idf.values()) / len(idf)
    for w, v in idf.items():
        if v < 0:
            idf[w] = epsilon * avg_idf
    score = np.zeros(n)
    for q in query:
        q_freq = np.array([f.get(q, 0) for f in doc_freqs], dtype=float)
        score += idf.get(q, 0) * q_freq * (k1 + 1) / (
            q_freq + k1 * (1 - b + b * doc_len / avgdl)
        )
    return score


CORPUS = [
    "cat says meow".split(),
    "dog says woof woof".split(),
    "the quick brown fox".split(),
    "cat and dog are friends".split(),
    "a cat sat on the mat with another cat".split(),
]


class TestBM25:
    def test_okapi_matches_dense_oracle(self):
        bm = BM25Okapi(CORPUS)
        for query in (["cat"], ["cat", "dog"], ["says", "the", "zebra"],
                      ["woof", "woof", "cat"]):
            np.testing.assert_allclose(
                bm.get_scores(query), _dense_bm25_okapi(CORPUS, query), atol=1e-12
            )

    def test_okapi_fuzz(self):
        rng = np.random.default_rng(0)
        vocab = [f"w{i}" for i in range(30)]
        for _ in range(20):
            corpus = [list(rng.choice(vocab, size=rng.integers(2, 12)))
                      for _ in range(rng.integers(3, 20))]
            query = list(rng.choice(vocab, size=rng.integers(1, 6)))
            bm = BM25Okapi(corpus)
            np.testing.assert_allclose(
                bm.get_scores(query), _dense_bm25_okapi(corpus, query), atol=1e-10
            )

    def test_top_n(self):
        bm = BM25Okapi(CORPUS)
        docs = ["d0", "d1", "d2", "d3", "d4"]
        top = bm.get_top_n(["woof"], docs, n=2)
        assert top[0] == "d1"

    def test_variants_run(self):
        for cls in (BM25L, BM25Plus):
            bm = cls(CORPUS)
            s = bm.get_scores(["cat", "dog"])
            assert s.shape == (5,)
            assert s.argmax() == 3  # doc with both terms


class TestVerbalize:
    TEMPLATES = {"is_a": "is a kind of", "locate": "is usually found in"}

    def test_template(self):
        assert triple_to_sentence(("cat", "is_a", "animal"), self.TEMPLATES) \
            == "cat is a kind of animal"

    def test_comparatives(self):
        assert triple_to_sentence(("cat", "fast#f", "snail"), self.TEMPLATES) \
            == "cat is more fast than snail"
        assert triple_to_sentence(("snail", "fast#r", "cat"), self.TEMPLATES) \
            == "snail is less fast than cat"

    def test_fallback_raw_relation(self):
        assert triple_to_sentence(("cat", "chases", "mouse"), self.TEMPLATES) \
            == "cat chases mouse"

    def test_corpus(self):
        ft = verbalize_triples([("cat", "is_a", "animal")], self.TEMPLATES)
        assert corpus_sentences(ft) == ["cat is a kind of animal."]


class TestDenseIndex:
    def test_exact_topk(self):
        rng = np.random.default_rng(1)
        emb = rng.normal(size=(100, 16)).astype(np.float32)
        q = rng.normal(size=(7, 16)).astype(np.float32)
        idx = DenseIndex(emb)
        ids, scores = idx.search(q, k=5)
        ref = q @ emb.T
        for i in range(7):
            expect = np.argsort(-ref[i])[:5]
            np.testing.assert_array_equal(ids[i], expect)
            np.testing.assert_allclose(scores[i], np.sort(ref[i])[::-1][:5], rtol=1e-5)

    def test_chunked_matches_unchunked(self):
        rng = np.random.default_rng(2)
        emb = rng.normal(size=(1000, 8)).astype(np.float32)
        q = rng.normal(size=(3, 8)).astype(np.float32)
        small = DenseIndex(emb, chunk_size=64)
        big = DenseIndex(emb, chunk_size=100000)
        ids_s, sc_s = small.search(q, k=10)
        ids_b, sc_b = big.search(q, k=10)
        np.testing.assert_array_equal(ids_s, ids_b)
        np.testing.assert_allclose(sc_s, sc_b, rtol=1e-5)

    def test_approx_topk_recall(self):
        # approx_max_k selection: high-recall, sorted, valid ids — and the
        # chunked merge path agrees with the single-shot path on what it keeps
        rng = np.random.default_rng(7)
        emb = rng.normal(size=(4096, 16)).astype(np.float32)
        q = rng.normal(size=(9, 16)).astype(np.float32)
        exact = DenseIndex(emb)
        approx = DenseIndex(emb, method="approx", recall_target=0.95)
        ids_e, _ = exact.search(q, k=32)
        ids_a, sc_a = approx.search(q, k=32)
        assert ids_a.shape == (9, 32)
        # scores sorted descending (aggregate_to_topk)
        assert np.all(np.diff(sc_a, axis=1) <= 1e-6)
        recall = np.mean([len(set(map(int, a)) & set(map(int, e))) / 32
                          for a, e in zip(ids_a, ids_e)])
        assert recall >= 0.9, recall
        # chunked approx merge: every kept id must be a real row with the
        # true score it claims
        chunked = DenseIndex(emb, method="approx", chunk_size=1024)
        ids_c, sc_c = chunked.search(q, k=32)
        ref = q @ emb.T
        for i in range(9):
            np.testing.assert_allclose(sc_c[i], ref[i][ids_c[i]], rtol=1e-5)

    def test_fast_method_matches_exact_on_cpu(self):
        # "fast" only relaxes matmul precision, which is a TPU-hardware
        # effect — on CPU both methods are f32, so results are identical;
        # the TPU recall gap is measured in scripts/bench_retrieval.py
        rng = np.random.default_rng(11)
        emb = rng.normal(size=(2048, 16)).astype(np.float32)
        q = rng.normal(size=(5, 16)).astype(np.float32)
        ids_e, sc_e = DenseIndex(emb, method="exact").search(q, k=16)
        ids_f, sc_f = DenseIndex(emb, method="fast").search(q, k=16)
        np.testing.assert_array_equal(ids_e, ids_f)
        np.testing.assert_allclose(sc_e, sc_f, rtol=1e-6)

    def test_approx_rejects_bad_method(self):
        with pytest.raises(ValueError):
            DenseIndex(np.zeros((4, 2), np.float32), method="fuzzy")

    def test_rerank(self):
        rng = np.random.default_rng(3)
        emb = rng.normal(size=(50, 8)).astype(np.float32)
        idx = DenseIndex(emb)
        cand = np.array([[3, 10, 7], [20, 1, 4]])
        q = rng.normal(size=(2, 8)).astype(np.float32)
        ids, scores = idx.rerank(cand, q)
        for b in range(2):
            ref = {i: float(q[b] @ emb[i]) for i in cand[b]}
            assert list(ids[b]) == sorted(ref, key=lambda i: -ref[i])
            assert (np.diff(scores[b]) <= 1e-6).all()

    def test_rerank_non_positional_ids(self):
        """rerank must invert the id→row mapping when corpus ids aren't
        0..n-1 positional (ADVICE r1: raw ids used as row indices scored the
        wrong embeddings, silently, via jnp.take clamping)."""
        rng = np.random.default_rng(9)
        emb = rng.normal(size=(20, 8)).astype(np.float32)
        ids = np.arange(100, 120, dtype=np.int64)  # offset external ids
        idx = DenseIndex(emb, ids=ids)
        q = rng.normal(size=(2, 8)).astype(np.float32)
        cand = np.array([[103, 110, 107], [119, 101, 104]])
        out_ids, out_scores = idx.rerank(cand, q)
        for b in range(2):
            ref = {i: float(q[b] @ emb[i - 100]) for i in cand[b]}
            assert list(out_ids[b]) == sorted(ref, key=lambda i: -ref[i])
            for i, s in zip(out_ids[b], out_scores[b]):
                assert s == pytest.approx(ref[int(i)], rel=1e-5)
        with pytest.raises(KeyError):
            idx.rerank(np.array([[999, 103, 110]]), q[:1])

    def test_rerank_batched_matches_single(self):
        """Internal batching returns identical results to one-call rerank."""
        rng = np.random.default_rng(10)
        emb = rng.normal(size=(64, 8)).astype(np.float32)
        idx = DenseIndex(emb)
        cand = rng.integers(0, 64, size=(9, 5)).astype(np.int64)
        q = rng.normal(size=(9, 8)).astype(np.float32)
        ids_a, sc_a = idx.rerank(cand, q, batch_size=4)
        ids_b, sc_b = idx.rerank(cand, q, batch_size=1000)
        np.testing.assert_array_equal(ids_a, ids_b)
        np.testing.assert_allclose(sc_a, sc_b, rtol=1e-6)

    def test_save_load(self, tmp_path):
        rng = np.random.default_rng(4)
        emb = rng.normal(size=(20, 8)).astype(np.float32)
        idx = DenseIndex(emb)
        idx.save(str(tmp_path / "ix"))
        idx2 = DenseIndex.load(str(tmp_path / "ix"))
        q = rng.normal(size=(2, 8)).astype(np.float32)
        np.testing.assert_array_equal(idx.search(q, 3)[0], idx2.search(q, 3)[0])

    def test_add_facts(self):
        examples = [{"question": "q"}]
        add_facts_to_examples(examples, np.array([[2, 0]]), np.array([[0.9, 0.1]]),
                              {0: "s0.", 2: "s2."})
        assert examples[0]["fact"] == [
            {"sentence": "s2.", "id": 2, "score": 0.9},
            {"sentence": "s0.", "id": 0, "score": 0.1},
        ]


class TestCandidates:
    TEMPLATES = {"is_a": "is a kind of"}

    def _miner(self):
        triples = [
            ("cat", "is_a", "animal"),
            ("dog", "is_a", "animal"),
            ("surfboard", "used_for", "surfing"),
            ("wave", "part_of", "ocean"),
        ]
        return CandidateMiner(verbalize_triples(triples, self.TEMPLATES))

    def test_candidates_via_inverted_index(self):
        miner = self._miner()
        ids = miner.candidate_ids({"cat", "ocean"})
        assert ids == [0, 3]

    def test_top_k_schema(self):
        miner = self._miner()
        facts = miner.top_k("what is the cat?", "a cat and a dog.", k=10)
        assert facts
        assert set(facts[0]) == {"sentence", "id"}
        assert facts[0]["sentence"].endswith(".")
        # cat facts must rank above unrelated ones
        assert facts[0]["id"] in (0, 1)

    def test_caption_sentence(self):
        assert build_caption_sentence(["a cat", "a dog."]) == "a cat. a dog."
        assert build_caption_sentence(["a cat."], ocr_text="STOP") == "STOP a cat."

    def test_mine_dataset_schema(self):
        miner = self._miner()
        rows = [{"sent": "what animal is the cat?", "label": {"cat": 1.0},
                 "img_id": "img0"},
                {"sent": "no label", "label": {}, "img_id": "img1"}]
        out = miner.mine_dataset(rows, {"img0": ["a cat."]})
        assert len(out) == 1  # empty-label row skipped (vqa2_deal.py:74-79)
        ex = out[0]
        assert set(ex) == {"question", "target", "answer", "img_id", "caption", "fact"}
        assert ex["target"] == "cat"


class TestHitAtK:
    def test_weighted_cuts(self):
        data = [{
            "answer": {"meow": 1.0},
            "fact": [{"sentence": "dog says woof."},
                     {"sentence": "cat says meow."},
                     {"sentence": "irrelevant."}],
        }]
        inc, stem = hit_at_k(data, hitk=(1, 2, 3))
        assert inc[1] == 0.0 and inc[2] == 1.0 and inc[3] == 1.0
        assert stem[2] == 1.0

    def test_short_fact_list(self):
        data = [{"answer": {"meow": 1.0}, "fact": [{"sentence": "nothing."}]}]
        inc, _ = hit_at_k(data, hitk=(1, 5))
        assert inc[1] == 0.0 and inc[5] == 0.0


class TestPQIndex:
    def test_pq_recall_vs_exact(self, tmp_path):
        from lako_tpu.retrieval.pq import PQIndex

        rng = np.random.default_rng(5)
        # clustered corpus so PQ has structure to exploit
        centers = rng.normal(size=(16, 32)) * 3
        emb = (centers[rng.integers(0, 16, 2000)]
               + rng.normal(size=(2000, 32)) * 0.3).astype(np.float32)
        q = (centers[rng.integers(0, 16, 8)]
             + rng.normal(size=(8, 32)) * 0.3).astype(np.float32)

        pq = PQIndex.train(emb, n_subquantizers=16, n_bits=8, train_size=1000,
                           iters=8)
        ids_pq, scores_pq = pq.search(q, k=20)
        ref = q @ emb.T
        recall = np.mean([
            len(set(ids_pq[i]) & set(np.argsort(-ref[i])[:20])) / 20
            for i in range(len(q))
        ])
        assert recall > 0.6, recall
        # LUT scores must equal exact scores on the reconstructed corpus
        recon = np.concatenate(
            [pq.codebooks[j][pq.codes[:, j]] for j in range(pq.m)], axis=1)
        approx = q @ recon.T
        np.testing.assert_allclose(
            scores_pq[0], np.sort(approx[0])[::-1][:20], atol=1e-4)
        # scores sorted descending
        assert all((np.diff(scores_pq[i]) <= 1e-5).all() for i in range(len(q)))

        pq.save(str(tmp_path / "pq"))
        pq2 = PQIndex.load(str(tmp_path / "pq"))
        ids2, _ = pq2.search(q, k=20)
        np.testing.assert_array_equal(ids_pq, ids2)


class TestShardedIndex:
    def test_matches_single_device(self):
        import jax
        from lako_tpu.core.config import MeshConfig
        from lako_tpu.core.mesh import make_mesh
        from lako_tpu.retrieval.index import ShardedDenseIndex

        rng = np.random.default_rng(6)
        emb = rng.normal(size=(1003, 16)).astype(np.float32)  # not divisible by 8
        q = rng.normal(size=(9, 16)).astype(np.float32)
        mesh = make_mesh(MeshConfig())
        sharded = ShardedDenseIndex(emb, mesh)
        ids_s, sc_s = sharded.search(q, k=7)
        ids_d, sc_d = DenseIndex(emb).search(q, k=7)
        np.testing.assert_array_equal(ids_s, ids_d)
        np.testing.assert_allclose(sc_s, sc_d, rtol=1e-5)

    def test_custom_ids(self):
        from lako_tpu.core.config import MeshConfig
        from lako_tpu.core.mesh import make_mesh
        from lako_tpu.retrieval.index import ShardedDenseIndex

        rng = np.random.default_rng(7)
        emb = rng.normal(size=(64, 8)).astype(np.float32)
        ids = np.arange(500, 564)
        mesh = make_mesh(MeshConfig())
        idx = ShardedDenseIndex(emb, mesh, ids=ids)
        out_ids, _ = idx.search(rng.normal(size=(2, 8)).astype(np.float32), k=3)
        assert out_ids.min() >= 500

    @pytest.mark.slow
    def test_reference_scale_corpus(self):
        """300,600 x 256 — the exact LaKo KG scale
        (generate_fact_embeddings.py:34,100) — through both DenseIndex and
        ShardedDenseIndex at k=500, exact vs a numpy oracle (VERDICT r1 #6).
        Query count kept small: this runs on the 8-device CPU mesh."""
        from lako_tpu.core.config import MeshConfig
        from lako_tpu.core.mesh import make_mesh
        from lako_tpu.retrieval.index import ShardedDenseIndex

        n, d, k, nq = 300_600, 256, 500, 4
        rng = np.random.default_rng(8)
        emb = rng.normal(size=(n, d)).astype(np.float32)
        q = rng.normal(size=(nq, d)).astype(np.float32)

        oracle_scores = q @ emb.T
        oracle_top = np.argsort(-oracle_scores, axis=1)[:, :k]

        dense = DenseIndex(emb)
        ids_d, sc_d = dense.search(q, k=k)
        mesh = make_mesh(MeshConfig())
        sharded = ShardedDenseIndex(emb, mesh)
        ids_s, sc_s = sharded.search(q, k=k)

        for row in range(nq):
            assert set(map(int, ids_d[row])) == set(map(int, oracle_top[row]))
            assert set(map(int, ids_s[row])) == set(map(int, oracle_top[row]))
        np.testing.assert_allclose(sc_d, sc_s, rtol=1e-5)


class TestEmbedFiniteAndMaxlength:
    """Round-4 regression: embed maxlength must come from the retriever's
    trained config, and non-finite embeddings must fail loudly at the source.

    The bug: embed_questions hardcoded maxlength=130; with a BERT whose
    max_position_embeddings < 130, the position lookup went out of range,
    jnp.take's fill mode produced all-NaN embeddings, NaN scores made the
    full loop's re-rank argsort a silent NO-OP, and iteration 2 trained on
    byte-identical data (the round-3 'reader never improves' artifact)."""

    def _tiny_retriever(self):
        import jax

        from lako_tpu.core.config import BertConfig, RetrieverConfig
        from lako_tpu.models.retriever import Retriever

        cfg = RetrieverConfig(
            bert=BertConfig(vocab_size=200, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2,
                            intermediate_size=64, max_position_embeddings=64),
            indexing_dimension=16, question_maxlength=16, passage_maxlength=12)
        model = Retriever(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), bool),
            jnp.zeros((1, 1, 8), jnp.int32), jnp.ones((1, 1, 8), bool),
        )["params"]
        return model, params

    def _tok(self):
        from tests.fixtures import make_tokenizer

        return make_tokenizer(style="bert")

    def test_config_maxlength_is_default(self):
        from lako_tpu.retrieval.embed import embed_corpus, embed_questions

        model, params = self._tiny_retriever()
        tok = self._tok()
        exs = [{"question": "what sound does the cat make?",
                "caption": "a cat sitting on the grass."}]
        q = embed_questions(model, params, exs, tok, batch_size=4)
        assert np.isfinite(q).all() and q.shape == (1, 16)
        ids, emb = embed_corpus(model, params,
                                [{"sentence": "cat says meow.", "id": 3}],
                                tok, batch_size=4)
        assert np.isfinite(emb).all() and list(ids) == [3]

    def test_past_position_table_raises(self):
        from lako_tpu.retrieval.embed import embed_questions

        model, params = self._tiny_retriever()
        tok = self._tok()
        exs = [{"question": "what sound does the cat make?",
                "caption": "a cat sitting on the grass."}]
        with pytest.raises(FloatingPointError, match="non-finite"):
            embed_questions(model, params, exs, tok, batch_size=4,
                            maxlength=130)

    def test_index_rejects_nan_corpus(self):
        emb = np.ones((4, 8), np.float32)
        emb[2, 3] = np.nan
        with pytest.raises(FloatingPointError):
            DenseIndex(emb)

    def test_search_k_exceeding_corpus_raises(self):
        emb = np.ones((4, 8), np.float32)
        with pytest.raises(ValueError, match="exceeds the corpus size"):
            DenseIndex(emb).search(np.ones((1, 8), np.float32), k=10)


class TestPQWideCodes:
    def test_n_bits_gt_8_codes_not_truncated(self):
        """n_bits > 8 produces uint16 codes; the device copy must keep them
        (a uint8 force-cast would wrap codes >= 256 and decompress against
        the wrong centroids)."""
        from lako_tpu.retrieval.pq import PQIndex

        rng = np.random.default_rng(0)
        emb = rng.normal(size=(700, 8)).astype(np.float32)
        pq = PQIndex.train(emb, n_subquantizers=2, n_bits=9, train_size=700,
                           iters=2)
        assert pq.k == 512
        assert pq.codes.dtype == np.uint16
        assert pq._codes_dev.dtype == jnp.uint16
        assert int(pq.codes.max()) >= 256  # the regression precondition

        q = rng.normal(size=(4, 8)).astype(np.float32)
        _, scores = pq.search(q, k=5)
        # scores must equal exact inner products on the HOST-code
        # reconstruction; a truncated device copy diverges wildly
        recon = np.concatenate(
            [pq.codebooks[j][pq.codes[:, j]] for j in range(pq.m)], axis=1)
        oracle = np.sort(q @ recon.T, axis=1)[:, ::-1][:, :5]
        np.testing.assert_allclose(scores, oracle, atol=1e-4)

    def test_codes_exceeding_codebook_rejected(self):
        from lako_tpu.retrieval.pq import PQIndex

        books = np.zeros((2, 4, 4), np.float32)  # k=4 centroids
        codes = np.array([[0, 5]], np.uint8)     # 5 >= k
        with pytest.raises(ValueError, match="only k=4 centroids"):
            PQIndex(books, codes)
