"""Serving: end-to-end retrieve->read service, including the HTTP endpoint."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lako_tpu.core.config import (
    ReaderDataConfig,
    RetrieverConfig,
    T5Config,
    bert_config_tiny,
)
from lako_tpu.models.retriever import Retriever
from lako_tpu.models.t5 import FiDT5
from lako_tpu.retrieval.index import DenseIndex
from lako_tpu.serve import LakoService, ServiceConfig, run_http_server
from tests.fixtures import corpus_sentences, make_tokenizer


@pytest.fixture(scope="module")
def service():
    tok = make_tokenizer()
    btok = make_tokenizer(style="bert")
    t5 = T5Config(vocab_size=tok.vocab_size, d_model=32, d_kv=8, d_ff=64,
                  num_layers=1, num_decoder_layers=1, num_heads=2,
                  relative_attention_num_buckets=8, dropout_rate=0.0)
    data_cfg = ReaderDataConfig(n_context=3, text_maxlength=24,
                                answer_maxlength=4, stream=2)
    cfg = ServiceConfig(batch_size=4, max_length=4, n_context=3, data=data_cfg,
                        dtype="float32")

    model = FiDT5(t5)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 24), jnp.int32),
                        jnp.ones((1, 2, 24), bool),
                        jnp.zeros((1, 4), jnp.int32))["params"]

    rcfg = RetrieverConfig(bert=bert_config_tiny(), indexing_dimension=16)
    retr = Retriever(rcfg)
    rparams = retr.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), bool),
                        jnp.zeros((1, 1, 8), jnp.int32),
                        jnp.ones((1, 1, 8), bool))["params"]

    sentences = corpus_sentences()
    rng = np.random.default_rng(0)
    index = DenseIndex(rng.normal(size=(len(sentences), 16)).astype(np.float32))
    return LakoService(
        cfg, t5, params, tok,
        retriever=retr, retriever_params=rparams, bert_tokenizer=btok,
        index=index, id_to_sentence=dict(enumerate(sentences)),
    )


def test_answer_with_given_facts(service):
    out = service.answer("what sound does the cat make?",
                         "a cat sitting on the grass.",
                         facts=[{"sentence": "cat says meow.", "id": 0}])
    assert isinstance(out["answer"], str)
    assert out["facts"][0]["sentence"] == "cat says meow."


def test_answer_with_retrieval(service):
    out = service.answer("what sound does the dog make?", "a dog.")
    assert isinstance(out["answer"], str)
    assert len(out["facts"]) == 3  # n_context retrieved
    assert all("sentence" in f and "score" in f for f in out["facts"])


def test_batch_mixed(service):
    reqs = [
        {"question": "q1?", "caption": "c1."},
        {"question": "q2?", "caption": "c2.",
         "fact": [{"sentence": "dog says woof.", "id": 1}]},
    ]
    outs = service.answer_batch(reqs)
    assert len(outs) == 2


def test_http_endpoint(service):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    t = threading.Thread(target=run_http_server, args=(service, "127.0.0.1", port),
                         daemon=True)
    t.start()
    import time

    payload = json.dumps({"question": "what sound does the cat make?",
                          "caption": "a cat."}).encode()
    for _ in range(50):
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/answer", data=payload,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=10) as resp:
                out = json.loads(resp.read())
            break
        except (ConnectionError, urllib.error.URLError):
            time.sleep(0.1)
    assert isinstance(out, list) and "answer" in out[0]

    # probe: malformed body -> 400 with error json
    bad = urllib.request.Request(f"http://127.0.0.1:{port}/answer",
                                 data=b"not json",
                                 headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(bad, timeout=10)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_microbatcher_coalesces_concurrent_requests(service):
    """N concurrent submits within the window must share answer_batch calls
    (fewer calls than requests) and each client gets its own result."""
    from lako_tpu.serve import MicroBatcher

    calls = []
    orig = service.answer_batch

    class Counting:
        cfg = service.cfg

        def answer_batch(self, reqs):
            calls.append(len(reqs))
            return orig(reqs)

    mb = MicroBatcher(Counting(), max_batch=4, window_s=0.25)
    results = [None] * 6

    def worker(i):
        results[i] = mb.submit({"question": f"q{i}?", "caption": "a cat.",
                                "fact": [{"sentence": "cat says meow.",
                                          "id": 0}]})

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None and "answer" in r for r in results)
    assert sum(calls) == 6
    assert len(calls) < 6, calls          # coalesced into shared batches
    assert max(calls) > 1, calls


def test_microbatcher_isolates_bad_request(service):
    from lako_tpu.serve import MicroBatcher

    mb = MicroBatcher(service, max_batch=4, window_s=0.2)
    results = {}

    def good():
        results["good"] = mb.submit(
            {"question": "q?", "caption": "c.",
             "fact": [{"sentence": "cat says meow.", "id": 0}]})

    def bad():
        try:
            mb.submit({"no_question_key": True})
            results["bad"] = "no error"
        except (ValueError, KeyError) as e:
            results["bad"] = f"error: {e}"

    tg, tb = threading.Thread(target=good), threading.Thread(target=bad)
    tg.start(); tb.start(); tg.join(timeout=120); tb.join(timeout=120)
    assert "answer" in results["good"]
    assert str(results["bad"]).startswith("error")


def test_http_endpoint_with_batching(service):
    import socket
    import time
    import copy

    import dataclasses

    svc = copy.copy(service)
    svc.cfg = dataclasses.replace(service.cfg, batch_window_ms=50.0)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    t = threading.Thread(target=run_http_server,
                         args=(svc, "127.0.0.1", port), daemon=True)
    t.start()
    payload = json.dumps([
        {"question": "what sound does the cat make?", "caption": "a cat.",
         "fact": [{"sentence": "cat says meow.", "id": 0}]},
        {"question": "what sound does the dog make?", "caption": "a dog.",
         "fact": [{"sentence": "dog says woof.", "id": 1}]},
    ]).encode()
    out = None
    for _ in range(80):
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/answer", data=payload,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as resp:
                out = json.loads(resp.read())
            break
        except (ConnectionError, urllib.error.URLError):
            time.sleep(0.1)
    assert isinstance(out, list) and len(out) == 2
    assert all("answer" in o for o in out)



def test_submit_many_returns_per_item_errors(service):
    """A failed slot in a multi-item payload must not discard its
    batch-mates' results (advisor r2): the bad item comes back as an
    in-place {"error", "index"} dict, the good items keep their answers."""
    from lako_tpu.serve import MicroBatcher

    mb = MicroBatcher(service, max_batch=4, window_s=0.05)
    out = mb.submit_many([
        {"question": "q0?", "caption": "c.",
         "fact": [{"sentence": "cat says meow.", "id": 0}]},
        {"no_question_key": True},
        {"question": "q2?", "caption": "c.",
         "fact": [{"sentence": "cat says meow.", "id": 0}]},
    ])
    assert len(out) == 3
    assert "answer" in out[0] and "answer" in out[2]
    assert "error" in out[1] and out[1]["index"] == 1


def test_tp_service_matches_single_device():
    """mesh_model=2: params committed with Megatron specs, batch on the
    data axis — answers must equal the unsharded service's exactly
    (requires the 8-device CPU mesh from conftest)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    tok = make_tokenizer()
    t5 = T5Config(vocab_size=tok.vocab_size, d_model=32, d_kv=8, d_ff=64,
                  num_layers=1, num_decoder_layers=1, num_heads=2,
                  relative_attention_num_buckets=8, dropout_rate=0.0)
    data_cfg = ReaderDataConfig(n_context=2, text_maxlength=24,
                                answer_maxlength=4, stream=2)
    model = FiDT5(t5)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 24), jnp.int32),
                        jnp.ones((1, 2, 24), bool),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    reqs = [{"question": f"is item {i} on",
             "fact": [{"sentence": "items toggle.", "id": 0, "score": 1.0}]}
            for i in range(4)]

    def build(mesh_model):
        cfg = ServiceConfig(batch_size=4, max_length=4, n_context=2,
                            data=data_cfg, dtype="float32",
                            mesh_model=mesh_model)
        return LakoService(cfg, t5, params, tok)

    plain = build(1).answer_batch(reqs)
    tp = build(2).answer_batch(reqs)
    assert [r["answer"] for r in tp] == [r["answer"] for r in plain]

    with pytest.raises(ValueError):
        build(3)    # 8 devices not divisible by 3


def test_engine_policy_auto_picks_by_occupancy():
    """engine_policy="auto": full-run greedy below the occupancy threshold,
    chunked early-exit at/above it — and both routes return identical
    tokens for identical inputs (greedy is deterministic)."""
    tok = make_tokenizer()
    t5 = T5Config(vocab_size=tok.vocab_size, d_model=32, d_kv=8, d_ff=64,
                  num_layers=1, num_decoder_layers=1, num_heads=2,
                  relative_attention_num_buckets=8, dropout_rate=0.0)
    data_cfg = ReaderDataConfig(n_context=2, text_maxlength=16,
                                answer_maxlength=4, stream=2)
    model = FiDT5(t5)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 16), jnp.int32),
                        jnp.ones((1, 2, 16), bool),
                        jnp.zeros((1, 4), jnp.int32))["params"]

    def make(policy):
        return LakoService(
            ServiceConfig(batch_size=4, max_length=6, n_context=2,
                          data=data_cfg, dtype="float32",
                          engine_policy=policy,
                          policy_chunked_min_occupancy=3,
                          decode_chunk_size=2),
            t5, params, tok)

    svc = make("auto")
    reqs = [{"question": f"what sound does animal {i} make?",
             "caption": "an animal",
             "fact": [{"sentence": "a cow says moo.", "id": 1}]}
            for i in range(4)]
    low = svc.answer_batch(reqs[:1])       # occupancy 1 < 3 -> full
    high = svc.answer_batch(reqs)          # occupancy 4 >= 3 -> chunked
    assert list(svc.policy_decisions) == [("full", 1), ("chunked", 4)], \
        svc.policy_decisions
    # both engines answer identically (same params, greedy)
    assert high[0]["answer"] == low[0]["answer"]

    fixed = make("fixed")
    fixed.answer_batch(reqs)
    assert list(fixed.policy_decisions) == []  # policy inactive

    import pytest as _pytest
    with _pytest.raises(ValueError):
        make("adaptive")


def test_engine_policy_threshold_validation():
    """An explicit policy_chunked_min_occupancy that batch_size can never
    reach must be rejected (a silent always-full 'auto' is the bug); the
    unset default resolves to max(batch_size//2, 5) and is accepted."""
    tok = make_tokenizer()
    t5 = T5Config(vocab_size=tok.vocab_size, d_model=32, d_kv=8, d_ff=64,
                  num_layers=1, num_decoder_layers=1, num_heads=2,
                  relative_attention_num_buckets=8, dropout_rate=0.0)
    data_cfg = ReaderDataConfig(n_context=2, text_maxlength=16,
                                answer_maxlength=4, stream=2)
    model = FiDT5(t5)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 16), jnp.int32),
                        jnp.ones((1, 2, 16), bool),
                        jnp.zeros((1, 4), jnp.int32))["params"]

    def make(batch_size, threshold):
        return LakoService(
            ServiceConfig(batch_size=batch_size, max_length=6, n_context=2,
                          data=data_cfg, dtype="float32",
                          engine_policy="auto",
                          policy_chunked_min_occupancy=threshold),
            t5, params, tok)

    with pytest.raises(ValueError, match="can never be reached"):
        make(8, 32)

    svc = make(12, None)          # default: max(12//2, 5) = 6
    assert svc._policy_threshold == 6
    assert svc._generate_chunked is not None

    # batch_size below the measured chunked-win floor: default threshold is
    # out of reach; accepted with a warning (full-length IS the measured
    # choice), not an error
    svc_small = make(4, None)
    assert svc_small._policy_threshold == 5


def test_engine_policy_threshold_zero_rejected():
    """threshold <= 0 would run chunked decode on EVERY batch (the measured
    -loss regime) — the mirror of the unreachable-threshold bug."""
    tok = make_tokenizer()
    t5 = T5Config(vocab_size=tok.vocab_size, d_model=32, d_kv=8, d_ff=64,
                  num_layers=1, num_decoder_layers=1, num_heads=2,
                  relative_attention_num_buckets=8, dropout_rate=0.0)
    data_cfg = ReaderDataConfig(n_context=2, text_maxlength=16,
                                answer_maxlength=4, stream=2)
    model = FiDT5(t5)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 16), jnp.int32),
                        jnp.ones((1, 2, 16), bool),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    with pytest.raises(ValueError, match="must be >= 1"):
        LakoService(
            ServiceConfig(batch_size=4, max_length=6, n_context=2,
                          data=data_cfg, dtype="float32",
                          engine_policy="auto",
                          policy_chunked_min_occupancy=0),
            t5, params, tok)
