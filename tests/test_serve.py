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
