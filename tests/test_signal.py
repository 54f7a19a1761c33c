"""Attention-signal aggregation parity.

The oracle transcribes the reference's host-side algorithm (src/model.py:143-204):
walk SentencePiece-style '.' boundaries in the fact passage token ids starting at
index 2, aggregate the layer×head-summed fact-stream scores per segment, pad with
-5, divide by layers×heads. Our implementation uses collate-time spans instead —
results must match on well-formed fact passages.
"""

import heapq

import numpy as np
import pytest

from lako_tpu.core.config import AttentionSignalConfig, ReaderDataConfig
from lako_tpu.data import ReaderCollator, ReaderDataset
from lako_tpu.signal import (
    aggregate_fact_scores,
    apply_ans_attention_bonus,
    attach_scores_to_examples,
)
from tests.fixtures import make_examples, make_tokenizer


def reference_walk_oracle(cross_logits, passage_ids, passage_mask, period_id,
                          n_context, style, last_half):
    """Transcription of get_crossattention_scores' semantics."""
    B, n_layers, n_heads, K = cross_logits.shape
    _, N, L = passage_ids.shape
    scores = np.where(passage_mask.reshape(B, 1, 1, K), cross_logits, 0.0)
    scores = scores.reshape(B, n_layers, n_heads, N, L)
    if last_half:
        # reference chunks first, then reads n_layers from the chunked shape
        # (src/model.py:155-158) — the final divisor uses the halved count
        scores = scores[:, n_layers // 2:]
        n_layers = n_layers - n_layers // 2
    fact_stream = scores[:, :, :, 1, :].sum(axis=(1, 2))  # (B, L)

    def agg(vals, style):
        if style == "mean":
            return sum(vals) / len(vals)
        if style == "max":
            return max(vals)
        num = max(int((len(vals) + 1) / 2), 1)
        return sum(heapq.nlargest(num, vals)) / num

    all_scores = []
    for b in range(B):
        fact_list = list(passage_ids[b, 1])
        fact_score_list = list(fact_stream[b])
        fact_score = []
        start = 2
        for _ in range(n_context):
            try:
                end = fact_list.index(period_id, start) + 1
            except ValueError:
                break
            fact_score.append(agg(fact_score_list[start:end], style))
            start = end
        if len(fact_score) < n_context and fact_list[-1] != 0:
            end = len(fact_list)
            if end > start:
                fact_score.append(agg(fact_score_list[start:end], style))
        while len(fact_score) < n_context:
            fact_score.append(-5)
        all_scores.append(fact_score)
    return np.asarray(all_scores) / (n_layers * n_heads)


@pytest.fixture(scope="module")
def batch_and_logits():
    tok = make_tokenizer()
    cfg = ReaderDataConfig(n_context=3, text_maxlength=24, answer_maxlength=4, stream=2)
    ds = ReaderDataset(make_examples(6, n_facts=3, seed=5), cfg)
    collator = ReaderCollator(cfg, tok)
    batch = collator([ds[i] for i in range(6)])
    rng = np.random.default_rng(0)
    B, N, L = batch.passage_ids.shape
    layers, heads = 4, 2
    logits = rng.normal(size=(B, layers, heads, N * L)).astype(np.float32)
    period_id = tok.encode(".", add_special=False)[0]
    return tok, cfg, ds, batch, logits, period_id


@pytest.mark.parametrize("style", ["mean", "max", "21mean"])
@pytest.mark.parametrize("last_half", [False, True])
def test_aggregation_matches_reference_walk(batch_and_logits, style, last_half):
    tok, data_cfg, ds, batch, logits, period_id = batch_and_logits
    cfg = AttentionSignalConfig(attention_score_style=style,
                                use_last_half_layer_attention=last_half,
                                n_context=3)
    ours = aggregate_fact_scores(logits, batch.passage_mask, batch.fact_spans, cfg)
    oracle = reference_walk_oracle(
        logits, batch.passage_ids, batch.passage_mask, period_id,
        3, style, last_half,
    )
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)


def test_missing_fact_padding():
    cfg = AttentionSignalConfig(n_context=4)
    B, layers, heads, N, L = 1, 2, 2, 2, 10
    logits = np.ones((B, layers, heads, N * L), dtype=np.float32)
    mask = np.ones((B, N, L), dtype=bool)
    spans = np.zeros((B, 4, 2), dtype=np.int32)
    spans[0, 0] = (2, 5)  # only one fact present
    out = aggregate_fact_scores(logits, mask, spans, cfg)
    assert out[0, 0] == pytest.approx((layers * heads) / (layers * heads))
    np.testing.assert_allclose(out[0, 1:], -5.0 / (layers * heads), rtol=1e-6)


def test_ans_attention_bonus_and_softmax():
    examples = [{
        "answer": {"meow": 1.0},
        "fact": [{"sentence": "cat says meow."}, {"sentence": "dog says woof."}],
    }]
    scores = np.array([[0.1, 0.1]], dtype=np.float32)
    plain = apply_ans_attention_bonus(scores, examples, 2, ans_attention=False)
    np.testing.assert_allclose(plain.sum(-1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(plain[0, 0], 0.5, rtol=1e-5)

    boosted = apply_ans_attention_bonus(scores, examples, 2, ans_attention=True)
    assert boosted[0, 0] > boosted[0, 1]  # answer-bearing fact gets the bonus
    np.testing.assert_allclose(boosted.sum(-1), 1.0, rtol=1e-6)


def test_attach_scores():
    examples = [{"fact": [{"sentence": "a."}, {"sentence": "b."}]}]
    attach_scores_to_examples(examples, np.array([[0.7, 0.3]]), 2)
    assert examples[0]["fact"][0]["score"] == pytest.approx(0.7)


@pytest.mark.parametrize("style", ["mean", "max", "21mean"])
@pytest.mark.parametrize("last_half", [False, True])
def test_device_aggregation_matches_numpy(batch_and_logits, style, last_half):
    import jax.numpy as jnp

    from lako_tpu.signal import aggregate_fact_scores_device

    tok, data_cfg, ds, batch, logits, period_id = batch_and_logits
    cfg = AttentionSignalConfig(attention_score_style=style,
                                use_last_half_layer_attention=last_half,
                                n_context=3)
    host = aggregate_fact_scores(logits, batch.passage_mask, batch.fact_spans, cfg)
    dev = aggregate_fact_scores_device(
        jnp.asarray(logits), jnp.asarray(batch.passage_mask),
        jnp.asarray(batch.fact_spans), cfg)
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-5, atol=1e-6)


def test_generate_and_score_fn():
    import jax
    import jax.numpy as jnp

    from lako_tpu.core.config import T5Config
    from lako_tpu.models.t5 import FiDT5
    from lako_tpu.models.t5.decode import make_generate_and_score_fn, make_generate_fn

    tok = make_tokenizer()
    dcfg = ReaderDataConfig(n_context=3, text_maxlength=24, answer_maxlength=4,
                            stream=2)
    ds = ReaderDataset(make_examples(4, 3, 11), dcfg)
    batch = ReaderCollator(dcfg, tok)([ds[i] for i in range(4)])
    t5 = T5Config(vocab_size=tok.vocab_size, d_model=32, d_kv=8, d_ff=64,
                  num_layers=2, num_decoder_layers=2, num_heads=2,
                  relative_attention_num_buckets=8, dropout_rate=0.0)
    model = FiDT5(t5)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch.passage_ids),
                        jnp.asarray(batch.passage_mask),
                        jnp.zeros((4, 4), jnp.int32))["params"]
    scfg = AttentionSignalConfig(n_context=3)
    fn = make_generate_and_score_fn(model, scfg, max_length=4)
    tokens, scores = fn(params, jnp.asarray(batch.passage_ids),
                        jnp.asarray(batch.passage_mask),
                        jnp.asarray(batch.fact_spans))
    assert scores.shape == (4, 3)
    # equals the two-stage host path
    gen = make_generate_fn(model, max_length=4, collect_cross_scores=True)
    t2, xl = gen(params, jnp.asarray(batch.passage_ids),
                 jnp.asarray(batch.passage_mask))
    host = aggregate_fact_scores(np.asarray(xl), batch.passage_mask,
                                 batch.fact_spans, scfg)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(scores), host, rtol=1e-4, atol=1e-5)


def test_question_passage_score():
    from lako_tpu.signal.aggregate import question_passage_score

    B, layers, heads, N, L = 2, 2, 2, 2, 10
    logits = np.ones((B, layers, heads, N * L), dtype=np.float32)
    mask = np.ones((B, N, L), dtype=bool)
    spans = np.array([[2, 6], [0, 0]], dtype=np.int32)
    cfg = AttentionSignalConfig(attention_score_style="mean")
    out = question_passage_score(logits, mask, spans, cfg)
    assert out[0] == pytest.approx(1.0)  # mean of summed ones / (layers*heads)
    assert out[1] == 0.0  # empty span
