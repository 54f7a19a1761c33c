"""Beam search parity vs HF torch generate (num_beams>1)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lako_tpu.models.t5 import FiDT5
from lako_tpu.models.t5.beam import beam_generate
from lako_tpu.models.t5.convert import fid_params_from_torch_t5, t5_config_from_hf


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(7)
    hf_cfg = transformers.T5Config(
        vocab_size=100, d_model=64, d_kv=16, d_ff=128,
        num_layers=2, num_decoder_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=32,
        dropout_rate=0.0, decoder_start_token_id=0,
    )
    model = transformers.T5ForConditionalGeneration(hf_cfg)
    model.eval()
    cfg = t5_config_from_hf(hf_cfg)
    params = fid_params_from_torch_t5(model.state_dict(), cfg)
    return model, cfg, params


@pytest.mark.parametrize("num_beams", [2, 4])
def test_beam_matches_hf(setup, num_beams):
    model, cfg, params = setup
    fid = FiDT5(cfg)
    rs = np.random.default_rng(21)
    B, L = 4, 10
    ids = rs.integers(2, 100, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), dtype=bool)
    max_length = 10

    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            max_length=max_length, num_beams=num_beams, do_sample=False,
            early_stopping=False, length_penalty=1.0,
        ).numpy()

    out = np.asarray(beam_generate(
        fid, params, jnp.asarray(ids)[:, None, :], jnp.asarray(mask)[:, None, :],
        max_length=max_length, num_beams=num_beams,
    ))

    def upto_eos(seq):
        res = []
        for t in seq:
            res.append(int(t))
            if t == cfg.eos_token_id:
                break
        return res

    for b in range(B):
        assert upto_eos(list(out[b])) == upto_eos(list(ref[b][1:])), \
            (b, out[b], ref[b])


def test_beam1_equals_greedy(setup):
    from lako_tpu.models.t5.decode import greedy_generate

    model, cfg, params = setup
    fid = FiDT5(cfg)
    rs = np.random.default_rng(3)
    ids = rs.integers(2, 100, size=(2, 2, 8)).astype(np.int32)
    mask = np.ones((2, 2, 8), dtype=bool)
    g, _ = greedy_generate(fid, params, jnp.asarray(ids), jnp.asarray(mask),
                           max_length=8)
    b = beam_generate(fid, params, jnp.asarray(ids), jnp.asarray(mask),
                      max_length=8, num_beams=1)
    gt = np.asarray(g)
    bt = np.asarray(b)
    for i in range(2):
        def upto_eos(seq):
            res = []
            for t in seq:
                res.append(int(t))
                if t == cfg.eos_token_id:
                    break
            return res
        assert upto_eos(list(gt[i])) == upto_eos(list(bt[i]))
