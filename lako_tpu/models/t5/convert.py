"""HF T5 checkpoint → lako_tpu param pytree conversion.

Replaces the reference's ``load_t5(state_dict)`` path (src/model.py:79-82): instead
of unwrapping/rewrapping module objects, we map tensor names. Works from a torch
``state_dict`` (loaded on CPU) or any mapping of numpy arrays; no hub access
required — pass a locally loaded checkpoint.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from lako_tpu.core.config import T5Config


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _attn(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {
        "q": {"kernel": _np(sd[f"{prefix}.q.weight"]).T},
        "k": {"kernel": _np(sd[f"{prefix}.k.weight"]).T},
        "v": {"kernel": _np(sd[f"{prefix}.v.weight"]).T},
        "o": {"kernel": _np(sd[f"{prefix}.o.weight"]).T},
    }


def _mlp(sd: Mapping, prefix: str, gated: bool) -> Dict[str, Any]:
    out = {"wo": {"kernel": _np(sd[f"{prefix}.wo.weight"]).T}}
    if gated:
        out["wi_0"] = {"kernel": _np(sd[f"{prefix}.wi_0.weight"]).T}
        out["wi_1"] = {"kernel": _np(sd[f"{prefix}.wi_1.weight"]).T}
    else:
        out["wi"] = {"kernel": _np(sd[f"{prefix}.wi.weight"]).T}
    return out


def _ln(sd: Mapping, key: str) -> Dict[str, Any]:
    return {"weight": _np(sd[key])}


def params_from_torch_t5(state_dict: Mapping, config: T5Config) -> Dict[str, Any]:
    """Build the param tree for :class:`lako_tpu.models.t5.T5` from an HF T5
    ``state_dict`` (e.g. ``T5ForConditionalGeneration.state_dict()``)."""
    sd = state_dict
    gated = config.is_gated_act

    encoder: Dict[str, Any] = {
        "relpos": {"rel_embedding": _np(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        )},
        "final_ln": _ln(sd, "encoder.final_layer_norm.weight"),
    }
    for i in range(config.num_layers):
        p = f"encoder.block.{i}"
        encoder[f"block_{i}"] = {
            "ln_attn": _ln(sd, f"{p}.layer.0.layer_norm.weight"),
            "self_attn": _attn(sd, f"{p}.layer.0.SelfAttention"),
            "ln_mlp": _ln(sd, f"{p}.layer.1.layer_norm.weight"),
            "mlp": _mlp(sd, f"{p}.layer.1.DenseReluDense", gated),
        }

    decoder: Dict[str, Any] = {
        "relpos": {"rel_embedding": _np(
            sd["decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        )},
        "final_ln": _ln(sd, "decoder.final_layer_norm.weight"),
    }
    for i in range(config.num_decoder_layers):
        p = f"decoder.block.{i}"
        decoder[f"block_{i}"] = {
            "ln_self": _ln(sd, f"{p}.layer.0.layer_norm.weight"),
            "self_attn": _attn(sd, f"{p}.layer.0.SelfAttention"),
            "ln_cross": _ln(sd, f"{p}.layer.1.layer_norm.weight"),
            "cross_attn": _attn(sd, f"{p}.layer.1.EncDecAttention"),
            "ln_mlp": _ln(sd, f"{p}.layer.2.layer_norm.weight"),
            "mlp": _mlp(sd, f"{p}.layer.2.DenseReluDense", gated),
        }

    params: Dict[str, Any] = {
        "shared": {"embedding": _np(sd["shared.weight"])},
        "encoder": encoder,
        "decoder": decoder,
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = {"kernel": _np(sd["lm_head.weight"]).T}
    return params


def fid_params_from_torch_t5(state_dict: Mapping, config: T5Config) -> Dict[str, Any]:
    """Param tree for :class:`FiDT5` (same weights, nested under ``t5``)."""
    return {"t5": params_from_torch_t5(state_dict, config)}


def t5_config_from_hf(hf_config) -> T5Config:
    """Translate a ``transformers.T5Config`` into ours."""
    ff = getattr(hf_config, "feed_forward_proj", "relu")
    if ff == "gated-gelu":
        ff = "gated-gelu_new" if getattr(hf_config, "dense_act_fn", "") == "gelu_new" else "gated-gelu"
    return T5Config(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.d_model,
        d_kv=hf_config.d_kv,
        d_ff=hf_config.d_ff,
        num_layers=hf_config.num_layers,
        num_decoder_layers=hf_config.num_decoder_layers,
        num_heads=hf_config.num_heads,
        relative_attention_num_buckets=hf_config.relative_attention_num_buckets,
        relative_attention_max_distance=getattr(hf_config, "relative_attention_max_distance", 128),
        dropout_rate=hf_config.dropout_rate,
        layer_norm_epsilon=hf_config.layer_norm_epsilon,
        feed_forward_proj=ff,
        tie_word_embeddings=hf_config.tie_word_embeddings,
        pad_token_id=hf_config.pad_token_id,
        eos_token_id=hf_config.eos_token_id,
        decoder_start_token_id=hf_config.decoder_start_token_id,
    )
