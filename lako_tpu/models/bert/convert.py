"""HF BertModel state_dict → lako_tpu BertEncoder param pytree."""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from lako_tpu.core.config import BertConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _ln(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def params_from_torch_bert(state_dict: Mapping, config: BertConfig,
                           prefix: str = "") -> Dict[str, Any]:
    """Convert an HF ``BertModel`` state_dict (optionally under ``prefix``, e.g.
    ``"bert."``) to our BertEncoder param tree."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items()} if prefix else dict(state_dict)

    params: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": _np(sd["embeddings.word_embeddings.weight"])},
            "position_embeddings": {"embedding": _np(sd["embeddings.position_embeddings.weight"])},
            "token_type_embeddings": {"embedding": _np(sd["embeddings.token_type_embeddings.weight"])},
            "layer_norm": _ln(sd, "embeddings.LayerNorm"),
        }
    }
    for i in range(config.num_hidden_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": _linear(sd, f"{p}.attention.self.query"),
                "key": _linear(sd, f"{p}.attention.self.key"),
                "value": _linear(sd, f"{p}.attention.self.value"),
                "out": _linear(sd, f"{p}.attention.output.dense"),
                "out_layer_norm": _ln(sd, f"{p}.attention.output.LayerNorm"),
            },
            "intermediate": _linear(sd, f"{p}.intermediate.dense"),
            "output": _linear(sd, f"{p}.output.dense"),
            "output_layer_norm": _ln(sd, f"{p}.output.LayerNorm"),
        }
    return params


def retriever_params_from_torch_bert(state_dict: Mapping, retriever_config,
                                     rng_seed: int = 0) -> Dict[str, Any]:
    """Build :class:`lako_tpu.models.retriever.Retriever` params from an HF
    ``BertModel`` state_dict: BERT backbone converted, projection head(s)
    freshly initialized (the reference's ``initialize_wBERT=True`` path,
    src/model.py:380-394 — pretrained BERT + new proj/LayerNorm)."""
    import numpy as np

    cfg = retriever_config
    rng = np.random.default_rng(rng_seed)
    hidden, dim = cfg.bert.hidden_size, cfg.indexing_dimension
    params: Dict[str, Any] = {
        "bert": params_from_torch_bert(state_dict, cfg.bert)
    }

    def _head():
        return {
            "kernel": rng.normal(scale=0.02, size=(hidden, dim)).astype(np.float32),
            "bias": np.zeros(dim, np.float32),
        }

    def _norm():
        return {"scale": np.ones(dim, np.float32), "bias": np.zeros(dim, np.float32)}

    if cfg.projection:
        params["proj"] = _head()
        params["norm"] = _norm()
    elif cfg.asymmetric:
        params["proj_iq"], params["proj_fact"] = _head(), _head()
        params["norm_iq"], params["norm_fact"] = _norm(), _norm()
    return params


def bert_config_from_hf(hf_config) -> BertConfig:
    return BertConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        hidden_act=hf_config.hidden_act,
        hidden_dropout_prob=hf_config.hidden_dropout_prob,
        attention_probs_dropout_prob=hf_config.attention_probs_dropout_prob,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        pad_token_id=hf_config.pad_token_id,
    )
