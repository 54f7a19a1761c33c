"""Import HF torch LXMERT weights into the flax LxmertForQA param tree.

Handles both a live ``transformers.LxmertForQuestionAnswering`` /
``LxmertModel`` state_dict and a ``save_pretrained`` directory (config.json +
pytorch_model.bin / model.safetensors), mirroring models/t5/convert.py.
Reference wrapper being replaced: data_process/model/lxmert.py:6-26.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from lako_tpu.core.config import LxmertConfig


def _dense(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    # torch Linear stores (out, in); flax Dense kernels are (in, out)
    return {"kernel": np.asarray(sd[f"{prefix}.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _ln(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _att(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {"query": _dense(sd, f"{prefix}.query"),
            "key": _dense(sd, f"{prefix}.key"),
            "value": _dense(sd, f"{prefix}.value")}


def _att_output(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {"dense": _dense(sd, f"{prefix}.dense"),
            "layer_norm": _ln(sd, f"{prefix}.LayerNorm")}


def _self_layer(sd: Mapping[str, Any], att: str, inter: str,
                out: str) -> Dict[str, Any]:
    """HF (attention, intermediate, output) triple → LxmertSelfLayer tree."""
    return {
        "attention": _att(sd, att),
        "att_output": _att_output(sd, f"{att.rsplit('.self', 1)[0]}.output"
                                  if att.endswith(".self") else f"{att}.output"),
        "ffn": {
            "intermediate": _dense(sd, f"{inter}.dense"),
            "output": _dense(sd, f"{out}.dense"),
            "layer_norm": _ln(sd, f"{out}.LayerNorm"),
        },
    }


def lxmert_params_from_state_dict(
        state_dict: Mapping[str, Any],
        cfg: LxmertConfig) -> Dict[str, Any]:
    """HF LxmertModel/LxmertForQuestionAnswering state_dict → flax params
    for LxmertForQA (without the QA head if absent)."""
    sd = {k.removeprefix("lxmert."): v for k, v in state_dict.items()}

    tree: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {
                "embedding": np.asarray(sd["embeddings.word_embeddings.weight"])},
            "position_embeddings": {
                "embedding": np.asarray(
                    sd["embeddings.position_embeddings.weight"])},
            "token_type_embeddings": {
                "embedding": np.asarray(
                    sd["embeddings.token_type_embeddings.weight"])},
            "layer_norm": _ln(sd, "embeddings.LayerNorm"),
        },
        "visual_encoder": {
            "visn_fc": _dense(sd, "encoder.visn_fc.visn_fc"),
            "visn_layer_norm": _ln(sd, "encoder.visn_fc.visn_layer_norm"),
            "box_fc": _dense(sd, "encoder.visn_fc.box_fc"),
            "box_layer_norm": _ln(sd, "encoder.visn_fc.box_layer_norm"),
        },
        "pooler": _dense(sd, "pooler.dense"),
    }
    for i in range(cfg.l_layers):
        tree[f"lang_{i}"] = _self_layer(
            sd, f"encoder.layer.{i}.attention.self",
            f"encoder.layer.{i}.intermediate", f"encoder.layer.{i}.output")
    for i in range(cfg.r_layers):
        tree[f"visn_{i}"] = _self_layer(
            sd, f"encoder.r_layers.{i}.attention.self",
            f"encoder.r_layers.{i}.intermediate",
            f"encoder.r_layers.{i}.output")
    for i in range(cfg.x_layers):
        p = f"encoder.x_layers.{i}"
        tree[f"x_{i}"] = {
            "cross_attention": _att(sd, f"{p}.visual_attention.att"),
            "cross_output": _att_output(sd, f"{p}.visual_attention.output"),
            "lang_self": {
                "attention": _att(sd, f"{p}.lang_self_att.self"),
                "att_output": _att_output(sd, f"{p}.lang_self_att.output"),
                "ffn": {"intermediate": _dense(sd, f"{p}.lang_inter.dense"),
                        "output": _dense(sd, f"{p}.lang_output.dense"),
                        "layer_norm": _ln(sd, f"{p}.lang_output.LayerNorm")},
            },
            "visn_self": {
                "attention": _att(sd, f"{p}.visn_self_att.self"),
                "att_output": _att_output(sd, f"{p}.visn_self_att.output"),
                "ffn": {"intermediate": _dense(sd, f"{p}.visn_inter.dense"),
                        "output": _dense(sd, f"{p}.visn_output.dense"),
                        "layer_norm": _ln(sd, f"{p}.visn_output.LayerNorm")},
            },
        }
    return tree


def lxmert_qa_params_from_state_dict(
        state_dict: Mapping[str, Any],
        cfg: LxmertConfig) -> Dict[str, Any]:
    """Full LxmertForQA params incl. the answer head
    (HF answer_head.logit_fc = [Dense, GeLU, LayerNorm, Dense])."""
    params = {"lxmert": lxmert_params_from_state_dict(state_dict, cfg)}
    sd = state_dict
    params["qa_dense"] = _dense(sd, "answer_head.logit_fc.0")
    params["qa_layer_norm"] = _ln(sd, "answer_head.logit_fc.2")
    params["qa_logits"] = _dense(sd, "answer_head.logit_fc.3")
    return params


def load_lxmert_pretrained(path: str) -> Tuple[LxmertConfig, Dict[str, Any],
                                               int]:
    """Load a save_pretrained directory → (config, flax params, num_labels)."""
    d = pathlib.Path(path)
    hf = json.loads((d / "config.json").read_text())
    cfg = LxmertConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        l_layers=hf["l_layers"], x_layers=hf["x_layers"],
        r_layers=hf["r_layers"], visual_feat_dim=hf["visual_feat_dim"],
        visual_pos_dim=hf["visual_pos_dim"],
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf["type_vocab_size"])
    sd = {}
    st = d / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        sd = load_file(str(st))
    else:
        import torch

        sd = {k: v.numpy() for k, v in
              torch.load(d / "pytorch_model.bin", map_location="cpu",
                         weights_only=True).items()}
    num_labels = hf.get("num_qa_labels", 0)
    if any(k.startswith("answer_head") for k in sd):
        return cfg, lxmert_qa_params_from_state_dict(sd, cfg), num_labels
    return cfg, {"lxmert": lxmert_params_from_state_dict(sd, cfg)}, num_labels
