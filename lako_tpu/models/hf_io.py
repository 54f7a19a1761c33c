"""Load HF ``save_pretrained`` checkpoint directories from disk.

Day-one readiness for the EM-parity run (BASELINE.json): when real pretrained
T5/BERT weights appear, the CLI warm-start path must consume the directory
format ``save_pretrained`` writes — ``config.json`` plus either a single
``model.safetensors``, sharded ``model-XXXXX-of-XXXXX.safetensors`` files with
a ``model.safetensors.index.json``, or legacy ``pytorch_model.bin`` (single or
sharded). The reference loads these via transformers ``from_pretrained``
(train_reader.py:231, test_reader.py:172); here the tensor files are read
directly (numpy end to end — no torch needed for safetensors) and mapped with
:mod:`lako_tpu.models.t5.convert` / :mod:`lako_tpu.models.bert.convert`.
"""

from __future__ import annotations

import json
from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, Tuple

import numpy as np

_SAFETENSORS_SINGLE = "model.safetensors"
_SAFETENSORS_INDEX = "model.safetensors.index.json"
_BIN_SINGLE = "pytorch_model.bin"
_BIN_INDEX = "pytorch_model.bin.index.json"


def is_hf_checkpoint_dir(path: str) -> bool:
    p = Path(path)
    if not (p / "config.json").exists():
        return False
    return any((p / f).exists() for f in
               (_SAFETENSORS_SINGLE, _SAFETENSORS_INDEX, _BIN_SINGLE, _BIN_INDEX))


def _load_safetensors_file(path: Path) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return dict(load_file(str(path)))


def _load_bin_file(path: Path) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def load_hf_state_dict(dir_path: str) -> Dict[str, np.ndarray]:
    """Read all weights of a save_pretrained directory into numpy arrays.

    Handles single-file and sharded layouts for both safetensors and torch
    ``pytorch_model.bin`` serialization.
    """
    p = Path(dir_path)
    if (p / _SAFETENSORS_SINGLE).exists():
        return _load_safetensors_file(p / _SAFETENSORS_SINGLE)
    if (p / _SAFETENSORS_INDEX).exists():
        index = json.loads((p / _SAFETENSORS_INDEX).read_text())
        out: Dict[str, np.ndarray] = {}
        for shard in sorted(set(index["weight_map"].values())):
            out.update(_load_safetensors_file(p / shard))
        return out
    if (p / _BIN_SINGLE).exists():
        return _load_bin_file(p / _BIN_SINGLE)
    if (p / _BIN_INDEX).exists():
        index = json.loads((p / _BIN_INDEX).read_text())
        out = {}
        for shard in sorted(set(index["weight_map"].values())):
            out.update(_load_bin_file(p / shard))
        return out
    raise FileNotFoundError(f"no model weights found under {dir_path}")


def _config_ns(dir_path: str) -> SimpleNamespace:
    cfg = json.loads((Path(dir_path) / "config.json").read_text())
    return SimpleNamespace(**cfg)


_T5_CONFIG_DEFAULTS = dict(
    feed_forward_proj="relu", dense_act_fn="", tie_word_embeddings=True,
    relative_attention_max_distance=128, pad_token_id=0, eos_token_id=1,
    decoder_start_token_id=0, num_decoder_layers=None,
)

_BERT_CONFIG_DEFAULTS = dict(
    hidden_act="gelu", hidden_dropout_prob=0.1,
    attention_probs_dropout_prob=0.1, max_position_embeddings=512,
    type_vocab_size=2, layer_norm_eps=1e-12, pad_token_id=0,
)


def load_hf_t5(dir_path: str, fid: bool = True) -> Tuple[Any, Dict[str, Any]]:
    """(T5Config, FiDT5|T5 param tree) from a save_pretrained directory."""
    from lako_tpu.models.t5.convert import (
        fid_params_from_torch_t5,
        params_from_torch_t5,
        t5_config_from_hf,
    )

    ns = _config_ns(dir_path)
    for k, v in _T5_CONFIG_DEFAULTS.items():
        if not hasattr(ns, k) or getattr(ns, k) is None:
            setattr(ns, k, v)
    if ns.num_decoder_layers in (None, 0):
        ns.num_decoder_layers = ns.num_layers
    cfg = t5_config_from_hf(ns)
    sd = load_hf_state_dict(dir_path)
    # tied checkpoints may omit lm_head / store encoder.embed_tokens aliases
    if "shared.weight" not in sd and "encoder.embed_tokens.weight" in sd:
        sd["shared.weight"] = sd["encoder.embed_tokens.weight"]
    convert = fid_params_from_torch_t5 if fid else params_from_torch_t5
    return cfg, convert(sd, cfg)


def load_hf_bert(dir_path: str, prefix: str = "") -> Tuple[Any, Dict[str, Any]]:
    """(BertConfig, BertEncoder param tree) from a save_pretrained directory.

    ``prefix`` strips a wrapper namespace (e.g. ``"bert."`` for checkpoints
    saved from BertForPreTraining-style models)."""
    from lako_tpu.models.bert.convert import bert_config_from_hf, params_from_torch_bert

    ns = _config_ns(dir_path)
    for k, v in _BERT_CONFIG_DEFAULTS.items():
        if not hasattr(ns, k) or getattr(ns, k) is None:
            setattr(ns, k, v)
    cfg = bert_config_from_hf(ns)
    sd = load_hf_state_dict(dir_path)
    if prefix == "" and not any(k.startswith("embeddings.") for k in sd):
        if any(k.startswith("bert.") for k in sd):
            prefix = "bert."
    return cfg, params_from_torch_bert(sd, cfg, prefix=prefix)
