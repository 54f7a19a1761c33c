"""TPU-native LXMERT VQA runner — drop-in for models/lxmert_adapter.py.

Same call surface as the reference's wrapper (data_process/model/lxmert.py:
28-84): (feats, boxes, sentences[, facts]) → answer logits, with the
fact-as-first-segment pairing (lxmert.py:48-57) and optional cross-attention
outputs — but the forward runs as a jitted flax model on device instead of
host torch. Weights come from ``load_lxmert_pretrained`` (a local HF
save_pretrained directory) or random init via ``LxmertForQA.init``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lako_tpu.core.config import LxmertConfig
from lako_tpu.models.lxmert.model import LxmertForQA


class LxmertVQARunner:
    def __init__(self, cfg: LxmertConfig, params, num_labels: int,
                 tokenizer, max_length: int = 50,
                 output_attentions: bool = False,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.model = LxmertForQA(cfg, num_labels=num_labels, dtype=dtype)
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.output_attentions = output_attentions
        self._fwd = jax.jit(
            lambda p, ids, feats, boxes, mask, types: self.model.apply(
                {"params": p}, ids, feats, boxes, mask, types,
                output_attentions=output_attentions))

    @classmethod
    def from_pretrained(cls, path: str, tokenizer, num_labels=None, **kw):
        from lako_tpu.models.lxmert.convert import load_lxmert_pretrained

        cfg, params, n = load_lxmert_pretrained(path)
        return cls(cfg, params, num_labels or n, tokenizer, **kw)

    def _encode(self, sents: Sequence[str], facts: Optional[Sequence[str]]):
        B, L = len(sents), self.max_length
        ids = np.zeros((B, L), dtype=np.int32)
        mask = np.zeros((B, L), dtype=bool)
        types = np.zeros((B, L), dtype=np.int32)
        for i, sent in enumerate(sents):
            if facts is not None:
                # HF pair encoding truncates longest_first (advisor r2):
                # trim one token from the longer CONTENT segment until the
                # pair plus [CLS]/[SEP]/[SEP] fits — a naive concat-then-clip
                # can drop the entire question behind a long fact.
                ca = self.tokenizer.encode(facts[i], add_special=False)
                cb = self.tokenizer.encode(sent, add_special=False)
                budget = max(L - 3, 0)
                while len(ca) + len(cb) > budget:
                    # tie → trim the second segment, as HF truncate_sequences
                    if len(ca) > len(cb) and ca:
                        ca = ca[:-1]
                    elif cb:
                        cb = cb[:-1]
                    elif ca:
                        ca = ca[:-1]
                    else:
                        break
                a = [self.tokenizer.cls_id] + ca + [self.tokenizer.sep_id]
                b = cb + [self.tokenizer.sep_id]
                toks = (a + b)[:L]
                seg = ([0] * len(a) + [1] * len(b))[:L]
            else:
                toks = self.tokenizer.encode(sent, add_special=True)[:L]
                seg = [0] * len(toks)
            ids[i, :len(toks)] = toks
            mask[i, :len(toks)] = True
            types[i, :len(seg)] = seg
        return ids, mask, types

    def __call__(self, feats, boxes, sents: Sequence[str],
                 facts: Optional[Sequence[str]] = None):
        """feats (B,n,visual_feat_dim), boxes (B,n,4) normalized → logits
        (B, num_labels) numpy (+ per-X-layer cross probs if configured)."""
        ids, mask, types = self._encode(sents, facts)
        out = self._fwd(self.params, jnp.asarray(ids),
                        jnp.asarray(np.asarray(feats), jnp.float32),
                        jnp.asarray(np.asarray(boxes), jnp.float32),
                        jnp.asarray(mask), jnp.asarray(types))
        if self.output_attentions:
            logits, cross = out
            return np.asarray(logits), [np.asarray(c) for c in cross]
        return np.asarray(out)
