"""Host-side LXMERT adapter for caption / answer-candidate experiments.

Reference: data_process/model/lxmert.py:6-85. NOTE: the PRIMARY LXMERT path
is now the TPU-native flax implementation in ``models/lxmert/`` (model +
weight importer + ``LxmertVQARunner`` with this same call surface, numeric
parity pinned in tests/test_lxmert.py). This torch adapter remains as an
optional host-CPU fallback for environments where only a torch checkpoint
object is at hand: same knobs — optional fact-as-second-segment input,
label-head resizing, attention outputs. Import is lazy; everything TPU-side
is independent of this module.
"""

from __future__ import annotations

from typing import Optional, Sequence


class LxmertVQAAdapter:
    def __init__(
        self,
        num_labels: Optional[int] = None,
        pretrained: Optional[str] = None,   # local path; None = random init
        tokenizer=None,                     # any BaseTokenizer-style tokenizer
        config_overrides: Optional[dict] = None,
        max_length: int = 50,
        output_attentions: bool = False,
    ):
        import torch  # noqa: F401 — host-side only
        from transformers import LxmertConfig, LxmertForQuestionAnswering

        if pretrained:
            self.model = LxmertForQuestionAnswering.from_pretrained(pretrained)
        else:
            cfg = LxmertConfig(**(config_overrides or {}))
            self.model = LxmertForQuestionAnswering(cfg)
        if num_labels is not None and self.model.num_qa_labels != num_labels:
            self.model.resize_num_qa_labels(num_labels)
        self.model.eval()
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.output_attentions = output_attentions

    def _encode(self, sents: Sequence[str], facts: Optional[Sequence[str]]):
        import numpy as np
        import torch

        B = len(sents)
        L = self.max_length
        ids = np.zeros((B, L), dtype=np.int64)
        mask = np.zeros((B, L), dtype=np.int64)
        type_ids = np.zeros((B, L), dtype=np.int64)
        for i, sent in enumerate(sents):
            if facts is not None:
                # fact as segment A, question as segment B (reference passes
                # (fact, question) pairs, lxmert.py:48-57)
                a = self.tokenizer.encode(facts[i], add_special=True)
                b = self.tokenizer.encode(sent, add_special=False) + [self.tokenizer.sep_id]
                toks = (a + b)[:L]
                seg = ([0] * len(a) + [1] * len(b))[:L]
            else:
                toks = self.tokenizer.encode(sent, add_special=True)[:L]
                seg = [0] * len(toks)
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
            type_ids[i, : len(seg)] = seg
        return (torch.tensor(ids), torch.tensor(mask), torch.tensor(type_ids))

    def __call__(self, feats, boxes, sents: Sequence[str],
                 facts: Optional[Sequence[str]] = None):
        """feats: (B, n, d) float; boxes: (B, n, 4) normalized.
        Returns logits (B, num_labels) numpy (plus attentions if configured)."""
        import numpy as np
        import torch

        ids, mask, type_ids = self._encode(sents, facts)
        with torch.no_grad():
            out = self.model(
                input_ids=ids,
                attention_mask=mask,
                visual_feats=torch.tensor(np.asarray(feats), dtype=torch.float32),
                visual_pos=torch.tensor(np.asarray(boxes), dtype=torch.float32),
                token_type_ids=type_ids,
                output_attentions=self.output_attentions,
            )
        logits = out["question_answering_score"].numpy()
        if self.output_attentions:
            return (logits, out["language_attentions"],
                    out["vision_attentions"], out["cross_encoder_attentions"])
        return logits
