import numpy as np
import pytest

from lako_tpu.data.hypernym import (
    HypernymDataset,
    find_sub_list,
    substitute_hypernym,
)
from tests.fixtures import make_tokenizer


class TestHypernym:
    def test_find_sub_list(self):
        assert find_sub_list([3, 4], [1, 2, 3, 4, 5]) == (2, 3)
        assert find_sub_list([9], [1, 2]) is None
        assert find_sub_list([1, 2], [1, 3, 1, 2]) == (2, 3)

    def test_substitute(self):
        assert substitute_hypernym("what animal is this?", "animal", "cat") \
            == "what cat is this?"
        # case-insensitive
        assert substitute_hypernym("What Animal?", "animal", "cat") == "What cat?"

    def test_dataset_build_and_batch(self):
        tok = make_tokenizer(style="bert")
        rows = [
            {"question": "what sound does the cat make?", "hypernym": "cat",
             "hyponym": "cat", "detections": ["dog", "cat"],
             "hypo_scores": {"cat": 0.9}},
            {"question": "no hyponym here", "hypernym": "dog",
             "hyponym": "frog", "detections": ["cat"]},  # dropped
        ]
        ds = HypernymDataset(rows, tok)
        assert len(ds) == 1
        ex = ds[0]
        assert ex["label"] == 1  # "cat" is detection index 1
        assert ex["hyponym_scores"][1] == pytest.approx(0.9)
        assert ex["hyponym_scores"][0] == pytest.approx(0.5)  # default
        i, j = ex["hypernym_span"]
        assert 0 < i <= j
        batch = ds.batch([0])
        assert batch["question_ids"].shape == (1, 32)
        assert batch["hyponym_ids"].shape == (1, 32, 8)


@pytest.mark.slow
def test_lxmert_adapter_runs():
    torch = pytest.importorskip("torch")
    from lako_tpu.models.lxmert_adapter import LxmertVQAAdapter

    tok = make_tokenizer(style="bert")
    torch.manual_seed(0)
    adapter = LxmertVQAAdapter(
        num_labels=7,
        tokenizer=tok,
        config_overrides=dict(
            vocab_size=tok.vocab_size + 10, hidden_size=32, num_attention_heads=2,
            l_layers=1, x_layers=1, r_layers=1, visual_feat_dim=16,
            intermediate_size=64, num_qa_labels=7,
        ),
        max_length=16,
    )
    feats = np.random.default_rng(0).normal(size=(2, 4, 16)).astype(np.float32)
    boxes = np.random.default_rng(1).random(size=(2, 4, 4)).astype(np.float32)
    logits = adapter(feats, boxes, ["what sound does the cat make?"] * 2)
    assert logits.shape == (2, 7)
    # fact-as-second-segment path
    logits2 = adapter(feats, boxes, ["what sound?"] * 2, facts=["cat says meow."] * 2)
    assert logits2.shape == (2, 7)
