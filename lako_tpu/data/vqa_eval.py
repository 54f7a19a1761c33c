"""VQA soft-accuracy evaluation + result dumps.

Reference: data_process/data/vqa_data.py:219-270 — accuracy is the sum of the
gold label's soft score for each predicted answer, and result dumps follow the
VQA-server submission schema.
"""

from __future__ import annotations

import json
from typing import Dict, Mapping


class VQAEvaluator:
    def __init__(self, id2datum: Mapping):
        """id2datum: question_id → {label: {answer: score}, sent, img_id, ...}."""
        self.id2datum = id2datum

    def evaluate(self, quesid2ans: Dict) -> float:
        score = 0.0
        for quesid, ans in quesid2ans.items():
            label = self.id2datum[quesid]["label"]
            if ans in label:
                score += label[ans]
        return score / max(len(quesid2ans), 1)

    def dump_result(self, quesid2ans: Dict, path: str, detail: bool = False) -> None:
        result = []
        for ques_id, ans in quesid2ans.items():
            row = {"question_id": ques_id, "answer": ans}
            if detail:
                datum = self.id2datum[ques_id]
                row["question"] = datum["sent"]
                row["img_id"] = datum["img_id"]
            result.append(row)
        with open(path, "w") as f:
            json.dump(result, f, indent=4, sort_keys=True)
