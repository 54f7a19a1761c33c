from lako_tpu.text.normalize import normalize_answer, STOP_WORDS
from lako_tpu.text.metrics import (
    exact_match_score,
    includ_match_score,
    ems,
    includ_ems,
    stem_ems,
    has_answer,
    calculate_matches,
    count_inversions,
    ranking_stats,
)
from lako_tpu.text.simple_tokenizer import SimpleTokenizer

__all__ = [
    "normalize_answer",
    "STOP_WORDS",
    "exact_match_score",
    "includ_match_score",
    "ems",
    "includ_ems",
    "stem_ems",
    "has_answer",
    "calculate_matches",
    "count_inversions",
    "ranking_stats",
    "SimpleTokenizer",
]
