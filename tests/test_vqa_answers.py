from lako_tpu.text.vqa_answers import (
    compute_soft_labels,
    create_ans2label,
    filter_answers,
    get_score,
    preprocess_answer,
    process_digit_article,
    process_punctuation,
)


def test_get_score():
    assert get_score(0) == 0.0
    assert get_score(1) == 0.3
    assert get_score(2) == 0.6
    assert get_score(3) == 0.9
    assert get_score(4) == 1.0
    assert get_score(10) == 1.0


def test_preprocess_answer():
    assert preprocess_answer("Two") == "2"
    assert preprocess_answer("a dog") == "dog"
    assert preprocess_answer("dont") == "don't"
    assert preprocess_answer("surf-board") == "surf board"
    assert preprocess_answer("1,000") == "1000"


def test_punctuation_space_rule():
    # punct adjacent to space is deleted; embedded punct becomes a space
    assert process_punctuation("hello , world") == "hello  world"
    assert process_punctuation("semi;colon") == "semi colon"


def test_digit_article():
    assert process_digit_article("The Three Dogs") == "3 dogs"
    assert process_digit_article("ten") == "10"


def _entry(qid, answers, mc=None):
    return {
        "question_id": qid,
        "answers": [{"answer": a} for a in answers],
        "multiple_choice_answer": mc or answers[0],
        "answer_type": "other",
        "image_id": f"img{qid}",
        "question_type": "what",
    }


def test_filter_and_ans2label():
    dset = [
        _entry(1, ["cat", "cat", "dog"]),
        _entry(2, ["cat"]),
        _entry(3, ["dog"]),
        _entry(4, ["bird"]),
    ]
    occ = filter_answers(dset, "okvqa", min_occurence=2)
    assert set(occ) == {"cat", "dog"}
    ans2label, label2ans = create_ans2label(dset, "okvqa", 2)
    assert set(ans2label) == {"cat", "dog"}
    assert [ans2label[a] for a in label2ans] == list(range(len(label2ans)))


def test_soft_labels():
    answers = [{"answer": "cat"}] * 3 + [{"answer": "dog"}] * 1 + [{"answer": "emu"}]
    labels = compute_soft_labels(answers, {"cat": 0, "dog": 1})
    assert labels == {"cat": 0.9, "dog": 0.3}
