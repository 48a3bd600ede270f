"""Predicate / language kernels vs reference goldens."""

from raydoc.kernels import lang, noise


def test_noise_predicates(golden_predicates):
    for case in golden_predicates:
        line, conf = case["line"], case["confidence"]
        assert noise.is_page_number(line) == case["is_page_number"], line
        assert noise.is_watermark(line) == case["is_watermark"], line
        assert noise.is_artifact(line, conf) == case["is_artifact"], (line, conf)
        assert noise.is_garbled(line) == case["is_garbled"], line


def test_language_detection(golden_language):
    for case in golden_language:
        got = lang.detect_language(case["input"])
        assert got == case["result"], case["input"][:40]


def test_language_of_turns_empty():
    assert lang.detect_language_of_turns([])["method"] == "no_pages"
    out = lang.detect_language_of_turns(
        ["The cat sat on the mat and it was good."] * 7)
    assert out["language"] == "en"
