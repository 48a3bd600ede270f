"""Byte-equality of textnorm kernels vs reference goldens (cleaner.py /
noise_filter.py string functions)."""

from raydoc.kernels import textnorm


def test_hyphen_strict(golden_textnorm):
    for case in golden_textnorm:
        assert textnorm.merge_hyphens_strict(case["input"]) == case["hyphen_strict"]


def test_hyphen_loose(golden_textnorm):
    for case in golden_textnorm:
        assert textnorm.merge_hyphens_loose(case["input"]) == case["hyphen_loose"]


def test_defragment(golden_textnorm):
    for case in golden_textnorm:
        assert textnorm.defragment(case["input"]) == case["defragment"]


def test_normalize_markdown(golden_textnorm):
    for case in golden_textnorm:
        assert textnorm.normalize_markdown(case["input"]) == case["normalize_markdown"]


def test_clean_artifact_lines(golden_textnorm):
    for case in golden_textnorm:
        assert textnorm.clean_artifact_lines(case["input"]) == case["clean_artifacts"]


def test_mask_digits():
    assert textnorm.mask_digits(" Page 3 of 12 ") == "Page [NUM] of [NUM]"
    assert textnorm.mask_digits("v1.2") == "v1.[NUM]"  # \b excludes digits glued to words
    assert textnorm.mask_digits("abc") == "abc"
