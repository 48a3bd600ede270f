"""Golden-equality tests for the OpenRouter / RapidOCR validator variant
ports (openrouter_validator.py, rapidocr_validator.py) — expectations
vendored from the read-only reference (sets normalized to sorted lists)."""

import json
from pathlib import Path

from raydoc.kernels.validator_openrouter import validate_openrouter_output
from raydoc.kernels.validator_rapidocr import validate_rapidocr_output

GOLDEN = json.loads(
    (Path(__file__).parent / "goldens" / "validator_variants.json").read_text())


def _norm(o):
    if isinstance(o, dict):
        return {k: _norm(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_norm(v) for v in o]
    if isinstance(o, set):
        return sorted(_norm(v) for v in o)
    return o


def test_openrouter_validator_matches_reference():
    for case in GOLDEN["openrouter"]:
        got = _norm(validate_openrouter_output(*case["args"]))
        assert got == case["report"], case["args"][0][:60]


def test_rapidocr_validator_matches_reference():
    for case in GOLDEN["rapidocr"]:
        got = _norm(validate_rapidocr_output(*case["args"]))
        assert got == case["report"], case["args"][0][:60]
