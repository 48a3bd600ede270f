"""Golden-equality test of the MarkdownValidator port (validator.py:12-313)
— expectations vendored from the read-only reference via the script in the
golden file's generation (see tools/make_goldens.py pattern)."""

import json
from pathlib import Path

from raydoc.kernels.validator_basic import MarkdownValidator

GOLDEN = json.loads(
    (Path(__file__).parent / "goldens" / "validator_basic.json").read_text())


def test_validator_basic_matches_reference_goldens():
    for case in GOLDEN:
        got = MarkdownValidator().get_validation_report(
            case["input"], case["method"], case["confidence"])
        assert got == case["report"], case["input"][:50]
