"""Validation framework + quality gate vs reference goldens."""

from raydoc.kernels.validate import quality_gate, validate_markdown


def test_validation_reports(golden_validation):
    for case in golden_validation:
        got = validate_markdown(case["input"])
        exp = case["report"]
        for key in ("is_valid", "quality_score", "errors", "warnings", "infos",
                    "hallucination_detected", "hallucination_count", "summary"):
            assert got[key] == exp[key], key
        assert [
            {k: i[k] for k in ("severity", "category", "message", "line", "context")}
            for i in got["issues"]
        ] == exp["issues"]


def test_quality_gate(golden_validation):
    for case in golden_validation:
        rep = validate_markdown(case["input"])
        got = quality_gate(case["input"], rep)
        exp = case["gate"]
        assert got["passed"] == exp["passed"]
        assert got["failures"] == exp["failures"]
        assert got["recommendations"] == exp["recommendations"]
        assert got["suggested_action"] == exp["suggested_action"]
        assert got["quality_level"] == exp["quality_level"]
