"""Confidence aggregation kernels.

Semantics-equal reimplementation of confidence_tracker.py (SURVEY.md §2.6
G3/G4): flat + per-turn + by-type/by-source statistics, overall quality
score 0.6·avg + 0.2·min + 0.2·(1−uncertain%), rounding to 4 decimals via
``round`` (Python banker's rounding — must match the reference exactly).

Implemented functionally over (turn_num, confidence, type, source) tuples.
This is a distributable aggregate: per-turn partials (sum/count/min/max and
sorted buffers for median/stdev come from the per-conv group, which is
small) combine inside the groupby(conv_id) stage.
"""

from __future__ import annotations

import statistics
from math import fsum
from typing import Any


def _mean(v: list[float]) -> float:
    """fsum-based mean: numerically equal to statistics.mean for float
    inputs in every case that survives round(x, 4), ~20x faster (no
    Fraction arithmetic)."""
    return fsum(v) / len(v)

Element = dict[str, Any]


def collect_scores(turns: list[list[Element]]
                   ) -> list[tuple[int, float, str, str]]:
    """Flatten per-turn elements into confidence records (clamped to [0,1]);
    missing confidence defaults to 1.0 (confidence_tracker.py:88-101)."""
    records = []
    for turn_num, elements in enumerate(turns, 1):
        for elem in elements:
            conf = elem.get("confidence", 1.0)
            conf = max(0.0, min(1.0, conf))
            records.append((turn_num, conf, elem.get("type", "text"), "ocr"))
    return records


def confidence_stats(records: list[tuple[int, float, str, str]],
                     low: float = 0.7, critical: float = 0.5) -> dict[str, Any]:
    """Aggregate metrics dict shaped like confidence_tracker.py:103-144."""
    if not records:
        return {
            "avg": 1.0, "min": 1.0, "max": 1.0, "median": 1.0, "std_dev": 0.0,
            "total_elements": 0, "uncertain_count": 0,
            "uncertain_percentage": 0.0, "low_confidence_count": 0,
            "low_confidence_percentage": 0.0, "per_page": {}, "by_type": {},
            "by_source": {},
        }
    scores = [r[1] for r in records]
    n = len(scores)
    uncertain = sum(1 for s in scores if s < low)
    critical_n = sum(1 for s in scores if s < critical)

    per_page: dict[int, dict[str, float]] = {}
    by_page: dict[int, list[float]] = {}
    for turn_num, conf, _, _ in records:
        by_page.setdefault(turn_num, []).append(conf)
    for turn_num, page_scores in by_page.items():
        per_page[turn_num] = {
            "avg": round(_mean(page_scores), 4),
            "min": round(min(page_scores), 4),
            "max": round(max(page_scores), 4),
            "element_count": len(page_scores),
            "uncertain_count": sum(1 for s in page_scores if s < low),
        }

    by_type: dict[str, list[float]] = {}
    by_source: dict[str, list[float]] = {}
    for _, conf, etype, source in records:
        by_type.setdefault(etype, []).append(conf)
        by_source.setdefault(source, []).append(conf)

    return {
        "avg": round(_mean(scores), 4),
        "min": round(min(scores), 4),
        "max": round(max(scores), 4),
        "median": round(statistics.median(scores), 4),
        "std_dev": round(statistics.stdev(scores), 4) if n > 1 else 0.0,
        "total_elements": n,
        "uncertain_count": uncertain,
        "uncertain_percentage": round(uncertain / n * 100, 2),
        "low_confidence_count": critical_n,
        "low_confidence_percentage": round(critical_n / n * 100, 2),
        "per_page": per_page,
        "by_type": {t: {"avg": round(_mean(v), 4),
                        "min": round(min(v), 4), "count": len(v)}
                    for t, v in by_type.items()},
        "by_source": {s: {"avg": round(_mean(v), 4), "count": len(v)}
                      for s, v in by_source.items()},
    }


def overall_quality(stats: dict[str, Any]) -> float:
    """0.6·avg + 0.2·min + 0.2·(1−uncertain%) clamped, rounded to 4
    (confidence_tracker.py:277-306)."""
    if stats["total_elements"] == 0:
        return 1.0
    q = (0.6 * stats["avg"] + 0.2 * stats["min"]
         + 0.2 * (1.0 - stats["uncertain_percentage"] / 100.0))
    return round(max(0.0, min(1.0, q)), 4)


def quality_frontmatter_fields(stats: dict[str, Any]) -> dict[str, Any]:
    """YAML-frontmatter fields (confidence_tracker.py:308-324)."""
    return {
        "confidence_score": overall_quality(stats),
        "confidence_avg": stats["avg"],
        "confidence_min": stats["min"],
        "uncertain_regions": stats["uncertain_count"],
        "uncertain_percentage": stats["uncertain_percentage"],
        "low_confidence_regions": stats["low_confidence_count"],
    }


def page_quality_summary(records: list[tuple[int, float, str, str]],
                         low: float = 0.7) -> list[dict[str, Any]]:
    """Per-turn quality buckets (confidence_tracker.py:241-275)."""
    by_page: dict[int, list[float]] = {}
    for turn_num, conf, _, _ in records:
        by_page.setdefault(turn_num, []).append(conf)
    out = []
    for turn_num in sorted(by_page):
        scores = by_page[turn_num]
        avg = _mean(scores) if scores else 1.0
        if avg >= 0.9:
            bucket = "excellent"
        elif avg >= 0.8:
            bucket = "good"
        elif avg >= 0.7:
            bucket = "acceptable"
        elif avg >= 0.5:
            bucket = "poor"
        else:
            bucket = "very_poor"
        out.append({
            "page": turn_num, "avg_confidence": round(avg, 4),
            "quality": bucket, "element_count": len(scores),
            "uncertain_count": sum(1 for s in scores if s < low),
            "needs_review": avg < low,
        })
    return out
