"""Generate vendored golden outputs by running the REFERENCE's pure-Python
modules (no OCR binaries needed) on the deterministic fixture corpus.

Run from the repo root:  python tools/make_goldens.py

Writes JSON goldens under tests/goldens/. Tests compare raydoc kernels
against these files, so the reference checkout is NOT needed at test time.
The reference is used strictly as a black-box oracle here — no code is
copied into the repo.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = "/root/reference"
GOLDENS = REPO / "tests" / "goldens"

sys.path.insert(0, str(REPO))
sys.path.insert(0, REFERENCE)

import cleaner  # noqa: E402  (reference modules)
import language_detector  # noqa: E402
import layout_analyzer  # noqa: E402
import noise_filter  # noqa: E402
import validation_framework  # noqa: E402
from enhanced_pipeline import EnhancedPipeline  # noqa: E402

from raydoc.kernels.document import conv_document_id, extract_turn_text  # noqa: E402
from raydoc.kernels.elementize import elementize  # noqa: E402
from raydoc.sources import transcripts as tgen  # noqa: E402

FIXTURE_SEED = 123
N_CONVS = 24
PINNED_DATE = "1970-01-01T00:00:00"


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple, set)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


def reference_layout_and_assemble(raw, tables, figures):
    """Reference layout analysis + the structure_engine handoff
    (structure_engine.py:385-440), used as a black-box oracle."""
    analyzer = layout_analyzer.LayoutAnalyzer(column_gap_threshold=50)
    result = analyzer.analyze_page_layout(
        [dict(e) for e in raw], confidence_threshold=0.7,
        use_enhanced_classification=True)
    page = []
    for elem in result["elements"]:
        page.append({
            "y": elem["bbox"][1],
            "type": "text",
            "content": elem["text"],
            "reading_order": elem.get("reading_order", 0),
            "semantic_role": elem.get("semantic_role", "paragraph"),
            "role_confidence": elem.get("role_confidence", 1.0),
            "confidence": elem.get("confidence", 1.0),
            "uncertain": elem.get("uncertain", False),
            "bbox": elem.get("bbox", (0, 0, 0, 0)),
        })
    page.extend(dict(f) for f in figures)
    page.extend(dict(t) for t in tables)
    page.sort(key=lambda e: e["y"])
    return page, result


def golden_textnorm():
    samples = [
        "This is a bro-\n ken sentence.",
        "Upper Bro-\nKen and digit 12-\n34 splits.",
        "docu-\nment merge-\n  able",
        "word-\nWord stays in strict",
        "Line one\nline two continues\nLine three ends.\nNew para",
        "a: \nb\n\nc!\nd?",
        "# Head\ntight text\n\n\n\n   * item\n  - dash\n* top\nrange 1−2 – 3 — 4 ― 5",
        "<!-- role:artifact -->\n<!-- /role -->\nkeep me",
        "|||---===\n  lots   of   space\n\n\n\nend",
        "",
        "   \n  ",
        "1. item\n\n  + plus item\nplain * star not bullet\n  * indented star",
    ]
    trng = tgen._rng(1, 0, 0)
    samples += [tgen._payload_markdown_messy(trng),
                tgen._payload_hyphenated(trng),
                tgen._payload_plain(trng)]
    out = []
    for s in samples:
        out.append({
            "input": s,
            "hyphen_strict": cleaner.merge_hyphenated_words(s),
            "hyphen_loose": noise_filter.merge_hyphenated_words(s),
            "defragment": cleaner.defragment_text(s),
            "normalize_markdown": cleaner.normalize_markdown(s),
            "clean_artifacts": noise_filter.clean_ocr_artifacts(s),
        })
    return out


def golden_predicates():
    filt = noise_filter.AdaptiveNoiseFilter()
    lines = [
        "Page 3", "Page 12 of 40", "3/12", "- 4 -", "[ 7 ]", "9", "p. 4",
        "pg 12", "page6", "CONFIDENTIAL", "Confidential - Internal", "Draft",
        "draft copy", "DO NOT COPY", "For Internal Use Only",
        "Proprietary and Confidential", "Copyright © 2024", "copy 2023",
        "All rights reserved.", "www.example.com", "sample", "PREVIEW",
        "watermark", "|||---===", "...", "??", "ab", "x", "42", "123",
        "hello world", "bcdfg qrtlz", "aaaaa", "a-b-c-d!@#", "normal text.",
        "Page three of four",
    ]
    out = []
    for line in lines:
        for conf in (1.0, 0.2):
            out.append({
                "line": line, "confidence": conf,
                "is_page_number": filt._is_page_number(line),
                "is_watermark": filt._is_watermark(line),
                "is_artifact": filt._is_artifact(line, {"confidence": conf}),
                "is_garbled": filt._is_garbled(line),
            })
    return out


def golden_language():
    det = language_detector.LanguageDetector()
    samples = [
        "The quick brown fox jumps over the lazy dog and that is that.",
        "Le renard brun rapide saute par-dessus le chien paresseux dans les bois.",
        "Der schnelle braune Fuchs springt über den faulen Hund und die Wiese.",
        "El zorro marrón rápido salta sobre el perro perezoso en el bosque.",
        "素早い茶色の狐はのろまな犬を飛び越えました、ひらがなのテキストです",
        "빠른 갈색 여우가 게으른 개를 뛰어넘었습니다 한국어 텍스트입니다",
        "敏捷的棕色狐狸跳过了懒惰的狗然后跑进了森林里面去了",
        "မြန်မာဘာသာစကား နမူနာ စာသား တစ်ခု ဖြစ်သည်",
        "สุนัขจิ้งจอกสีน้ำตาลกระโดดข้ามสุนัขขี้เกียจ",
        "short", "", "12345 67890 !!!",
    ] + [v for _, v in sorted(tgen._LANG_SNIPPETS.items())]
    return [{"input": s, "result": det.detect(s)} for s in samples]


def golden_validation():
    docs = [
        "---\ndocument:\n  source_file: \"x\"\nquality:\n  confidence_score: 0.9\n"
        "---\n\n<!-- page:1 -->\n\n<!-- role:heading level:1 -->\n# Title\n\n"
        "Body text here.\nMore body.\n| a | b |\n|---|---|\n| 1 | 2\n",
        "no frontmatter at all\njust text\nBased on the image, stuff.\n",
        "---\ndocument:\n---\n\nshort\n",
    ]
    out = []
    for d in docs:
        fw = validation_framework.ValidationFramework()
        rep = fw.validate(d)
        gate = validation_framework.QualityGate(min_quality_score=0.6).check(d, rep)
        out.append({"input": d, "report": _jsonable(rep), "gate": _jsonable(gate)})
    return out


def golden_documents():
    table = tgen.generate_transcripts(n_convs=N_CONVS, seed=FIXTURE_SEED,
                                      min_turns=1, max_turns=8,
                                      skew_conv_turns=24)
    by_conv: dict[str, list[tuple[int, str]]] = {}
    for conv_id, idx, text in zip(table.column("conv_id").to_pylist(),
                                  table.column("turn_idx").to_pylist(),
                                  table.column("text").to_pylist()):
        by_conv.setdefault(conv_id, []).append((idx, text))

    out = []
    for conv_id, turns in sorted(by_conv.items()):
        turns.sort()
        pages = []
        norm_texts = []
        for _, text in turns:
            normalized, _, _ = extract_turn_text(text)
            norm_texts.append(normalized)
            raw, tables, figures = elementize(normalized)
            page, _ = reference_layout_and_assemble(raw, tables, figures)
            pages.append(page)

        metadata = {
            "source_file": conv_id,
            "document_id": conv_document_id(conv_id),
            "pages": len(pages),
            "extraction_method": "raydoc",
            "extraction_date": PINNED_DATE,
        }
        pipe = EnhancedPipeline()
        processed, _ = pipe.process_elements(pages)
        turn_segments = [
            pipe.semantic_annotator.annotate_page(elems, i, 800)
            for i, elems in enumerate(processed, 1)
        ]
        meta = dict(metadata)
        doc_md = pipe.render_markdown(processed, meta)
        validation = pipe.validate_output(doc_md)
        out.append({
            "conv_id": conv_id,
            "turn_idx": [i for i, _ in turns],
            "normalized_texts": norm_texts,
            "turn_segments": turn_segments,
            "doc_markdown": doc_md,
            "language": meta.get("language"),
            "confidence_score": meta.get("confidence_score"),
            "quality_score": validation["validation"].get("quality_score"),
            "gate_passed": validation["passed"],
            "suggested_action": validation["suggested_action"],
            "n_elements": [len(p) for p in processed],
        })
    return out




def _norm_sets(o):
    if isinstance(o, dict):
        return {k: _norm_sets(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_norm_sets(v) for v in o]
    if isinstance(o, set):
        return sorted(_norm_sets(v) for v in o)
    return o


def golden_validator_basic() -> list:
    """MarkdownValidator reports (validator.py:12-313)."""
    from validator import MarkdownValidator
    cases = [
        "# Title\n\nSome **bold** text.\n",
        "---\ndocument:\n  source_file: x\n  document_id: abc\n---\n# T\n"
        "<!-- role:heading -->\n| a | b |\n|---|---|\n- item\n",
        "```python\ncode\n",
        "[text]() empty link",
        "Based on the image, things look good.\nI can see that it works.",
        "no frontmatter here [unmatched\n",
        "---\nnot closed frontmatter",
        "",
        "| a | b |\nplain | pipe | line | x",
    ]
    out = []
    for c in cases:
        for method in ("", "RapidOCR", "OpenRouter extraction"):
            for conf in (None, 0.42):
                out.append({"input": c, "method": method, "confidence": conf,
                            "report": MarkdownValidator().get_validation_report(
                                c, method, conf)})
    return out


def golden_validator_variants() -> dict:
    """OpenRouter / RapidOCR validator reports (sets normalized)."""
    import openrouter_validator as orv
    import rapidocr_validator as rcv
    or_cases = [
        ("<!-- page:1 -->\n<!-- role:heading level:1 -->\n# T\n"
         "<!-- role:paragraph -->\nBody text here with enough words "
         + "w " * 200, 1, "OpenRouter", None),
        ("<!-- page:1 -->\n<!-- page:3 -->\n<!-- role:weirdrole -->\nx\n"
         "It appears that this probably works.", 2, "OpenRouter", 100),
        ("no annotations at all, I can see that it fails. " + "t " * 50,
         1, "RapidOCR", None),
        ("<!-- reading-order:1 -->\n<!-- reading-order:3 -->\ncontent here",
         1, "OpenRouter", 10),
        ("", 1, "OpenRouter", None),
    ]
    rc_cases = [
        ("<!-- page:1 -->\n<!-- role:heading -->\n# T\n"
         "<!-- role:paragraph -->\n" + "word " * 300, 1, "RapidOCR", None),
        ("<!-- page:1 -->\n" + "".join(
            f"<!-- reading-order:{i} -->\nx\n" for i in range(1, 30))
         + "word " * 300, 1, "RapidOCR", 2),
        ("<!-- role:figure -->\n[uncertain: blurry]\n"
         "<!-- confidence:0.42 -->\nshort", 2, "RapidOCR", None),
        ("", 1, "RapidOCR", None),
        ("<!-- reading-order:2 -->\n<!-- reading-order:1 -->\ncontent "
         + "w " * 200, 1, "RapidOCR", 1),
    ]
    return {
        "openrouter": [{"args": list(a),
                        "report": _norm_sets(orv.validate_openrouter_output(*a))}
                       for a in or_cases],
        "rapidocr": [{"args": list(a),
                      "report": _norm_sets(rcv.validate_rapidocr_output(*a))}
                     for a in rc_cases],
    }


def main() -> None:
    GOLDENS.mkdir(parents=True, exist_ok=True)
    jobs = {
        "textnorm.json": golden_textnorm,
        "predicates.json": golden_predicates,
        "language.json": golden_language,
        "validation.json": golden_validation,
        "documents.json": golden_documents,
        "validator_basic.json": golden_validator_basic,
        "validator_variants.json": golden_validator_variants,
    }
    for name, fn in jobs.items():
        data = fn()
        (GOLDENS / name).write_text(json.dumps(data, ensure_ascii=False, indent=1))
        print(f"wrote {name}: {len(data)} cases")


if __name__ == "__main__":
    main()
