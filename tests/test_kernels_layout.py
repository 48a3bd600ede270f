"""Port of the reference's layout-analyzer unit suite
(test_layout_analyzer.py:15-205) against raydoc.kernels.roles — same
fixtures, same expectations."""

from raydoc.kernels.roles import (analyze_layout, assign_columns,
                                  classify_layout_role_legacy, detect_columns,
                                  split_by_confidence, xy_cut)


def test_single_column():
    elements = [{"bbox": (50, 100, 250, 120)},
                {"bbox": (50, 130, 250, 150)},
                {"bbox": (50, 160, 250, 180)}]
    assert len(detect_columns(elements, gap=50)) == 1


def test_two_columns():
    elements = [{"bbox": (50, 100, 250, 120)}, {"bbox": (350, 100, 550, 120)},
                {"bbox": (50, 130, 250, 150)}, {"bbox": (350, 130, 550, 150)}]
    cols = detect_columns(elements, gap=50)
    assert len(cols) == 2
    assert cols[0]["x_min"] < cols[1]["x_min"]


def test_three_columns():
    elements = [{"bbox": (50, 100, 200, 120)}, {"bbox": (270, 100, 420, 120)},
                {"bbox": (490, 100, 640, 120)}]
    assert len(detect_columns(elements, gap=50)) == 3


def test_assign_to_correct_column():
    elements = [{"bbox": (50, 100, 250, 120), "text": "Col1"},
                {"bbox": (350, 100, 550, 120), "text": "Col2"}]
    cols = detect_columns(elements, gap=50)
    elements = assign_columns(elements, cols)
    assert elements[0]["column_id"] == 0
    assert elements[1]["column_id"] == 1


def test_single_column_order():
    elements = [
        {"bbox": (50, 200, 250, 220), "column_id": 0, "text": "Third"},
        {"bbox": (50, 100, 250, 120), "column_id": 0, "text": "First"},
        {"bbox": (50, 150, 250, 170), "column_id": 0, "text": "Second"},
    ]
    s = xy_cut(elements)
    assert [e["text"] for e in s] == ["First", "Second", "Third"]
    assert s[0]["reading_order"] == 1 and s[2]["reading_order"] == 3


def test_two_column_order():
    elements = [
        {"bbox": (350, 150, 550, 170), "column_id": 1, "text": "Col2-Line2"},
        {"bbox": (50, 100, 250, 120), "column_id": 0, "text": "Col1-Line1"},
        {"bbox": (350, 100, 550, 120), "column_id": 1, "text": "Col2-Line1"},
        {"bbox": (50, 150, 250, 170), "column_id": 0, "text": "Col1-Line2"},
    ]
    s = xy_cut(elements)
    assert [e["text"] for e in s] == ["Col1-Line1", "Col1-Line2",
                                      "Col2-Line1", "Col2-Line2"]


_PAGE = [{"bbox": (50, 100, 250, 130), "text": "Normal text"},
         {"bbox": (50, 140, 250, 160), "text": "More text"}]


def test_heading_detection_legacy():
    elem = {"bbox": (50, 50, 250, 90), "text": "Chapter Title"}
    assert classify_layout_role_legacy(elem, _PAGE) == "heading"


def test_list_item_detection_legacy():
    for text in ("• First item", "- Second item", "1. Numbered item",
                 "2) Another item"):
        elem = {"bbox": (50, 100, 250, 120), "text": text}
        assert classify_layout_role_legacy(elem, _PAGE) == "list_item", text


def test_caption_detection_legacy():
    elem = {"bbox": (50, 300, 250, 320), "text": "Figure 1: Example diagram"}
    assert classify_layout_role_legacy(elem, _PAGE) == "caption"


def test_filter_by_threshold():
    elements = [{"text": "High confidence", "confidence": 0.95},
                {"text": "Medium confidence", "confidence": 0.75},
                {"text": "Low confidence", "confidence": 0.55}]
    high, low = split_by_confidence(elements, threshold=0.7)
    assert len(high) == 2 and len(low) == 1
    assert low[0]["uncertain"]


def test_full_analysis():
    elements = [
        {"text": "Title", "bbox": (50, 50, 250, 90), "confidence": 0.95},
        {"text": "Column 1 text", "bbox": (50, 100, 250, 120), "confidence": 0.92},
        {"text": "Column 2 text", "bbox": (350, 100, 550, 120), "confidence": 0.88},
        {"text": "Low conf text", "bbox": (50, 150, 250, 170), "confidence": 0.60},
    ]
    result = analyze_layout(elements, confidence_threshold=0.7)
    assert result["column_count"] > 0
    assert result["reading_order_applied"]
    assert result["high_confidence_count"] == 3
    assert result["low_confidence_count"] == 1
    assert len(result["elements"]) == 4
    for elem in result["elements"]:
        assert "reading_order" in elem and "semantic_role" in elem


def test_body_font_size_mode_matches_reference_semantics():
    from raydoc.kernels.roles import body_font_size_mode

    blocks = [
        {"lines": [{"spans": [{"size": 11.04}, {"size": 11.02}]},
                   {"spans": [{"size": 18.0}]}]},
        {"no_lines_key": True},
        {"lines": [{"spans": [{"size": 11.01}]}]},
    ]
    assert body_font_size_mode(blocks) == 11.0   # three 11.0x spans round to 11.0
    assert body_font_size_mode([]) == 11
    assert body_font_size_mode([{"lines": []}]) == 11


def test_numbered_item_length_rule():
    """Port of test_numbered_headings.py:11-35 — `N. short` (< 80 chars) is
    a list item; `N. long...` (≥ 80) falls through to heading scoring."""
    from raydoc.kernels.roles import classify_layout_role_enhanced

    page = [{"bbox": (0, 0, 100, 20)}]
    shorts = ["1. Buy milk", "10. Call dentist", "2. Review document"]
    longs = [
        "1. For investments in sectors listed in a notification to be "
        "issued by the Commission",
        "2. Income tax exemptions shall only be granted to sectors that "
        "the Commission has specified",
    ]
    for text in shorts:
        role, conf = classify_layout_role_enhanced(
            {"text": text, "bbox": (0, 0, 100, 20)}, page)
        assert role == "list_item" and conf == 0.9, text
    for text in longs:
        role, _ = classify_layout_role_enhanced(
            {"text": text, "bbox": (0, 0, 400, 30)}, page)
        assert role != "list_item", text
