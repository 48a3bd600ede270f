"""Behavioral port of the reference's caption/footnote linking semantics
(caption_extractor.py:22-269; SURVEY.md §2.5 J1/J3): nearest-target |Δy| <
100 linking, caption text copied onto the target, caption element REMOVED
(the tag-don't-remove exception), bottom-zone footnote identification."""

from raydoc.kernels.linking import link_captions, link_footnotes, parse_caption


def test_parse_caption_variants():
    assert parse_caption("Table 2: Summary")["type"] == "table"
    assert parse_caption("Figure 3. Overview")["type"] == "figure"
    assert parse_caption("Fig. 1 something")["type"] == "figure"
    assert parse_caption("Chart 4: trend")["type"] == "figure"
    assert parse_caption("Just a sentence.") is None


def test_caption_links_to_nearest_table_and_is_removed():
    turns = [[
        {"type": "table", "content": "|a|b|", "y": 100},
        {"type": "table", "content": "|c|d|", "y": 400},
        {"type": "text", "content": "Table 1: Nearby caption", "y": 120},
        {"type": "text", "content": "Body text stays.", "y": 200},
    ]]
    out, extracted = link_captions(turns)
    elems = out[0]
    # caption element removed, body text kept
    contents = [e["content"] for e in elems]
    assert "Table 1: Nearby caption" not in contents
    assert "Body text stays." in contents
    # nearest table (y=100, Δ20 < 100) got the caption text; far one didn't
    assert elems[0].get("caption") == "Nearby caption"
    assert "caption" not in elems[1]
    assert extracted and extracted[0]["type"] == "table"


def test_caption_beyond_proximity_not_linked_but_still_removed():
    turns = [[
        {"type": "figure", "content": "[fig]", "y": 500},
        {"type": "text", "content": "Figure 2: far away", "y": 100},
    ]]
    out, extracted = link_captions(turns)
    assert "caption" not in out[0][0]          # Δ400 > 100 → no link
    assert len(out[0]) == 1                    # caption element still removed
    assert extracted == []


def test_footnote_linking_bottom_zone():
    # 25 elements; the [1] line sits in the bottom 20% of the page
    turns = [[{"type": "text", "content": f"line {i}", "y": float(i * 30)}
              for i in range(24)]
             + [{"type": "text", "content": "[1] The footnote text.",
                 "y": 750.0}]]
    out, notes = link_footnotes(turns, page_heights=[800.0])
    tagged = [e for e in out[0] if e.get("semantic_role") == "footnote"]
    assert len(tagged) == 1
    assert tagged[0]["footnote_id"] == "1"
    assert notes and notes[0]["id"] == "1"
