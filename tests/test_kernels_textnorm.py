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


def test_parse_pdf_date_matches_reference_semantics():
    from raydoc.kernels.textnorm import parse_pdf_date

    assert parse_pdf_date("D:20240115120000") == "2024-01-15T12:00:00"
    assert parse_pdf_date("20240115120000") == "2024-01-15T12:00:00"
    assert parse_pdf_date("D:2024") == "2024-01-01T00:00:00"
    assert parse_pdf_date("D:202401") == "2024-01-01T00:00:00"
    assert parse_pdf_date("D:2024011512") == "2024-01-15T12:00:00"
    assert parse_pdf_date("") == ""
    assert parse_pdf_date("D:20") == ""
    assert parse_pdf_date("D:abcd0115") == ""


def test_unicode_dash_normalization_regression():
    """Port of test_list_normalization.py:12-18."""
    from raydoc.kernels.textnorm import normalize_markdown

    assert (normalize_markdown("− Item 1\n− Item 2\n– Item 3\n— Item 4")
            == "- Item 1\n- Item 2\n- Item 3\n- Item 4")


def test_indented_list_cleanup_regression():
    """Port of test_list_normalization.py:21-29."""
    from raydoc.kernels.textnorm import normalize_markdown

    result = normalize_markdown("    - Item 1\n    - Item 2")
    assert not result.startswith("    ")
    assert result.startswith("- ")


def test_combined_dash_indent_regression():
    """Port of test_list_normalization.py:31-48 (the code-block bug)."""
    from raydoc.kernels.textnorm import normalize_markdown

    result = normalize_markdown(
        "    − Goods imported or exported\n    − Motor vehicles imported")
    assert "−" not in result
    assert not result.startswith("    ")
    for line in result.split("\n"):
        if line.strip():
            assert line.startswith("- "), repr(line)


def test_markdown_to_html_inline_surface():
    """K2 subset converter: headings/bold/italic/links in the K3 pass
    order; tables and fenced code pass through verbatim."""
    from raydoc.kernels.textnorm import markdown_to_html

    md = ("# Title\n"
          "## Sub *section*\n"
          "Body with **bold** and *ital* and [a link](http://x/y).\n"
          "| a | b |\n"
          "```\ncode **stays**\n```")
    out = markdown_to_html(md)
    assert "<h1>Title</h1>" in out
    assert "<h2>Sub <em>section</em></h2>" in out
    assert "<strong>bold</strong>" in out
    assert "<em>ital</em>" in out
    assert '<a href="http://x/y">a link</a>' in out
    assert "| a | b |" in out            # tables pass through
    # fenced code is NOT protected in the regex-chain subset: inline
    # emphasis inside it converts like normal text (documented divergence
    # from markdown2)
    assert "<strong>stays</strong>" in out


def test_markdown_to_html_no_false_heading_match():
    from raydoc.kernels.textnorm import markdown_to_html
    assert markdown_to_html("a # not heading") == "a # not heading"
    assert markdown_to_html("####### seven") == "####### seven"
