"""K4 DOCX writer: reference line semantics (utils/formatters.py:86-101),
byte determinism, and the Ray sink plumbing."""

import zipfile

from raydoc.kernels.docx import docx_paragraphs, markdown_to_docx_bytes

MD = ("# Title\n"
      "## Section\n"
      "### Sub\n"
      "\n"
      "Body line one.\n"
      "#### four hashes is a paragraph per the reference\n"
      "   \n"
      "Second body & <line>.")


def test_line_semantics_match_reference():
    paras = docx_paragraphs(markdown_to_docx_bytes(MD))
    assert paras == [
        ("Heading1", "Title"),
        ("Heading2", "Section"),
        ("Heading3", "Sub"),
        (None, "Body line one."),
        (None, "#### four hashes is a paragraph per the reference"),
        (None, "Second body & <line>."),
    ]


def test_docx_is_valid_zip_and_deterministic():
    a = markdown_to_docx_bytes(MD)
    b = markdown_to_docx_bytes(MD)
    assert a == b
    with zipfile.ZipFile(__import__("io").BytesIO(a)) as zf:
        names = zf.namelist()
        assert "[Content_Types].xml" in names
        assert "word/document.xml" in names
        assert zf.testzip() is None


def test_empty_document():
    paras = docx_paragraphs(markdown_to_docx_bytes(""))
    assert paras == []


def test_export_docx_sink(ray_session, tmp_path):
    import os

    from raydoc.functions.export import docx_meta, export_docx

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "docx")
    n = export_docx(sf, out)
    files = [f for f in os.listdir(out) if f.endswith(".docx")]
    assert n == len(files) > 0

    meta = docx_meta(sf)
    assert meta.num_rows == n
    # written bytes match the meta query's hashes for a sample file
    import hashlib
    row = {c: meta.column(c)[0].as_py() for c in meta.column_names}
    with open(os.path.join(out, f"doc-{row['doc_id']}.docx"), "rb") as fh:
        data = fh.read()
    assert len(data) == row["n_bytes"]
    assert hashlib.sha256(data).hexdigest() == row["sha256"]


def test_sanitize_filename_reference_semantics():
    from raydoc.kernels.docx import sanitize_filename

    assert sanitize_filename("a/b\\c:d") == "a_b_c_d"
    assert sanitize_filename("price $5 (draft), v2?") == "price_USD5_draft_v2"
    assert sanitize_filename("__x__") == "x"
    assert sanitize_filename("../../etc/passwd") == ".._.._etc_passwd"
    assert len(sanitize_filename("x" * 500)) == 200


def test_docx_bytes_golden_pin():
    """Byte-level golden: the writer's exact output is pinned by sha256 so
    any silent change to the OOXML serialization (zip ordering, timestamps,
    XML layout) fails loudly — the docx_meta query's hashes inherit this
    stability."""
    import hashlib

    assert len(markdown_to_docx_bytes(MD)) == 1800
    assert hashlib.sha256(markdown_to_docx_bytes(MD)).hexdigest() == (
        "01f3718e47d7985699591eb1eff3f9839520eb27f92a2460c58d261b96c6e88f")
    assert hashlib.sha256(markdown_to_docx_bytes("")).hexdigest() == (
        "c2eb1993ab98426cefe41eafca0e13d007ed611be7bdb83acefe4d8bd40e24b1")
