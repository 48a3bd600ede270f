"""PDF byte-stream source (sources/pdf.py + the extract_pipeline `.pdf`
dispatch arm): the reference's first-touch input shape — a folder of
PDFs — flows through extract_dataset end-to-end, with scanned/damaged
PDFs fail-softing instead of killing the job."""

import pytest

from raydoc.sources.pdf import make_simple_pdf, pdf_extract_text


def test_text_roundtrip_compressed_and_raw():
    text = "Heading line\nBody text with (parens) and \\ slashes.\nEnd."
    for compress in (True, False):
        pdf = make_simple_pdf([text], compress=compress)
        assert pdf.startswith(b"%PDF-") and pdf.endswith(b"%%EOF")
        assert pdf_extract_text(pdf) == text


def test_multi_page_concatenates_in_order():
    pdf = make_simple_pdf(["page one", "page two", "page three"])
    assert pdf_extract_text(pdf) == "page one\npage two\npage three"


def test_hex_and_tj_array_strings():
    """Operators beyond plain Tj: hex strings and TJ arrays with kerning
    numbers decode too (hand-built content stream, raw)."""
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"[(Hel) -20 (lo)] TJ T* <776f726c64> Tj ET")
    pdf = (b"%PDF-1.4\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\n%%EOF")
    assert pdf_extract_text(pdf) == "Hello\nworld"


def test_non_pdf_raises_scanned_pdf_empty():
    with pytest.raises(ValueError):
        pdf_extract_text(b"not a pdf at all")
    # stream exists but holds no text operators (image-only/scanned)
    assert pdf_extract_text(
        b"%PDF-1.4\nstream\n\xde\xad\xbe\xef\nendstream\n%%EOF") == ""


def test_folder_of_pdfs_flows_through_extract_dataset(ray_session,
                                                      tmp_path):
    from raydoc.pipelines.extract_pipeline import extract_dataset

    docs = {
        "alpha": "# Title\n\nA paragraph of real text for alpha.\n"
                 "More sentences to extract here.",
        "beta": "Beta document body.\nWith a second line.",
    }
    for name, text in docs.items():
        (tmp_path / f"{name}.pdf").write_bytes(make_simple_pdf([text]))
    # a scanned/damaged PDF must not kill the job
    (tmp_path / "scanned.pdf").write_bytes(
        b"%PDF-1.4\nstream\n\x00\x01\x02\nendstream\n%%EOF")

    rows = extract_dataset(str(tmp_path)).take_all()
    by_conv = {r["conv_id"]: r for r in rows}
    assert set(by_conv) == {"alpha", "beta", "scanned"}
    assert "alpha" in by_conv["alpha"]["extracted_text"].lower() or \
        "paragraph" in by_conv["alpha"]["extracted_text"].lower()
    assert "beta document" in by_conv["beta"]["extracted_text"].lower()
    # the scanned doc contributes no real content — only pipeline
    # annotations (page markers) may remain
    residue = [l for l in by_conv["scanned"]["extracted_text"].splitlines()
               if l.strip() and not l.strip().startswith("<!--")]
    assert residue == []


def test_raw_stream_with_zlib_looking_prefix_not_inflated():
    """A declared-raw (no /Filter) content stream whose bytes happen to
    start with a valid zlib header (0x78 …) must be used verbatim, not
    silently inflated into garbage — ADVICE round-4 finding."""
    import zlib

    from raydoc.sources.pdf import pdf_extract_text

    # craft a raw content stream beginning with 0x78 0x9C that IS valid
    # zlib data for some unrelated bytes, followed by the real text ops
    decoy = zlib.compress(b"decoy-not-the-text")
    assert decoy[:1] == b"\x78"
    ops = b"BT (kept raw) Tj ET"
    body = decoy + b"\n" + ops
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj << /Length " + str(len(body)).encode()
           + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
           b"%%EOF\n")
    # zlib.decompress(body) succeeds on the decoy prefix (garbage
    # result); the declared-filter path must keep the raw bytes
    assert "kept raw" in pdf_extract_text(pdf)


def test_declared_flate_stream_still_inflates():
    """Round-trip guard for the declared-filter path: FlateDecode
    streams written by make_simple_pdf keep extracting."""
    from raydoc.sources.pdf import make_simple_pdf, pdf_extract_text

    pdf = make_simple_pdf(["Hello compressed world"], compress=True)
    assert "Hello compressed world" in pdf_extract_text(pdf)
    pdf_raw = make_simple_pdf(["Hello raw world"], compress=False)
    assert "Hello raw world" in pdf_extract_text(pdf_raw)


def test_nested_dict_stream_filter_resolution():
    """/DecodeParms nested dicts must not confuse the backward dict
    scan: the OUTER dictionary's /Filter decides."""
    import zlib

    from raydoc.sources.pdf import pdf_extract_text

    body = zlib.compress(b"BT (nested ok) Tj ET")
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj << /Filter /FlateDecode /DecodeParms << /X 1 >> "
           b"/Length " + str(len(body)).encode()
           + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF\n")
    assert "nested ok" in pdf_extract_text(pdf)
