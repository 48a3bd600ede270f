"""Port of the reference's metadata-extractor suite
(test_metadata_extractor.py) against the rebuild's analogs: PDF date
parsing (M12), deterministic document ids (M13), frontmatter assembly
(M14) with the pinned clock."""

from raydoc.kernels.document import conv_document_id
from raydoc.kernels.enforce import build_frontmatter
from raydoc.kernels.textnorm import parse_pdf_date


def test_full_date_string():
    assert parse_pdf_date("D:20240115120000") == "2024-01-15T12:00:00"


def test_partial_date_string():
    assert parse_pdf_date("D:202401") == "2024-01-01T00:00:00"


def test_no_prefix():
    assert parse_pdf_date("20240115120000") == "2024-01-15T12:00:00"


def test_empty_string():
    assert parse_pdf_date("") == ""


def test_invalid_date():
    assert parse_pdf_date("D:notadate") == ""


def test_deterministic_hash():
    a = conv_document_id("conv-000042")
    b = conv_document_id("conv-000042")
    assert a == b
    assert len(a) == 16
    assert all(c in "0123456789abcdef" for c in a)


def test_different_ids_for_different_convs():
    assert conv_document_id("conv-1") != conv_document_id("conv-2")


def test_frontmatter_block_shape():
    meta = {"source_file": "conv-1", "document_id": conv_document_id("conv-1"),
            "title": "T", "pages": 3}
    fm = build_frontmatter(meta)
    assert fm.startswith("---\n") and fm.rstrip().endswith("---")
    assert "document_id:" in fm and "source_file:" in fm
    # pinned clock: repeated builds are byte-identical (no datetime.now)
    assert fm == build_frontmatter(meta)
