"""K4 markdown → DOCX writer (≙ utils/formatters.py:86-101).

The reference builds the document with ``python-docx`` (not available in
this environment); this is a dependency-free OOXML writer with the SAME
line semantics as the reference:

    '# '   → heading level 1
    '## '  → heading level 2
    '### ' → heading level 3
    other non-blank lines → paragraph
    blank lines → skipped

Output is a minimal valid .docx (zip of [Content_Types].xml + rels +
word/document.xml with Heading1-3 paragraph styles), byte-deterministic:
fixed zip timestamps, STORED entries (deflate output varies by zlib
build), stable member order.
"""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    '</Types>')

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    '</Relationships>')

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _para(text: str, style: str | None = None) -> str:
    ppr = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
    return (f"<w:p>{ppr}<w:r><w:t xml:space=\"preserve\">"
            f"{escape(text)}</w:t></w:r></w:p>")


def markdown_to_docx_bytes(markdown_text: str) -> bytes:
    """One markdown document → .docx bytes (reference line semantics)."""
    body: list[str] = []
    for line in markdown_text.split("\n"):
        if line.startswith("# "):
            body.append(_para(line[2:], "Heading1"))
        elif line.startswith("## "):
            body.append(_para(line[3:], "Heading2"))
        elif line.startswith("### "):
            body.append(_para(line[4:], "Heading3"))
        elif line.strip():
            body.append(_para(line))
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>{"".join(body)}</w:body>'
        "</w:document>")

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, data in (("[Content_Types].xml", _CONTENT_TYPES),
                           ("_rels/.rels", _RELS),
                           ("word/document.xml", document)):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, data)
    return buf.getvalue()


def docx_paragraphs(docx_bytes: bytes) -> list[tuple[str | None, str]]:
    """Parse (style, text) pairs back out of a generated docx — the
    round-trip check used by tests."""
    import re
    with zipfile.ZipFile(io.BytesIO(docx_bytes)) as zf:
        xml = zf.read("word/document.xml").decode()
    out = []
    for m in re.finditer(r"<w:p>(.*?)</w:p>", xml, re.S):
        seg = m.group(1)
        sm = re.search(r'<w:pStyle w:val="([^"]+)"/>', seg)
        tm = re.search(r"<w:t[^>]*>(.*?)</w:t>", seg, re.S)
        text = tm.group(1) if tm else ""
        # standard XML unescape order: '&amp;' LAST, or a literal '&lt;'
        # in the source (stored as '&amp;lt;') would double-unescape
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&")):
            text = text.replace(ent, ch)
        out.append((sm.group(1) if sm else None, text))
    return out


def sanitize_filename(filename: str) -> str:
    """M17 filename sanitizer, exact semantics of the reference
    (services/cache_manager.py:29-58): invalid chars → underscore, '$' →
    'USD', parens/space/comma → underscore, collapse runs, strip edge
    underscores, cap at 200 chars. Used by every file-emitting sink
    (docx/media) so an id like '../x' can never escape the output dir."""
    for char in '<>:"/\\|?*':
        filename = filename.replace(char, "_")
    filename = filename.replace("$", "USD")
    filename = filename.replace("(", "_")
    filename = filename.replace(")", "_")
    filename = filename.replace(" ", "_")
    filename = filename.replace(",", "_")
    while "__" in filename:
        filename = filename.replace("__", "_")
    filename = filename.strip("_")
    if len(filename) > 200:
        filename = filename[:200]
    return filename
