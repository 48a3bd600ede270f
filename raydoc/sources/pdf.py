"""Minimal PDF text-layer source — the reference's first-touch input
shape (SmolDocling-OCR structure_engine.py:304 ingests a PDF path).

This is deliberately a TEXT-LAYER walk, not a renderer: a PDF that
carries its text as content-stream operators (the overwhelmingly common
digital-born case) yields its text; a scanned/image-only PDF yields
nothing and fail-softs into the pipeline's parse_failed path (the
reference would OCR it — a network/model non-goal here, SURVEY.md §2.1).

Scope (documented, enforced by fail-soft):
- streams: raw or FlateDecode (stdlib zlib); other filters are skipped;
- text operators: BT/ET blocks with Tj, ', ", TJ and the Td/TD/T*
  line-advance family (line breaks become newlines);
- strings: literal ``(...)`` with escapes and octal, and hex ``<...>``;
  bytes decode as Latin-1 after UTF-16BE BOM detection — enough for
  ASCII/WinAnsi text, no CMap/ToUnicode handling;
- structure: streams are located by scanning ``stream``/``endstream``
  pairs, so a damaged xref table does not block extraction.

``make_simple_pdf`` writes a small valid PDF (xref and all) — the test
fixture generator and the documented inverse shape.
"""

from __future__ import annotations

import os
import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n")
_STRING_OPS_RE = re.compile(
    rb"""(\((?:[^()\\]|\\.)*\))\s*(Tj|'|")   # literal string + show op
       | (<[0-9A-Fa-f\s]*>)\s*(Tj|'|")       # hex string + show op
       | \[((?:[^\[\]\\]|\\.)*)\]\s*TJ       # array show
       | (T\*|Td|TD)                         # line advances
    """, re.VERBOSE | re.DOTALL)
_ARRAY_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>")
_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
        b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape_literal(raw: bytes) -> bytes:
    """PDF literal string body (no outer parens) → bytes."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1:i + 2]
        if nxt in _ESC:
            out += _ESC[nxt]
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < min(i + 4, n) and raw[j:j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1:j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):
            i += 2                      # line continuation
        else:
            i += 2                      # unknown escape: drop backslash
    return bytes(out)


def _decode_pdf_string(tok: bytes) -> str:
    if tok.startswith(b"("):
        data = _unescape_literal(tok[1:-1])
    else:                               # <hex>
        hx = re.sub(rb"\s", b"", tok[1:-1])
        if len(hx) % 2:
            hx += b"0"
        data = bytes.fromhex(hx.decode("ascii"))
    if data[:2] == b"\xfe\xff":
        return data[2:].decode("utf-16-be", "replace")
    return data.decode("latin-1", "replace")


_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_ANY_FILTER_RE = re.compile(rb"/Filter\b")


def _dict_before(payload: bytes, pos: int) -> bytes | None:
    """The stream dictionary closing just before ``pos`` (the `stream`
    keyword), found by a backward ``<<``/``>>`` balance scan so nested
    dictionaries (/DecodeParms << … >>) resolve to the OUTER dict.
    None when no well-formed dictionary precedes the keyword."""
    win = payload[max(0, pos - 4096):pos].rstrip()
    if not win.endswith(b">>"):
        return None
    depth = 0
    i = len(win)
    while i >= 2:
        two = win[i - 2:i]
        if two == b">>":
            depth += 1
            i -= 2
        elif two == b"<<":
            depth -= 1
            if depth == 0:
                return win[i - 2:]
            i -= 2
        else:
            i -= 1
    return None


def _content_streams(payload: bytes) -> list[bytes]:
    """All decodable stream bodies. The stream dictionary's declared
    /Filter decides when it is parseable: /FlateDecode inflates, no
    filter stays raw (a raw stream whose bytes happen to start with a
    zlib header must NOT be inflated into garbage — ADVICE round-4),
    other filters are skipped. Only when the dictionary is damaged or
    missing do we fall back to the try-inflate heuristic, which also
    survives broken xrefs."""
    out = []
    for m in _STREAM_RE.finditer(payload):
        start = m.end()
        end = payload.find(b"endstream", start)
        if end < 0:
            continue
        body = payload[start:end].rstrip(b"\r\n")
        head = _dict_before(payload, m.start())
        if head is not None:
            if _FLATE_RE.search(head):
                try:
                    out.append(zlib.decompress(body))
                except zlib.error:
                    pass               # declared Flate but corrupt: skip
            elif _ANY_FILTER_RE.search(head):
                continue               # declared non-Flate filter: skip
            else:
                out.append(body)       # no filter: raw, never inflated
            continue
        try:                           # damaged dictionary: heuristic
            out.append(zlib.decompress(body))
        except zlib.error:
            out.append(body)
    return out


def pdf_extract_text(payload: bytes) -> str:
    """Text layer of a PDF byte stream (see module docstring for scope).
    Raises ValueError when the payload is not a PDF; returns "" for a
    PDF with no extractable text (image-only/scanned)."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    lines: list[str] = []
    cur: list[str] = []
    for stream in _content_streams(payload):
        # only look inside text objects
        for bt in re.finditer(rb"BT(.*?)ET", stream, re.DOTALL):
            for m in _STRING_OPS_RE.finditer(bt.group(1)):
                lit, _op1, hx, _op2, arr, adv = (
                    m.group(1), m.group(2), m.group(3), m.group(4),
                    m.group(5), m.group(6))
                if adv:                           # Td/TD/T* → line break
                    if cur:
                        lines.append("".join(cur))
                        cur = []
                    continue
                if arr is not None:
                    for s in _ARRAY_STR_RE.finditer(arr):
                        cur.append(_decode_pdf_string(s.group(0)))
                    continue
                tok = lit if lit is not None else hx
                if _op1 in (b"'", b'"') or _op2 in (b"'", b'"'):
                    if cur:
                        lines.append("".join(cur))
                        cur = []
                cur.append(_decode_pdf_string(tok))
            if cur:
                lines.append("".join(cur))
                cur = []
    return "\n".join(l for l in lines if l.strip())


def make_simple_pdf(pages: list[str], compress: bool = True) -> bytes:
    """A small valid single-font PDF (Helvetica, 12pt, one text column
    per page) with a correct xref table — the test-fixture inverse of
    ``pdf_extract_text``."""
    objs: list[bytes] = []

    def esc(s: str) -> bytes:
        return (s.replace("\\", r"\\").replace("(", r"\(")
                .replace(")", r"\)").encode("latin-1", "replace"))

    n_pages = len(pages)
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")                # 1
    objs.append(b"<< /Type /Pages /Kids [" + kids +
                b"] /Count %d >>" % n_pages)                         # 2
    objs.append(b"<< /Type /Font /Subtype /Type1 "
                b"/BaseFont /Helvetica >>")                          # 3
    for i, text in enumerate(pages):
        content = bytearray(b"BT /F1 12 Tf 72 720 Td 14 TL\n")
        for j, line in enumerate(text.splitlines() or [""]):
            if j:
                content += b"T*\n"
            content += b"(" + esc(line) + b") Tj\n"
        content += b"ET"
        body = zlib.compress(bytes(content)) if compress else bytes(content)
        filt = b" /Filter /FlateDecode" if compress else b""
        objs.append(b"<< /Type /Page /Parent 2 0 R "
                    b"/MediaBox [0 0 612 792] "
                    b"/Resources << /Font << /F1 3 0 R >> >> "
                    b"/Contents %d 0 R >>" % (page_ids[i] + 1))
        objs.append(b"<< /Length %d%s >>\nstream\n" % (len(body), filt)
                    + body + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + obj + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
            % (len(objs) + 1, xref_at))
    return bytes(out)


PDF_EXT = ".pdf"


def list_pdfs(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(root, f)
        for root, _, fs in os.walk(path) for f in fs
        if f.lower().endswith(PDF_EXT) and not f.startswith("_"))
