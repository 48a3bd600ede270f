"""Per-turn text normalization kernels.

Semantics-equal reimplementations of the reference's string normalizers
(SURVEY.md §2.2 M1-M6):

- ``merge_hyphens_strict``  ≙ cleaner.py:5-13   (continuation must be [a-z]+)
- ``merge_hyphens_loose``   ≙ noise_filter.py:302-310 (\\w+ continuation)
- ``defragment``            ≙ cleaner.py:179-211
- ``normalize_markdown``    ≙ cleaner.py:214-269 (6 ordered passes; order is
                              semantics — see SURVEY.md §2.9)
- ``clean_artifact_lines``  ≙ noise_filter.py:313-331
- ``mask_digits``           ≙ noise_filter.py:192-196

All regexes/constants are pinned to the reference's exact patterns; the
surrounding code is our own. These run inside ``map_batches`` over string
columns — Python ``re`` is C-backed, so a per-row loop over a batch column
is the vectorization unit here.
"""

from __future__ import annotations

import re

# -- compiled once at import (module constants; stages that want per-actor
#    state import this module inside __init__) -------------------------------

_HYPHEN_STRICT = re.compile(r"([a-zA-Z]+)-\s*\n\s*([a-z]+)")
_HYPHEN_LOOSE = re.compile(r"(\w+)-\s*\n\s*(\w+)")

_DASH_TABLE = str.maketrans({
    "−": "-",  # minus sign
    "–": "-",  # en dash
    "—": "-",  # em dash
    "―": "-",  # horizontal bar
})

_LIST_DEINDENT = re.compile(r"(^|\n\n)[ ]{2,4}([-*+])\s", re.MULTILINE)
_NL3 = re.compile(r"\n{3,}")
_STAR_BULLET = re.compile(r"^(\s*)\* ", re.MULTILINE)
_HEADING_SPACER = re.compile(r"([^\n])\n(#{1,6} )")
_EMPTY_ROLE_TAG = re.compile(r"<!-- role:\w+ -->\s*<!-- /role -->")

_ARTIFACT_LINE_START = re.compile(r"^[|_\-=+]+\s*", re.MULTILINE)
_MULTISPACE = re.compile(r"[ \t]{2,}")
_BLANK_RUNS = re.compile(r"\n\s*\n{2,}")

_DIGIT_RUN = re.compile(r"\b\d+\b")

_SENTENCE_END = (".", "?", "!", ":")


def merge_hyphens_strict(text: str) -> str:
    """Join line-broken words where the continuation is all-lowercase."""
    if "-" not in text:   # memchr pre-filter; both patterns require a '-'
        return text
    return _HYPHEN_STRICT.sub(r"\1\2", text)


def merge_hyphens_loose(text: str) -> str:
    """Join line-broken words; continuation may be any word chars."""
    if "-" not in text:
        return text
    return _HYPHEN_LOOSE.sub(r"\1\2", text)


def defragment(text: str) -> str:
    """Merge consecutive lines into paragraphs unless the running line
    already ends with sentence punctuation; blank lines are kept as
    paragraph breaks."""
    out: list[str] = []
    run = ""
    for raw in text.split("\n"):
        line = raw.strip()
        if not line:
            if run:
                out.append(run)
                run = ""
            out.append("")
            continue
        if not run:
            run = line
        elif run.endswith(_SENTENCE_END):
            out.append(run)
            run = line
        else:
            run += " " + line
    if run:
        out.append(run)
    return "\n".join(out)


def normalize_markdown(text: str) -> str:
    """Six ordered normalization passes over markdown text.

    1. unicode dashes → ``-``;  2. de-indent 2-4-space top-level list items;
    3. collapse 3+ newlines to 2;  4. ``* `` bullets → ``- ``;  5. blank line
    before headings;  6. drop empty role-tag pairs;  then strip.
    """
    if not text:
        return ""
    text = text.translate(_DASH_TABLE)
    text = _LIST_DEINDENT.sub(r"\1\2 ", text)
    text = _NL3.sub("\n\n", text)
    text = _STAR_BULLET.sub(r"\1- ", text)
    text = _HEADING_SPACER.sub(r"\1\n\n\2", text)
    text = _EMPTY_ROLE_TAG.sub("", text)
    return text.strip()


def clean_artifact_lines(text: str) -> str:
    """Strip leading special-char runs, collapse spaces and blank-line runs."""
    text = _ARTIFACT_LINE_START.sub("", text)
    text = _MULTISPACE.sub(" ", text)
    text = _BLANK_RUNS.sub("\n\n", text)
    return text.strip()


def mask_digits(text: str) -> str:
    """Digit-mask a line for repeater matching ("Page 3" ≡ "Page 7")."""
    return _DIGIT_RUN.sub("[NUM]", text.strip())


def parse_pdf_date(date_str: str) -> str:
    """PDF ``D:YYYYMMDDHHmmSS`` → ISO 8601; '' on parse failure — exact
    semantics of metadata_extractor.py:18-55 (M12), including the
    partial-string defaults (missing month/day → '01', time → '00')."""
    if not date_str:
        return ""
    if date_str.startswith("D:"):
        date_str = date_str[2:]
    if len(date_str) < 4:
        return ""
    year = date_str[0:4]
    month = date_str[4:6] if len(date_str) >= 6 else "01"
    day = date_str[6:8] if len(date_str) >= 8 else "01"
    hour = date_str[8:10] if len(date_str) >= 10 else "00"
    minute = date_str[10:12] if len(date_str) >= 12 else "00"
    second = date_str[12:14] if len(date_str) >= 14 else "00"
    try:
        int(year)
    except ValueError:
        return ""
    return f"{year}-{month}-{day}T{hour}:{minute}:{second}"


_MD_HEADER = re.compile(r"#{1,6}\s")
_MD_BOLD = re.compile(r"\*\*(.+?)\*\*")
_MD_ITALIC = re.compile(r"\*(.+?)\*")
_MD_LINK = re.compile(r"\[(.+?)\]\(.+?\)")


def markdown_to_txt(markdown_text: str) -> str:
    """Markdown → plain text, exact semantics of utils/formatters.py:74-83
    (K3): strip headers, bold, italic, links — in that order."""
    text = _MD_HEADER.sub("", markdown_text)
    text = _MD_BOLD.sub(r"\1", text)
    text = _MD_ITALIC.sub(r"\1", text)
    text = _MD_LINK.sub(r"\1", text)
    return text


_MD_HTML_HEADINGS = [
    (re.compile(rf"(?m)^{'#' * i}\s(.*)$"), rf"<h{i}>\1</h{i}>")
    for i in range(6, 0, -1)]
_MD_LINK_HREF = re.compile(r"\[(.+?)\]\((.+?)\)")


def markdown_to_html(markdown_text: str) -> str:
    """Markdown → HTML (K2, ≙ utils/formatters.py:69-71). The reference
    delegates to the ``markdown2`` library (extras: tables +
    fenced-code-blocks), which is not available in this environment —
    this is a deterministic regex-chain SUBSET over the same inline
    surface the K3 txt writer covers (headings → <hN>, bold → <strong>,
    italic → <em>, links → <a href>), in the same pass order, and is
    SQL-oracle-checkable. Tables and fenced code pass through verbatim."""
    text = markdown_text
    for pat, repl in _MD_HTML_HEADINGS:
        text = pat.sub(repl, text)
    text = _MD_BOLD.sub(r"<strong>\1</strong>", text)
    text = _MD_ITALIC.sub(r"<em>\1</em>", text)
    text = _MD_LINK_HREF.sub(r'<a href="\2">\1</a>', text)
    return text
