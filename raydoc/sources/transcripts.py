"""Deterministic synthetic transcript corpus.

Generates the BASELINE.json ``input_hint`` table
(conv_id, turn_idx, role, text, tool, ts) with payload kinds that exercise
every reference operator (FIXTURES.md §1): HTML docs with boilerplate,
messy markdown, hyphen-broken lines, noisy pages with repeated
headers/footers, captioned tables/figures + footnotes, structured headings
and lists, multilingual snippets, low-confidence markers, hallucination
phrases, plain prose, empties.

Everything derives from a single integer seed; ``ts`` is computed from
(conv hash, turn_idx) — no wall clock anywhere (FIXTURES.md §4). The same
generator scales from test size (tens of convs) to bench size (thousands)
and can also derive conversations from the driver's ``documents`` table so
benchmarks run over provided test data.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa

PAYLOAD_KINDS = (
    "html_doc", "markdown_messy", "hyphenated", "noisy_page", "captioned",
    "structured", "multilingual", "low_confidence", "hallucinated", "plain",
    "empty",
)

_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds

_WORDS = ("data pipeline document extraction quality signal batch stream "
          "table figure caption heading paragraph confidence layout noise "
          "filter render schema markdown arrow shuffle partition lineage "
          "worker actor block column row text page turn corpus token").split()

_LANG_SNIPPETS = {
    "fr": "le renard brun rapide saute par dessus le chien paresseux dans les bois",
    "de": "der schnelle braune fuchs springt über den faulen hund und die wiese",
    "es": "el zorro marrón rápido salta sobre el perro perezoso en el bosque",
    "pt": "a raposa marrom rápida pula sobre o cachorro preguiçoso não é",
    "th": "สุนัขจิ้งจอกสีน้ำตาลกระโดดข้ามสุนัขขี้เกียจ",
    "my": "မြန်မာဘာသာစကား နမူနာ စာသား တစ်ခု ဖြစ်သည်",
    "zh": "敏捷的棕色狐狸跳过了懒惰的狗然后跑进了森林里面去了",
    "ja": "素早い茶色の狐はのろまな犬を飛び越えました、ひらがなのテキストです",
    "ko": "빠른 갈색 여우가 게으른 개를 뛰어넘었습니다 한국어 텍스트입니다",
}


def _rng(seed: int, conv: int, turn: int) -> random.Random:
    digest = hashlib.md5(f"{seed}:{conv}:{turn}".encode()).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n)).capitalize() + "."


def _paragraph(rng: random.Random, sentences: int = 3) -> str:
    return " ".join(_sentence(rng, rng.randint(6, 14)) for _ in range(sentences))


def _payload_html(rng: random.Random, conv: int) -> str:
    paras = "".join(f"<p>{_paragraph(rng)}</p>\n" for _ in range(rng.randint(2, 4)))
    items = "".join(f"<li><a href='/{w}'>{w}</a></li>" for w in rng.sample(_WORDS, 4))
    return (
        "<!DOCTYPE html><html><head><title>doc</title>"
        "<style>p{margin:0}</style><script>var x=1;</script></head><body>"
        f"<nav><ul>{items}</ul></nav>"
        f"<div class='sidebar'><p>Subscribe to our newsletter for updates!</p></div>"
        f"<main><h1>Report {conv}</h1>\n{paras}"
        f"<h2>{_sentence(rng, 3)[:-1]}</h2>\n<p>{_paragraph(rng)}</p></main>"
        "<footer><p>Copyright 2024 Example Corp. All rights reserved.</p></footer>"
        "</body></html>"
    )


def _payload_markdown_messy(rng: random.Random) -> str:
    return (
        f"# Heading one\n{_sentence(rng, 8)}\n"
        f"Some range 10−20 and a dash – here — plus ― bar.\n\n"
        f"   * indented item one\n  * indented item two\n\n\n\n"
        f"* star bullet\n{_sentence(rng, 6)}\n## Tight heading\n"
        f"{_paragraph(rng, 2)}"
    )


def _payload_hyphenated(rng: random.Random) -> str:
    return (
        f"{_sentence(rng, 5)} This sentence has a bro-\n ken word inside.\n"
        f"Another frag-\nmented line follows here.\n"
        f"Uppercase Bro-\nKen stays split in strict mode.\n"
        f"Number split 12-\n34 merges only loosely.\n{_sentence(rng, 7)}"
    )


def _payload_noisy(rng: random.Random, conv: int, turn: int, n_turns: int) -> str:
    body = "\n".join(_sentence(rng, rng.randint(6, 12)) for _ in range(rng.randint(4, 7)))
    return (
        f"ACME Corp Quarterly Report {conv}\n"
        f"{body}\n"
        f"|||---===\n"
        f"xkcdqrtlbn garble\n"
        f"CONFIDENTIAL\n"
        f"Page {turn + 1} of {n_turns}"
    )


def _payload_captioned(rng: random.Random) -> str:
    a, b = rng.randint(1, 99), rng.randint(1, 99)
    lines = [
        _sentence(rng, 8) + " See footnote [1].",
        f"Table {rng.randint(1, 5)}: Summary of results",
        f"| metric | value |\n|---|---|\n| alpha | {a} |\n| beta | {b} |",
        f"Figure {rng.randint(1, 5)}. Distribution overview",
        "![chart](image.png)",
        _paragraph(rng, 2),
    ]
    # long tail pushes footnote content into the bottom zone
    lines += [_sentence(rng, 6) for _ in range(18)]
    lines.append("[1] The footnote content lives here.")
    return "\n".join(lines)


def _payload_structured(rng: random.Random) -> str:
    return "\n".join([
        "EXECUTIVE SUMMARY",
        _paragraph(rng, 2),
        "1. Introduction",
        _sentence(rng, 10),
        "1.1 Background",
        f"1. {_sentence(rng, 3)[:-1]}",
        f"2. {_sentence(rng, 20)}",
        "• bullet alpha",
        "• bullet beta",
        f"a) lettered item {rng.choice(_WORDS)}",
        "References",
        _sentence(rng, 8),
    ])


def _payload_multilingual(rng: random.Random) -> str:
    lang = rng.choice(sorted(_LANG_SNIPPETS))
    return _LANG_SNIPPETS[lang] + "\n" + _LANG_SNIPPETS[lang]


def _payload_low_confidence(rng: random.Random) -> str:
    return "\n".join([
        _sentence(rng, 8),
        f"{{{{conf=0.62}}}}{_sentence(rng, 6)}",
        f"{{{{conf=0.41}}}}{_sentence(rng, 5)}",
        f"{{{{conf=0.25}}}}smudged",
        _sentence(rng, 7),
    ])


def _payload_hallucinated(rng: random.Random) -> str:
    return "\n".join([
        _sentence(rng, 7),
        "Based on the image, the chart trends upward.",
        f"I can see that {_sentence(rng, 5).lower()}",
        _sentence(rng, 9),
    ])


def _payload_plain(rng: random.Random) -> str:
    return "\n\n".join(_paragraph(rng, rng.randint(2, 4)) for _ in range(2))


def make_turn_text(kind: str, rng: random.Random, conv: int, turn: int,
                   n_turns: int) -> str:
    if kind == "html_doc":
        return _payload_html(rng, conv)
    if kind == "markdown_messy":
        return _payload_markdown_messy(rng)
    if kind == "hyphenated":
        return _payload_hyphenated(rng)
    if kind == "noisy_page":
        return _payload_noisy(rng, conv, turn, n_turns)
    if kind == "captioned":
        return _payload_captioned(rng)
    if kind == "structured":
        return _payload_structured(rng)
    if kind == "multilingual":
        return _payload_multilingual(rng)
    if kind == "low_confidence":
        return _payload_low_confidence(rng)
    if kind == "hallucinated":
        return _payload_hallucinated(rng)
    if kind == "empty":
        return "" if turn % 2 == 0 else "   \n  "
    return _payload_plain(rng)


def conversation_kinds(seed: int, conv: int, n_turns: int) -> list[str]:
    """Per-turn payload kinds. Noisy conversations repeat the noisy kind so
    cross-turn repeater detection has something to find."""
    rng = _rng(seed, conv, -1)
    if conv % 5 == 0 and n_turns >= 3:
        return ["noisy_page"] * n_turns
    return [rng.choice(PAYLOAD_KINDS) for _ in range(n_turns)]


def generate_transcripts(n_convs: int = 50, seed: int = 42,
                         min_turns: int = 1, max_turns: int = 10,
                         skew_conv_turns: int = 0) -> pa.Table:
    """Build the transcripts table. ``skew_conv_turns`` > 0 makes conv 0 a
    deliberately long conversation (skew exercise, FIXTURES.md §1)."""
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for conv in range(n_convs):
        rng = _rng(seed, conv, -2)
        n_turns = (skew_conv_turns if (conv == 0 and skew_conv_turns)
                   else rng.randint(min_turns, max_turns))
        kinds = conversation_kinds(seed, conv, n_turns)
        conv_id = f"conv-{seed}-{conv:06d}"
        base_us = _EPOCH_US + (int(hashlib.md5(conv_id.encode()).hexdigest()[:8], 16)
                               % 10_000_000) * 1_000_000
        for turn in range(n_turns):
            trng = _rng(seed, conv, turn)
            conv_ids.append(conv_id)
            turn_idxs.append(turn)
            roles.append(("user", "assistant", "tool")[turn % 3])
            texts.append(make_turn_text(kinds[turn], trng, conv, turn, n_turns))
            tools.append("browser" if kinds[turn] == "html_doc" else "")
            tss.append(base_us + turn * 60_000_000)
    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })


def transcripts_from_documents(doc_table: pa.Table, turns_per_conv: int = 6,
                               seed: int = 42) -> pa.Table:
    """Derive a transcripts table from the driver's ``documents`` table: each
    document becomes one conversation whose turns wrap chunks of the document
    text in the synthetic payload templates (deterministic; uses only the
    provided test data plus seeded templating)."""
    doc_ids = doc_table.column("doc_id").to_pylist()
    doc_texts = doc_table.column("text").to_pylist()
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    kind_cycle = ("html_doc", "plain", "markdown_messy", "noisy_page",
                  "captioned", "structured", "hyphenated", "low_confidence")
    for doc_id, doc_text in zip(doc_ids, doc_texts):
        conv_id = f"doc-{doc_id}"
        base_us = _EPOCH_US + (doc_id % 10_000_000) * 1_000_000
        chunks = _chunk(doc_text or "", turns_per_conv)
        for turn in range(turns_per_conv):
            rng = _rng(seed, doc_id, turn)
            kind = kind_cycle[(doc_id + turn) % len(kind_cycle)]
            body = make_turn_text(kind, rng, doc_id, turn, turns_per_conv)
            payload = chunks[turn] + "\n" + body if chunks[turn] else body
            if kind == "html_doc" and chunks[turn]:
                payload = body.replace("</main>",
                                       f"<p>{chunks[turn]}</p></main>")
            conv_ids.append(conv_id)
            turn_idxs.append(turn)
            roles.append(("user", "assistant", "tool")[turn % 3])
            texts.append(payload)
            tools.append("browser" if kind == "html_doc" else "")
            tss.append(base_us + turn * 60_000_000)
    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })


def _chunk(text: str, n: int) -> list[str]:
    if not text:
        return [""] * n
    step = max(1, len(text) // n)
    return [text[i * step:(i + 1) * step] for i in range(n)]


def write_transcripts_parquet(path: str, n_convs: int = 50, seed: int = 42,
                              **kwargs) -> str:
    import pyarrow.parquet as pq
    table = generate_transcripts(n_convs=n_convs, seed=seed, **kwargs)
    pq.write_table(table, path)
    return path
