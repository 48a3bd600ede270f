"""Text-analysis operators over the documents table: token counting,
quality counters, content fingerprinting, language id — each a vectorized
``map_batches`` stage; the first three have DuckDB-oracle twins (integer
outputs and md5 so results hash identically)."""

from __future__ import annotations

import hashlib
import re

import numpy as _np
import pyarrow as pa

import ray.data as rd

from raydoc.functions._collect import collect_table

from raydoc.kernels.lang import detect_language

_WS_RUN = re.compile(r"\s+")
_NON_ALPHA = re.compile(r"[^A-Za-z]")
_NON_DIGIT = re.compile(r"[^0-9]")
_SENT_PUNCT = re.compile(r"[^.!?]")
_TOKEN = re.compile(r"\S+")


def token_counts(sf_dir: str) -> pa.Table:
    """(doc_id, n_tokens) — whitespace tokenization, SQL-replicable."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        counts = [len(_TOKEN.findall(v or ""))
                  for v in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(counts, pa.int64())})

    out = ds.map_batches(fn, batch_format="pyarrow")
    return collect_table(out).sort_by("doc_id")


def quality_counters(sf_dir: str) -> pa.Table:
    """(doc_id, n_chars, n_alpha, n_digit, n_sentences) integer quality
    signals (ASCII classes so the SQL oracle is bit-identical)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n_chars, n_alpha, n_digit, n_sent = [], [], [], []
        for v in t.column("text").to_pylist():
            v = v or ""
            n_chars.append(len(v))
            n_alpha.append(len(_NON_ALPHA.sub("", v)))
            n_digit.append(len(_NON_DIGIT.sub("", v)))
            n_sent.append(len(_SENT_PUNCT.sub("", v)))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_chars": pa.array(n_chars, pa.int64()),
                         "n_alpha": pa.array(n_alpha, pa.int64()),
                         "n_digit": pa.array(n_digit, pa.int64()),
                         "n_sentences": pa.array(n_sent, pa.int64())})

    out = ds.map_batches(fn, batch_format="pyarrow")
    return collect_table(out).sort_by("doc_id")


def fingerprints(sf_dir: str) -> pa.Table:
    """(doc_id, fingerprint): md5 of the whitespace-collapsed, lowercased
    text — canonicalization + exact hash (the reference's dedup style,
    SURVEY.md §2.8), SQL-replicable."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(_WS_RUN.sub(" ", (v or "").lower()).strip().encode())
               .hexdigest() for v in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "fingerprint": pa.array(fps, pa.string())})

    out = ds.map_batches(fn, batch_format="pyarrow")
    return collect_table(out).sort_by("doc_id")


def winnowing_fingerprints(sf_dir: str, k: int = 5,
                           w: int = 4) -> pa.Table:
    """(doc_id, n_fingerprints, fp_sum): MOSS-style WINNOWING document
    fingerprints (Schleimer et al., SIGMOD 2003) — over the normalized
    text (lowercased, non-[a-z0-9] stripped), hash every char ``k``-gram
    (first 32 bits of its md5), slide a window of ``w`` consecutive gram
    hashes and select each window's MINIMUM; the fingerprint set is the
    DISTINCT selected hashes. Guarantees any shared substring of length
    ≥ k+w-1 contributes a shared fingerprint — the local-dedup /
    plagiarism primitive that survives reordering and edits, unlike the
    whole-doc ``fingerprints`` digest. Emitted as (count, sum) per doc
    so the row stays tiny and integer-exact (hash < 2³², count < 2¹⁶ →
    sum < 2⁴⁸); the DuckDB twin replays the same md5/window-min/distinct
    pipeline with window functions.

    Shape: embarrassingly parallel — one vectorized pass per batch
    (numpy sliding-window min over the gram-hash array), no shuffle."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    strip = re.compile(r"[^a-z0-9]")

    def fn(t: pa.Table) -> pa.Table:
        counts, sums = [], []
        for v in t.column("text").to_pylist():
            s = strip.sub("", (v or "").lower())
            n_grams = len(s) - k + 1
            if n_grams < w:
                counts.append(0)
                sums.append(0)
                continue
            hs = _np.array(
                [int.from_bytes(
                    hashlib.md5(s[i:i + k].encode()).digest()[:4], "big")
                 for i in range(n_grams)], dtype=_np.int64)
            mins = _np.lib.stride_tricks.sliding_window_view(
                hs, w).min(axis=1)
            sel = _np.unique(mins)
            counts.append(int(len(sel)))
            sums.append(int(sel.sum()))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_fingerprints": pa.array(counts, pa.int64()),
                         "fp_sum": pa.array(sums, pa.int64())})

    out = ds.map_batches(fn, batch_format="pyarrow")
    return collect_table(out).sort_by("doc_id")


def winnowing_shared_pairs(sf_dir: str, k: int = 5, w: int = 4,
                           min_shared: int = 5, max_df: int = 20,
                           num_buckets: int = 64) -> pa.Table:
    """(a, b, shared_fps): document pairs sharing ≥ ``min_shared``
    winnowing fingerprints — the pair-proposal stage that turns
    ``winnowing_fingerprints`` into an actual local-dedup operator
    (guaranteed to fire on any shared run of ≥ k+w-1 normalized chars,
    robust to reordering of the surrounding text, unlike MinHash whose
    signal needs whole-document resemblance).

    Shape: (fingerprint, doc) rows — hashes only — shuffle once on a
    coarse fingerprint bucket; per bucket each fingerprint's doc set
    expands to pairs (bounded by the fingerprint's doc frequency; a
    boilerplate fingerprint shared by everything is the hot-key case,
    so fingerprints occurring in more than ``max_df`` documents are
    DROPPED as boilerplate before pairing — the standard df-cap that
    both bounds the blowup and removes meaningless template matches);
    a combiner sums shared counts per pair. Oracle:
    winnowing-selection self-join with the same df cap."""
    import pandas as pd

    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    strip = re.compile(r"[^a-z0-9]")

    def fps(t: pa.Table) -> pa.Table:
        hs, ids, buckets = [], [], []
        for doc_id, v in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            s = strip.sub("", (v or "").lower())
            n_grams = len(s) - k + 1
            if n_grams < w:
                continue
            gh = _np.array(
                [int.from_bytes(
                    hashlib.md5(s[i:i + k].encode()).digest()[:4], "big")
                 for i in range(n_grams)], dtype=_np.int64)
            sel = _np.unique(
                _np.lib.stride_tricks.sliding_window_view(gh, w)
                .min(axis=1))
            hs.extend(int(x) for x in sel)
            ids.extend([doc_id] * len(sel))
            buckets.extend(int(x) % num_buckets for x in sel)
        return pa.table({"h": pa.array(hs, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(buckets, pa.int32())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, grp in g.groupby("h", sort=False):
            ds_ = sorted(set(grp["doc_id"]))
            if len(ds_) > max_df:      # boilerplate fingerprint
                continue
            for i in range(len(ds_)):
                for j in range(i + 1, len(ds_)):
                    a_out.append(ds_[i])
                    b_out.append(ds_[j])
        return pd.DataFrame({"a": a_out, "b": b_out,
                             "one": [1] * len(a_out)})

    counted = partial_groupby(
        ds.map_batches(fps, batch_format="pyarrow")
        .groupby("bucket").map_groups(pairs, batch_format="pandas"),
        ["a", "b"], {"shared_fps": ("one", "sum")})
    out = collect_table(counted)
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "shared_fps": pa.array([], pa.int64())})
    if out.num_rows == 0 or "a" not in out.schema.names:
        return empty
    import pyarrow.compute as pc
    out = out.filter(pc.greater_equal(out["shared_fps"],
                                      pa.scalar(min_shared)))
    return out.select(["a", "b", "shared_fps"]).sort_by(
        [("a", "ascending"), ("b", "ascending")])


def markdown_structure_stats(sf_dir: str) -> pa.Table:
    """(doc_id, n_headings, n_bullets, n_code_fences, n_links):
    markdown structural profile per document — the corpus-structure
    audit a markdown-extraction pipeline runs on its own output
    (documents suddenly losing headings/links marks an upstream
    extraction regression). Pure Arrow RE2 kernels per batch — zero
    Python in the loop — and the DuckDB twin runs the SAME RE2 patterns
    (both engines are RE2, so multiline anchors behave identically)."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pats = {"n_headings": r"(?m)^#{1,6} ",
            "n_bullets": r"(?m)^[-*] ",
            "n_code_fences": r"```",
            "n_links": r"\[[^\]]*\]\([^)]*\)"}

    def fn(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        cols = {"doc_id": pc.cast(t["doc_id"], pa.int64())}
        for name, pat in pats.items():
            cols[name] = pc.cast(pc.count_substring_regex(txt, pat),
                                 pa.int64())
        return pa.table(cols)

    out = ds.map_batches(fn, batch_format="pyarrow")
    return collect_table(out).sort_by("doc_id")


def rare_token_docs(sf_dir: str, num_buckets: int = 64) -> pa.Table:
    """(doc_id, n_tokens_distinct, n_hapax): hapax audit — per document,
    its distinct-token count and how many of its tokens occur EXACTLY
    ONCE in the whole corpus (counting multiplicity). A high hapax share
    marks OCR garble / random-string spam; near-zero across a large
    corpus marks template stamping. The token-grain sibling of
    ``ngram_novelty_curve``.

    Shape: (token, doc, multiplicity) rows from per-doc Counters, one
    coarse token-hash-bucket exchange (crc32 — deterministic, unlike
    salted ``hash()``), per-bucket fold decides hapax-ness and emits
    per-doc partials, a combiner sums. Oracle: token-count self-join."""
    import zlib

    import pandas as pd

    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    word = re.compile(r"[0-9a-z_]+")

    def tok_rows(t: pa.Table) -> pa.Table:
        ws, ids, ms, buckets = [], [], [], []
        for doc_id, v in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            from collections import Counter
            for w, m in Counter(word.findall((v or "").lower())).items():
                ws.append(w)
                ids.append(doc_id)
                ms.append(m)
                buckets.append(zlib.crc32(w.encode()) % num_buckets)
        return pa.table({"w": pa.array(ws, pa.string()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "m": pa.array(ms, pa.int64()),
                         "bucket": pa.array(buckets, pa.int32())})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        total = g.groupby("w")["m"].transform("sum")
        return g.assign(hapax=(total == 1).astype("int64"), one=1) \
            .groupby("doc_id", as_index=False) \
            .agg(n_tokens_distinct=("one", "sum"),
                 n_hapax=("hapax", "sum"))

    counted = partial_groupby(
        ds.map_batches(tok_rows, batch_format="pyarrow")
        .groupby("bucket").map_groups(fold, batch_format="pandas"),
        ["doc_id"], {"n_tokens_distinct": ("n_tokens_distinct", "sum"),
                     "n_hapax": ("n_hapax", "sum")})
    ct = collect_table(counted)
    nmap: dict = {}
    hmap: dict = {}
    if ct.num_rows and "doc_id" in ct.schema.names:
        nmap = dict(zip(ct.column("doc_id").to_pylist(),
                        ct.column("n_tokens_distinct").to_pylist()))
        hmap = dict(zip(ct.column("doc_id").to_pylist(),
                        ct.column("n_hapax").to_pylist()))
    all_ids = sorted(collect_table(
        ds.select_columns(["doc_id"])).column("doc_id").to_pylist())
    return pa.table({
        "doc_id": pa.array(all_ids, pa.int64()),
        "n_tokens_distinct": pa.array(
            [int(nmap.get(d, 0)) for d in all_ids], pa.int64()),
        "n_hapax": pa.array([int(hmap.get(d, 0)) for d in all_ids],
                            pa.int64())})


def quoted_sentences(sf_dir: str, min_tokens: int = 5,
                     num_buckets: int = 64) -> pa.Table:
    """(doc_id, n_sentences, n_quoted): verbatim quote contamination —
    per document, how many of its distinct qualifying sentences
    (split on [.!?], ≥ ``min_tokens`` words after tokenization) appear
    in at least one OTHER document. The sentence-grain dedup audit:
    quotation farms and mirror feeds light up here while doc- and
    near-dup passes stay quiet. Sentence identity = md5-prefix hash of
    the space-joined lowered ASCII token sequence, so whitespace and
    punctuation inside the sentence don't split identities.

    Shape: (hash, doc) rows — hashes only — one coarse-bucket exchange;
    per bucket each hash's doc-frequency decides quoted-ness and emits
    per-doc counts; a combiner folds. Oracle: DISTINCT sentence-hash
    self-count."""
    import pandas as pd

    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    word = re.compile(r"[0-9a-z_]+")
    sent_split = re.compile(r"[.!?]")

    def keys(t: pa.Table) -> pa.Table:
        hs, ids, buckets = [], [], []
        for doc_id, v in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            seen = set()
            for s in sent_split.split(v or ""):
                toks = word.findall(s.lower())
                if len(toks) < min_tokens:
                    continue
                seen.add(int(hashlib.md5(
                    " ".join(toks).encode()).hexdigest()[:12], 16))
            for h in seen:
                hs.append(h)
                ids.append(doc_id)
                buckets.append(h % num_buckets)
        return pa.table({"h": pa.array(hs, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(buckets, pa.int32())})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        df = g.groupby("h")["doc_id"].transform("size")
        out = g.assign(q=(df >= 2).astype("int64"),
                       one=1).groupby("doc_id", as_index=False) \
            .agg(n_sentences=("one", "sum"), n_quoted=("q", "sum"))
        return out

    counted = partial_groupby(
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("bucket").map_groups(fold, batch_format="pandas"),
        ["doc_id"], {"n_sentences": ("n_sentences", "sum"),
                     "n_quoted": ("n_quoted", "sum")})
    ct = collect_table(counted)
    cmap_n: dict = {}
    cmap_q: dict = {}
    if ct.num_rows and "doc_id" in ct.schema.names:
        cmap_n = dict(zip(ct.column("doc_id").to_pylist(),
                          ct.column("n_sentences").to_pylist()))
        cmap_q = dict(zip(ct.column("doc_id").to_pylist(),
                          ct.column("n_quoted").to_pylist()))
    all_ids = sorted(collect_table(
        ds.select_columns(["doc_id"])).column("doc_id").to_pylist())
    return pa.table({
        "doc_id": pa.array(all_ids, pa.int64()),
        "n_sentences": pa.array([int(cmap_n.get(d, 0)) for d in all_ids],
                                pa.int64()),
        "n_quoted": pa.array([int(cmap_q.get(d, 0)) for d in all_ids],
                             pa.int64())})


def ngram_novelty_curve(sf_dir: str, n: int = 8,
                        num_buckets: int = 64) -> pa.Table:
    """(doc_id, total_grams, novel_grams, novelty_ppm): reading the
    corpus in doc_id order, what fraction of each document's distinct
    word ``n``-grams has NEVER appeared in an earlier document —
    the memorization/diversity curve (a template-stamped or
    self-plagiarizing corpus collapses toward 0 early; fresh corpora
    stay high). ppm = 1e6·novel // total, integer-exact.

    Shape: (gram-hash, doc) rows shuffle once on a coarse hash bucket;
    a combiner MIN(doc_id) per hash finds each gram's first document;
    per-doc novel counts and per-doc totals fold in two more combiner
    groupbys — no sort, no corpus-sized driver state. Oracle: MIN per
    hash + LEFT JOIN."""
    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    word = re.compile(r"[0-9a-z_]+")

    def grams(t: pa.Table) -> pa.Table:
        hs, ids, buckets = [], [], []
        for doc_id, v in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            toks = word.findall((v or "").lower())
            seen = set()
            for i in range(len(toks) - n + 1):
                h = int(hashlib.md5(
                    " ".join(toks[i:i + n]).encode()).hexdigest()[:12], 16)
                seen.add(h)
            for h in seen:
                hs.append(h)
                ids.append(doc_id)
                buckets.append(h % num_buckets)
        return pa.table({"h": pa.array(hs, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(buckets, pa.int32())})

    gram_rows = ds.map_batches(grams, batch_format="pyarrow") \
        .materialize()   # consumed twice: first-doc fold + totals fold

    firsts = partial_groupby(gram_rows, ["bucket", "h"],
                             {"first_doc": ("doc_id", "min")})
    novel = partial_groupby(
        firsts.map_batches(
            lambda t: pa.table({"doc_id": t["first_doc"]})
            if t.num_rows and "first_doc" in t.schema.names
            else pa.table({"doc_id": pa.array([], pa.int64())}),
            batch_format="pyarrow"),
        ["doc_id"], {"novel_grams": ("doc_id", "count")})
    totals = partial_groupby(gram_rows, ["doc_id"],
                             {"total_grams": ("h", "count")})

    nt = collect_table(novel)
    tt = collect_table(totals)
    nmap = (dict(zip(nt.column("doc_id").to_pylist(),
                     nt.column("novel_grams").to_pylist()))
            if nt.num_rows and "doc_id" in nt.schema.names else {})
    tmap = (dict(zip(tt.column("doc_id").to_pylist(),
                     tt.column("total_grams").to_pylist()))
            if tt.num_rows and "doc_id" in tt.schema.names else {})
    all_ids = sorted(collect_table(
        ds.select_columns(["doc_id"])).column("doc_id").to_pylist())
    tot = [int(tmap.get(d, 0)) for d in all_ids]
    nov = [int(nmap.get(d, 0)) for d in all_ids]
    return pa.table({
        "doc_id": pa.array(all_ids, pa.int64()),
        "total_grams": pa.array(tot, pa.int64()),
        "novel_grams": pa.array(nov, pa.int64()),
        "novelty_ppm": pa.array(
            [1_000_000 * nv // t if t else 0 for nv, t in zip(nov, tot)],
            pa.int64())})


def cross_source_gram_overlap(sf_dir: str, n: int = 8,
                              num_buckets: int = 64) -> pa.Table:
    """(src_a, src_b, shared_grams): GRAM-level cross-source
    contamination — for every unordered source pair, how many distinct
    word ``n``-gram hashes (first 48 bits of md5 over the
    space-joined lowered ASCII tokens) occur in BOTH sources. The
    sharper sibling of ``dup_source_matrix`` (whole-doc digests): one
    feed paraphrasing or partially quoting another shows up here while
    the doc-level matrix stays empty.

    Shape: hashes-only wire — per batch, per-doc distinct (hash,
    source) pairs emit with a coarse hash bucket; a combiner groupby
    dedups globally; per bucket each hash's source set expands to ≤
    |sources|² pairs; a final combiner sums pair counts. Oracle:
    DISTINCT gram-source self-join."""
    import pandas as pd

    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])
    word = re.compile(r"[0-9a-z_]+")

    def grams(t: pa.Table) -> pa.Table:
        hs, srcs, buckets = [], [], []
        for v, src in zip(t.column("text").to_pylist(),
                          t.column("source").to_pylist()):
            toks = word.findall((v or "").lower())
            seen = set()
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i:i + n])
                h = int(hashlib.md5(g.encode()).hexdigest()[:12], 16)
                seen.add(h)
            for h in seen:
                hs.append(h)
                srcs.append(src)
                buckets.append(h % num_buckets)
        return pa.table({"h": pa.array(hs, pa.int64()),
                         "source": pa.array(srcs, pa.string()),
                         "bucket": pa.array(buckets, pa.int32())})

    deduped = partial_groupby(
        ds.map_batches(grams, batch_format="pyarrow"),
        ["bucket", "h", "source"], {"__n": ("h", "count")})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, grp in g.groupby("h", sort=False):
            ss = sorted(set(grp["source"]))
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    a_out.append(ss[i])
                    b_out.append(ss[j])
        return pd.DataFrame({"src_a": a_out, "src_b": b_out,
                             "one": [1] * len(a_out)})

    counted = partial_groupby(
        deduped.groupby("bucket").map_groups(pairs,
                                             batch_format="pandas"),
        ["src_a", "src_b"], {"shared_grams": ("one", "sum")})
    out = collect_table(counted)
    if out.num_rows == 0 or "src_a" not in out.schema.names:
        return pa.table({"src_a": pa.array([], pa.string()),
                         "src_b": pa.array([], pa.string()),
                         "shared_grams": pa.array([], pa.int64())})
    return out.select(["src_a", "src_b", "shared_grams"]).sort_by(
        [("src_a", "ascending"), ("src_b", "ascending")])


def language_id(sf_dir: str) -> pa.Table:
    """(doc_id, language, script) via the unicode-script/common-word
    heuristic (kernels/lang.py) — no SQL analog, rows-only check."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        langs, scripts = [], []
        for v in t.column("text").to_pylist():
            r = detect_language(v or "")
            langs.append(r["language"])
            scripts.append(r["script"])
        return pa.table({"doc_id": t.column("doc_id"),
                         "language": pa.array(langs, pa.string()),
                         "script": pa.array(scripts, pa.string())})

    out = ds.map_batches(fn, batch_format="pyarrow")
    return collect_table(out).sort_by("doc_id")


def markdown_to_txt_docs(sf_dir: str) -> pa.Table:
    """(doc_id, plain_text): the K3 markdown→plain-text writer
    (utils/formatters.py:74-83) applied per document."""
    from raydoc.kernels.textnorm import markdown_to_txt

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        txts = [markdown_to_txt(v or "") for v in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "plain_text": pa.array(txts, pa.large_string())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        "doc_id")


def markdown_to_html_docs(sf_dir: str) -> pa.Table:
    """(doc_id, html): the K2 markdown→HTML writer
    (kernels/textnorm.py:markdown_to_html) applied per document."""
    from raydoc.kernels.textnorm import markdown_to_html

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        htmls = [markdown_to_html(v or "")
                 for v in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "html": pa.array(htmls, pa.large_string())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        "doc_id")


def train_test_split(sf_dir: str, train_hex_max: str = "c") -> pa.Table:
    """(doc_id, split): deterministic content-hash split — md5 of the text's
    first hex digit < ``train_hex_max`` ⇒ 'train' (12/16 = 75%), else
    'test'. Pure function of the row ⇒ stable across runs, cluster sizes
    and input order (the training-pipeline splitter; SQL-replicable)."""
    import hashlib as _hl

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        splits = ["train" if _hl.md5((v or "").encode()).hexdigest()[0]
                  < train_hex_max else "test"
                  for v in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "split": pa.array(splits, pa.string())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        "doc_id")


def weighted_sample(sf_dir: str, k: int = 100) -> pa.Table:
    """(doc_id, n_chars): deterministic weight-proportional sample of k
    documents, biased toward LONGER documents — the data-mixing primitive
    (sample a corpus proportional to length/quality weight).

    Scheme: key(doc) = md5_lower64(doc_id) // n_chars (all uint64 integer
    arithmetic); keep the k smallest keys. A document with twice the
    weight has (in distribution) half the key — weight-biased selection
    that is a pure function of the row: stable across runs, cluster sizes
    and input order, and bit-exactly replicable in SQL (DuckDB
    ``md5_number_lower`` = little-endian LAST 8 md5 digest bytes,
    verified against this implementation).

    Distribution: each batch computes keys vectorized and keeps its LOCAL
    top-k (the global top-k is a subset of the union of local top-ks), so
    the driver merges #batches × k candidate rows, never the corpus."""
    import hashlib as _hl

    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        w = t.column("n_chars").to_numpy(zero_copy_only=False) \
             .astype(np.uint64)
        lo64 = np.array([int.from_bytes(
            _hl.md5(str(int(i)).encode()).digest()[8:], "little")
            for i in ids], dtype=np.uint64)
        key = lo64 // np.maximum(w, np.uint64(1))
        order = np.lexsort((ids, key))[:k]
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "n_chars": pa.array(w[order].astype(np.int64), pa.int64()),
            "key": pa.array(key[order], pa.uint64()),
        })

    cand = collect_table(ds.map_batches(local_topk, batch_format="pyarrow"))
    import pandas as pd
    df = cand.to_pandas().sort_values(["key", "doc_id"]).head(k)
    return pa.Table.from_pandas(
        df[["doc_id", "n_chars"]], preserve_index=False).cast(
        pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())])) \
        .sort_by("doc_id")


def pack_sequences(sf_dir: str, seq_len: int = 2048,
                   num_buckets: int = 64) -> pa.Table:
    """(doc_id, n_tokens, tok_offset, seq_id): GPT-style sequence packing —
    concatenate all documents in doc_id order and chunk the token stream
    into ``seq_len`` sequences; each doc's ``tok_offset`` is its start in
    the global stream, ``seq_id`` the sequence its first token lands in.

    The global running offset is a distributed prefix sum (the classic
    scan decomposition): (1) one pass reduces each doc to its token count;
    (2) doc_ids are range-bucketed (order-preserving) and per-bucket token
    totals are combined with a tiny shuffle; (3) the driver exclusive-scans
    the B bucket totals (B rows, never doc rows) and each bucket adds its
    base to a local vectorized cumsum. No global sort, no driver-side doc
    loop — scales to any corpus the combiner pattern scales to."""
    import numpy as np
    import pandas as pd

    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def count_fn(t: pa.Table) -> pa.Table:
        counts = [len(_TOKEN.findall(v or ""))
                  for v in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(counts, pa.int64())})

    # metadata-sized (16 B/doc) — materialized so the two downstream passes
    # don't re-read and re-tokenize the corpus text
    counts = ds.map_batches(count_fn, batch_format="pyarrow").materialize()
    max_id = counts.max("doc_id")
    span = max_id + 1

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = pc.cast(pc.divide(pc.multiply(t["doc_id"], num_buckets), span),
                    pa.int32())
        return t.append_column("bucket", b)

    bucketed = counts.map_batches(add_bucket, batch_format="pyarrow")
    totals = collect_table(partial_groupby(
        bucketed, ["bucket"], {"tot": ("n_tokens", "sum")})).sort_by("bucket")
    base_of = {}
    acc = 0
    for b, tot in zip(totals.column("bucket").to_pylist(),
                      totals.column("tot").to_pylist()):
        base_of[b] = acc
        acc += tot

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", ignore_index=True)
        n = g["n_tokens"].to_numpy()
        off = base_of[int(g["bucket"].iloc[0])] + n.cumsum() - n
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": n,
            "tok_offset": off,
            "seq_id": off // np.int64(seq_len),
        })

    out = bucketed.groupby("bucket").map_groups(per_bucket,
                                                batch_format="pandas")
    return collect_table(out).sort_by("doc_id")


def _word_4gram_hashes(text: str) -> "np.ndarray":
    """Sorted unique 64-bit hashes (md5 prefix) of the lowercase word
    4-grams of ``text`` — the decontamination match unit."""
    import numpy as np
    toks = re.findall(r"\w+", (text or "").lower())
    if len(toks) < 4:
        return np.empty(0, dtype=np.uint64)
    grams = {" ".join(toks[i:i + 4]) for i in range(len(toks) - 3)}
    return np.unique(np.fromiter(
        (int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
         for g in grams), dtype=np.uint64, count=len(grams)))


def decontaminate(sf_dir: str, bench_mod: int = 50) -> pa.Table:
    """(doc_id, contaminated) for every non-benchmark document: flag docs
    sharing ANY lowercase word 4-gram with the benchmark slice
    (``doc_id % bench_mod == 0``) — the classic test-set decontamination
    op of a training-data pipeline.

    Scale shape: the benchmark side (small by definition) reduces to
    per-batch-unique 4-gram hashes, lands once in the object store
    (``ray.put``) and every corpus task probes it with a vectorized
    ``np.isin`` — a broadcast semi-join, no shuffle of corpus text."""
    import numpy as np

    import ray

    bench = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % bench_mod == 0))
        hs = [_word_4gram_hashes(v) for v in t.column("text").to_pylist()]
        merged = (np.unique(np.concatenate(hs)) if hs
                  else np.empty(0, dtype=np.uint64))
        return pa.table({"h": pa.array(merged, pa.uint64())})

    gram_tbl = collect_table(
        bench.map_batches(bench_grams, batch_format="pyarrow"))
    bench_set = np.unique(gram_tbl.column("h").to_numpy(zero_copy_only=False))
    bench_ref = ray.put(bench_set)

    corpus = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])

    def flag(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % bench_mod != 0))
        grams = ray.get(bench_ref)
        flags = [bool(np.isin(_word_4gram_hashes(v), grams,
                              assume_unique=True).any())
                 for v in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "contaminated": pa.array(flags, pa.bool_())})

    out = corpus.map_batches(flag, batch_format="pyarrow")
    return collect_table(out).sort_by("doc_id")


def shuffle_sample(sf_dir: str, n: int = 100, seed: int = 7) -> pa.Table:
    """Seeded global ``random_shuffle`` + limit — the example-shuffling step
    of a training-data pipeline (a full all-to-all exchange; rows-only
    check, ordering is not SQL-replicable)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = ds.random_shuffle(seed=seed).limit(n)
    return collect_table(out)


def validate_docs(sf_dir: str) -> pa.Table:
    """(doc_id, quality_score, syntax_valid, schema_compliant,
    hallucination_count): the MarkdownValidator port (validator.py:12-313)
    applied per document through a map_batches stage (rows-only check —
    the scoring rubric has no SQL analog; kernel equality is golden-tested
    against the reference in tests/test_kernels_validator_basic.py)."""
    from raydoc.kernels.validator_basic import validate_markdown_basic

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        scores, syntax, schema, halluc = [], [], [], []
        for v in t.column("text").to_pylist():
            r = validate_markdown_basic(v or "")
            scores.append(round(r["quality_score"], 6))
            syntax.append(r["syntax_valid"])
            schema.append(r["schema_compliant"])
            halluc.append(len(r["hallucination_markers"]))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "quality_score": pa.array(scores, pa.float64()),
            "syntax_valid": pa.array(syntax, pa.bool_()),
            "schema_compliant": pa.array(schema, pa.bool_()),
            "hallucination_count": pa.array(halluc, pa.int64()),
        })

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        "doc_id")


def html_docs(sf_dir: str) -> pa.Table:
    """(doc_id, is_html): the router stage's payload-kind sniff
    (kernels/htmlstrip.py:looks_like_html) — SQL-replicable."""
    from raydoc.kernels.htmlstrip import looks_like_html

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        flags = [looks_like_html(v or "") for v in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "is_html": pa.array(flags, pa.bool_())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        "doc_id")


def ngram_logprob(sf_dir: str, n: int = 3) -> pa.Table:
    """(doc_id, logprob): per-doc mean char-n-gram log-probability under a
    model TRAINED ON THE CORPUS ITSELF — the classic LM-based quality
    filter (low scores ⇒ garbled/unnatural text).

    Two Ray passes, both scale-shaped: (1) per-batch n-gram Counter
    partials → combiner groupby → the (small: bounded by |charset|^n seen)
    count table collects and becomes a broadcast log-prob map with add-one
    smoothing; (2) one vectorized scoring map over the corpus. The model
    never exceeds the seen-vocabulary size; document text never leaves its
    batch."""
    import math

    import ray

    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def grams(text: str):
        s = _WS_RUN.sub(" ", (text or "").lower())
        return (s[i:i + n] for i in range(len(s) - n + 1))

    def count_partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for v in t.column("text").to_pylist():
            c.update(grams(v))
        ks = list(c.keys())
        return pa.table({"gram": pa.array(ks, pa.string()),
                         "cnt": pa.array([c[k] for k in ks], pa.int64())})

    counts = partial_groupby(ds.map_batches(count_partial,
                                            batch_format="pyarrow"),
                             ["gram"], {"cnt": ("cnt", "sum")})
    model_t = collect_table(counts)
    total = sum(model_t.column("cnt").to_pylist())
    vocab = model_t.num_rows
    denom = math.log(total + vocab)
    logp = {g: math.log(c + 1) - denom
            for g, c in zip(model_t.column("gram").to_pylist(),
                            model_t.column("cnt").to_pylist())}
    unseen = math.log(1) - denom
    model_ref = ray.put((logp, unseen))

    def score(t: pa.Table) -> pa.Table:
        mdl, uns = ray.get(model_ref)
        out = []
        for v in t.column("text").to_pylist():
            gs = list(grams(v))
            if not gs:
                out.append(0.0)
                continue
            out.append(round(sum(mdl.get(g, uns) for g in gs) / len(gs), 6))
        return pa.table({"doc_id": t.column("doc_id"),
                         "logprob": pa.array(out, pa.float64())})

    return collect_table(ds.map_batches(score, batch_format="pyarrow")).sort_by(
        "doc_id")


_SYMBOLS = re.compile(r"[#@\^~\\|<>{}\[\]]")
_BULLET_LINE = re.compile(r"^[-*•]", re.MULTILINE)


def _gopher_metrics(text: str) -> tuple[int, int, int, int, int, bool]:
    """(n_words, n_nonws_chars, n_symbols, n_bullet_lines, n_lines,
    quality_ok) — the shared per-doc Gopher rule evaluation (used by
    ``gopher_quality`` and ``corpus_quality_report``; thresholds live
    HERE only)."""
    words = _TOKEN.findall(text)
    nw = len(words)
    nonws = sum(len(w) for w in words)
    sym = len(_SYMBOLS.findall(text))
    nl = len(text.split("\n"))
    bl = len(_BULLET_LINE.findall(text))
    ok = (nw >= 50 and 3 * nw <= nonws <= 10 * nw
          and 10 * sym < nw and 10 * bl < 9 * nl)
    return nw, nonws, sym, bl, nl, ok


def gopher_quality(sf_dir: str) -> pa.Table:
    """Gopher-style per-doc quality signals (Rae et al. 2021 §A1.1 rules,
    the subset expressible both here and in the SQL oracle). ALL-INTEGER
    outputs + the combined gate, with the ratio thresholds evaluated as
    exact integer comparisons (3 ≤ mean word length ≤ 10 ⇔
    3·n_words ≤ n_nonws_chars ≤ 10·n_words; symbol ratio < 0.1 ⇔
    10·n_symbols < n_words; bullet-line ratio < 0.9 ⇔
    10·n_bullet_lines < 9·n_lines; n_words ≥ 50) so the oracle hashes
    bit-identically — no float rounding-mode hazards."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        nw_o, nc_o, sym_o, bl_o, nl_o, ok_o = [], [], [], [], [], []
        for v in t.column("text").to_pylist():
            nw, nonws, sym, bl, nl, ok = _gopher_metrics(v or "")
            nw_o.append(nw)
            nc_o.append(nonws)
            sym_o.append(sym)
            bl_o.append(bl)
            nl_o.append(nl)
            ok_o.append(ok)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_words": pa.array(nw_o, pa.int64()),
            "n_nonws_chars": pa.array(nc_o, pa.int64()),
            "n_symbols": pa.array(sym_o, pa.int64()),
            "n_bullet_lines": pa.array(bl_o, pa.int64()),
            "n_lines": pa.array(nl_o, pa.int64()),
            "quality_ok": pa.array(ok_o, pa.bool_()),
        })

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        "doc_id")


# GPT-2-style pre-tokenizer pattern, ASCII classes, no lookahead (RE2-safe
# so the DuckDB oracle runs the IDENTICAL pattern)
_BPE_SPLIT = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")


def bpe_token_counts(sf_dir: str) -> pa.Table:
    """(doc_id, n_bpe_tokens): GPT-2-style pre-tokenizer segmentation count
    — the "BPE-ish regex" token estimate a training pipeline budgets with
    (a pre-tokenizer piece maps to ≥1 BPE tokens, so this lower-bounds the
    real count). Same regex in the SQL oracle."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        counts = [len(_BPE_SPLIT.findall(v or ""))
                  for v in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_bpe_tokens": pa.array(counts, pa.int64())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        "doc_id")


_PII_URL = re.compile(r"https?://[^\s]+")
_PII_EMAIL = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_PII_IP = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")


def redact_pii(sf_dir: str) -> pa.Table:
    """(doc_id, redacted): C4-style PII scrub — URLs, then emails, then
    IPv4 literals replaced with placeholder tags, in that order (URL first
    so credentials-in-URL never survive as an email match). Pure
    vectorized regex chain; identical patterns in the SQL oracle."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        out = []
        for v in t.column("text").to_pylist():
            s = _PII_URL.sub("<URL>", v or "")
            s = _PII_EMAIL.sub("<EMAIL>", s)
            s = _PII_IP.sub("<IP>", s)
            out.append(s)
        return pa.table({"doc_id": t.column("doc_id"),
                         "redacted": pa.array(out, pa.large_string())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        "doc_id")


def paragraph_dedup_stats(sf_dir: str) -> pa.Table:
    """(doc_id, n_paragraphs, n_unique_paragraphs): the within-document
    repetition signal used by repetition-removal filters (Gopher §A1.1) —
    blank-line-delimited paragraphs, exact duplicate counting."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n_p, n_u = [], []
        for v in t.column("text").to_pylist():
            paras = (v or "").split("\n\n")
            n_p.append(len(paras))
            n_u.append(len(set(paras)))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_paragraphs": pa.array(n_p, pa.int64()),
                         "n_unique_paragraphs": pa.array(n_u, pa.int64())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        "doc_id")


def tfidf_top_terms(sf_dir: str, top_n: int = 3,
                    num_buckets: int | None = None,
                    df_broadcast_max: int | None = 4_000_000) -> pa.Table:
    """(doc_id, rank, term, score): each document's ``top_n`` terms by an
    integer-exact tf-idf surrogate ``score = tf * 1_000_000 // df`` (ties
    broken by term asc) — the keyword-extraction step of a corpus
    analysis pipeline, kept in integer arithmetic so the DuckDB oracle
    hashes bit-identically (float idf would tie-break nondeterministically
    across runtimes).

    Scale shape: tf is doc-local (one Counter per row, no shuffle); df is
    a combiner groupby over the exploded (doc_id, term) rows (partials
    only cross the wire). The df table is vocabulary-sized, so the join
    back is ADAPTIVE (same regime discipline as ``neardup_components``):
    when the materialized vocabulary has ≤ ``df_broadcast_max`` terms it
    broadcasts once (``ray.put``) and every tf row joins map-side — no
    second shuffle of the corpus-sized tf stream; a larger vocabulary
    (open-web token soup) falls back to the bucketed hash join. Pass
    ``df_broadcast_max=None`` to force the bucketed path. The final
    per-doc top-N reduces on a coarse doc bucket, never one group per
    doc."""
    from collections import Counter

    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.functions.agg import partial_groupby
    from raydoc.functions.joins import bucket_hash_join

    word = re.compile(r"\w+")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def explode_tf(t: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for d, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            for tok, tf in Counter(word.findall((txt or "").lower())).items():
                ids.append(d)
                terms.append(tok)
                tfs.append(tf)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "term": pa.array(terms, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    # one (doc_id, term) row per distinct term per doc -> df = row count
    tf_rows = ds.map_batches(explode_tf, batch_format="pyarrow")
    df_rows = partial_groupby(tf_rows, ["term"], {"df": ("term", "count")})
    if df_broadcast_max is not None:
        df_rows = df_rows.materialize()   # vocab-sized, cluster-resident
    if (df_broadcast_max is not None
            and df_rows.count() <= df_broadcast_max):
        from raydoc.functions.joins import broadcast_join
        joined = broadcast_join(tf_rows, collect_table(df_rows), "term")
    else:
        joined = bucket_hash_join(tf_rows, df_rows, "term")

    mask = (num_buckets or reduce_bucket_count()) - 1

    def score_and_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        score = pc.divide(pc.multiply(t["tf"], 1_000_000), t["df"])
        return pa.table({
            "doc_id": t["doc_id"], "term": t["term"], "score": score,
            "bucket": pc.cast(pc.bit_wise_and(t["doc_id"], mask),
                              pa.int32())})

    def per_bucket_topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True], ignore_index=True)
        g = g.groupby("doc_id", sort=False).head(top_n).reset_index(drop=True)
        g["rank"] = g.groupby("doc_id", sort=False).cumcount() + 1
        return g[["doc_id", "rank", "term", "score"]]

    out = (joined.map_batches(score_and_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket_topn,
                                         batch_format="pandas"))
    t = collect_table(out)
    return t.set_column(t.schema.get_field_index("rank"), "rank",
                        t.column("rank").cast(pa.int64())).sort_by(
        [("doc_id", "ascending"), ("rank", "ascending")])


def pmi_collocations(sf_dir: str, top_n: int = 20, min_count: int = 5,
                     num_buckets: int | None = None) -> pa.Table:
    """(w1, w2, n_xy, score_micro): the ``top_n`` adjacent-word
    collocations by an integer PMI surrogate —
    score = c_xy·N_u²·10⁶ // (N_b·c_x·c_y), i.e. ⌊10⁶·p(x,y)/(p(x)p(y))⌋
    with bigram/unigram normalizers — rendered VARCHAR (the exact value
    exceeds int64 at corpus scale; the HUGEINT SQL twin renders
    identically). Ties break (score desc, w1, w2), bigrams under
    ``min_count`` prune before scoring.

    Shape: unigram counts are one combiner groupby broadcast back as a
    dict (vocabulary-sized — same caveat as ``tfidf_top_terms``: at
    open-web vocab swap for a bucketed join); bigram counts combine per
    batch and reduce on a coarse bucket where each bigram lives whole, so
    per-bucket Python-int scoring + local top-N is exact; the driver
    merges B candidate lists."""
    from collections import Counter

    import pandas as pd

    import ray

    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.functions.agg import partial_groupby

    word = re.compile(r"\w+")
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def uni_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        n_big = 0
        for txt in t.column("text").to_pylist():
            toks = word.findall((txt or "").lower())
            c.update(toks)
            n_big += max(len(toks) - 1, 0)
        return pa.table({"w": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64()),
                         "nb": pa.array([n_big] + [0] * (len(c) - 1)
                                        if c else [], pa.int64())})

    uni_t = collect_table(partial_groupby(
        ds.map_batches(uni_partial, batch_format="pyarrow"),
        ["w"], {"n": ("n", "sum"), "nb": ("nb", "sum")}))
    uni = dict(zip(uni_t.column("w").to_pylist(),
                   (int(v) for v in uni_t.column("n").to_pylist())))
    n_uni = sum(uni.values())
    n_big = sum(int(v) for v in uni_t.column("nb").to_pylist())
    uni_ref = ray.put(uni)

    def big_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t.column("text").to_pylist():
            toks = word.findall((txt or "").lower())
            c.update(zip(toks, toks[1:]))
        w1 = [k[0] for k in c]
        w2 = [k[1] for k in c]
        # categorize=False — the default path is array-dependent for
        # equal values (see profile.py), which would split a bigram's
        # partials across buckets
        h = pd.util.hash_array(
            _np.array([f"{a}\x00{b}" for a, b in c], dtype=object),
            categorize=False)
        return pa.table({
            "w1": pa.array(w1, pa.string()),
            "w2": pa.array(w2, pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
            "bucket": pa.array((h & _np.uint64(mask)).astype(_np.int32))})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = ray.get(uni_ref)
        g = (g.groupby(["w1", "w2"], sort=False)["n"].sum()
             .reset_index())
        g = g[g["n"] >= min_count]
        if not len(g):
            return pd.DataFrame({"w1": [], "w2": [], "n_xy": [],
                                 "score_micro": []}).astype(
                {"w1": str, "w2": str, "n_xy": "int64",
                 "score_micro": str})
        scores = [int(c) * n_uni * n_uni * 1_000_000
                  // (n_big * u[a] * u[b])
                  for a, b, c in zip(g["w1"], g["w2"], g["n"])]
        g = g.assign(score=scores)
        g = g.sort_values(["score", "w1", "w2"],
                          ascending=[False, True, True]).head(top_n)
        return pd.DataFrame({"w1": g["w1"], "w2": g["w2"],
                             "n_xy": g["n"].astype("int64"),
                             "score_micro": [str(s) for s in g["score"]]})

    cand = collect_table(
        ds.map_batches(big_partial, batch_format="pyarrow")
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    rows = sorted(cand.to_pylist(),
                  key=lambda r: (-int(r["score_micro"]), r["w1"], r["w2"]))
    rows = rows[:top_n]
    return pa.table({
        "w1": pa.array([r["w1"] for r in rows], pa.string()),
        "w2": pa.array([r["w2"] for r in rows], pa.string()),
        "n_xy": pa.array([r["n_xy"] for r in rows], pa.int64()),
        "score_micro": pa.array([r["score_micro"] for r in rows],
                                pa.string())})


def _edit1(a: str, b: str) -> bool:
    """Exact Levenshtein-distance ≤ 1 predicate (a != b assumed)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:                       # exactly one substitution
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b = a with one insertion
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_name_pairs(sf_dir: str,
                     num_buckets: int | None = None,
                     table: str = "customer",
                     column: str = "c_name") -> pa.Table:
    """(w1, w2): every UNORDERED pair of distinct customer names within
    Levenshtein distance 1 — the string-similarity self-join (record
    linkage / typo clustering), SQL twin = the quadratic
    ``levenshtein() <= 1`` self-join.

    Shape — SymSpell deletion-key blocking, NEVER the O(V²) cross
    product: the name set reduces by a combiner distinct; each name
    explodes into itself + its single-deletion variants (any distance-1
    pair provably shares a variant); variants bucket by hash so
    candidates meet in one group; exact edit-distance verification runs
    per bucket; a pair found via several shared variants dedups in one
    final tiny combiner. Shuffle volume is O(V·avg_len) variant rows —
    key-set-scale, not corpus-scale."""
    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.functions.agg import partial_groupby

    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet",
                         columns=[column])

    def vocab_partial(t: pa.Table) -> pa.Table:
        vs = {v for v in t.column(column).to_pylist() if v is not None}
        return pa.table({"w": pa.array(sorted(vs), pa.string())})

    vocab = partial_groupby(
        ds.map_batches(vocab_partial, batch_format="pyarrow"),
        ["w"], {"__n": ("w", "count")})

    def explode_deletions(t: pa.Table) -> pa.Table:
        keys, words = [], []
        for w in t.column("w").to_pylist():
            keys.append(w)
            words.append(w)
            for i in range(len(w)):
                keys.append(w[:i] + w[i + 1:])
                words.append(w)
        h = pd.util.hash_array(_np.array(keys, dtype=object),
                               categorize=False)
        return pa.table({
            "key": pa.array(keys, pa.string()),
            "w": pa.array(words, pa.string()),
            "bucket": pa.array((h & _np.uint64(mask)).astype(_np.int32))})

    def per_bucket(g: pa.Table) -> pa.Table:
        # candidate pairs via a vectorized self-merge on the variant key
        # (runs are tiny — ≤ alphabet size — so the merge blowup is
        # bounded); Python only touches the surviving unique pairs
        df = g.select(["key", "w"]).to_pandas().drop_duplicates()
        m = df.merge(df, on="key")
        m = m[m["w_x"] < m["w_y"]].drop_duplicates(["w_x", "w_y"])
        if len(m):
            keep = _np.fromiter(
                (_edit1(a, b) for a, b in zip(m["w_x"], m["w_y"])),
                dtype=bool, count=len(m))
            m = m[keep]
        return pa.table({"w1": pa.array(m["w_x"].tolist(), pa.string()),
                         "w2": pa.array(m["w_y"].tolist(), pa.string())})

    cand = (vocab.map_batches(explode_deletions, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pyarrow"))
    # no cross-bucket dedup needed: a distance-1 pair shares EXACTLY one
    # distinct key value (equal length → the one differing-position
    # deletion; length±1 → the shorter word itself), and equal keys
    # share a bucket — so each pair is emitted by one bucket only
    # (within-bucket repeats of the same key dedup in per_bucket)
    out = collect_table(cand)
    if out.num_rows == 0:       # all-empty groups collapse the schema
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string())})
    return out.sort_by([("w1", "ascending"), ("w2", "ascending")])


def corpus_quality_report(sf_dir: str) -> pa.Table:
    """(metric, value): the one-look corpus health dashboard every ingest
    job publishes before a training run — composed from the engine's own
    operators, all-integer so the SQL twin hashes exactly:

    - n_docs / total_chars / total_words — volume;
    - n_quality_ok — Gopher-gate passes (same integer rules as
      ``gopher_quality``);
    - n_distinct_texts — exact content-hash distinct (dup rate =
      1 − distinct/docs).

    Shape: ONE streaming pass folds the four volume partials (constant
    key, combiner); the distinct count is the ``exact_dedup`` combiner
    groupby consumed by a distributed ``count()`` — nothing
    corpus-sized ever collects. Gopher thresholds come from the shared
    ``_gopher_metrics`` (one source of truth with ``gopher_quality``);
    the distinct pass drops NULL texts first, matching the twin's
    ``COUNT(DISTINCT md5(text))`` null semantics."""
    from raydoc.functions.agg import partial_groupby
    from raydoc.functions.dedup import add_content_hash

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "n_chars"])

    def partials(t: pa.Table) -> pa.Table:
        words = chars = ok = 0
        for v, nc in zip(t.column("text").to_pylist(),
                         t.column("n_chars").to_pylist()):
            nw, _nonws, _sym, _bl, _nl, is_ok = _gopher_metrics(v or "")
            words += nw
            chars += int(nc)
            ok += int(is_ok)
        return pa.table({"k": pa.array([0], pa.int8()),
                         "n_docs": pa.array([t.num_rows], pa.int64()),
                         "total_words": pa.array([words], pa.int64()),
                         "total_chars": pa.array([chars], pa.int64()),
                         "n_quality_ok": pa.array([ok], pa.int64())})

    agg = collect_table(partial_groupby(
        ds.map_batches(partials, batch_format="pyarrow"), ["k"],
        {"n_docs": ("n_docs", "sum"),
         "total_words": ("total_words", "sum"),
         "total_chars": ("total_chars", "sum"),
         "n_quality_ok": ("n_quality_ok", "sum")}))
    row = agg.to_pylist()[0]
    import pyarrow.compute as pc
    nonnull = ds.select_columns(["text"]).map_batches(
        lambda t: t.filter(pc.is_valid(t["text"])),
        batch_format="pyarrow")
    n_distinct = partial_groupby(
        add_content_hash(nonnull),
        ["content_hash"], {"__n": ("content_hash", "count")}).count()

    names = ["n_distinct_texts", "n_docs", "n_quality_ok",
             "total_chars", "total_words"]
    vals = {"n_distinct_texts": n_distinct, **{k: int(row[k])
                                               for k in names[1:]}}
    return pa.table({"metric": pa.array(names, pa.string()),
                     "value": pa.array([vals[n] for n in names],
                                       pa.int64())})


def domain_mix(sf_dir: str, total: int = 200,
               num_buckets: int | None = None) -> pa.Table:
    """(doc_id, source): a deterministic TRAINING MIX — sample documents
    so each source contributes ⌊total·w_s/Σw⌋ docs under a content-derived
    pseudo-random order (md5 of doc_id) — the domain-weighting step of a
    corpus build (up-weight curated sources, down-weight crawl), stable
    across runs, cluster sizes and input order, and exactly replicable
    in SQL. Demo weights derive from the source name (w = id%3 + 1);
    real pipelines pass their mixing table the same way.

    Shape: same two-phase rank as ``q_stratified_sample`` — per-bucket
    local md5-top-k_s per source (the per-source target k_s broadcasts
    as a tiny dict), tiny global merge; no source ever lands in one
    task."""
    import hashlib as _hl

    import pandas as pd
    import pyarrow.compute as pc

    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.functions.agg import partial_groupby

    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    # source inventory via one combiner pass (tiny: one row per source)
    src_t = collect_table(partial_groupby(
        ds.select_columns(["source"]), ["source"],
        {"n": ("source", "count")}))
    sources = sorted(src_t.column("source").to_pylist())
    # demo weights from an md5 of the source NAME (not a parse of a
    # corpus-specific "srcN" pattern — any naming scheme works); real
    # pipelines pass their mixing table instead. md5_number_lower twin.
    weights = {s: int.from_bytes(_hl.md5(s.encode()).digest()[8:16],
                                 "little") % 3 + 1 for s in sources}
    sw = sum(weights.values())
    targets = {s: total * w // sw for s, w in weights.items()}

    def add_keys(t: pa.Table) -> pa.Table:
        keys = [_hl.md5(str(v).encode()).hexdigest()
                for v in t.column("doc_id").to_pylist()]
        t = t.append_column("rk", pa.array(keys, pa.string()))
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["doc_id"], mask),
                              pa.int32()))

    def local_top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "rk", "doc_id"], ignore_index=True)
        rank = g.groupby("source", sort=False).cumcount()
        k = g["source"].map(targets)
        return g[rank < k][["doc_id", "source", "rk"]]

    survivors = collect_table(
        ds.map_batches(add_keys, batch_format="pyarrow")
          .groupby("bucket").map_groups(local_top,
                                        batch_format="pandas"))
    df = survivors.to_pandas().sort_values(["source", "rk", "doc_id"],
                                           ignore_index=True)
    rank = df.groupby("source", sort=False).cumcount()
    k = df["source"].map(targets)
    out = pa.Table.from_pandas(df[rank < k][["doc_id", "source"]],
                               preserve_index=False)
    return out.sort_by([("source", "ascending"), ("doc_id", "ascending")])


def compression_ratio(sf_dir: str, level: int = 6) -> pa.Table:
    """(doc_id, n_bytes, n_compressed, ratio_milli): per-document zlib
    compressibility — the RefinedWeb/Dolma-style entropy quality signal
    (templated/boilerplate/repetitive text compresses far below prose;
    extreme ratios either way are removal candidates). ``ratio_milli`` =
    compressed·1000 // raw, integer so downstream filters are exact;
    empty docs emit ratio_milli = 1000 (incompressible by convention).

    Rows-only (no SQL twin — DuckDB has no DEFLATE): determinism and
    bounds are property-tested instead. One embarrassingly-parallel
    map_batches; the only state is the per-call zlib level."""
    import zlib

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        raw_n, comp_n, ratio = [], [], []
        for txt in t.column("text").to_pylist():
            b = (txt or "").encode()
            c = len(zlib.compress(b, level))
            raw_n.append(len(b))
            comp_n.append(c)
            ratio.append(c * 1000 // len(b) if b else 1000)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_bytes": pa.array(raw_n, pa.int64()),
                         "n_compressed": pa.array(comp_n, pa.int64()),
                         "ratio_milli": pa.array(ratio, pa.int64())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")) \
        .sort_by("doc_id")


def collapse_repeats(sf_dir: str) -> pa.Table:
    """(doc_id, cleaned): collapse CONSECUTIVE repeated words within each
    document ("part part part" → "part") — the stutter-removal cleanup for
    OCR/ASR output, one embarrassingly-parallel vectorized pass (numpy
    shift-compare per doc; no shuffle). Split/join on single spaces keeps
    empty tokens, matching the SQL twin's string_split semantics exactly."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids, cleaned = [], []
        for d, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            if txt is None:
                continue   # SQL twin: string_split(NULL) -> no row
            ids.append(d)
            w = np.array(txt.split(" "), dtype=object)
            if len(w) <= 1:
                cleaned.append(txt)
                continue
            keep = np.ones(len(w), dtype=bool)
            keep[1:] = w[1:] != w[:-1]
            cleaned.append(" ".join(w[keep]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "cleaned": pa.array(cleaned, pa.string())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")) \
        .sort_by("doc_id")


# two independent odd-multiplier banks for the 128-bit rolling gram hash
# (seeded, stable; window width up to 16 words)
_GRAM_RNG = _np.random.RandomState(0x9E3779B9)
_GRAM_MIX1 = (_GRAM_RNG.randint(1, 2**31, size=16)
              .astype(_np.uint64) * 2 + 1)
_GRAM_MIX2 = (_GRAM_RNG.randint(1, 2**31, size=16)
              .astype(_np.uint64) * 2 + 1)


def dup_ngram_fraction(sf_dir: str, n: int = 8) -> pa.Table:
    """(doc_id, n_grams, n_dup): per document, how many of its word
    ``n``-gram positions carry a gram that occurs ≥2 times corpus-wide —
    the RefinedWeb/Gopher "duplicated n-gram fraction" quality signal as
    exact integers (callers divide; integer outputs keep the SQL twin
    hash-exact). Docs shorter than ``n`` words emit no row (no grams).

    Shape — NO join at all: a gram with corpus count 1 lives in exactly
    one document, so ``n_dup(doc) = n_grams(doc) − n_singleton(doc)``.
    One tokenize+hash explode feeds ONE coarse-bucket exchange (int32
    bucket cut from the already-mixed gram hash — cheaper to sort than
    the 128-bit key, and all occurrences of a gram share a bucket); each
    bucket counts its grams with a C++ hash group-by and re-aggregates
    its singleton grams per owning document, emitting tiny per-bucket
    (doc, n_uniq) partials for one final combiner. ``n_grams`` itself is
    plain word arithmetic (len(words)−n+1), no explode needed. Grams are
    identified by a 128-bit vectorized rolling hash (two independent
    64-bit mixes over memoized per-token md5-64) — no per-gram hashlib
    calls, and 128 bits keep the collision envelope negligible at 10¹²
    corpus grams (P ≈ n²/2¹²⁹). The shuffles move two int64 hash words
    per gram, never text."""
    import numpy as np
    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby
    from raydoc.functions.dedup import _token_hashes

    if n > len(_GRAM_MIX1):
        raise ValueError(f"n={n} exceeds the mix-constant bank "
                         f"({len(_GRAM_MIX1)})")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    from raydoc.functions._buckets import reduce_bucket_count
    mask = np.uint64(reduce_bucket_count() - 1)

    def explode(t: pa.Table) -> pa.Table:
        ids, h1s, h2s = [], [], []
        for d, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            ws = (txt or "").split(" ")
            m = len(ws) - n + 1
            if m <= 0:
                continue
            th = _token_hashes(ws)
            h1 = np.zeros(m, dtype=np.uint64)
            h2 = np.zeros(m, dtype=np.uint64)
            for j in range(n):
                h1 += th[j:j + m] * _GRAM_MIX1[j]
                h2 += th[j:j + m] * _GRAM_MIX2[j]
            ids.append(np.full(m, d, dtype=np.int64))
            h1s.append(h1)
            h2s.append(h2)
        if not ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "g1": pa.array([], pa.int64()),
                             "g2": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        h1 = np.concatenate(h1s)
        return pa.table({"doc_id": pa.array(np.concatenate(ids)),
                         "g1": pa.array(h1.view(np.int64)),
                         "g2": pa.array(np.concatenate(h2s)
                                        .view(np.int64)),
                         "bucket": pa.array(((h1 >> np.uint64(32))
                                             & mask).astype(np.int32))})

    def gram_counts(t: pa.Table) -> pa.Table:
        ws = [(v or "").split(" ") for v in t.column("text").to_pylist()]
        m = np.maximum(np.array([len(w) for w in ws], dtype=np.int64)
                       - n + 1, 0)
        keep = m > 0
        return pa.table({
            "doc_id": t.column("doc_id").filter(pa.array(keep)),
            "n_grams": pa.array(m[keep], pa.int64())})

    def per_bucket(g: pa.Table) -> pa.Table:
        s = g.group_by(["g1", "g2"]).aggregate([("doc_id", "count"),
                                                ("doc_id", "min")])
        single = s.filter(pc.equal(s["doc_id_count"], 1))
        d = single.group_by(["doc_id_min"]).aggregate(
            [("doc_id_min", "count")])
        return pa.table({"d": d["doc_id_min"],
                         "n": d["doc_id_min_count"]})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    bucket_partials = exploded.groupby("bucket").map_groups(
        per_bucket, batch_format="pyarrow")
    n_uniq = collect_table(partial_groupby(
        bucket_partials, ["d"], {"n_uniq": ("n", "sum")})).rename_columns(
        ["doc_id", "n_uniq"])
    n_grams = collect_table(
        ds.map_batches(gram_counts, batch_format="pyarrow"))

    out = n_grams.join(n_uniq, keys="doc_id", join_type="left outer")
    return pa.table({
        "doc_id": out["doc_id"],
        "n_grams": out["n_grams"],
        "n_dup": pc.subtract(
            out["n_grams"],
            pc.coalesce(out["n_uniq"], pa.scalar(0, pa.int64()))),
    }).sort_by("doc_id")


def inverted_index(sf_dir: str, min_df: int = 2,
                   max_df: int | None = None,
                   num_buckets: int | None = None) -> pa.Table:
    """(term, df, postings): the IR inverted index — every term mapping
    to its document frequency and the comma-joined sorted doc_id posting
    list (terms below ``min_df`` pruned). Batch-local (term, doc)
    dedup before the exchange; terms bucket by md5 so one group holds
    many complete terms; postings assemble vectorized per bucket. At
    corpus scale postings stream straight to partitioned parquet — the
    collect here is for the oracle check.

    Hot-term hazard: a stopword's posting list is O(n_docs) in one task.
    ``max_df`` prunes such terms BEFORE their posting string is built
    (df counts per bucket first, assembly only for survivors) — the
    standard stopword cut; unbounded by default to keep the SQL twin
    exact."""
    import hashlib as _hl

    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        terms, ids, buckets = [], [], []
        for d, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            if txt is None:
                continue
            for term in set(txt.split(" ")) - {""}:
                terms.append(term)
                ids.append(d)
                buckets.append(int(_hl.md5(term.encode())
                                   .hexdigest()[:4], 16) & mask)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(buckets, pa.int32())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["term", "doc_id"]) \
             .sort_values(["term", "doc_id"], ignore_index=True)
        # df first; build posting strings only for surviving terms
        sizes = g.groupby("term", sort=False)["doc_id"].size()
        keep = sizes[sizes >= min_df]
        if max_df is not None:
            keep = keep[keep <= max_df]
        g = g[g["term"].isin(keep.index)]
        agg = g.groupby("term", sort=True)["doc_id"].agg(
            df="size",
            postings=lambda s: ",".join(str(int(x)) for x in s))
        return agg.reset_index()[["term", "df", "postings"]]

    out = (ds.map_batches(explode, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    t = collect_table(out)
    return pa.table({"term": t["term"],
                     "df": t["df"].cast(pa.int64()),
                     "postings": t["postings"]}).sort_by("term")


def strip_dup_ngrams(sf_dir: str, n: int = 8,
                     num_buckets: int | None = None) -> pa.Table:
    """(doc_id, clean_text, n_words, n_removed): corpus-level exact
    duplicate-SPAN removal — the substring-dedup step of Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models Better")
    at word n-gram granularity. Every occurrence of a word ``n``-gram
    that appears ≥2 times corpus-wide — EXCEPT the gram's global first
    occurrence (lexicographic min ``(doc_id, start)``) — has its ``n``
    covered word positions deleted; surviving words re-join with single
    spaces. Docs shorter than ``n`` words pass through verbatim; NULL
    text is treated as ''. Complements ``dup_ngram_fraction`` (which
    only measures) and ``paragraph_dedup_global`` (coarser granularity).

    Shape — two bounded exchanges, text shipped exactly once:
    (1) grams explode to (hash128, doc_id, start) and exchange on a
    coarse bucket of the gram hash (all occurrences of a gram share a
    bucket); each bucket sorts its (gram, doc_id, start) run and emits
    the NON-first rows of each gram — the removal starts. The gram
    shuffle moves two int64 hash words + a start per gram, never text.
    (2) removal starts (sparse) union with the (doc_id, text) rows via
    ``tag_union`` and exchange once on the doc-id bucket; each group
    rebuilds its docs with a vectorized difference-array coverage mask.
    Gram identity is the same 128-bit vectorized rolling hash as
    ``dup_ngram_fraction`` (collision envelope ≈ n²/2¹²⁹ — negligible
    at 10¹² corpus grams)."""
    import numpy as np
    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.functions.dedup import _token_hashes
    from raydoc.functions.joins import tag_union

    if n < 2 or n > len(_GRAM_MIX1):
        raise ValueError(f"n={n} outside [2, {len(_GRAM_MIX1)}]")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    gmask = np.uint64(reduce_bucket_count() - 1)

    def explode(t: pa.Table) -> pa.Table:
        ids, starts, h1s, h2s = [], [], [], []
        for d, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            ws = (txt or "").split(" ")
            m = len(ws) - n + 1
            if m <= 0:
                continue
            th = _token_hashes(ws)
            h1 = np.zeros(m, dtype=np.uint64)
            h2 = np.zeros(m, dtype=np.uint64)
            for j in range(n):
                h1 += th[j:j + m] * _GRAM_MIX1[j]
                h2 += th[j:j + m] * _GRAM_MIX2[j]
            ids.append(np.full(m, d, dtype=np.int64))
            starts.append(np.arange(1, m + 1, dtype=np.int64))
            h1s.append(h1)
            h2s.append(h2)
        if not ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "g1": pa.array([], pa.int64()),
                             "g2": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        h1 = np.concatenate(h1s)
        return pa.table({
            "doc_id": pa.array(np.concatenate(ids)),
            "s": pa.array(np.concatenate(starts)),
            "g1": pa.array(h1.view(np.int64)),
            "g2": pa.array(np.concatenate(h2s).view(np.int64)),
            "bucket": pa.array(((h1 >> np.uint64(32)) & gmask)
                               .astype(np.int32))})

    def dup_starts(g: pa.Table) -> pa.Table:
        df = g.select(["g1", "g2", "doc_id", "s"]).to_pandas()
        df.sort_values(["g1", "g2", "doc_id", "s"], inplace=True,
                       kind="mergesort", ignore_index=True)
        first = (df["g1"].ne(df["g1"].shift())
                 | df["g2"].ne(df["g2"].shift()))
        out = df.loc[~first, ["doc_id", "s"]]
        return pa.table({"doc_id": pa.array(out["doc_id"].to_numpy()),
                         "s": pa.array(out["s"].to_numpy())})

    removal = (ds.map_batches(explode, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(dup_starts, batch_format="pyarrow"))

    fields = [("doc_id", pa.int64()), ("text", pa.string()),
              ("s", pa.int64())]
    u = tag_union(ds, removal, "doc_id", fields,
                  num_buckets or reduce_bucket_count())

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["__side"] == 0]
        starts = g[g["__side"] == 1]
        smap = ({d: grp["s"].to_numpy(dtype=np.int64)
                 for d, grp in starts.groupby("doc_id")}
                if len(starts) else {})
        out_id, out_txt, out_nw, out_nr = [], [], [], []
        for d, txt in zip(docs["doc_id"].to_numpy(), docs["text"]):
            words = (txt if isinstance(txt, str) else "").split(" ")
            m = len(words)
            ss = smap.get(d)
            if ss is None:
                clean, nr = " ".join(words), 0
            else:
                diff = np.zeros(m + 1, dtype=np.int32)
                s0 = ss - 1
                np.add.at(diff, s0, 1)
                np.add.at(diff, np.minimum(s0 + n, m), -1)
                cov = np.cumsum(diff[:m]) > 0
                arr = np.array(words, dtype=object)
                clean = " ".join(arr[~cov].tolist())
                nr = int(cov.sum())
            out_id.append(int(d))
            out_txt.append(clean)
            out_nw.append(m)
            out_nr.append(nr)
        return pd.DataFrame({"doc_id": out_id, "clean_text": out_txt,
                             "n_words": out_nw, "n_removed": out_nr})

    t = collect_table(
        u.groupby("__bucket").map_groups(rebuild, batch_format="pandas"))
    return pa.table({
        "doc_id": t["doc_id"].cast(pa.int64()),
        "clean_text": t["clean_text"].cast(pa.string()),
        "n_words": t["n_words"].cast(pa.int64()),
        "n_removed": t["n_removed"].cast(pa.int64()),
    }).sort_by("doc_id")


def chunk_documents(sf_dir: str, chunk: int = 128,
                    overlap: int = 16) -> pa.Table:
    """(doc_id, chunk_idx, chunk_text, n_chunk_words): deterministic
    fixed-width word chunking with overlap — the RAG/embedding-corpus
    prep primitive. Chunk i (1-based) covers word positions
    ``[(i-1)·stride + 1, min((i-1)·stride + chunk, n)]`` with
    ``stride = chunk − overlap``; a doc emits
    ``max(1, ceil((n − overlap) / stride))`` chunks, so every word is
    covered, consecutive chunks share ``overlap`` words, and a short
    doc emits itself as one chunk. NULL text chunks as ''. Pure
    per-doc arithmetic — one vectorized ``map_batches`` explode, no
    exchange at all (chunk rows stream straight to the consumer)."""
    if not 0 <= overlap < chunk:
        raise ValueError(f"need 0 <= overlap({overlap}) < chunk({chunk})")
    stride = chunk - overlap
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids, idxs, texts, nws = [], [], [], []
        for d, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            ws = (txt or "").split(" ")
            n = len(ws)
            n_chunks = max(1, -(-(n - overlap) // stride))
            for i in range(1, n_chunks + 1):
                lo = (i - 1) * stride
                hi = min(lo + chunk, n)
                ids.append(d)
                idxs.append(i)
                texts.append(" ".join(ws[lo:hi]))
                nws.append(hi - lo)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "chunk_idx": pa.array(idxs, pa.int64()),
                         "chunk_text": pa.array(texts, pa.string()),
                         "n_chunk_words": pa.array(nws, pa.int64())})

    return collect_table(
        ds.map_batches(explode, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending"), ("chunk_idx", "ascending")])


def bm25_search(sf_dir: str, query: tuple[str, ...] = ("hash", "join",
                                                       "merge"),
                top_k: int = 20, k1: float = 1.2, b: float = 0.75) -> pa.Table:
    """(rank, doc_id, score): the ``top_k`` documents by BM25 against a
    fixed query-term set — the retrieval-scoring primitive behind corpus
    search / RAG candidate generation (reference analog: the confidence-
    ranked candidate selection in validate.py, re-expressed as IR
    ranking).

    Determinism: the classic ``ln``-idf is replaced by the rational
    surrogate ``idf = (N - df + 0.5)/(df + 0.5)`` — every operation in
    the score is IEEE-exact-rounded (+,-,·,/), no transcendentals, so
    the DuckDB twin evaluates the SAME expression tree to bit-identical
    doubles. Per-term contributions sum in fixed query order. Ties break
    (score desc, doc_id asc).

    Shape: one tokenizing pass emits per-doc (dl, tf per query term) —
    doc-local, no exchange, fully vectorized (Arrow RE2 kernels: dl is
    the non-overlapping ``\\w+`` match count, tf_i a ``\\bterm\\b``
    count, which equals token equality because a \\w-only term bounded
    by non-\\w IS a maximal \\w+ run — RE2-vs-RE2 with the DuckDB twin,
    no Python row loop); N / Σdl / df come off that tiny stream via a
    constant-key combiner groupby (never a corpus shuffle); scoring is a
    second vectorized pass with the 5 scalars closed over; top-k reduces
    per batch then once on the driver (k rows per batch cross)."""
    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    terms = list(query)
    for q in terms:
        if not re.fullmatch(r"\w+", q):
            raise ValueError(f"query term {q!r} must be \\w-only for the "
                             "\\b-bounded vectorized tf count")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def doc_stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:        # empty Ray blocks carry an EMPTY schema
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "dl": pa.array([], pa.int64()),
                 **{f"tf_{i}": pa.array([], pa.int64())
                    for i in range(len(terms))}})
        low = pc.utf8_lower(pc.fill_null(t["text"], ""))
        out = {"doc_id": t["doc_id"],
               "dl": pc.cast(pc.count_substring_regex(low, r"\w+"),
                             pa.int64())}
        for i, q in enumerate(terms):
            pat = r"\b" + re.escape(q) + r"\b"
            out[f"tf_{i}"] = pc.cast(pc.count_substring_regex(low, pat),
                                     pa.int64())
        return pa.table(out)

    # materialized: TWO consumers (corpus stats, then scoring) — a lazy
    # branch would re-read and re-tokenize the whole corpus; the pinned
    # set is 5 ints per doc, not the text
    stats = ds.map_batches(doc_stats, batch_format="pyarrow").materialize()

    def globals_partial(t: pa.Table) -> pa.Table:
        row = {"one": pa.array([1], pa.int64()),
               "n_docs": pa.array([t.num_rows], pa.int64()),
               "sum_dl": pa.array([pc.sum(t["dl"]).as_py() or 0],
                                  pa.int64())}
        for i in range(len(terms)):
            df_i = pc.sum(pc.cast(pc.greater(t[f"tf_{i}"], 0),
                                  pa.int64())).as_py() or 0
            row[f"df_{i}"] = pa.array([df_i], pa.int64())
        return pa.table(row)

    spec = {"n_docs": ("n_docs", "sum"), "sum_dl": ("sum_dl", "sum")}
    for i in range(len(terms)):
        spec[f"df_{i}"] = (f"df_{i}", "sum")
    g = collect_table(partial_groupby(
        stats.map_batches(globals_partial, batch_format="pyarrow"),
        ["one"], spec))
    empty = pa.table({"rank": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if g.num_rows == 0:                     # empty corpus
        return empty
    n_docs = g.column("n_docs")[0].as_py()
    avgdl = g.column("sum_dl")[0].as_py() / n_docs
    idfs = [(n_docs - g.column(f"df_{i}")[0].as_py() + 0.5)
            / (g.column(f"df_{i}")[0].as_py() + 0.5)
            for i in range(len(terms))]

    def score_topk(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(_np.float64)
        norm = k1 * ((1.0 - b) + b * (dl / avgdl))
        score = _np.zeros(t.num_rows, _np.float64)
        for i in range(len(terms)):
            tf = t[f"tf_{i}"].to_numpy(zero_copy_only=False).astype(
                _np.float64)
            score = score + idfs[i] * ((tf * (k1 + 1.0)) / (tf + norm))
        out = pa.table({"doc_id": t["doc_id"],
                        "score": pa.array(score, pa.float64())})
        out = out.filter(pc.greater(out["score"], 0.0))
        if out.num_rows == 0:   # select_k_unstable chokes on empty input
            return out
        idx = pc.select_k_unstable(
            out, top_k, [("score", "descending"), ("doc_id", "ascending")])
        return out.take(idx)

    cand = collect_table(
        stats.map_batches(score_topk, batch_format="pyarrow"))
    if cand.num_rows == 0:                  # no doc matched any term
        return empty
    cand = cand.sort_by([("score", "descending"), ("doc_id", "ascending")]) \
        .slice(0, top_k)
    return pa.table({
        "rank": pa.array(range(1, cand.num_rows + 1), pa.int64()),
        "doc_id": cand.column("doc_id"),
        "score": cand.column("score")})


def bpe_learn_merges(sf_dir: str, n_merges: int = 8,
                     max_vocab_words: int = 2_000_000) -> pa.Table:
    """(merge_rank, left, right, pair_count): learn the first
    ``n_merges`` BPE merges from the corpus — the tokenizer-training
    primitive. Classic word-frequency BPE (Sennrich et al. 2015): the
    ONE corpus-sized pass is a distributed word-frequency combiner
    groupby (the shuffle carries (word, count) partials bounded by the
    TRUE vocabulary, never the text stream); the merge loop then runs
    over the small word-frequency table — per iteration, count symbol
    pairs weighted by word frequency, take the max (ties → lexicographic
    (left, right), fully deterministic), apply the merge. This is the
    real trainer architecture: corpus scan distributed, vocab-sized
    learning local. ``max_vocab_words`` guards a pathological vocabulary
    (raise it, or pre-truncate words, for non-natural-language data)."""
    word_re = re.compile(r"\w+")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def word_partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for txt in t.column("text").to_pylist():
            c.update(word_re.findall((txt or "").lower()))
        if not c:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    from raydoc.functions.agg import partial_groupby
    vocab_t = collect_table(partial_groupby(
        ds.map_batches(word_partial, batch_format="pyarrow"),
        ["word"], {"n": ("n", "sum")}))
    if vocab_t.num_rows > max_vocab_words:
        raise ValueError(
            f"vocabulary has {vocab_t.num_rows} words > max_vocab_words="
            f"{max_vocab_words}; raise the cap or pre-truncate words")
    vocab = {tuple(w): int(n) for w, n in
             zip(vocab_t.column("word").to_pylist(),
                 vocab_t.column("n").to_pylist())}

    out_rank, out_l, out_r, out_c = [], [], [], []
    for rank in range(1, n_merges + 1):
        pair_counts: dict = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        # deterministic: max count, ties -> lexicographically smallest
        best_count = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == best_count)
        merged = best[0] + best[1]
        new_vocab: dict = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and (syms[i], syms[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
        out_rank.append(rank)
        out_l.append(best[0])
        out_r.append(best[1])
        out_c.append(best_count)
    return pa.table({"merge_rank": pa.array(out_rank, pa.int64()),
                     "left": pa.array(out_l, pa.string()),
                     "right": pa.array(out_r, pa.string()),
                     "pair_count": pa.array(out_c, pa.int64())})


def bpe_encode(sf_dir: str, n_merges: int = 8) -> pa.Table:
    """(doc_id, n_words, n_bpe_tokens): ENCODE the corpus with the
    merges ``bpe_learn_merges`` learned from it — the apply half of the
    tokenizer pipeline (train → broadcast merge table → one streaming
    encode pass). Encoding replays the trainer's exact semantics: each
    merge applied to every word in rank order (the trainer transforms
    its whole vocab per rank, so sequential application IS the learned
    tokenization — verified against the trainer's final vocab in
    tests). Per-batch word cache: each unique word encodes once per
    batch, so cost scales with batch vocabulary, not token count.
    Rows-only (no SQL twin — the merge loop is iterative), covered by a
    known-answer training/encoding test."""
    merges = bpe_learn_merges(sf_dir, n_merges=n_merges)
    merge_list = list(zip(merges.column("left").to_pylist(),
                          merges.column("right").to_pylist()))
    import ray as _ray
    merges_ref = _ray.put(merge_list)
    word_re = re.compile(r"\w+")

    def encode_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_words": pa.array([], pa.int64()),
                             "n_bpe_tokens": pa.array([], pa.int64())})
        mlist = _ray.get(merges_ref)
        cache: dict[str, int] = {}

        def n_tokens(word: str) -> int:
            got = cache.get(word)
            if got is not None:
                return got
            syms = list(word)
            for l_sym, r_sym in mlist:
                i, out = 0, []
                while i < len(syms):
                    if (i < len(syms) - 1 and syms[i] == l_sym
                            and syms[i + 1] == r_sym):
                        out.append(l_sym + r_sym)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[word] = len(syms)
            return len(syms)

        ids, nw, nt = [], [], []
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            words = word_re.findall((txt or "").lower())
            ids.append(did)
            nw.append(len(words))
            nt.append(sum(n_tokens(w) for w in words))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_words": pa.array(nw, pa.int64()),
                         "n_bpe_tokens": pa.array(nt, pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(encode_batch, batch_format="pyarrow")
    return collect_table(out).sort_by("doc_id")


_WORD_RE = re.compile(r"\w+")


def unicode_normalize(sf_dir: str) -> pa.Table:
    """(doc_id, norm_text, n_before, n_after): NFC unicode normalization
    — the CCNet/C4-style canonicalization pass. The corpus is ASCII-only
    synthetic text, so to make composition actually fire both engines
    first inject a combining acute (U+0301) after every 'e'; NFC then
    recomposes 'e'+◌́ → 'é' (codepoint count shrinks back). One
    vectorized-C map per batch (CPython ``unicodedata.normalize`` —
    pyarrow 16's ``utf8_normalize`` kernel is decompose-only: its
    'NFC' output is NFD, so the stdlib C routine is the correct AND
    faster path); the DuckDB twin is
    ``nfc_normalize(replace(text, 'e', 'e' || chr(769)))``."""
    import unicodedata

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "norm_text": pa.array([], pa.string()),
                             "n_before": pa.array([], pa.int64()),
                             "n_after": pa.array([], pa.int64())})
        norm, nb, na = [], [], []
        for v in t.column("text").to_pylist():
            inj = (v or "").replace("e", "e\u0301")
            out = unicodedata.normalize("NFC", inj)
            norm.append(out)
            nb.append(len(inj))
            na.append(len(out))
        return pa.table({"doc_id": t.column("doc_id"),
                         "norm_text": pa.array(norm, pa.string()),
                         "n_before": pa.array(nb, pa.int64()),
                         "n_after": pa.array(na, pa.int64())})

    out = ds.map_batches(fn, batch_format="pyarrow")
    return collect_table(out).sort_by("doc_id")


def lexical_diversity(sf_dir: str) -> pa.Table:
    """(doc_id, n_tokens, n_distinct, ttr): type-token ratio — the
    classic lexical-diversity quality signal (low TTR ⇒ repetitive,
    boilerplate-like text). Tokens are ``\\w+`` over lowercased text
    (RE2-compatible, so the DuckDB twin tokenizes identically);
    ``ttr`` is one IEEE division of the two exact integers (also
    emitted, so the gate hashes ints AND the derived double). One
    vectorized map per batch, no exchange."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_distinct": pa.array([], pa.int64()),
                             "ttr": pa.array([], pa.float64())})
        nt, nd, ttr = [], [], []
        for v in t.column("text").to_pylist():
            toks = _WORD_RE.findall((v or "").lower())
            nt.append(len(toks))
            nd.append(len(set(toks)))
            ttr.append(nd[-1] / nt[-1] if nt[-1] else 0.0)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(nt, pa.int64()),
                         "n_distinct": pa.array(nd, pa.int64()),
                         "ttr": pa.array(ttr, pa.float64())})

    out = ds.map_batches(fn, batch_format="pyarrow")
    return collect_table(out).sort_by("doc_id")


def top_terms_by_lang(sf_dir: str, k: int = 3) -> pa.Table:
    """(lang, term, n, rank): the ``k`` most frequent tokens per
    language — exact grouped heavy hitters (corpus-mix diagnostics;
    the per-GROUP complement of the global CMS heavy-hitter path).
    Combiner (lang, term) count partials bound the exchange by true
    vocabulary; the vocab-sized aggregate then prunes to a per-batch
    per-lang top-k before a tiny driver merge. Ties: count desc, term
    asc — replicated in the row_number twin."""
    import pandas as pd

    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])

    def count_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return pa.table({"lang": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        counts: dict[tuple[str, str], int] = {}
        for lang, v in zip(t.column("lang").to_pylist(),
                           t.column("text").to_pylist()):
            for tok in _WORD_RE.findall((v or "").lower()):
                key = (lang or "", tok)
                counts[key] = counts.get(key, 0) + 1
        langs, terms, ns = [], [], []
        for (lang, term), n in counts.items():
            langs.append(lang)
            terms.append(term)
            ns.append(n)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "term": pa.array(terms, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    per_term = partial_groupby(
        ds.map_batches(count_fn, batch_format="pyarrow"),
        ["lang", "term"], {"n": ("n", "sum")})

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lang" not in t.schema.names:
            return t
        df = t.to_pandas()
        df = df.sort_values(["lang", "n", "term"],
                            ascending=[True, False, True],
                            ignore_index=True)
        df = df.groupby("lang", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    t = collect_table(per_term.map_batches(local_topk,
                                           batch_format="pyarrow"))
    df = t.to_pandas().sort_values(["lang", "n", "term"],
                                   ascending=[True, False, True],
                                   ignore_index=True)
    df = df.groupby("lang", sort=False).head(k)
    df["rank"] = df.groupby("lang", sort=False).cumcount() + 1
    return pa.table({"lang": pa.array(df["lang"], pa.string()),
                     "term": pa.array(df["term"], pa.string()),
                     "n": pa.array(df["n"], pa.int64()),
                     "rank": pa.array(df["rank"], pa.int64())})


_MENTION_RE = re.compile(r"\b(?:join|merge|sort)\b")


def extract_mentions(sf_dir: str) -> pa.Table:
    """(doc_id, ord, mention): every join/merge/sort keyword occurrence
    in every document, exploded one row per match with its 1-based
    ordinal — the flat_map/UNNEST row-explosion shape (entity
    extraction emits more rows than it reads). One vectorized map per
    batch, no exchange; RE2-identical twin via
    unnest(regexp_extract_all). Empty-corpus-safe typed empty table."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "ord": pa.array([], pa.int64()),
                      "mention": pa.array([], pa.string())})

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return empty
        ids, ords, ments = [], [], []
        for did, v in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            for i, mtxt in enumerate(_MENTION_RE.findall(v or ""), 1):
                ids.append(did)
                ords.append(i)
                ments.append(mtxt)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "ord": pa.array(ords, pa.int64()),
                         "mention": pa.array(ments, pa.string())})

    out = ds.map_batches(fn, batch_format="pyarrow")
    t = collect_table(out)
    if t.num_rows == 0 or "doc_id" not in t.schema.names:
        return empty
    return t.sort_by([("doc_id", "ascending"), ("ord", "ascending")])


def pii_by_source(sf_dir: str) -> pa.Table:
    """(source, n_docs, n_urls, n_emails, n_ips): per-source PII
    exposure report — the audit complement of ``redact_pii`` (which
    corpora need scrubbing, and how badly). The synthetic corpus is
    PII-free, so both engines first append deterministic PII spans
    keyed by doc_id (doc_id%3→email, %5→URL-with-credential-email,
    %7→IP) — the counts then exercise the real chain, incl. the
    URL-before-email discipline (the %5 docs' in-URL email must NOT
    count as an email). Counts ride one vectorized regex pass per
    batch into a combiner groupby keyed by the tiny source
    dimension."""
    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_urls": pa.array([], pa.int64()),
                             "n_emails": pa.array([], pa.int64()),
                             "n_ips": pa.array([], pa.int64())})
        srcs, urls, mails, ips = [], [], [], []
        for did, src, v in zip(t.column("doc_id").to_pylist(),
                               t.column("source").to_pylist(),
                               t.column("text").to_pylist()):
            v = v or ""
            if did % 3 == 0:
                v += f" contact u{did}@example.com"
            if did % 5 == 0:
                v += f" see https://h{did}.example.com/a?u=x@y.org"
            if did % 7 == 0:
                v += f" from 10.0.{did % 256}.{(did * 7) % 256}"
            srcs.append(src or "")
            urls.append(len(_PII_URL.findall(v)))
            s = _PII_URL.sub("<URL>", v)
            mails.append(len(_PII_EMAIL.findall(s)))
            s = _PII_EMAIL.sub("<EMAIL>", s)
            ips.append(len(_PII_IP.findall(s)))
        part = pa.table({"source": pa.array(srcs, pa.string()),
                         "n_docs": pa.array([1] * len(srcs), pa.int64()),
                         "n_urls": pa.array(urls, pa.int64()),
                         "n_emails": pa.array(mails, pa.int64()),
                         "n_ips": pa.array(ips, pa.int64())})
        g = part.group_by("source").aggregate(
            [("n_docs", "sum"), ("n_urls", "sum"),
             ("n_emails", "sum"), ("n_ips", "sum")])
        return g.rename_columns(["source", "n_docs", "n_urls",
                                 "n_emails", "n_ips"])

    out = partial_groupby(
        ds.map_batches(fn, batch_format="pyarrow"), ["source"],
        {"n_docs": ("n_docs", "sum"), "n_urls": ("n_urls", "sum"),
         "n_emails": ("n_emails", "sum"), "n_ips": ("n_ips", "sum")})
    return collect_table(out).sort_by("source")


def kfold_split(sf_dir: str, n_folds: int = 5) -> pa.Table:
    """(doc_id, fold): deterministic content-hash k-fold assignment —
    fold = md5(text) top-32-bits mod ``n_folds``. The cross-validation
    splitter: a pure function of the row, so folds are stable across
    runs, cluster sizes and input order, and any fold's complement is a
    training set with no coordination (complements
    ``train_test_split``'s single binary split; SQL-replicable)."""
    import hashlib as _hl

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        folds = [int(_hl.md5((v or "").encode()).hexdigest()[:8], 16)
                 % n_folds
                 for v in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "fold": pa.array(folds, pa.int64())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        "doc_id")


def canonicalize_url(url: str) -> str:
    """Standard URL canonicalization (the web-pipeline dedup key):
    lowercase scheme+host, strip the scheme's default port, drop the
    fragment, remove ``utm_*`` tracking params (other params keep
    their order). Pure function — usable as a dedup key at any scale."""
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    sp = urlsplit(url)
    scheme = sp.scheme.lower()
    host = (sp.hostname or "").lower()
    default = {"http": 80, "https": 443}.get(scheme)
    netloc = host if (sp.port is None or sp.port == default) \
        else f"{host}:{sp.port}"
    params = [(k, v) for k, v in parse_qsl(sp.query,
                                           keep_blank_values=True)
              if not k.lower().startswith("utm_")]
    return urlunsplit((scheme, netloc, sp.path, urlencode(params), ""))


def canonical_urls(sf_dir: str) -> pa.Table:
    """(doc_id, url_canonical): URL canonicalization over the corpus —
    the crawl-dedup key derivation (tracking params, host case, default
    ports and fragments must not split identical pages). The synthetic
    corpus has no URLs, so both engines first derive one deterministic
    URL per doc_id (mixed-case host + :443 + utm param + fragment on
    even ids; trailing utm param on odd ids — the ``pii_by_source``
    injection discipline), then canonicalize: the oracle replicates the
    same rules as SQL string surgery. One vectorized stateless
    map_batches pass; scales embarrassingly."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        urls = [
            (f"HTTPS://WWW.Example.COM:443/Path/p{d}?utm_source=x&id={d}"
             f"#frag") if d % 2 == 0 else
            f"http://site{d % 7}.example.org/a/b?id={d}&utm_campaign=y"
            for d in ids]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "url_canonical": pa.array([canonicalize_url(u) for u in urls],
                                      pa.string())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")) \
        .sort_by("doc_id")


def pseudonymize_users(sf_dir: str, pepper: str = "pepper:") -> pa.Table:
    """(pseudo_id, n_events): GDPR-style keyed pseudonymization — every
    user_id is replaced corpus-wide by a deterministic one-way token
    (first 16 hex chars of sha256(pepper || id)) while aggregates keep
    working on the new key. The heavy stream never carries the token:
    events fold to per-user counts in a combiner groupby FIRST (the
    exchange moves |users|-sized partials), then one vectorized-bounded
    map over the user-sized result attaches tokens. At 100 TB the
    pepper would live in a secret store and rotate per release; the
    operator only needs it broadcast once as a task-closure constant.
    DuckDB twin: substr(sha256(...), 1, 16) — byte-identical hex."""
    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def ones(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        return pa.table({"user_id": t["user_id"],
                         "n_events": pa.array(
                             _np.ones(t.num_rows, _np.int64))})

    per_user = partial_groupby(ds.map_batches(ones, batch_format="pyarrow"),
                               ["user_id"],
                               {"n_events": ("n_events", "sum")})

    def tokenize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.schema.names:
            return pa.table({"pseudo_id": pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64())})
        toks = [hashlib.sha256(f"{pepper}{u}".encode()).hexdigest()[:16]
                for u in t.column("user_id").to_pylist()]
        return pa.table({"pseudo_id": pa.array(toks, pa.string()),
                         "n_events": t["n_events"]})

    out = per_user.map_batches(tokenize, batch_format="pyarrow")
    return collect_table(out).sort_by("pseudo_id")


def domain_temperature_sample(sf_dir: str, divisor: int = 16) -> pa.Table:
    """(doc_id, source): temperature-based domain mixture sampling —
    the GPT-3/LLaMA data-recipe step that re-balances a corpus toward
    small domains by sampling each domain ∝ weight^α (α = 0.5 here:
    quota_d = ⌊√(Σ n_chars of domain d) / divisor⌋), with a
    content-derived md5 rank choosing WHICH docs — stable across runs,
    cluster sizes and input order, and exactly SQL-replicable.

    Hash-exactness: the quota uses only correctly-rounded IEEE ops on
    an exact integer weight (int64 SUM → double cast < 2⁵³ → SQRT →
    /2⁴ → FLOOR), each bit-identical in numpy and DuckDB; no
    cross-domain float sum ever forms, so summation order can't flip a
    boundary.

    Scale shape: pass A is one combiner groupby to |domains| weight
    rows (driver arithmetic on a tiny table → broadcast quota map);
    pass B reuses the stratified-sample two-phase rank — per
    doc_id-hash bucket keep the LOCAL md5-top-quota_d per domain, then
    one tiny global merge — so a dominant domain spreads across all
    buckets instead of one pandas group."""
    import math

    import pandas as pd
    import pyarrow.compute as pc

    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.functions.agg import partial_groupby

    mask = reduce_bucket_count() - 1

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])
    weights = collect_table(partial_groupby(
        docs, ["source"], {"w": ("n_chars", "sum")}))
    quota = {s: int(math.floor(math.sqrt(float(w)) / divisor))
             for s, w in zip(weights.column("source").to_pylist(),
                             weights.column("w").to_pylist())}

    def add_keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string()),
                             "rk": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int32())})
        keys = [hashlib.md5(str(v).encode()).hexdigest()
                for v in t.column("doc_id").to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"], "source": t["source"],
            "rk": pa.array(keys, pa.string()),
            "bucket": pc.cast(pc.bit_wise_and(t["doc_id"], mask),
                              pa.int32())})

    def local_top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "rk"], ignore_index=True)
        rank = g.groupby("source", sort=False).cumcount()
        keep = rank < g["source"].map(quota).fillna(0)
        return g[keep][["doc_id", "source", "rk"]]

    survivors = collect_table(
        docs.select_columns(["doc_id", "source"])
            .map_batches(add_keys, batch_format="pyarrow")
            .groupby("bucket").map_groups(local_top,
                                          batch_format="pandas"))
    df = survivors.to_pandas().sort_values(["source", "rk"],
                                           ignore_index=True)
    rank = df.groupby("source", sort=False).cumcount()
    keep = rank < df["source"].map(quota).fillna(0)
    out = pa.Table.from_pandas(df[keep][["doc_id", "source"]],
                               preserve_index=False)
    return out.cast(pa.schema([("doc_id", pa.int64()),
                               ("source", pa.string())])).sort_by(
        [("source", "ascending"), ("doc_id", "ascending")])


def uniform_sample_md5(sf_dir: str, k: int = 100) -> pa.Table:
    """(event_id, event_type, value): exact fixed-k uniform sample of
    the events table under a content-derived pseudo-random order
    (md5 of the event id) — the ORACLE-CHECKABLE twin of the seeded
    ``shuffle_sample``: stable across runs, cluster sizes and input
    order, and exactly replicable in SQL (ORDER BY md5 LIMIT k).

    Scale shape: each block prunes to its local md5-top-k map-side (no
    exchange — the global top-k is a subset of the union of per-block
    top-ks), ≤ k·n_blocks survivors collect, one tiny driver sort
    finishes. The corpus never sorts or shuffles."""
    import pyarrow.compute as pc

    from raydoc.functions.relational import _global_topk

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def add_rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.schema.names:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "value": pa.array([], pa.float64()),
                             "rk": pa.array([], pa.string())})
        keys = [hashlib.md5(str(v).encode()).hexdigest()
                for v in t.column("event_id").to_pylist()]
        return t.append_column("rk", pa.array(keys, pa.string()))

    top = _global_topk(ds.map_batches(add_rank, batch_format="pyarrow"),
                       ["rk"], [False], k)
    return top.select(["event_id", "event_type", "value"]).sort_by(
        "event_id")


def url_path_rollup(sf_dir: str) -> pa.Table:
    """(prefix, depth, n_docs, sum_chars): hierarchical URL-path
    rollup — corpus volume aggregated at EVERY ancestor of each page's
    path (host, host/section, host/section/subsection), the trie-style
    crawl-frequency-by-site-section analysis used to budget recrawls
    and spot over-represented site sections. The synthetic corpus has
    no URLs, so both engines first derive one deterministic URL per
    doc_id (the ``canonical_urls`` injection discipline: host from
    doc_id%5, two path segments from %3 / %4), then every doc explodes
    to its ≤3 path prefixes map-side (bounded fan-out, vectorized
    string joins) and a combiner groupby folds per prefix — one
    exchange over ~|distinct prefixes| partial rows, never the docs."""
    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return pa.table({"prefix": pa.array([], pa.string()),
                             "depth": pa.array([], pa.int64()),
                             "nc": pa.array([], pa.int64())})
        d = t.column("doc_id")
        host = pc.binary_join_element_wise(
            pa.scalar("site"),
            pc.cast(pc.subtract(d, pc.multiply(
                pc.divide(d, pa.scalar(5)), pa.scalar(5))), pa.string()),
            pa.scalar(".example"), pa.scalar(""))
        s1 = pc.binary_join_element_wise(
            host, pc.binary_join_element_wise(
                pa.scalar("s"),
                pc.cast(pc.subtract(d, pc.multiply(
                    pc.divide(d, pa.scalar(3)), pa.scalar(3))),
                    pa.string()), pa.scalar("")), pa.scalar("/"))
        s2 = pc.binary_join_element_wise(
            s1, pc.binary_join_element_wise(
                pa.scalar("t"),
                pc.cast(pc.subtract(d, pc.multiply(
                    pc.divide(d, pa.scalar(4)), pa.scalar(4))),
                    pa.string()), pa.scalar("")), pa.scalar("/"))
        nc = pc.cast(t.column("n_chars"), pa.int64())
        n = t.num_rows
        return pa.concat_tables([
            pa.table({"prefix": col,
                      "depth": pa.array([depth] * n, pa.int64()),
                      "nc": nc})
            for depth, col in ((1, host), (2, s1), (3, s2))])

    out = partial_groupby(ds.map_batches(explode, batch_format="pyarrow"),
                          ["prefix", "depth"],
                          {"n_docs": ("nc", "count"),
                           "sum_chars": ("nc", "sum")})
    return collect_table(out).sort_by(
        [("prefix", "ascending"), ("depth", "ascending")]).select(
        ["prefix", "depth", "n_docs", "sum_chars"])


def entity_resolution(sf_dir: str) -> pa.Table:
    """(entity, n_names, n_parts, sum_qty): record linkage over part
    names — names within Levenshtein distance 1 merge into one entity
    (connected components of the distance-1 graph, canonical = MIN
    name), and lineitem order volume rolls up to the RESOLVED entity —
    the catalog-dedup pipeline (typo'd product variants polluting
    per-product aggregates) end-to-end in one query.

    Composes the SymSpell deletion-blocked distance-1 self-join
    (``fuzzy_name_pairs`` machinery — shuffle volume is key-set-scale,
    never O(V²)) with the shared adaptive component labeler
    (``graph.label_components``); the name→entity map is
    component-sized (tiny) and the part dimension broadcast follows the
    ``brand_volume`` discipline, so the only corpus-scale work is one
    combiner aggregate over the streaming lineitem table."""
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    import ray as _ray

    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby
    from raydoc.functions.graph import label_components
    from raydoc.functions.joins import broadcast_join

    pairs = fuzzy_name_pairs(sf_dir, table="part", column="p_name")
    labels: dict = {}
    if pairs.num_rows:
        labels = label_components(
            rd.from_arrow(pairs.rename_columns(["a", "b"])))

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_name"])
    names = part.column("p_name").to_pylist()
    ents = [labels.get(n, n) for n in names]
    ent_dim = pa.table({
        "l_partkey": pc.cast(part["p_partkey"], pa.int64()),
        "entity": pa.array(ents, pa.string())})

    # dimension-scale counts (same driver budget as the part broadcast)
    import collections as _c
    n_parts = _c.Counter(ents)
    n_names = _c.Counter()
    for e, _name in set(zip(ents, names)):
        n_names[e] += 1

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity"])
    joined = broadcast_join(li, ent_dim, key="l_partkey")

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"entity": t["entity"],
                         "qty": pc.cast(pc.round(t["l_quantity"]),
                                        pa.int64())})

    vol = collect_table(partial_groupby(
        joined.map_batches(prep, batch_format="pyarrow"),
        ["entity"], {"sum_qty": ("qty", "sum")})).sort_by("entity")

    ent_sorted = vol.column("entity").to_pylist()
    return pa.table({
        "entity": pa.array(ent_sorted, pa.string()),
        "n_names": pa.array([n_names[e] for e in ent_sorted], pa.int64()),
        "n_parts": pa.array([n_parts[e] for e in ent_sorted], pa.int64()),
        "sum_qty": pc.cast(vol["sum_qty"], pa.int64())})


def loss_mask_spans(sf_dir: str, base_len: int = 5,
                    len_mod: int = 7) -> pa.Table:
    """(doc_id, turn_idx, role, tok_start, tok_end, loss_mask): the
    SFT-training-prep flatten — each document becomes one chat-template
    conversation whose token stream (GPT-2-style pre-tokenizer pieces,
    the ``bpe_token_counts`` regex) is segmented into variable-length
    turns of ``base_len + (doc_id + t) % len_mod`` pieces; roles cycle
    user/assistant/tool and ``loss_mask=1`` marks assistant spans — the
    span table every supervised fine-tune dataloader consumes (reference
    analog: the per-turn span bookkeeping of the extraction pipeline,
    §2.2, re-expressed as example preparation).

    Shape: ONE vectorized map_batches pass, zero exchange — ``n_tok``
    comes from an Arrow RE2 count (no Python tokenize loop), turns
    explode with np.repeat range arithmetic, and ``tok_start`` is a
    SEGMENTED exclusive cumsum (global cumsum minus per-doc base), so a
    batch of any width is O(rows-out) numpy work. The within-conversation
    prefix sum never crosses documents, so blocks split anywhere.
    DuckDB twin: UNNEST(range()) lateral explode + a window SUM
    (__ray_entry__.oracle_sql()['loss_mask_spans'])."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    _ROLES = np.array(["user", "assistant", "tool"])

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        empty = {
            "doc_id": pa.array([], pa.int64()),
            "turn_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()),
            "tok_start": pa.array([], pa.int64()),
            "tok_end": pa.array([], pa.int64()),
            "loss_mask": pa.array([], pa.int64())}
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return pa.table(empty)
        n_tok = pc.count_substring_regex(
            pc.fill_null(t["text"], ""), _BPE_SPLIT.pattern).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
        # upper bound on turns (every turn is >= base_len pieces), then
        # trim to the spans that actually start inside the stream
        reps = (n_tok + base_len - 1) // base_len
        keep_doc = reps > 0
        doc_id, n_tok, reps = doc_id[keep_doc], n_tok[keep_doc], reps[keep_doc]
        if len(doc_id) == 0:
            return pa.table(empty)
        did = np.repeat(doc_id, reps)
        ntk = np.repeat(n_tok, reps)
        ends = np.cumsum(reps)
        starts = ends - reps
        tix = np.arange(ends[-1], dtype=np.int64) - np.repeat(starts, reps)
        tlen = base_len + (did + tix) % len_mod
        ex = np.concatenate(([0], np.cumsum(tlen)[:-1]))
        tok_start = ex - np.repeat(ex[starts], reps)
        keep = tok_start < ntk
        did, tix, tlen = did[keep], tix[keep], tlen[keep]
        tok_start, ntk = tok_start[keep], ntk[keep]
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "turn_idx": pa.array(tix.astype(np.int32), pa.int32()),
            "role": pa.array(_ROLES[tix % 3], pa.string()),
            "tok_start": pa.array(tok_start, pa.int64()),
            "tok_end": pa.array(np.minimum(tok_start + tlen, ntk),
                                pa.int64()),
            "loss_mask": pa.array((tix % 3 == 1).astype(np.int64),
                                  pa.int64())})

    return collect_table(
        ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending"), ("turn_idx", "ascending")])


def textrank_windows(sf_dir: str, win: int = 10, n_iter: int = 5,
                     scale: int = 10 ** 12, damping: int = 85) -> pa.Table:
    """(doc_id, window_idx, rank_fp, is_top): TextRank extractive
    summarization (Mihalcea & Tarau 2004) — each document's token stream
    splits into ``win``-token windows (the sentence stand-in for this
    corpus's unpunctuated texts), windows link by shared-distinct-word
    count, and a damped PageRank over that per-document graph ranks
    them; ``is_top`` marks the window a summarizer would extract.

    Exactness: the same all-integer fixed-point discipline as
    ``graph.pagerank`` — ranks live at ``scale`` (10¹²), every transfer
    is ``r·w // W`` floor division on non-negative ints, so per-node
    contribution sums are order-independent and the chained-CTE DuckDB
    twin matches bit-for-bit, iteration by iteration.

    Shape: the graph never leaves the document — ONE vectorized
    map_batches pass, zero exchange (each doc's n_w×n_w weight matrix is
    a few dozen cells; the 5 iterations are numpy matvecs). The scale
    story is embarrassing parallelism over documents, unlike the global
    ``user_type_pagerank`` which pays the broadcast/tree-fold path."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    base_frac = (100 - damping)

    def fn(t: pa.Table) -> pa.Table:
        out_doc, out_w, out_r, out_top = [], [], [], []
        if t.num_rows and "doc_id" in t.schema.names:
            for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                    t.column("text").to_pylist()):
                toks = re.findall(r"[a-z0-9]+", (text or "").lower())
                if not toks:
                    continue
                n_w = (len(toks) + win - 1) // win
                wins = [set(toks[w * win:(w + 1) * win])
                        for w in range(n_w)]
                wt = np.zeros((n_w, n_w), dtype=np.int64)
                for i in range(n_w):
                    for j in range(i + 1, n_w):
                        c = len(wins[i] & wins[j])
                        wt[i, j] = wt[j, i] = c
                outw = wt.sum(axis=1)
                src = outw > 0
                base = scale // n_w
                r = np.full(n_w, base, dtype=np.int64)
                for _ in range(n_iter):
                    s = np.zeros(n_w, dtype=np.int64)
                    if src.any():
                        # transfer r_i*w_ij // W_i per edge, summed per dst
                        tr = (r[src, None] * wt[src]) // outw[src, None]
                        s = tr.sum(axis=0)
                    r = (base_frac * base) // 100 + (damping * s) // 100
                top = int(np.lexsort((np.arange(n_w), -r))[0])
                out_doc.extend([doc_id] * n_w)
                out_w.extend(range(n_w))
                out_r.extend(int(v) for v in r)
                out_top.extend(int(w == top) for w in range(n_w))
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "window_idx": pa.array(out_w, pa.int32()),
            "rank_fp": pa.array(out_r, pa.int64()),
            "is_top": pa.array(out_top, pa.int64())})

    return collect_table(
        ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending"), ("window_idx", "ascending")])


def curriculum_order(sf_dir: str, num_buckets: int = 64) -> pa.Table:
    """(doc_id, score, curriculum_rank): corpus-wide curriculum
    ordering — every document's exact 1-based position in the
    (score, doc_id) total order, score = alphabetic-character count
    (the cleanliness proxy; curricula feed cleanest-first). The rank
    column is what an ordered-shard writer consumes to emit a
    difficulty-staged training corpus.

    Shape (NO global sort — the ``global_rank_ntile`` decomposition):
    scores come from one vectorized Arrow RE2 count; rows land in
    ORDER-PRESERVING score-range buckets; a combiner counts each
    bucket; the driver exclusive-scans B bucket counts into base ranks
    (B rows, never docs); each bucket sorts locally and adds its base.
    DuckDB twin: ROW_NUMBER() OVER (ORDER BY score, doc_id)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def add_score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "score": pc.cast(pc.count_substring_regex(
                pc.fill_null(t["text"], ""), "[A-Za-z]"), pa.int64())})

    scored = ds.map_batches(add_score, batch_format="pyarrow")
    lo, hi = scored.min("score"), scored.max("score")
    cuts = np.linspace(lo, hi, num_buckets + 1)[1:-1]

    def add_bucket(t: pa.Table) -> pa.Table:
        s = t.column("score").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(np.searchsorted(cuts, s, side="right")
                               .astype(np.int32)))

    # two consumers (bucket counts, then ranked emit) — pin the tiny
    # (doc_id, score, bucket) stream instead of re-reading + re-scoring
    bucketed = scored.map_batches(add_bucket,
                                  batch_format="pyarrow").materialize()
    counts = collect_table(partial_groupby(
        bucketed, ["bucket"],
        {"cnt": ("score", "count")})).sort_by("bucket")
    bids = counts.column("bucket").to_pylist()
    cnts = counts.column("cnt").to_pylist()
    bases = dict(zip(bids, np.concatenate(
        ([0], np.cumsum(cnts)[:-1])).astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "doc_id"], ignore_index=True)
        g["curriculum_rank"] = (bases[int(g["bucket"].iloc[0])]
                                + np.arange(1, len(g) + 1,
                                            dtype=np.int64))
        return g[["doc_id", "score", "curriculum_rank"]]

    out = collect_table(bucketed.groupby("bucket").map_groups(
        per_bucket, batch_format="pandas"))
    return out.sort_by("doc_id")


def pack_conversations(sf_dir: str, budget: int = 512,
                       num_buckets: int = 8) -> pa.Table:
    """(doc_id, n_tokens, bucket, seq_in_bucket, tok_start_in_seq):
    conversation-aware greedy sequence packing — unlike
    ``pack_sequences`` (which CUTS the token stream at exact budget
    boundaries), an SFT packer must keep each conversation whole: in
    doc order, a conversation opens a new sequence iff appending it
    would exceed ``budget`` (an oversized conversation gets its own
    sequence). Sequences never span the ``num_buckets``
    ORDER-PRESERVING doc-id ranges — exactly the shard-local packing
    real pipelines run (boundary waste ≤ one partial sequence per
    bucket; buckets scale with the cluster so the per-bucket
    sequential fold stays bounded).

    Shape: one vectorized token-count pass (Arrow RE2), one bucket
    exchange, and a per-bucket greedy fold over conversation COUNTS
    (never text). DuckDB twin: recursive CTE stepping rn→rn+1 per
    bucket (__ray_entry__.oracle_sql()['pack_conversations'])."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def count_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pc.cast(pc.count_substring_regex(
                pc.fill_null(t["text"], ""), _BPE_SPLIT.pattern),
                pa.int64())})

    counts = ds.map_batches(count_fn, batch_format="pyarrow").materialize()
    span = counts.max("doc_id") + 1

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.divide(pc.multiply(t["doc_id"], num_buckets),
                              span), pa.int64())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", ignore_index=True)
        toks = g["n_tokens"].to_numpy()
        seq = np.empty(len(g), np.int64)
        off = np.empty(len(g), np.int64)
        s, cum = 0, 0
        for i, nt in enumerate(toks):
            if i and cum + nt > budget:
                s, cum = s + 1, 0
            elif not i:
                s, cum = 0, 0
            off[i] = cum
            seq[i] = s
            cum += nt
        g["seq_in_bucket"] = seq
        g["tok_start_in_seq"] = off
        return g[["doc_id", "n_tokens", "bucket", "seq_in_bucket",
                  "tok_start_in_seq"]]

    out = collect_table(
        counts.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    return out.sort_by("doc_id")


def term_label_chi2(sf_dir: str, top_n: int = 10, min_df: int = 5,
                    num_buckets: int | None = None) -> pa.Table:
    """(lang, term, chi2_ppm, rank): each language's ``top_n`` most
    label-discriminative terms by exact-integer χ² over the 2×2
    doc-presence table (a = docs with term & lang, b = term & ¬lang,
    c = ¬term & lang, d = rest) — the classic feature-selection /
    corpus-drift screen. chi2_ppm = ⌊10⁶·N·(ad−bc)² / ((a+b)(c+d)
    (a+c)(b+d))⌋ in arbitrary-precision integers (the HUGEINT twin
    renders identically); ties break (chi2 desc, term asc). Terms with
    corpus df < ``min_df`` and degenerate margins (single-language
    corpus, all-doc terms) are excluded by both engines.

    Scale shape: distinct (doc, term) explodes map-side WITH the doc's
    lang riding along (one row per distinct term per doc — never tf
    duplicates); (term, lang) presence counts and per-term df are
    combiner groupbys; lang totals are a |langs|-row broadcast. The χ²
    arithmetic runs on the vocabulary×|langs| aggregate (post-
    aggregation rows, not corpus rows), and the per-lang top-N is
    two-phase — term-bucket-local top-N per lang, then a tiny global
    merge — so no stratum ever occupies one task (the
    q_stratified_sample discipline)."""
    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.functions.agg import partial_groupby
    from raydoc.functions.joins import bucket_hash_join

    word = re.compile(r"\w+")
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def explode(t: pa.Table) -> pa.Table:
        terms, langs = [], []
        for txt, lg in zip(t.column("text").to_pylist(),
                           t.column("lang").to_pylist()):
            for tok in set(word.findall((txt or "").lower())):
                terms.append(tok)
                langs.append(lg)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "lang": pa.array(langs, pa.string())})

    pres = ds.map_batches(explode, batch_format="pyarrow")
    tl = partial_groupby(pres, ["term", "lang"],
                         {"a": ("term", "count")}).materialize()
    td = partial_groupby(tl, ["term"], {"df": ("a", "sum")})

    lang_tbl = collect_table(partial_groupby(
        ds.select_columns(["lang"]), ["lang"],
        {"n_docs": ("lang", "count")}))
    lang_n = dict(zip(lang_tbl.column("lang").to_pylist(),
                      (int(x) for x in
                       lang_tbl.column("n_docs").to_pylist())))
    n_total = sum(lang_n.values())

    joined = bucket_hash_join(tl, td, "term")

    def chi2(t: pa.Table) -> pa.Table:
        out_l, out_t, out_c = [], [], []
        for term, lg, a, df in zip(t.column("term").to_pylist(),
                                   t.column("lang").to_pylist(),
                                   t.column("a").to_pylist(),
                                   t.column("df").to_pylist()):
            if df < min_df:
                continue
            a, df = int(a), int(df)
            ln = lang_n.get(lg, 0)
            b = df - a
            c = ln - a
            d = n_total - df - ln + a
            den = (a + b) * (c + d) * (a + c) * (b + d)
            if den <= 0:
                continue
            num = a * d - b * c
            out_l.append(lg)
            out_t.append(term)
            out_c.append(1_000_000 * n_total * num * num // den)
        # χ² runs on vocabulary-sized aggregate rows (never corpus
        # rows); Python ints keep N·(ad−bc)² exact past int64
        h = pd.util.hash_array(_np.array(out_t, dtype=object),
                               categorize=False) if out_t else \
            _np.array([], dtype="uint64")
        return pa.table({"lang": pa.array(out_l, pa.string()),
                         "term": pa.array(out_t, pa.string()),
                         "chi2_ppm": pa.array(out_c, pa.int64()),
                         "bucket": pa.array(
                             (h & mask).astype("int32"))})

    def local_topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "chi2_ppm", "term"],
                          ascending=[True, False, True],
                          ignore_index=True)
        return g.groupby("lang", sort=False).head(top_n)[
            ["lang", "term", "chi2_ppm"]]

    locl = collect_table(
        joined.map_batches(chi2, batch_format="pyarrow")
        .groupby("bucket").map_groups(local_topn,
                                      batch_format="pandas"))
    if locl.num_rows == 0:
        return pa.table({"lang": pa.array([], pa.string()),
                         "term": pa.array([], pa.string()),
                         "chi2_ppm": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    # tiny global merge: ≤ B × |langs| × top_n candidate rows
    df = locl.to_pandas().sort_values(
        ["lang", "chi2_ppm", "term"], ascending=[True, False, True],
        ignore_index=True)
    df = df.groupby("lang", sort=False).head(top_n).reset_index(
        drop=True)
    df["rank"] = df.groupby("lang", sort=False).cumcount() + 1
    return pa.table({"lang": pa.array(df["lang"], pa.string()),
                     "term": pa.array(df["term"], pa.string()),
                     "chi2_ppm": pa.array(df["chi2_ppm"], pa.int64()),
                     "rank": pa.array(df["rank"], pa.int64())})


def vocab_growth(sf_dir: str, step: int = 10_000,
                 num_buckets: int = 64) -> pa.Table:
    """(pos_bucket, new_terms, vocab_size): Heaps'-law vocabulary-growth
    curve — reading the corpus in doc_id order, how many NEW distinct
    terms first appear inside each window of ``step`` token positions,
    plus the running vocabulary size. The standard corpus-health audit:
    a healthy natural corpus grows ~n^beta; a template-stamped or
    looping corpus flatlines early.

    Shape (NO global sort): global token positions come from the
    ``curriculum_order`` decomposition — order-preserving doc_id range
    buckets, a combiner sums each bucket's Arrow-RE2 token counts, the
    driver exclusive-scans B bucket sums into base offsets (B rows,
    never docs), and each bucket re-derives its docs' offsets locally.
    First occurrences then reduce with one combiner min per term and a
    tiny histogram groupby. Oracle: UNNEST + generate_subscripts with a
    window-SUM offset and MIN per term."""
    import pandas as pd
    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    # ONE tokenizer for both sides of the offset decomposition: bucket
    # token counts (Arrow RE2) and in-bucket positions (Python re) must
    # agree or every downstream global position shifts. RE2's \w is ASCII
    # while Python's is Unicode, so both use the explicit ASCII class
    # over LOWERED text — exactly what the DuckDB twin's
    # regexp_extract_all(lower(text), '\w+') computes.
    word = re.compile(r"[0-9A-Za-z_]+")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    empty = pa.table({"pos_bucket": pa.array([], pa.int64()),
                      "new_terms": pa.array([], pa.int64()),
                      "vocab_size": pa.array([], pa.int64())})
    lo = ds.min("doc_id")
    if lo is None:
        return empty
    hi = ds.max("doc_id")
    cuts = _np.linspace(lo, hi, num_buckets + 1)[1:-1]

    def count_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "ntok": pa.array([], pa.int64())})
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(_np.searchsorted(cuts, ids, side="right")
                               .astype(_np.int32)),
            "ntok": pc.cast(pc.count_substring_regex(
                pc.utf8_lower(pc.fill_null(t["text"], "")),
                r"[0-9A-Za-z_]+"), pa.int64())})

    counts = collect_table(partial_groupby(
        ds.map_batches(count_bucket, batch_format="pyarrow"),
        ["bucket"], {"btok": ("ntok", "sum")})).sort_by("bucket")
    bids = counts.column("bucket").to_pylist()
    btoks = counts.column("btok").to_pylist()
    bases = dict(zip(bids, _np.concatenate(
        ([0], _np.cumsum(btoks)[:-1])).astype(_np.int64)))

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int32())})
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "text": t["text"],
            "bucket": pa.array(_np.searchsorted(cuts, ids, side="right")
                               .astype(_np.int32))})

    def first_positions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", ignore_index=True)
        base = int(bases[int(g["bucket"].iloc[0])])
        terms, poss = [], []
        off = base
        for txt in g["text"]:
            toks = word.findall((txt or "").lower())
            seen = {}
            for i, tok in enumerate(toks):
                if tok not in seen:
                    seen[tok] = off + i
            terms.extend(seen.keys())
            poss.extend(seen.values())
            off += len(toks)
        return pd.DataFrame({"term": terms, "gpos": poss})

    firsts = partial_groupby(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(first_positions,
                                      batch_format="pandas"),
        ["term"], {"first_pos": ("gpos", "min")})

    def to_hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "first_pos" not in t.schema.names:
            return pa.table({"pos_bucket": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64())})
        fp = pc.cast(t["first_pos"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "pos_bucket": pa.array(fp // step),
            "one": pa.array(_np.ones(len(fp), _np.int64))})

    hist = collect_table(partial_groupby(
        firsts.map_batches(to_hist, batch_format="pyarrow"),
        ["pos_bucket"], {"new_terms": ("one", "sum")})).sort_by(
            "pos_bucket")
    if hist.num_rows == 0:
        return empty
    nt = hist.column("new_terms").to_numpy(zero_copy_only=False)
    return pa.table({
        "pos_bucket": pc.cast(hist["pos_bucket"], pa.int64()),
        "new_terms": pc.cast(hist["new_terms"], pa.int64()),
        "vocab_size": pa.array(_np.cumsum(nt).astype(_np.int64))})


def token_fertility(sf_dir: str) -> pa.Table:
    """(lang, n_docs, n_words, n_pieces, fertility_ppm): tokenizer
    fertility audit per language — BPE-style pre-tokenizer pieces per
    word (×10⁶, integer floor) over the corpus. Fertility far above
    ~1.3e6 for a language flags a tokenizer that fragments it (the
    standard multilingual-tokenizer health check before training).

    Shape: two vectorized Arrow-RE2 counts per batch + per-batch lang
    partials; only |langs| rows reach the final groupby. Oracle: the
    same regexp counts grouped by lang."""
    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])

    def prep(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        return pa.table({
            "lang": t["lang"],
            "one": pa.array(_np.ones(t.num_rows, _np.int64)),
            "words": pc.cast(pc.count_substring_regex(txt, r"\w+"),
                             pa.int64()),
            "pieces": pc.cast(pc.count_substring_regex(
                txt, _BPE_SPLIT.pattern), pa.int64())})

    t = collect_table(partial_groupby(
        ds.map_batches(prep, batch_format="pyarrow"), ["lang"],
        {"n_docs": ("one", "sum"), "n_words": ("words", "sum"),
         "n_pieces": ("pieces", "sum")}))
    if t.num_rows == 0:
        return pa.table({"lang": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "n_words": pa.array([], pa.int64()),
                         "n_pieces": pa.array([], pa.int64()),
                         "fertility_ppm": pa.array([], pa.int64())})
    w = t.column("n_words").to_numpy(zero_copy_only=False)
    p = t.column("n_pieces").to_numpy(zero_copy_only=False)
    fert = _np.where(w > 0, (p * 1_000_000) // _np.maximum(w, 1), 0)
    return pa.table({
        "lang": t["lang"],
        "n_docs": pc.cast(t["n_docs"], pa.int64()),
        "n_words": pc.cast(t["n_words"], pa.int64()),
        "n_pieces": pc.cast(t["n_pieces"], pa.int64()),
        "fertility_ppm": pa.array(fert.astype(_np.int64))}) \
        .sort_by("lang")


def dup_source_matrix(sf_dir: str,
                      num_buckets: int | None = None) -> pa.Table:
    """(src_a, src_b, shared_texts): cross-source contamination matrix
    — for every unordered source pair, how many distinct text digests
    occur in BOTH sources. The pretraining-mix audit that catches one
    feed re-serving another's content (inflating that content's
    effective epoch count).

    Shape: md5 digests only cross the wire; (digest, source) dedups in
    a combiner groupby, pairs emit per digest inside a coarse
    digest-bucket group (≤ |sources|² rows per digest), and a second
    combiner counts pairs. Oracle: DISTINCT md5 self-join."""
    import pandas as pd
    import pyarrow.compute as pc

    from raydoc.functions._buckets import reduce_bucket_count
    from raydoc.functions.agg import partial_groupby

    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])

    def digest(t: pa.Table) -> pa.Table:
        ds_, ss = [], []
        for txt, src in zip(t.column("text").to_pylist(),
                            t.column("source").to_pylist()):
            if txt is None:
                continue
            ds_.append(hashlib.md5(txt.encode()).hexdigest())
            ss.append(src)
        return pa.table({"d": pa.array(ds_, pa.string()),
                         "source": pa.array(ss, pa.string())})

    distinct = partial_groupby(
        ds.map_batches(digest, batch_format="pyarrow"),
        ["d", "source"], {"n": ("source", "count")})

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "d" not in t.schema.names:
            return pa.table({"d": pa.array([], pa.string()),
                             "source": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int32())})
        h = pd.util.hash_array(
            t.column("d").to_numpy(zero_copy_only=False),
            categorize=False)
        return pa.table({"d": t["d"], "source": t["source"],
                         "bucket": pa.array((h & mask).astype("int32"))})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, grp in g.groupby("d", sort=False):
            srcs = sorted(set(grp["source"]))
            for i in range(len(srcs)):
                for j in range(i + 1, len(srcs)):
                    rows.append((srcs[i], srcs[j]))
        return pd.DataFrame(rows, columns=["src_a", "src_b"])

    counted = collect_table(partial_groupby(
        distinct.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(pairs, batch_format="pandas"),
        ["src_a", "src_b"], {"shared_texts": ("src_a", "count")}))
    if counted.num_rows == 0:
        return pa.table({"src_a": pa.array([], pa.string()),
                         "src_b": pa.array([], pa.string()),
                         "shared_texts": pa.array([], pa.int64())})
    return pa.table({
        "src_a": counted["src_a"], "src_b": counted["src_b"],
        "shared_texts": pc.cast(counted["shared_texts"], pa.int64())}) \
        .sort_by([("src_a", "ascending"), ("src_b", "ascending")])


def conversation_structure(sf_dir: str,
                           transcripts: "pa.Table | None" = None,
                           num_buckets: int = 16) -> pa.Table:
    """(n_convs, valid_convs, dense_violations, role_violations,
    empty_turn_convs, total_turns): SFT-readiness validation of the
    transcript table — per conversation, turn_idx must be dense from 0
    under the stable (turn_idx) order, roles must follow the
    user/assistant/tool cycle, and no turn may be empty text; a
    conversation failing any check is excluded from ``valid_convs``.
    The pre-training-prep gate run before packing/loss-masking.

    Rows-only: the transcript model is synthesized (no driver view for
    DuckDB), so constructed-violation unit tests carry correctness.
    Shape: one coarse conv-hash bucket exchange, vectorized per-bucket
    checks over whole blocks — the sessionize discipline."""
    import pandas as pd
    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    if transcripts is None:
        # same derivation the extraction queries use (documents ->
        # deterministic multi-turn transcripts)
        import pyarrow.parquet as pq

        from raydoc.sources.transcripts import transcripts_from_documents
        doc_table = pq.read_table(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
        transcripts = transcripts_from_documents(doc_table,
                                                 turns_per_conv=6)
    ds = rd.from_arrow(transcripts)
    mask = num_buckets - 1
    cycle = {0: "user", 1: "assistant", 2: "tool"}

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "conv_id" not in t.schema.names:
            return pa.table({"conv_id": pa.array([], pa.string()),
                             "turn_idx": pa.array([], pa.int32()),
                             "role": pa.array([], pa.string()),
                             "text": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int32())})
        h = pd.util.hash_array(
            t.column("conv_id").to_numpy(zero_copy_only=False),
            categorize=False)
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "role": t["role"],
            "text": t["text"],
            "bucket": pa.array((h & mask).astype("int32"))})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], ignore_index=True)
        n_convs = valid = dense_v = role_v = empty_v = 0
        total = len(g)
        for _, grp in g.groupby("conv_id", sort=False):
            n_convs += 1
            idx = grp["turn_idx"].to_numpy()
            ok_dense = bool((idx == _np.arange(len(idx))).all())
            ok_role = all(r == cycle[i % 3]
                          for i, r in enumerate(grp["role"]))
            ok_text = bool(grp["text"].fillna("").str.len().gt(0).all())
            dense_v += not ok_dense
            role_v += not ok_role
            empty_v += not ok_text
            valid += ok_dense and ok_role and ok_text
        return pd.DataFrame({
            "k": [0], "n_convs": [n_convs], "valid_convs": [valid],
            "dense_violations": [dense_v], "role_violations": [role_v],
            "empty_turn_convs": [empty_v], "total_turns": [total]})

    t = collect_table(partial_groupby(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(per_bucket,
                                      batch_format="pandas"),
        ["k"], {"n_convs": ("n_convs", "sum"),
                "valid_convs": ("valid_convs", "sum"),
                "dense_violations": ("dense_violations", "sum"),
                "role_violations": ("role_violations", "sum"),
                "empty_turn_convs": ("empty_turn_convs", "sum"),
                "total_turns": ("total_turns", "sum")}))
    if t.num_rows == 0:
        z = pa.array([0], pa.int64())
        return pa.table({"n_convs": z, "valid_convs": z,
                         "dense_violations": z, "role_violations": z,
                         "empty_turn_convs": z, "total_turns": z})
    return pa.table({
        "n_convs": pa.compute.cast(t["n_convs"], pa.int64()),
        "valid_convs": pa.compute.cast(t["valid_convs"], pa.int64()),
        "dense_violations": pa.compute.cast(t["dense_violations"],
                                            pa.int64()),
        "role_violations": pa.compute.cast(t["role_violations"],
                                           pa.int64()),
        "empty_turn_convs": pa.compute.cast(t["empty_turn_convs"],
                                            pa.int64()),
        "total_turns": pa.compute.cast(t["total_turns"], pa.int64())})
