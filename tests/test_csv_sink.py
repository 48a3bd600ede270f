"""CSV sink + Ray CSV source round-trip: adversarial text fidelity
(embedded newlines, quotes, commas, empty strings), manifest
discipline, idempotent reruns, stale-shard removal."""

import json
import os

import pyarrow as pa
from pyarrow import csv as pacsv


ADVERSARIAL = [
    "plain words",
    "comma, separated, values",
    'a "quoted" phrase',
    "line one\nline two\nline three",
    'mix: "q", comma,\nand newline',
    "",
    "   leading and trailing   ",
    "unicode: café ☃ ﬀ",
    "123",            # numeric-looking text must stay a string
    "\n",
]


def _docs_table():
    n = len(ADVERSARIAL)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(ADVERSARIAL, pa.string()),
        "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
    })


def _read_back(out):
    import ray.data as rd
    return rd.read_csv(
        out, file_extensions=["csv"],
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(
            column_types={"doc_id": pa.int64(), "text": pa.string(),
                          "source": pa.string()},
            strings_can_be_null=False))


def test_csv_roundtrip_adversarial_text(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.functions.export import export_csv

    t = _docs_table()
    out = str(tmp_path / "csv")
    manifest = export_csv(rd.from_arrow(t), out, shard_rows=4)

    assert sum(manifest.column("n_rows").to_pylist()) == t.num_rows
    files = sorted(f for f in os.listdir(out) if f.endswith(".csv"))
    assert files == sorted(manifest.column("shard").to_pylist())
    with open(os.path.join(out, "_csv_manifest.json")) as fh:
        assert {m["shard"] for m in json.load(fh)} == set(files)

    back = sorted(_read_back(out).take_all(), key=lambda r: r["doc_id"])
    assert [r["text"] for r in back] == ADVERSARIAL
    assert [r["source"] for r in back] == \
        t.column("source").to_pylist()


def test_csv_rerun_idempotent_and_stale_removed(ray_session, tmp_path):
    import ray.data as rd

    from raydoc.functions.export import export_csv

    out = str(tmp_path / "csv")
    t1 = _docs_table()
    m1 = export_csv(rd.from_arrow(t1), out, shard_rows=3)
    m2 = export_csv(rd.from_arrow(t1), out, shard_rows=3)
    assert sorted(m1.column("shard").to_pylist()) == \
        sorted(m2.column("shard").to_pylist())

    # different data: old shards must not survive the rerun
    t2 = t1.set_column(1, "text", pa.array(
        [s + "!" for s in ADVERSARIAL], pa.string()))
    m3 = export_csv(rd.from_arrow(t2), out, shard_rows=3)
    files = {f for f in os.listdir(out) if f.endswith(".csv")}
    assert files == set(m3.column("shard").to_pylist())
    assert files.isdisjoint(set(m1.column("shard").to_pylist()))


def test_csv_roundtrip_stats_shape(ray_session):
    from raydoc.functions.export import csv_roundtrip_stats

    t = csv_roundtrip_stats("/root/testdata/sf0.001")
    assert t.schema.names == ["source", "n_docs", "sum_chars", "checksum"]
    assert t.num_rows > 0
    assert all(len(c) == 16 for c in t.column("checksum").to_pylist())
