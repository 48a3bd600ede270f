"""compact_parquet_dir: fragment count drops, rows and values survive."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydoc.pipelines.compact import compact_parquet_dir


def _fragmented(d, n_files=24, rows_each=50):
    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        t = pa.table({
            "k": pa.array(range(i * rows_each, (i + 1) * rows_each),
                          pa.int64()),
            "v": [f"row-{i}-{j}" for j in range(rows_each)],
        })
        pq.write_table(t, os.path.join(d, f"part-{i:04d}.parquet"))


def test_compaction_in_place(ray_session, tmp_path):
    d = str(tmp_path / "out")
    _fragmented(d)
    before = pq.read_table(d).sort_by("k")
    m = compact_parquet_dir(d, target_rows_per_file=400)
    assert m["files_before"] == 24 and m["rows"] == 1200
    assert m["files_after"] < 24 // 4
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) == m["files_after"]
    after = pq.read_table(d, columns=["k", "v"]).sort_by("k")
    assert after.equals(before)
    assert os.path.exists(os.path.join(d, "_compaction_manifest.json"))


def test_compaction_to_out_dir_keeps_input(ray_session, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _fragmented(src, n_files=6, rows_each=10)
    m = compact_parquet_dir(src, target_rows_per_file=60, out_dir=dst)
    assert m["files_before"] == 6 and m["files_after"] >= 1
    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 6
    assert pq.read_table(dst, columns=["k"]).num_rows == 60


def test_compaction_empty_dir_raises(ray_session, tmp_path):
    os.makedirs(tmp_path / "empty", exist_ok=True)
    with pytest.raises(ValueError, match="no parquet files"):
        compact_parquet_dir(str(tmp_path / "empty"))
