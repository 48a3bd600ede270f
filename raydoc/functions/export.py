"""K4 DOCX export over the documents table.

Sink shape: one .docx per document, written inside ``map_batches`` tasks
(atomic tmp+rename — the same sink discipline as the aligned extraction
path); the dataset flowing back to the driver is a tiny per-batch metrics
table. ``docx_meta`` is the deterministic query twin (byte length + sha256
of the generated docx per doc — stable because the writer is
byte-deterministic)."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

import ray.data as rd

from raydoc.functions._collect import collect_table


def docx_meta(sf_dir: str) -> pa.Table:
    """(doc_id, n_bytes, sha256) of the K4 docx rendering of each doc."""
    from raydoc.kernels.docx import markdown_to_docx_bytes

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        sizes, hashes = [], []
        for v in t.column("text").to_pylist():
            b = markdown_to_docx_bytes(v or "")
            sizes.append(len(b))
            hashes.append(hashlib.sha256(b).hexdigest())
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_bytes": pa.array(sizes, pa.int64()),
                         "sha256": pa.array(hashes, pa.string())})

    return collect_table(ds.map_batches(fn, batch_format="pyarrow")).sort_by(
        "doc_id")


def export_docx(sf_dir: str, out_dir: str) -> int:
    """Write one .docx per document under ``out_dir``; returns the number
    of files written. Files are written by the workers (atomic tmp+rename),
    not shipped to the driver."""
    from raydoc.kernels.docx import markdown_to_docx_bytes

    os.makedirs(out_dir, exist_ok=True)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    from raydoc.kernels.docx import sanitize_filename

    def fn(t: pa.Table) -> pa.Table:
        n = 0
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            data = markdown_to_docx_bytes(text or "")
            path = os.path.join(out_dir,
                                f"doc-{sanitize_filename(str(doc_id))}.docx")
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, path)
            n += 1
        return pa.table({"files": pa.array([n], pa.int64())})

    counts = collect_table(ds.map_batches(fn, batch_format="pyarrow"))
    import pyarrow.compute as pc
    return pc.sum(counts.column("files")).as_py() or 0
