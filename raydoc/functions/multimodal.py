"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata
processed by an actor-pool decode stage.

The image/audio decode libraries are not available in this container, so
the decode kernel itself is STUBBED (``decode_image`` raises
``NotImplementedError`` unless a known deterministic test header is seen),
but the Ray-side plumbing — binary column schema, small batch sizes for
wide rows, actor signature with once-per-worker "model" setup, output
layout — is real and tested. Swapping in PIL/ffmpeg later only changes the
kernel body.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("mime", pa.string()),
])


def decode_image(payload: bytes) -> tuple[int, int]:
    """STUB: real image decode is unavailable in this environment.

    Recognizes only the deterministic fake header ``RAWDIM:<w>x<h>;`` used
    by tests; any other payload raises NotImplementedError exactly like a
    missing codec would."""
    head = payload[:32]
    if head.startswith(b"RAWDIM:"):
        dims = head[7:head.index(b";")].decode()
        w, h = dims.split("x")
        return int(w), int(h)
    raise NotImplementedError("image codecs not available in this build")


class MediaMetaActor:
    """Actor-pool stage: per-payload metadata + stubbed decode.

    ``__init__`` is the once-per-worker model-load slot (here: nothing to
    load, but the shape is the production one). Use small ``batch_size``
    for wide binary rows so batch × concurrency fits worker heaps.
    """

    def __init__(self) -> None:
        self._decoder = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        payloads = batch.column("payload").to_pylist()
        n_bytes, sha, widths, heights, decoded = [], [], [], [], []
        for p in payloads:
            p = p or b""
            n_bytes.append(len(p))
            sha.append(hashlib.sha256(p).hexdigest())
            try:
                w, h = self._decoder(p)
                widths.append(w)
                heights.append(h)
                decoded.append(True)
            except NotImplementedError:
                widths.append(None)
                heights.append(None)
                decoded.append(False)
        return pa.table({
            "media_id": ids,
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "sha256": pa.array(sha, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "decoded": pa.array(decoded, pa.bool_()),
        })


def media_pipeline(ds: rd.Dataset, concurrency=(1, 4),
                   batch_size: int = 64) -> rd.Dataset:
    """Binary payloads → metadata rows through the actor pool. Small batch
    size on purpose: rows are wide."""
    return ds.map_batches(MediaMetaActor, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


def document_media_meta(sf_dir: str) -> pa.Table:
    """Oracle-checkable exercise of the media path: documents' text bytes
    as opaque payloads → (doc_id, n_bytes, sha256)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        payloads = [(v or "").encode() for v in t.column("text").to_pylist()]
        return pa.table({
            "media_id": t.column("doc_id"),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["text/plain"] * t.num_rows, pa.string()),
        })

    media = ds.map_batches(to_media, batch_format="pyarrow")
    rows = media_pipeline(media).take_all()
    rows.sort(key=lambda r: r["media_id"])
    t = pa.Table.from_pylist(rows)
    return pa.table({"doc_id": t["media_id"], "n_bytes": t["n_bytes"],
                     "sha256": t["sha256"]})
