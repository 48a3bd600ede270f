"""Per-partition lineage manifests and checkpoint/resume.

The Ray-native replacement for the reference's md5-keyed result cache
(services/cache_manager.py:18-87; SURVEY.md §2.1 K5): output is laid out as
one directory per deterministic partition (``part=<k>/``), each completed
partition carrying a ``_manifest.json`` with lineage (input fingerprint,
engine version, config hash) and extraction metrics (rows, conversations,
turns/sec, strip ratio, parse failures). A rerun skips partitions whose
manifest validates against the current input fingerprint — resume is
partition-granular, which is what makes a 10^12-turn job restartable.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, is_dataclass
from typing import Any

MANIFEST_NAME = "_manifest.json"


def config_fingerprint(cfg: Any) -> str:
    payload = asdict(cfg) if is_dataclass(cfg) else dict(cfg)
    return hashlib.sha256(
        json.dumps(payload, sort_keys=True, default=str).encode()).hexdigest()[:16]


def partition_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part}")


def write_manifest(out_dir: str, part: int, *, input_fingerprint: str,
                   config_hash: str, metrics: dict[str, Any]) -> None:
    """Atomic write (tmp + rename) so a crash never leaves a half manifest."""
    pdir = partition_dir(out_dir, part)
    os.makedirs(pdir, exist_ok=True)
    payload = {
        "partition": part,
        "input_fingerprint": input_fingerprint,
        "config_hash": config_hash,
        "engine_version": _engine_version(),
        "metrics": metrics,
    }
    tmp = os.path.join(pdir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=1)
    os.replace(tmp, os.path.join(pdir, MANIFEST_NAME))


def read_manifest(out_dir: str, part: int) -> dict[str, Any] | None:
    path = os.path.join(partition_dir(out_dir, part), MANIFEST_NAME)
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def completed_partitions(out_dir: str, num_partitions: int, *,
                         input_fingerprint: str, config_hash: str) -> set[int]:
    """Partitions whose manifest matches the current input + config."""
    done: set[int] = set()
    for part in range(num_partitions):
        m = read_manifest(out_dir, part)
        if (m and m.get("input_fingerprint") == input_fingerprint
                and m.get("config_hash") == config_hash):
            done.add(part)
    return done


def _engine_version() -> str:
    from raydoc import __version__
    return __version__


# --- file-granular manifests (aligned / shuffle-elision mode) ---------------
# When input files are conversation-aligned the natural checkpoint unit is
# the INPUT FILE: each fused task turns one input file into one output file
# (no hive fan-out → no tiny-file explosion) and stamps a manifest next to
# it. Resume = skip input files whose manifest validates.

def file_fingerprint(path: str) -> str:
    """name:size — cheap and catches regeneration (content hash would
    re-read the whole corpus)."""
    return f"{os.path.basename(path)}:{os.path.getsize(path)}"


def file_stem(input_path: str, input_root: str | None = None) -> str:
    """Unique output stem for one input file. With ``input_root`` the stem
    is the path RELATIVE to the root with separators folded (so the
    standard Spark/Hive layout ``a/part-0.parquet`` + ``b/part-0.parquet``
    never collides on basename); without a root, the basename."""
    if input_root:
        rel = os.path.relpath(input_path, input_root)
        if not rel.startswith(".."):
            return os.path.splitext(rel)[0].replace(os.sep, "__")
    return os.path.splitext(os.path.basename(input_path))[0]


def file_output_paths(out_dir: str, input_path: str,
                      input_root: str | None = None) -> tuple[str, str]:
    """(output parquet path, manifest path) for one input file."""
    stem = file_stem(input_path, input_root)
    return (os.path.join(out_dir, f"{stem}.extracted.parquet"),
            os.path.join(out_dir, "_manifests", f"{stem}.json"))


def write_file_manifest(out_dir: str, input_path: str, *, config_hash: str,
                        metrics: dict[str, Any],
                        input_root: str | None = None) -> None:
    _, mpath = file_output_paths(out_dir, input_path, input_root)
    os.makedirs(os.path.dirname(mpath), exist_ok=True)
    payload = {
        "input_file": os.path.basename(input_path),
        "input_fingerprint": file_fingerprint(input_path),
        "config_hash": config_hash,
        "engine_version": _engine_version(),
        "metrics": metrics,
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=1)
    os.replace(tmp, mpath)


def read_file_manifest(out_dir: str, input_path: str,
                       input_root: str | None = None) -> dict[str, Any] | None:
    _, mpath = file_output_paths(out_dir, input_path, input_root)
    try:
        with open(mpath) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def pending_input_files(out_dir: str, input_files: list[str], *,
                        config_hash: str,
                        input_root: str | None = None) -> list[str]:
    """Input files whose output manifest is missing or stale."""
    pending = []
    for f in input_files:
        m = read_file_manifest(out_dir, f, input_root)
        opath, _ = file_output_paths(out_dir, f, input_root)
        if (m is None or m.get("input_fingerprint") != file_fingerprint(f)
                or m.get("config_hash") != config_hash
                or not os.path.exists(opath)):
            pending.append(f)
    return pending
