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
