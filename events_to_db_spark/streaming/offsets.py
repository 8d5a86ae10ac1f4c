"""Checkpoint offset-map introspection.

The reference persists an offset map (stream → highest offset copied)
in the target database, where operators can inspect copy progress.
Spark's streaming checkpoint *is* that offset map — an offset log and
a commit log of JSON files — but it's opaque on disk.  This module
reads it back into data, so progress monitoring / lag dashboards have
the same visibility the reference's DB table gave.

Layout (stable public format since Spark 2.x):
``<ckpt>/offsets/<batchId>`` — one file per *started* batch: a version
line, a metadata JSON line (watermark, confs), then one line per
source with that source's end offset (for the file source: a JSON with
``logOffset``).  ``<ckpt>/commits/<batchId>`` exists only once the
batch *committed* — the resume point is the highest committed id.
"""

from __future__ import annotations

import json
from pathlib import Path


def _batch_files(d: Path) -> dict[int, Path]:
    if not d.is_dir():
        return {}
    out = {}
    for p in d.iterdir():
        if p.name.isdigit():
            out[int(p.name)] = p
    return out


def read_offset_log(checkpoint_dir: str) -> dict[int, dict]:
    """batchId → {"metadata": {...}, "sources": [offset, ...]}."""
    out: dict[int, dict] = {}
    for bid, path in sorted(_batch_files(Path(checkpoint_dir) / "offsets").items()):
        lines = path.read_text().splitlines()
        # line 0: "v1"; line 1: batch metadata; rest: per-source offsets
        meta = json.loads(lines[1]) if len(lines) > 1 else {}
        sources = []
        for ln in lines[2:]:
            try:
                sources.append(json.loads(ln))
            except json.JSONDecodeError:
                sources.append(ln)
        out[bid] = {"metadata": meta, "sources": sources}
    return out


def committed_batches(checkpoint_dir: str) -> list[int]:
    return sorted(_batch_files(Path(checkpoint_dir) / "commits"))


def resume_point(checkpoint_dir: str) -> dict | None:
    """The offset map a restart resumes from: the last *committed*
    batch's source offsets (None for a fresh checkpoint) — exactly
    what the reference reads from its DB on startup."""
    committed = committed_batches(checkpoint_dir)
    if not committed:
        return None
    log = read_offset_log(checkpoint_dir)
    last = committed[-1]
    return {
        "batch_id": last,
        "sources": log[last]["sources"],
        "watermark_ms": log[last]["metadata"].get("batchWatermarkMs"),
    }
