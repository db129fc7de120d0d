"""Per-stage checkpointing with manifests: resumable runs + lineage.

Layout per stage: ``{run_dir}/{stage}/`` holding the stage's Parquet part
files plus ``_MANIFEST.json`` with the stage name, input fingerprint,
per-file row counts (lineage), row total, wall time and stage metrics.

A rerun with the same fingerprint skips the stage and re-reads its output;
a stage is only visible once complete (written to ``{stage}.tmp`` then
atomically renamed), so a killed run never leaves a half-stage that a
resume would trust.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Dict, Optional

import pyarrow.parquet as pq

MANIFEST = "_MANIFEST.json"


def _scan_lineage(stage_dir: str) -> Dict[str, int]:
    out = {}
    for name in sorted(os.listdir(stage_dir)):
        if name.endswith(".parquet"):
            out[name] = pq.read_metadata(os.path.join(stage_dir, name)).num_rows
    return out


def run_stage(
    run_dir: str,
    stage: str,
    fingerprint: str,
    write_fn: Callable[[str], Optional[dict]],
    resume: bool = True,
) -> str:
    """Execute (or skip) one checkpointed stage; returns the stage dir.

    ``write_fn(tmp_dir)`` must write the stage output as parquet files into
    ``tmp_dir`` and may return a metrics dict for the manifest.
    """
    stage_dir = os.path.join(run_dir, stage)
    mpath = os.path.join(stage_dir, MANIFEST)
    if resume and os.path.exists(mpath):
        with open(mpath) as f:
            man = json.load(f)
        if man.get("fingerprint") == fingerprint:
            return stage_dir
    tmp_dir = stage_dir + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    t0 = time.perf_counter()
    metrics = write_fn(tmp_dir) or {}
    lineage = _scan_lineage(tmp_dir)
    man = {
        "stage": stage,
        "fingerprint": fingerprint,
        "rows": int(sum(lineage.values())),
        "files": lineage,
        "wall_sec": round(time.perf_counter() - t0, 3),
        "metrics": metrics,
    }
    with open(os.path.join(tmp_dir, MANIFEST), "w") as f:
        json.dump(man, f, indent=1)
    if os.path.exists(stage_dir):
        shutil.rmtree(stage_dir)
    os.replace(tmp_dir, stage_dir)
    return stage_dir


def read_manifest(stage_dir: str) -> dict:
    with open(os.path.join(stage_dir, MANIFEST)) as f:
        return json.load(f)
