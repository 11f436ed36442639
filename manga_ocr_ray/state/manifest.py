"""Per-partition lineage manifests + resume (north-rule requirement).

Replicates — hardened and distributed — the reference's package-granular
rerun model (manga_ocr_dev/synthetic_data_generator/run_generate.py:126-146:
one CSV package in, one image dir + meta CSV out; resume = rerun a package).

Layout under ``out_dir``::

    data/bucket=<k>/*.parquet      extracted rows of hash bucket k
    _manifests/bucket=<k>.json     written AFTER the bucket's data commits

A manifest records: bucket id, input fingerprint, extraction-rule version,
row count, and the north-rule metrics (turns/sec, strip ratio, normalization
edit volume).  On resume, buckets with a manifest matching the current
fingerprint+version are skipped by filtering them out of the input BEFORE the
extraction stage (vectorized anti-join against the small done-set — no
shuffle).  A fingerprint mismatch invalidates the bucket (rule/input drift
cannot silently mix outputs — SURVEY.md §7.5).
"""

from __future__ import annotations

import json
import os
import time

RULE_VERSION = "1"


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def data_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def write_manifest(out_dir: str, bucket: int, fingerprint: str, rows: int,
                   metrics: dict | None = None) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = os.path.join(manifest_dir(out_dir), f"bucket={bucket}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "bucket": bucket,
                "fingerprint": fingerprint,
                "rule_version": RULE_VERSION,
                "rows": rows,
                "metrics": metrics or {},
                "written_at": time.time(),
            },
            f,
        )
    os.replace(tmp, path)  # atomic commit


def done_buckets(out_dir: str, fingerprint: str) -> set[int]:
    """Buckets already extracted for this exact input+rule version."""
    mdir = manifest_dir(out_dir)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if m.get("fingerprint") == fingerprint and m.get("rule_version") == RULE_VERSION:
            done.add(int(m["bucket"]))
    return done


def read_manifests(out_dir: str) -> list[dict]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out
