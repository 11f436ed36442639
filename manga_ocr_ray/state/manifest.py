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

All manifest/listing IO routes through ``pyarrow.fs`` (ADVICE r4): ``out_dir``
may be a local path OR an object-store URI (``s3://bucket/extracted``), so a
``ray job submit`` re-submission resumes correctly when outputs live in S3 —
previously manifests silently targeted a literal local ``s3:/...`` directory
on the driver.  Local commits stay write-tmp-then-rename (atomic on POSIX);
object stores get a single PUT per manifest, which is atomic-visible.
"""

from __future__ import annotations

import json
import os
import posixpath
import time

RULE_VERSION = "1"


def _is_uri(path: str) -> bool:
    return "://" in path


def _join(base: str, *parts: str) -> str:
    # URIs always use "/" regardless of host OS
    return posixpath.join(base, *parts) if _is_uri(base) else \
        os.path.join(base, *parts)


def resolve_fs(path: str, filesystem=None):
    """→ (pyarrow filesystem, fs-internal path) for a local path or any URI
    ``pyarrow.fs.FileSystem.from_uri`` understands (s3://, gs://, hdfs://).
    An explicit ``filesystem`` wins — tests inject ``_MockFileSystem`` to
    exercise the object-store code path without network."""
    from pyarrow import fs as pafs

    if filesystem is not None:
        return filesystem, path.split("://", 1)[1] if _is_uri(path) else path
    if _is_uri(path):
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), os.path.abspath(path)


def manifest_dir(out_dir: str) -> str:
    return _join(out_dir, "_manifests")


def data_dir(out_dir: str) -> str:
    return _join(out_dir, "data")


def write_manifest(out_dir: str, bucket: int, fingerprint: str, rows: int,
                   metrics: dict | None = None, *, filesystem=None) -> None:
    from pyarrow import fs as pafs

    fs_, mdir = resolve_fs(manifest_dir(out_dir), filesystem)
    fs_.create_dir(mdir, recursive=True)
    payload = json.dumps(
        {
            "bucket": bucket,
            "fingerprint": fingerprint,
            "rule_version": RULE_VERSION,
            "rows": rows,
            "metrics": metrics or {},
            "written_at": time.time(),
        }
    ).encode()
    path = posixpath.join(mdir, f"bucket={bucket}.json")
    if isinstance(fs_, pafs.LocalFileSystem):
        # atomic commit: write sidecar, rename into place
        tmp = f"{path}.tmp{os.getpid()}"
        with fs_.open_output_stream(tmp) as f:
            f.write(payload)
        fs_.move(tmp, path)
    else:
        # object stores have no rename, but a single-object PUT is
        # atomic-visible — readers see the old object or the new one
        with fs_.open_output_stream(path) as f:
            f.write(payload)


def _manifest_infos(fs_, mdir: str) -> list:
    from pyarrow import fs as pafs

    sel = pafs.FileSelector(mdir, allow_not_found=True)
    return sorted(
        (i for i in fs_.get_file_info(sel)
         if i.type == pafs.FileType.File and i.path.endswith(".json")),
        key=lambda i: i.path)


def done_buckets(out_dir: str, fingerprint: str, *,
                 filesystem=None) -> set[int]:
    """Buckets already extracted for this exact input+rule version."""
    fs_, mdir = resolve_fs(manifest_dir(out_dir), filesystem)
    done: set[int] = set()
    for info in _manifest_infos(fs_, mdir):
        try:
            with fs_.open_input_stream(info.path) as f:
                m = json.loads(f.read())
        except (json.JSONDecodeError, OSError):
            continue
        if m.get("fingerprint") == fingerprint and \
                m.get("rule_version") == RULE_VERSION:
            done.add(int(m["bucket"]))
    return done


def prune_stale_manifests(out_dir: str, fingerprint: str, *,
                          filesystem=None) -> list[int]:
    """Delete every manifest whose fingerprint/rule-version does NOT match
    the current run (plus unreadable ones).  Returns the pruned bucket ids.

    Required for correctness when ``num_buckets`` SHRINKS (review fix r5):
    a run at nb=4 over an nb=8 layout overwrites manifests 0-3 but would
    leave 4-7 still claiming ``fp|nb=8`` — a later run back at nb=8 would
    read those orphans as done and silently skip (= lose) their rows.
    Stale manifests are dead under the current fingerprint anyway (their
    data dirs are cleared by the crash-window repair), so removal is safe.
    """
    fs_, mdir = resolve_fs(manifest_dir(out_dir), filesystem)
    pruned: list[int] = []
    for info in _manifest_infos(fs_, mdir):
        stale = True
        try:
            with fs_.open_input_stream(info.path) as f:
                m = json.loads(f.read())
            stale = (m.get("fingerprint") != fingerprint
                     or m.get("rule_version") != RULE_VERSION)
        except (json.JSONDecodeError, OSError):
            pass  # unreadable manifest == stale
        if stale:
            try:
                fs_.delete_file(info.path)
            except FileNotFoundError:
                continue
            try:
                pruned.append(int(info.base_name.split("=", 1)[1]
                                  .rsplit(".json", 1)[0]))
            except ValueError:
                pass
    return pruned


def read_manifests(out_dir: str, *, filesystem=None) -> list[dict]:
    fs_, mdir = resolve_fs(manifest_dir(out_dir), filesystem)
    out = []
    for info in _manifest_infos(fs_, mdir):
        with fs_.open_input_stream(info.path) as f:
            out.append(json.loads(f.read()))
    return out


def list_bucket_dirs(out_dir: str, *, filesystem=None) -> list[tuple[int, str]]:
    """(bucket id, fs-internal dir path) for every ``bucket=<k>`` partition
    directory under ``data/`` — object-store safe (S3 'directories' are the
    listed common prefixes)."""
    from pyarrow import fs as pafs

    fs_, ddir = resolve_fs(data_dir(out_dir), filesystem)
    sel = pafs.FileSelector(ddir, allow_not_found=True)
    out = []
    for info in fs_.get_file_info(sel):
        name = info.base_name
        if not name.startswith("bucket="):
            continue
        try:
            b = int(name.split("=", 1)[1])
        except ValueError:
            continue
        out.append((b, info.path))
    return sorted(out)


def delete_bucket_dir(out_dir: str, bucket_path: str, *,
                      filesystem=None) -> None:
    """Remove one bucket partition (crash-window repair) — recursive, and a
    no-op if it vanished meanwhile."""
    fs_, _ = resolve_fs(data_dir(out_dir), filesystem)
    try:
        fs_.delete_dir(bucket_path)
    except FileNotFoundError:
        pass


def list_bucket_files(out_dir: str, bucket_path: str, *,
                      filesystem=None) -> list[str]:
    """fs-internal paths of the parquet files inside one bucket dir."""
    from pyarrow import fs as pafs

    fs_, _ = resolve_fs(data_dir(out_dir), filesystem)
    sel = pafs.FileSelector(bucket_path, allow_not_found=True)
    return sorted(i.path for i in fs_.get_file_info(sel)
                  if i.type == pafs.FileType.File
                  and i.path.endswith(".parquet"))
