"""CLI entry point — the reference's console script surface
(/root/reference/pyproject.toml:68 → manga_ocr/__main__.py:6-15, fire.Fire)
recast for batch extraction:

    python -m manga_ocr_ray extract --input DIR_OR_GLOB --out DIR [--fingerprint F]
    python -m manga_ocr_ray verify  --out DIR --expected PARQUET
    python -m manga_ocr_ray merge   --out DIR --dest PARQUET_DIR

``extract`` is resume-aware: rerunning with the same ``--fingerprint`` skips
finished buckets (the hardened analog of the reference's package-granular
rerun, run_generate.py:126-146).  Owns its Ray session (guarded init), unlike
the driver-contract module.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None) -> bool:
    """Init Ray if needed; returns True iff WE started it (and so own the
    shutdown — never tear down a session someone else created).

    Address comes from ``RAY_ADDRESS`` when set (the production path: under
    ``ray job submit`` the job server exports it so the CLI JOINS the
    cluster; this sandbox presets ``RAY_ADDRESS=local``), else a local
    session.  ``--num-cpus`` only applies to a locally-started session — a
    cluster's size is the cluster's."""
    import os

    import ray

    if ray.is_initialized():
        return False
    address = os.environ.get("RAY_ADDRESS", "local")
    kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
    if num_cpus and address == "local":
        kwargs["num_cpus"] = num_cpus
    ray.init(address=address, **kwargs)
    return True


def _watch(args) -> int:
    """Continuous-ingest loop (the reference's run.py:110-214 polling surface
    over IncrementalParquetSource): diff → extract just the new files into a
    per-batch resumable subdir → commit the seen-set ONLY after the write
    succeeds (at-least-once; a crash mid-batch reprocesses that batch, whose
    own bucket manifests then dedupe the work)."""
    import hashlib
    import json
    import os
    import time

    from .pipelines.extract import read_transcripts, run_extraction
    from .sources import IncrementalParquetSource

    state = args.state or os.path.join(args.out, "_watch_state.json")
    os.makedirs(args.out, exist_ok=True)
    src = IncrementalParquetSource(args.input, state)
    ticks = 0
    while True:
        new = src.diff()
        if new:
            batch_id = hashlib.sha1("\x00".join(sorted(new)).encode()).hexdigest()[:12]
            dest = os.path.join(args.out, f"batch_{batch_id}")
            res = run_extraction(
                read_transcripts(new), dest,
                fingerprint=batch_id, num_buckets=args.num_buckets,
            )
            src.commit()
            print(json.dumps({"tick": ticks, "files": len(new), "dest": dest,
                              "new_rows": res["new_rows"]}), flush=True)
        else:
            print(json.dumps({"tick": ticks, "files": 0}), flush=True)
        ticks += 1
        if args.max_ticks and ticks >= args.max_ticks:
            return 0
        time.sleep(args.interval)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="manga_ocr_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="run the extraction pipeline, resumable")
    pe.add_argument("--input", required=True, help="parquet path/dir of transcripts")
    pe.add_argument("--out", required=True, help="output root (data/ + _manifests/)")
    pe.add_argument("--fingerprint", default="v1",
                    help="input+rules fingerprint; changing it reprocesses everything")
    pe.add_argument("--num-buckets", type=int, default=64)
    pe.add_argument("--batch-size", type=int, default=None)
    pe.add_argument("--concurrency", type=int, default=None)
    pe.add_argument("--num-cpus", type=int, default=None)
    pe.add_argument("--quarantine", action="store_true",
                    help="tag failing rows with extract_error instead of failing")

    pv = sub.add_parser("verify", help="per-turn golden equality check")
    pv.add_argument("--out", required=True)
    pv.add_argument("--expected", required=True)
    pv.add_argument("--num-cpus", type=int, default=None)

    pm = sub.add_parser("merge", help="ordered per-conversation merge")
    pm.add_argument("--out", required=True)
    pm.add_argument("--dest", required=True)
    pm.add_argument("--chunk-size", type=int, default=10_000)
    pm.add_argument("--num-cpus", type=int, default=None)

    pr = sub.add_parser("run", help="run a YAML pipeline spec (typed, validated)")
    pr.add_argument("--spec", required=True, help="pipeline spec YAML file")
    pr.add_argument("--num-cpus", type=int, default=None)

    pw = sub.add_parser(
        "watch", help="continuous ingest: poll a parquet dir, extract new files "
                      "(the reference's run.py watch loop, restart-safe)")
    pw.add_argument("--input", required=True, help="directory of transcript parquet files")
    pw.add_argument("--out", required=True, help="output root; each file-batch gets a subdir")
    pw.add_argument("--state", default=None,
                    help="seen-files manifest path (default <out>/_watch_state.json)")
    pw.add_argument("--interval", type=float, default=5.0, help="poll delay seconds")
    pw.add_argument("--max-ticks", type=int, default=0,
                    help="stop after N polls (0 = forever); lets tests/cron drive")
    pw.add_argument("--num-buckets", type=int, default=16)
    pw.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)
    owns_ray = _ray_init(args.num_cpus)
    import ray
    import ray.data as rd

    from .pipelines.extract import (
        conversation_merge,
        read_transcripts,
        run_extraction,
        verify_against_expected,
    )
    from .state import manifest as mf

    try:
        if args.cmd == "extract":
            res = run_extraction(
                read_transcripts(args.input), args.out,
                fingerprint=args.fingerprint, num_buckets=args.num_buckets,
                batch_size=args.batch_size, concurrency=args.concurrency,
                quarantine=args.quarantine,
            )
            print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                              for k, v in res.items()}))
        elif args.cmd == "verify":
            mismatches = verify_against_expected(
                rd.read_parquet(mf.data_dir(args.out)), rd.read_parquet(args.expected)
            )
            print(json.dumps({"mismatches": mismatches}))
            return 0 if mismatches == 0 else 1
        elif args.cmd == "merge":
            merged = conversation_merge(
                rd.read_parquet(mf.data_dir(args.out)), chunk_size=args.chunk_size
            )
            merged.write_parquet(args.dest)
            print(json.dumps({"conversations": merged.count()}))
        elif args.cmd == "run":
            from .spec import load_spec, run_spec

            spec = load_spec(args.spec)
            res = run_spec(spec)
            if isinstance(res, dict):
                print(json.dumps(res))
            else:
                print(json.dumps({"rows": res.count()}))
        elif args.cmd == "watch":
            return _watch(args)
    finally:
        if owns_ray:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
