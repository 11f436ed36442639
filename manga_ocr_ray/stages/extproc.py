"""External-process-per-actor stage (A4): a persistent worker SUBPROCESS per
Ray actor, talking a length-prefixed pipe protocol, restarted on crash.

The reference keeps one external Chrome/html2image renderer process alive
per generator worker and streams work to it
(manga_ocr_dev/synthetic_data_generator/common/renderer.py:121-171).  The
same pattern here with a real process: each ``ExternalToolActor`` spawns one
``python -u -c worker`` child in ``__init__`` (once per actor, NOT per
batch), sends each payload as ``<u32 len><bytes>`` on stdin, reads a
``<u32 len><json>`` reply on stdout, and respawns the child if it dies
mid-stream (the reference's renderer-hang restart, hardened with a bounded
retry).  The worker does real codec work — it decodes BMP/PPM/WAV payloads
with functions/imagecodec.py in its own address space — so a crash (codec
segfault, OOM kill) never takes the actor down.
"""

from __future__ import annotations

import json
import os
import struct
import subprocess
import sys

import pyarrow as pa

_LEN = struct.Struct("<I")

# Self-contained worker: imports the repo package via PYTHONPATH (set by the
# spawning actor), loops over length-prefixed payloads, replies with one JSON
# object per payload.  b"CRASH" exits nonzero — the restart-path test hook.
_WORKER_SRC = r"""
import json, struct, sys
import numpy as np
from manga_ocr_ray.functions import imagecodec as ic

_LEN = struct.Struct("<I")
inp, out = sys.stdin.buffer, sys.stdout.buffer
while True:
    head = inp.read(_LEN.size)
    if len(head) < _LEN.size:
        break
    payload = inp.read(_LEN.unpack(head)[0])
    if payload == b"CRASH":
        sys.exit(13)
    try:
        kind = ic.sniff_kind(payload)
        if kind == "wav":
            x, rate = ic.decode_wav(payload)
            res = {"kind": kind, "n_samples": len(x), "sample_rate": rate,
                   "rms": round(float(np.sqrt(np.mean(x * x))), 9)}
        elif kind == "bmp":
            img = ic.decode_bmp(payload)
            res = {"kind": kind, "height": img.shape[0], "width": img.shape[1],
                   "mean": round(float(img.mean()), 9)}
        elif kind in ("ppm", "pgm"):
            img = ic.decode_pnm(payload)
            res = {"kind": kind, "height": img.shape[0], "width": img.shape[1],
                   "mean": round(float(img.mean()), 9)}
        else:
            res = {"kind": kind, "error": "unsupported format"}
    except Exception as exc:
        res = {"kind": "error", "error": f"{type(exc).__name__}: {exc}"}
    blob = json.dumps(res).encode()
    out.write(_LEN.pack(len(blob)) + blob)
    out.flush()
"""


class ExternalToolActor:
    """map_batches actor: one persistent external worker process, pipe
    protocol, bounded respawn-and-retry on crash, per-row quarantine."""

    def __init__(self, max_retries: int = 1):
        self.max_retries = max_retries
        self.proc: subprocess.Popen | None = None
        # the worker resolves manga_ocr_ray through PYTHONPATH, independent
        # of the Ray worker's cwd
        import manga_ocr_ray

        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(manga_ocr_ray.__file__)))
        env = dict(os.environ)
        env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        self._env = env
        self._spawn()

    def _spawn(self) -> None:
        if self.proc is not None:
            self.proc.kill()
        self.proc = subprocess.Popen(
            [sys.executable, "-u", "-c", _WORKER_SRC],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, env=self._env,
        )

    def _roundtrip(self, payload: bytes) -> dict:
        p = self.proc
        p.stdin.write(_LEN.pack(len(payload)) + payload)
        p.stdin.flush()
        head = p.stdout.read(_LEN.size)
        if len(head) < _LEN.size:  # worker died mid-request
            raise BrokenPipeError(f"worker exited with {p.poll()}")
        return json.loads(p.stdout.read(_LEN.unpack(head)[0]))

    def call_one(self, payload: bytes) -> dict:
        for attempt in range(self.max_retries + 1):
            try:
                return self._roundtrip(payload)
            except (BrokenPipeError, OSError) as exc:
                self._spawn()
                if attempt == self.max_retries:
                    return {"kind": "error", "error": f"worker crashed: {exc}"}
        raise AssertionError("unreachable")

    def __call__(self, batch: pa.Table) -> pa.Table:
        results = [self.call_one(p or b"") for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "tool_kind": pa.array([r.get("kind") for r in results], pa.string()),
            "tool_json": pa.array([json.dumps(r, sort_keys=True) for r in results],
                                  pa.string()),
            "tool_error": pa.array([r.get("error") for r in results], pa.string()),
        })

    def __del__(self):  # best-effort; Ray tears actors down process-and-all
        try:
            if self.proc is not None:
                self.proc.kill()
        except Exception:  # noqa: BLE001
            pass


def external_tool_pipeline(ds, *, concurrency: int | tuple[int, int] = (1, 2),
                           batch_size: int = 32):
    """Small batches (large binary rows) and one external process per actor —
    concurrency × 1 worker process, exactly the reference's renderer pool."""
    return ds.map_batches(
        ExternalToolActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
