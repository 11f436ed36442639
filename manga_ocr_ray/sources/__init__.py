"""Source adapters (SURVEY §2.1).

- :func:`read_corpus_lines` — the raw-corpus line reader (S4,
  process_cc100.py:41-64): ``read_text`` → drop short lines (M4) → stable
  per-line ids (M5).
- :func:`read_csv_table` — CSV metadata reader (S5).
- :class:`IncrementalParquetSource` — the directory-watch pattern (S1/S2,
  run.py:93-214) recast for batch scale: a seen-files manifest on disk, a
  ``diff`` that lists only new/changed files, and a reader over just those.
  Replaces the reference's in-process ``(path, mtime)`` set — state survives
  restarts and never lives in one process.
- :func:`flatten_xml` — XML annotation flattener (S6/M6/M7,
  process_manga109s.py:68-144): one XML document payload → N rows.
"""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET

import pyarrow as pa

import ray.data as rd


def read_corpus_lines(paths: str | list[str], *, min_chars: int = 3,
                      source: str = "corpus") -> rd.Dataset:
    """Read text files line-by-line; keep stripped lines with at least
    ``min_chars`` chars; add ``source`` and a stable ``line_id``.

    ``line_id = <source>_<file basename>_<line number>`` — a pure function of
    stable input coordinates, so ids are identical at every read parallelism
    / cluster size and never collide (block-boundary-derived ids are neither:
    boundaries move with parallelism).  The unit of parallelism is therefore
    the FILE (``read_binary_files`` + in-task line split), matching the
    reference's per-file loop (process_cc100.py:39-69) without its driver-side
    serial counter; shard large corpora into many files upstream.
    """
    ds = rd.read_binary_files(paths, include_paths=True)

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        srcs, ids, lines = [], [], []
        for path, blob in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            base = os.path.basename(path)
            raw = pa.array(blob.decode("utf-8", errors="replace").split("\n"))
            text = pc.utf8_trim_whitespace(raw)
            keep_arr = pc.greater_equal(pc.utf8_length(text), min_chars)
            keep = keep_arr.to_numpy(zero_copy_only=False)
            linenos = keep.nonzero()[0]
            lines.append(text.filter(keep_arr))
            ids.extend(f"{source}_{base}_{ln}" for ln in linenos)
            srcs.extend([source] * len(linenos))
        line_col = (pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                                      for a in lines])
                    if lines else pa.array([], pa.string()))
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "line_id": pa.array(ids, pa.string()),
                         "line": line_col})

    return ds.map_batches(project, batch_format="pyarrow")


def read_csv_table(paths: str | list[str], **kwargs) -> rd.Dataset:
    """CSV metadata reader (S5) — thin, but the single place to hang dialect
    defaults so pipelines never call ray.data.read_csv directly."""
    return rd.read_csv(paths, **kwargs)


# ---- incremental ingest -----------------------------------------------------

class IncrementalParquetSource:
    """Manifest-diff incremental reader over a growing parquet directory.

    ``state_path`` holds the seen-set as JSON ``{path: {size, mtime}}``.
    ``diff()`` lists files that are new or changed since the last commit;
    ``read_new()`` returns a Dataset over just those; ``commit()`` persists
    the updated seen-set (call it only after the downstream write succeeds —
    at-least-once, like the reference's skip-and-log loop, but restartable).
    """

    def __init__(self, data_dir: str, state_path: str):
        self.data_dir = data_dir
        self.state_path = state_path
        try:
            with open(state_path) as f:
                self._seen: dict[str, dict] = json.load(f)
        except (OSError, json.JSONDecodeError):
            self._seen = {}
        self._pending: dict[str, dict] = {}

    def diff(self) -> list[str]:
        new: list[str] = []
        self._pending = {}
        for name in sorted(os.listdir(self.data_dir)):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(self.data_dir, name)
            st = os.stat(path)
            key = {"size": st.st_size, "mtime": st.st_mtime}
            if self._seen.get(path) != key:
                new.append(path)
                self._pending[path] = key
        return new

    def read_new(self, **read_kwargs) -> rd.Dataset | None:
        paths = self.diff()
        if not paths:
            return None
        return rd.read_parquet(paths, **read_kwargs)

    def commit(self) -> None:
        self._seen.update(self._pending)
        self._pending = {}
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._seen, f)
        os.replace(tmp, self.state_path)


# ---- XML flattener ----------------------------------------------------------

def flatten_xml(batch: pa.Table, *, xml_col: str = "xml", tag: str = "item",
                attrs: tuple[str, ...] = ()) -> pa.Table:
    """One XML document per input row → one output row per ``<tag>`` element,
    carrying the element text plus the requested attributes.  Designed for
    ``map_batches`` (a flat_map over batches, like the reference's page/frame
    flatteners at process_manga109s.py:71-88,126-144)."""
    docs = batch[xml_col].to_pylist()
    texts: list[str] = []
    cols: dict[str, list] = {a: [] for a in attrs}
    parents: list[int] = []
    for i, doc in enumerate(docs):
        try:
            root = ET.fromstring(doc or "")
        except ET.ParseError:
            continue  # corrupt-row skip (run.py:210-212 analog)
        for el in root.iter(tag):
            texts.append(el.text or "")
            for a in attrs:
                cols[a].append(el.get(a))
            parents.append(i)
    out: dict[str, pa.Array] = {}
    for name in batch.column_names:
        if name == xml_col:
            continue
        out[name] = batch[name].take(pa.array(parents, pa.int64()))
    out["text"] = pa.array(texts, pa.string())
    for a in attrs:
        out[a] = pa.array(cols[a], pa.string())
    return pa.table(out)
