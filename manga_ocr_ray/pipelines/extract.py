"""Flagship pipeline: transcripts → extracted per-turn main content.

Ray-Data-native re-expression of the reference's recognize-then-normalize
loop (/root/reference/manga_ocr/run.py:110-214 + ocr.py:81-117):

    read_parquet(transcripts)                       # S1/S2 analog
      → map_batches(extract kernel)                 # A1 analog (the "model");
        default: reusable-worker tasks w/ per-process extractor cache,
        pool="actor" for heavy-state extractors
      → bucket column = hash(conv_id) % B           # explicit partitioning
      → write data/bucket=k/ + per-bucket manifest  # resumable, lineage
    verification = key-based join vs golden table   # tests/test_ocr.py:21-41 analog

Ordering: extraction is per-turn pure, so the hot path never shuffles.  The
only order contract is within-conversation ``turn_idx`` order, enforced where
it matters (``conversation_merge``, dump sinks) by within-group sort — never
by block order (Ray blocks are unordered).
"""

from __future__ import annotations

import os
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.hashing import bucket_of
from ..schema import TRANSCRIPTS_SCHEMA, assert_schema_contains
from ..stages.extractor import ExtractorActor
from ..state import manifest as mf

OUTPUT_COLUMNS = [
    "conv_id", "turn_idx", "role", "tool", "ts",
    "extracted_text", "raw_chars", "extracted_chars", "bucket",
]

# Adaptive batching (SURVEY §7.5): cap the bytes one extractor batch holds so
# MB-sized tool payloads can't blow an actor's heap at a fixed ROW count
# (1024 rows × 4 MB payloads × pool size = tens of GB).  Knob is bytes, not
# rows, because payload width varies 5 orders of magnitude across corpora.
TARGET_BATCH_BYTES = 32 << 20
# Parquet metadata byte sizes reflect ENCODED data; assume up to 4× decode
# expansion so the row estimate errs on the small side.
_DECODE_EXPANSION = 4


def _adaptive_batch_size(ds: rd.Dataset,
                         target_bytes: int | None = None) -> int | None:
    """Rows per batch derived from a metadata bytes/row estimate.

    METADATA-ONLY by design: uses the plan's snapshot row count
    (``_meta_count`` — known for parquet reads and materialized inputs,
    ``None`` for lazy transformed plans) so sizing never executes the
    pipeline.  Returns ``None`` (Ray's default batching) when the input's
    size isn't known for free.  Clamped to [16, 1024]: the cap preserves the
    narrow-row default; the floor keeps the extractor's per-batch overhead
    amortized even at multi-MB payloads."""
    import os

    target = target_bytes or int(os.environ.get(
        "GRAFT_TARGET_BATCH_BYTES", str(TARGET_BATCH_BYTES)))
    try:
        n = ds._meta_count()
        if not n:
            return None
        b = ds.size_bytes()
    except Exception:
        return None
    if not b:
        return None
    bytes_per_row = max(1, (b + n - 1) // n)
    return int(min(1024, max(16, target // (_DECODE_EXPANSION * bytes_per_row))))


def read_transcripts(path: str | list[str], columns: list[str] | None = None,
                     **read_kwargs) -> rd.Dataset:
    ds = rd.read_parquet(path, columns=columns, **read_kwargs)
    assert_schema_contains(ds.schema().base_schema, TRANSCRIPTS_SCHEMA, "read_transcripts")
    return ds


def extract_turns(
    ds: rd.Dataset,
    *,
    batch_size: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
    num_buckets: int = 64,
    skip_buckets: set[int] | None = None,
    quarantine: bool = False,
    max_attempts: int = 1,
    debug: bool = False,
    pool: str = "task",
) -> rd.Dataset:
    """The extraction stage graph (lazy).  No shuffle.

    ``skip_buckets`` prunes already-done partitions BEFORE the expensive
    stage (resume path) with a vectorized mask — the anti-join of SURVEY §4.2.

    ``pool`` selects the execution mode for the extraction stage:

    - ``"task"`` (default): plain ``map_batches`` tasks in Ray's long-lived
      reusable workers, with the extractor built once per worker process and
      memoized (``stages.extractor.extract_batch_task``).  Right for the
      built-in extractor, whose state is cheap (~50 ms of regex compiles);
      repeated or incremental executions pay zero spawn cost (a fresh actor
      pool measures ~1.2 s per execution at 32 CPUs) and the streaming
      executor shares CPUs across read/extract/write by backpressure.
    - ``"actor"``: the dedicated actor pool (SURVEY §4.2 A1) — use for
      heavy-state subclasses (model weights, media codecs, external worker
      subprocesses) and when per-actor fault isolation / ``max_restarts``
      semantics matter.  Both modes run the identical kernel and are pinned
      equal by the golden tests.
    """
    if pool not in ("task", "actor"):
        raise ValueError(f"pool must be 'task' or 'actor', got {pool!r}")
    if concurrency is None and pool == "actor":
        # actor-pool sizing (SURVEY §4.2): reserve a FIXED FRACTION (~25%) of
        # cluster CPUs for the read/decompress/write stages and give the rest
        # to the extraction pool.  A proportional reserve keeps the pool's
        # CPU share identical at every cluster size (a flat "-2" gives a
        # 4-CPU run a 50% pool and a 32-CPU run a 94% pool, which distorts
        # N→4N scaling comparisons); measured at 32 CPUs, 24 vs 30 actors is
        # throughput-neutral because the IO stages use the difference.
        import ray

        total = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = max(1, total - max(1, total // 4))
    if batch_size is None:
        batch_size = _adaptive_batch_size(ds)
    skip = np.array(sorted(skip_buckets or ()), dtype=np.int32)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch["conv_id"], num_buckets)
        batch = batch.append_column("bucket", pa.array(b, pa.int32()))
        if skip.size:
            batch = batch.filter(pa.array(~np.isin(b, skip)))
        return batch

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    cfg = {"quarantine": quarantine, "max_attempts": max_attempts,
           "debug": debug}
    if pool == "task":
        from ..stages.extractor import extract_batch_task

        # fault tolerance: Ray task retries (lost worker/node re-executes the
        # batch task from lineage) — the task-mode analog of max_restarts.
        ds = ds.map_batches(
            extract_batch_task,
            fn_kwargs=cfg,
            batch_format="pyarrow",
            batch_size=batch_size,
            # honor an explicit cap (tuple pools cap at their max); None →
            # the streaming executor's own CPU-based backpressure
            concurrency=(max(concurrency) if isinstance(concurrency, tuple)
                         else concurrency),
            num_cpus=1,
        )
    else:
        ds = ds.map_batches(
            ExtractorActor,
            fn_constructor_kwargs=cfg,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
            # fault tolerance on a multi-node cluster: a lost worker/node
            # restarts the actor and replays its in-flight tasks (§4.2)
            max_restarts=4,
            max_task_retries=4,
        )
    cols = (OUTPUT_COLUMNS + (["extract_error"] if quarantine else [])
            + (["debug_json"] if debug else []))
    return ds.select_columns(cols)


def run_extraction(
    source: rd.Dataset,
    out_dir: str,
    *,
    fingerprint: str,
    num_buckets: int = 64,
    batch_size: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
    quarantine: bool = False,
    filesystem: Any = None,
) -> dict[str, Any]:
    """Resume-aware end-to-end run: extract missing buckets, write partitioned
    parquet, commit per-bucket manifests with lineage metrics.

    ``out_dir`` may be a local/NFS path or an object-store URI
    (``s3://bucket/extracted``) — manifests, crash-window repair and the
    resume-stats scan all route through ``pyarrow.fs`` (ADVICE r4), so a
    re-submitted ``ray job submit`` run resumes against S3 outputs too.
    ``filesystem`` overrides URI resolution (tests inject a mock fs).

    ``num_buckets`` is folded into the manifest-validity fingerprint: the
    bucket assignment is ``hash mod num_buckets``, so resuming with a
    DIFFERENT bucket count would re-extract rows into new partitions while
    their originals sit in the old ones (silent duplication).  Changing it
    therefore invalidates every manifest and triggers a full clean rebuild
    via the crash-window repair below."""
    eff_fp = f"{fingerprint}|nb={num_buckets}"
    # manifests from a different fingerprint / bucket count are dead weight
    # AND a resume hazard: after a shrink (nb=8 → nb=4), orphan nb=8
    # manifests for buckets >= 4 would be read as done by a later nb=8 run,
    # silently skipping their rows.  Prune them before trusting `done`.
    mf.prune_stale_manifests(out_dir, eff_fp, filesystem=filesystem)
    done = mf.done_buckets(out_dir, eff_fp, filesystem=filesystem)
    # crash-window repair: a bucket with data files but NO committed manifest
    # (killed between write and commit) must be REWRITTEN, not appended to —
    # clear any existing data for buckets we are about to reprocess.
    bucket_dirs = mf.list_bucket_dirs(out_dir, filesystem=filesystem)
    for b, bpath in bucket_dirs:
        if b not in done:
            mf.delete_bucket_dir(out_dir, bpath, filesystem=filesystem)
    t0 = time.perf_counter()
    ds = extract_turns(
        source,
        batch_size=batch_size,
        concurrency=concurrency,
        num_buckets=num_buckets,
        skip_buckets=done,
        quarantine=quarantine,
    )
    ds.write_parquet(mf.data_dir(out_dir), partition_cols=["bucket"],
                     filesystem=filesystem)

    # per-bucket lineage metrics: tiny groupby over the NEW buckets only —
    # a resume run must not re-scan the 63/64 already-committed partitions
    # whose stats it would discard anyway
    elapsed = time.perf_counter() - t0
    fs_, _ = mf.resolve_fs(mf.data_dir(out_dir), filesystem)
    new_files: list[str] = []
    for b, bpath in mf.list_bucket_dirs(out_dir, filesystem=filesystem):
        if b in done:
            continue
        new_files.extend(
            mf.list_bucket_files(out_dir, bpath, filesystem=filesystem))
    new_recs: list[dict] = []
    if new_files:
        def bucket_partial(t: pa.Table) -> pa.Table:
            # rsplit: anchor to the LAST 'bucket=' segment — the out_dir
            # itself may contain one (e.g. s3://corp/bucket=west/extracted)
            b = [int(p.rsplit("bucket=", 1)[1].split("/", 1)[0])
                 for p in t["path"].to_pylist()]
            tb = pa.table({"bucket": pa.array(b, pa.int64()),
                           "raw_chars": t["raw_chars"],
                           "extracted_chars": t["extracted_chars"]})
            g = pa.TableGroupBy(tb, "bucket").aggregate(
                [("bucket", "count"), ("raw_chars", "sum"),
                 ("extracted_chars", "sum")])
            return pa.table({"bucket": g["bucket"],
                             "rows": pc.cast(g["bucket_count"], pa.int64()),
                             "raw_chars": g["raw_chars_sum"],
                             "extracted_chars": g["extracted_chars_sum"]})

        # block-local Arrow partials + driver combine: the table is bounded
        # by num_buckets × blocks (manifest-sized), so an all-to-all
        # Aggregate buys nothing here and its empty hash partitions emit
        # schema-mismatch warnings in the flagship path
        stats = (
            rd.read_parquet(new_files,
                            columns=["raw_chars", "extracted_chars"],
                            include_paths=True, filesystem=fs_)
            .map_batches(bucket_partial, batch_format="pyarrow")
            .to_pandas()
            .groupby("bucket", as_index=False).sum()
        )
        new_recs = stats.to_dict("records")
    new_rows = sum(int(r["rows"]) for r in new_recs)
    turns_per_sec = new_rows / elapsed if elapsed > 0 else 0.0
    for rec in new_recs:
        raw = int(rec["raw_chars"])
        ext = int(rec["extracted_chars"])
        mf.write_manifest(
            out_dir, int(rec["bucket"]), eff_fp, int(rec["rows"]),
            metrics={
                "strip_ratio": round(1.0 - ext / raw, 6) if raw else 0.0,
                "chars_removed": raw - ext,
                "turns_per_sec_run": round(turns_per_sec, 2),
            },
            filesystem=filesystem,
        )
    return {
        "elapsed_sec": elapsed,
        "new_rows": new_rows,
        "skipped_buckets": len(done),
        "turns_per_sec": turns_per_sec,
    }


# ---- verification (golden join) -------------------------------------------

def verify_against_expected(extracted: rd.Dataset, expected: rd.Dataset) -> int:
    """Distributed count of per-turn mismatches (0 == pass).

    Key-based (conv_id, turn_idx) comparison — independent of block order, as
    required under streaming execution.  FULL OUTER hash join on the turn key
    (grouping per turn would pay Ray's per-group overhead once per turn —
    10^12 times at target scale); a turn passes iff both sides are present
    and texts are equal, and a row-count cross-check catches duplicate keys
    that pairwise-match each other.

    Both projections are materialized before the join: the dup-key checks
    below need TRUE per-side input counts (joined-row tallies inflate under
    cross products), and counting a lazy chain would re-execute the whole
    upstream extraction a second time.  Post-materialize counts are
    metadata-only, and the barrier also separates the CPU-heavy extraction
    phase from the join shuffle (the measured 4× fused-vs-staged effect —
    see conversation_merge below).
    """
    ex = extracted.select_columns(
        ["conv_id", "turn_idx", "extracted_text"]).materialize()
    gold = expected.select_columns(
        ["conv_id", "turn_idx", "expected_text"]).materialize()
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    joined = ex.join(gold, join_type="full_outer", num_partitions=max(8, cpus // 2),
                     on=("conv_id", "turn_idx"))

    def bad(t: pa.Table) -> pa.Table:
        mism = pc.fill_null(pc.not_equal(t["extracted_text"], t["expected_text"]), True)
        nulls = pc.or_(pc.is_null(t["extracted_text"]),
                       pc.is_null(t["expected_text"]))
        n = pc.sum(pc.cast(mism, pa.int64())).as_py() or 0
        nn = pc.sum(pc.cast(nulls, pa.int64())).as_py() or 0
        return pa.table({"mismatch": pa.array([n], pa.int64()),
                         "nulls": pa.array([nn], pa.int64()),
                         "rows": pa.array([t.num_rows], pa.int64())})

    parts = joined.map_batches(bad, batch_format="pyarrow").to_pandas().sum()
    n_ex, n_gold = ex.count(), gold.count()
    mismatch = int(parts.get("mismatch", 0))   # includes every null-side row
    nulls = int(parts.get("nulls", 0))
    rows = int(parts.get("rows", 0))
    # Row-count discrepancies the join's null rows did NOT already surface:
    # duplicate gold keys can absorb a missing extracted row with zero null
    # rows (one extracted row matching two gold rows), and same-count dup
    # keys on both sides inflate the join via cross products — both must
    # fail even when every joined row text-matches.
    hidden = max(0, abs(n_ex - n_gold) - nulls)
    if hidden == 0 and rows != max(n_gold, n_ex):
        hidden = 1
    return mismatch + hidden


# ---- ordered per-conversation merge (skew-safe) ----------------------------

def conversation_merge(
    extracted: rd.Dataset,
    *,
    text_col: str = "extracted_text",
    chunk_size: int = 10_000,
    sep: str = "\n",
    num_shards: int | None = None,
) -> rd.Dataset:
    """Concatenate each conversation's turns in ``turn_idx`` order.

    Two-stage SHARDED merge (SURVEY §7.4 salting + the shard-vectorization
    trick from dedup): grouping per conversation would pay Ray's per-group
    task overhead ~10^6-10^12 times, so both stages group on a SHARD key
    (~thousands of groups) and merge all of a shard's conversations in one
    Arrow pass (sort_by + run detection + binary_join — no Python per
    group).  Stage 1 shards on hash(conv_id, turn_idx //
    chunk_size) — a mega-conversation's chunks spread across shards — and
    joins each chunk's turns in turn order; stage 2 shards on hash(conv_id)
    and joins the (tiny) chunk parts in chunk order.
    Result: (conv_id, merged_text, n_turns).
    """
    from ..functions.hashing import hash64_array

    # Materialize the (projected) input before the first all-to-all —
    # POLICY KNOB `GRAFT_MERGE_BARRIER` (default on; set 0/false/off to fuse).
    # Measured 294 s → 71-84 s end-to-end at the 17M-turn bench (8 cpus)
    # when the upstream is the extraction pipeline.  A counter-actor probe
    # showed sort does NOT re-execute a lazy upstream, so the win is
    # execution-phase separation: one fused streaming execution interleaves
    # the CPU-bound extraction tasks with the sort-shuffle stages on the
    # shared CPU budget and degrades far beyond their sum; the barrier runs
    # extraction at full width first (blocks spill to the object store at
    # scale — bounded, and far cheaper than the contention).  On a real
    # multi-node cluster where extraction and shuffle aggregators run on
    # disjoint resources the fused path avoids a full-corpus object-store
    # spill of (conv_id, turn_idx, text) — hence the knob; both paths are
    # oracle-green (tests/test_extract.py).
    projected = extracted.select_columns(["conv_id", "turn_idx", text_col])
    barrier = os.environ.get("GRAFT_MERGE_BARRIER", "1").lower() \
        not in ("0", "false", "off")
    if barrier:
        projected = projected.materialize()
    if num_shards is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        # floor by CPUs, but ALSO scale with materialized bytes so one
        # shard's text stays far below the 2 GB 32-bit Arrow offset cap the
        # per-shard combine_chunks/binary_join kernels rely on (~512 MB
        # target per shard).  size_bytes() on a lazy dataset would force
        # execution, so the byte term applies only on the barrier path; the
        # fused path keeps the CPU floor (callers at known scale pass
        # num_shards explicitly).
        num_shards = max(32, cpus * 8,
                         (int(projected.size_bytes() // (512 << 20)) + 1)
                         if barrier else 0)
    S = np.uint64(num_shards)

    def add_keys(t: pa.Table) -> pa.Table:
        chunk = (t["turn_idx"].combine_chunks().to_numpy() // chunk_size).astype(np.int64)
        h = hash64_array(t["conv_id"])
        shard = ((h + chunk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % S).astype(np.int32)
        t = t.append_column("chunk", pa.array(chunk.astype(np.int32)))
        return t.append_column("shard", pa.array(shard))

    def _runs(conv: pa.Array, second: np.ndarray) -> np.ndarray:
        """Start indices of (conv, second)-runs over SORTED columns — the
        adjacent-inequality trick, string compare as an Arrow C kernel."""
        n = len(conv)
        if n == 0:
            return np.empty(0, dtype=np.int64)
        conv_change = np.r_[
            True,
            pc.invert(pc.equal(conv.slice(1), conv.slice(0, n - 1)))
            .to_numpy(zero_copy_only=False)]
        if second is not None:
            conv_change[1:] |= second[1:] != second[:-1]
        return np.flatnonzero(conv_change)

    # Both merge kernels are Arrow-native (sort_by + run detection +
    # ListArray/binary_join): the earlier pandas ``sep.join`` per group paid
    # Python-call overhead per CONVERSATION (~10^6-10^12 at scale) — 3.4×
    # slower per shard (measured round 4).
    def _offsets32(starts: np.ndarray, n: int) -> np.ndarray:
        # ListArray offsets are int32: a hash-skewed shard past 2^31 rows
        # would WRAP silently (combine_chunks fails loudly for >2 GB strings,
        # the offset cast would not) — fail loudly and name the fix instead.
        if n >= 2**31:
            raise ValueError(
                f"merge shard has {n} rows >= 2^31: int32 ListArray offsets "
                "would overflow — raise num_shards (or chunk_size)")
        return np.r_[starts, n].astype(np.int32)

    def merge_chunks(g: pa.Table) -> pa.Table:
        g = g.sort_by([("conv_id", "ascending"), ("chunk", "ascending"),
                       ("turn_idx", "ascending")])
        conv = g["conv_id"].combine_chunks()
        chunk = g["chunk"].to_numpy()
        starts = _runs(conv, chunk)
        offsets = _offsets32(starts, len(conv))
        lists = pa.ListArray.from_arrays(pa.array(offsets),
                                         g[text_col].combine_chunks())
        return pa.table({
            "conv_id": conv.take(pa.array(starts)),
            "chunk": pa.array(chunk[starts]),
            "part": pc.binary_join(lists, sep),
            "n": pa.array(np.diff(offsets).astype(np.int64)),
        })

    def add_shard2(t: pa.Table) -> pa.Table:
        shard2 = (hash64_array(t["conv_id"]) % S).astype(np.int32)
        return t.append_column("shard2", pa.array(shard2))

    def merge_convs(g: pa.Table) -> pa.Table:
        g = g.sort_by([("conv_id", "ascending"), ("chunk", "ascending")])
        conv = g["conv_id"].combine_chunks()
        starts = _runs(conv, None)
        offsets = _offsets32(starts, len(conv))
        lists = pa.ListArray.from_arrays(pa.array(offsets),
                                         g["part"].combine_chunks())
        n = g["n"].to_numpy()
        n_turns = np.add.reduceat(n, starts) if starts.size else \
            np.empty(0, dtype=np.int64)
        return pa.table({
            "conv_id": conv.take(pa.array(starts)),
            "merged_text": pc.binary_join(lists, sep),
            "n_turns": pa.array(n_turns.astype(np.int64)),
        })

    chunks = (
        projected
        .map_batches(add_keys, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(merge_chunks, batch_format="pyarrow")
    )
    return (
        chunks.map_batches(add_shard2, batch_format="pyarrow")
        .groupby("shard2")
        .map_groups(merge_convs, batch_format="pyarrow")
    )
