"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (SURVEY §2.7 D1/D2 hardened for 10^12 rows):

- exact: content-hash columns added in a vectorized ``map_batches``, then ONE
  ``groupby`` shuffle keyed on a 128-bit blake2b digest carried as two int64
  columns (never on the text; 64 bits would birthday-collide ~10^4 times at
  10^12 rows).
- MinHash/LSH: signatures computed batch-local (numpy broadcasting), exploded
  to ``(band, band_key, doc_id)`` rows, bucketed by ONE groupby; candidate
  pairs verified by true Jaccard.  Only bucket rows shuffle — O(bands·n)
  small ints, not the corpus.
- SimHash: 64-bit signatures; near-dup candidates via 4×16-bit block keys
  (pigeonhole: hamming ≤3 ⇒ at least one of 4 blocks equal), verified by
  hamming distance.

Pair verification is a hash-partitioned JOIN of the candidate pairs back to
the texts on doc_id (twice: id_a then id_b) followed by a batched exact-
Jaccard filter — the corpus never materializes on the driver; only the
verified pairs (tiny) do.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..functions.hashing import content_hash64, content_hash128, mix64
from ..functions.textstats import SHINGLE_TOKEN_PATTERN

# CJK-aware (shingling runs on lower()ed text; mirrored by the DuckDB oracle
# in pipelines/documents.py Q_DOC_MINHASH_PAIR_SQL)
_TOKEN_RE = re.compile(SHINGLE_TOKEN_PATTERN)

# ---- exact dedup -----------------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    """Two int64 key columns = one 128-bit blake2b digest: 64-bit keys
    expect ~10^4 birthday collisions at the 10^12-row design scale (silently
    merging distinct documents); 128 bits makes that ~1e-14."""
    lo, hi = content_hash128(batch[text_col])
    batch = batch.append_column(out_col, pa.array(lo.astype(np.int64)))
    return batch.append_column(f"{out_col}2", pa.array(hi.astype(np.int64)))


_HASH_KEYS = ["content_hash", "content_hash2"]


def exact_dedup_groups(ds: rd.Dataset, id_col: str = "doc_id",
                       text_col: str = "text") -> rd.Dataset:
    """(keep_doc_id, n_copies) per distinct content — hash-keyed groupby."""
    hashed = ds.map_batches(
        lambda t: add_content_hash(t, text_col), batch_format="pyarrow"
    ).select_columns([id_col, *_HASH_KEYS])
    return (
        hashed.groupby(_HASH_KEYS)
        .aggregate(Min(id_col, alias_name="keep_doc_id"), Count(alias_name="n_copies"))
        .select_columns(["keep_doc_id", "n_copies"])
    )


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id",
                text_col: str = "text", num_partitions: int | None = None) -> rd.Dataset:
    """Keep the min-id row of each distinct content (deterministic winner).

    Map-side-combining aggregate computes the winner per content hash, then
    a hash join + vectorized filter keeps only winner rows — no per-group
    task (one group per DISTINCT document would pay Ray's per-group overhead
    ~10^12 times at target scale)."""
    import pyarrow.compute as pc

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(8, cpus // 2)
    # materialize: both the winner aggregate and the join consume `hashed`;
    # without it the whole upstream pipeline (often a read + transform
    # chain) executes twice.  Blocks spill to the object store at scale —
    # cheaper than recomputing the upstream.
    hashed = ds.map_batches(lambda t: add_content_hash(t, text_col),
                            batch_format="pyarrow").materialize()
    keep = hashed.select_columns([*_HASH_KEYS, id_col]).groupby(_HASH_KEYS).aggregate(
        Min(id_col, alias_name="__keep_id")
    )
    joined = hashed.join(keep, join_type="inner", num_partitions=num_partitions,
                         on=tuple(_HASH_KEYS))

    def flt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t[id_col], t["__keep_id"]))
        return t.drop_columns(["__keep_id", *_HASH_KEYS])

    return joined.map_batches(flt, batch_format="pyarrow")


# ---- shingles + MinHash ----------------------------------------------------

def _word_ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """64-bit hashes of word n-gram shingles (distinct)."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not joined:
        return np.zeros(1, dtype=np.uint64)
    return np.unique(content_hash64(joined))


_MERSENNE = np.uint64((1 << 61) - 1)


def _batch_token_strings(texts: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    """(flat token strings, parent doc index) for a whole batch — Arrow-only
    tokenization (lower → sentinel-wrap every SHINGLE_TOKEN_PATTERN match →
    split on the sentinel → keep exact-match pieces), no per-doc Python.
    ``parent`` is nondecreasing (tokens grouped per doc)."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lower = pc.utf8_lower(texts.fill_null(""))
    wrapped = pc.replace_substring_regex(
        lower, pattern=f"({SHINGLE_TOKEN_PATTERN})", replacement="\x00\\1\x00")
    toks = pc.split_pattern(wrapped, "\x00")
    flat = pc.list_flatten(toks)
    keep_arr = pc.and_(
        pc.not_equal(pc.utf8_length(flat), pa.scalar(0)),
        pc.match_substring_regex(flat, f"^(?:{SHINGLE_TOKEN_PATTERN})$"),
    )
    keep = keep_arr.to_numpy(zero_copy_only=False)
    parent = pc.list_parent_indices(toks).to_numpy()[keep]
    return flat.filter(keep_arr), parent


def minhash_signature(shingle_hashes: np.ndarray, num_hashes: int,
                      a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """k-permutation MinHash over a shingle-hash set (one numpy broadcast).

    NOTE: a*x wraps mod 2^64 before the Mersenne mod, so this is an ad-hoc
    deterministic mixing family, not a textbook (a*x+b) mod p universal hash
    — empirically fine here (recall is pytest-pinned and every candidate is
    verified by exact Jaccard, so only recall, never precision, depends on
    the family's quality)."""
    x = shingle_hashes.astype(np.uint64)
    vals = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def _perm_params(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.Philox(key=[seed, 0xD1CE]))
    a = rng.integers(1, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
    return a, b


def _batch_shingle_hashes(texts: pa.Array | pa.ChunkedArray,
                          ngram: int) -> tuple[np.ndarray, np.ndarray]:
    """(shingle_hashes uint64, parent doc index) for a whole batch — NO
    per-doc Python: Arrow tokenization (sentinel-wrap extract-all), one
    vectorized FNV pass over the token buffer (loops over max token LENGTH,
    not token count), then n-gram window combining via shifted-array mixes
    with windows masked at doc boundaries.  Every doc contributes ≥1 shingle
    (zero-token docs get the 0 shingle; short docs one all-token shingle), so
    segment starts line up 1:1 with batch rows.

    These signature shingles are an internal identity (recall only); the
    exact-Jaccard VERIFY stage and its SQL oracle use the string shingles of
    :func:`_word_ngram_hashes`, which define correctness."""
    from ..functions.hashing import hash64_array

    tokens, parent = _batch_token_strings(texts)
    n = len(texts)
    th = hash64_array(tokens)
    S = th.size

    shingles: list[np.ndarray] = []
    parents: list[np.ndarray] = []
    if S >= ngram:
        # windows fully inside one doc (parent is nondecreasing)
        m = S - ngram + 1
        valid = parent[:m] == parent[ngram - 1:]
        acc = th[:m].copy()
        for k in range(1, ngram):
            acc = mix64(acc) + th[k:m + k]
        shingles.append(mix64(acc)[valid])
        parents.append(parent[:m][valid])
    counts = np.bincount(parent, minlength=n) if S else np.zeros(n, dtype=np.int64)
    short = np.flatnonzero((counts > 0) & (counts < ngram))
    if short.size:
        starts = np.searchsorted(parent, short)
        for d, s in zip(short, starts):  # rare: docs with < ngram tokens
            seg = th[s:s + counts[d]]
            acc = seg[0:1].copy()
            for k in range(1, len(seg)):
                acc = mix64(acc) + seg[k:k + 1]
            shingles.append(mix64(acc))
            parents.append(np.array([d], dtype=parent.dtype))
    empty_docs = np.flatnonzero(counts == 0)
    if empty_docs.size:
        shingles.append(np.zeros(empty_docs.size, dtype=np.uint64))
        parents.append(empty_docs.astype(parent.dtype if S else np.int64))
    sh = np.concatenate(shingles) if shingles else np.zeros(0, dtype=np.uint64)
    par = np.concatenate(parents) if parents else np.zeros(0, dtype=np.int64)
    order = np.argsort(par, kind="stable")
    return sh[order], par[order]


class MinHashStage:
    """Actor-pool stage: permutation params built once per actor; per batch
    emits (id, band_0..band_{B-1} fold keys) — the LSH bucketing columns.
    Fully vectorized across the batch: Arrow tokenization, numpy FNV token
    hashes, windowed shingle mixes, and per-doc signature minima via
    ``np.minimum.reduceat`` in bounded permutation chunks."""

    _PERM_CHUNK = 8  # perms per reduceat pass: 8 × shingles × 8B ≤ ~64MB/batch

    def __init__(self, num_hashes: int = 128, bands: int = 16, ngram: int = 3,
                 id_col: str = "doc_id", text_col: str = "text", seed: int = 42):
        assert num_hashes % bands == 0
        self.num_hashes, self.bands, self.ngram = num_hashes, bands, ngram
        self.rows = num_hashes // bands
        self.id_col, self.text_col = id_col, text_col
        self.a, self.b = _perm_params(num_hashes, seed)

    def signatures(self, texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
        """(n_docs, num_hashes) uint64 signature matrix for a batch."""
        sh, par = _batch_shingle_hashes(texts, self.ngram)
        n = len(texts)
        if n == 0:
            return np.zeros((0, self.num_hashes), dtype=np.uint64)
        # every doc has ≥1 shingle and par is sorted → one segment per doc
        starts = np.searchsorted(par, np.arange(n))
        sig = np.empty((self.num_hashes, n), dtype=np.uint64)
        for c in range(0, self.num_hashes, self._PERM_CHUNK):
            a_c = self.a[c:c + self._PERM_CHUNK][:, None]
            b_c = self.b[c:c + self._PERM_CHUNK][:, None]
            vals = (a_c * sh[None, :] + b_c) % _MERSENNE
            sig[c:c + self._PERM_CHUNK] = np.minimum.reduceat(vals, starts, axis=1)
        return sig.T

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures(batch[self.text_col])
        n = len(sigs)
        # fold each band's r rows into one key
        band_keys = np.zeros((n, self.bands), dtype=np.uint64)
        for bi in range(self.bands):
            seg = sigs[:, bi * self.rows : (bi + 1) * self.rows]
            acc = np.full(n, np.uint64(bi + 1), dtype=np.uint64)
            for c in range(seg.shape[1]):
                acc = mix64(acc ^ seg[:, c])
            band_keys[:, bi] = acc
        cols = {self.id_col: batch[self.id_col]}
        for bi in range(self.bands):
            cols[f"band_{bi}"] = pa.array(band_keys[:, bi].astype(np.int64))
        return pa.table(cols)


def bucket_pairs_vectorized(g: pd.DataFrame, bucket_cols: list[str], id_col: str,
                            max_bucket: int = 200) -> pd.DataFrame:
    """All within-bucket candidate pairs for every bucket in one shard group.

    One sort + run-length detection over the whole group; a Python loop runs
    only over buckets with ≥2 members (rare).  Buckets larger than
    ``max_bucket`` are skipped as degenerate (hot-key guard; a bucket that
    large means the band key carries no signal)."""
    id_dtype = g[id_col].dtype if len(g) else "int64"
    if len(g) < 2:
        return pd.DataFrame({"id_a": pd.Series([], dtype=id_dtype),
                             "id_b": pd.Series([], dtype=id_dtype)})
    g = g.sort_values(bucket_cols + [id_col])
    ids = g[id_col].to_numpy()
    combo = np.zeros(len(g), dtype=np.uint64)
    for c in bucket_cols:
        combo = mix64(combo ^ g[c].to_numpy().astype(np.uint64))
    boundaries = np.flatnonzero(np.concatenate(([True], combo[1:] != combo[:-1], [True])))
    out_a, out_b = [], []
    for s, e in zip(boundaries[:-1], boundaries[1:]):
        c = e - s
        if c < 2 or c > max_bucket:
            continue
        ia, ib = np.triu_indices(c, k=1)
        out_a.append(ids[s:e][ia])
        out_b.append(ids[s:e][ib])
    if not out_a:
        return pd.DataFrame({"id_a": pd.Series([], dtype=id_dtype),
                             "id_b": pd.Series([], dtype=id_dtype)})
    return pd.DataFrame({"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)})


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def minhash_lsh_pairs_ds(
    ds: rd.Dataset,
    *,
    threshold: float = 0.7,
    num_hashes: int = 128,
    bands: int = 16,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple[int, int] = (1, 4),
    num_partitions: int | None = None,
    n_rows: int | None = None,
    materialize_input: bool = False,
) -> rd.Dataset:
    """Verified near-duplicate pairs (id_a < id_b, jaccard ≥ threshold),
    fully distributed — nothing corpus-sized ever touches the driver.

    shingle→minhash→band (actor pool) → per-band groupby buckets → candidate
    pairs (deduped by a small groupby) → texts joined back on doc_id (two
    hash-partitioned joins) → batched exact-Jaccard verify filter.

    The projected (id, text) input is consumed twice (signatures + the
    verify join) plus once for shard-count sizing.  For parquet-backed
    inputs the count is metadata-only and a re-scan is cheap (default);
    when ``ds`` is an expensive lazy chain, pass ``materialize_input=True``
    to pin the projection in the object store instead of re-executing the
    upstream, and/or ``n_rows`` to skip the sizing count."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(8, cpus // 2)

    base = ds.select_columns([id_col, text_col])
    if materialize_input:
        base = base.materialize()

    banded = base.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(num_hashes=num_hashes, bands=bands,
                                   ngram=ngram, id_col=id_col, text_col=text_col),
        # coalesce small read blocks: the signature kernel is ~7ms/1k docs,
        # so per-task overhead dominates under tiny batches
        batch_format="pyarrow", concurrency=concurrency, batch_size=1024,
    )

    # explode to (shard, band, key, id) rows — only these small rows shuffle.
    # The groupby key is a SHARD (hash of (band,key) mod n_shards), not the
    # raw bucket: shuffling 10^7+ one-row groups through map_groups pays a
    # per-group python overhead that dominates; with shards, each group task
    # receives many buckets and resolves them with one vectorized pass.
    # Balanced sizing: n_shards = sqrt(exploded rows) makes group COUNT and
    # group SIZE both grow as sqrt(corpus) — per-group task overhead and
    # per-group memory never grow linearly.  Deliberately UNCAPPED: a fixed
    # cap (the old 8192) would hand a 10^12-row corpus multi-GB groups.
    n = n_rows if n_rows is not None else base.count()
    n_shards = max(64, int(np.sqrt(max(1, n * bands))))

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = np.repeat(t[id_col].to_numpy(), bands)
        band = np.tile(np.arange(bands, dtype=np.int32), n)
        keys = np.stack([t[f"band_{bi}"].to_numpy() for bi in range(bands)], axis=1).ravel()
        shard = (
            mix64(keys.astype(np.uint64) + (np.uint64(0x9E3779B9) * (band.astype(np.uint64) + 1)))
            % np.uint64(n_shards)
        ).astype(np.int32)
        return pa.table({"shard": pa.array(shard), "band": pa.array(band),
                         "key": pa.array(keys), id_col: pa.array(ids)})

    buckets = banded.map_batches(explode, batch_format="pyarrow")

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # within-shard dedup is free (sorted runs); CROSS-shard duplicates
        # (the same pair firing in several bands) survive to the verify stage,
        # whose pshard grouping co-locates all copies of a pair — they are
        # dropped there, saving a dedicated dedup shuffle here.
        return bucket_pairs_vectorized(
            g, ["band", "key"], id_col, max_bucket=200).drop_duplicates()

    cand = buckets.groupby("shard").map_groups(shard_pairs, batch_format="pandas")

    # Attach both texts with ONE hash-partitioned join: explode each pair to
    # two (side, lookup_id) rows, join texts on lookup_id, then reassemble
    # per pair in a shard-grouped vectorized pass.  (Chaining two Dataset
    # joins is not an option: the join operator emits schema-less blocks for
    # empty partitions, map_batches skips empty blocks so they can't be
    # repaired, and a second join then fails key-field resolution — groupby
    # tolerates them, so join→groupby is the robust composition.)
    texts = base
    pair_shards = max(16, num_partitions * 4)

    def explode_pairs(t: pa.Table) -> pa.Table:
        a = t["id_a"].combine_chunks().to_numpy()
        b = t["id_b"].combine_chunks().to_numpy()
        shard = (mix64(a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                       ^ b.astype(np.uint64)) % np.uint64(pair_shards)).astype(np.int32)
        return pa.table({
            "id_a": pa.array(np.repeat(a, 2)),
            "id_b": pa.array(np.repeat(b, 2)),
            "pshard": pa.array(np.repeat(shard, 2)),
            "side": pa.array(np.tile(np.array([0, 1], dtype=np.int8), len(a))),
            "lid": pa.array(np.stack([a, b], axis=1).ravel()),
        })

    exploded = cand.map_batches(explode_pairs, batch_format="pyarrow")
    j = exploded.join(texts, join_type="inner", num_partitions=num_partitions,
                      on=("lid",), right_on=(id_col,))

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "jaccard": pd.Series([], dtype="float64")})
        if len(g) == 0 or "side" not in g.columns:
            return empty
        # all copies of a pair (one per band it fired in) land in this shard:
        # drop duplicates BEFORE the expensive shingling
        a = g[g["side"] == 0][["id_a", "id_b", text_col]].drop_duplicates(["id_a", "id_b"])
        b = g[g["side"] == 1][["id_a", "id_b", text_col]].drop_duplicates(["id_a", "id_b"])
        m = a.merge(b, on=["id_a", "id_b"], suffixes=("_l", "_r"))
        if m.empty:
            return empty
        jac = np.fromiter(
            (_jaccard(_word_ngram_hashes(x, ngram), _word_ngram_hashes(y, ngram))
             for x, y in zip(m[f"{text_col}_l"], m[f"{text_col}_r"])),
            dtype=np.float64, count=len(m))
        out = m[["id_a", "id_b"]].copy()
        out["jaccard"] = jac
        return out[out["jaccard"] >= threshold]

    return j.groupby("pshard").map_groups(assemble, batch_format="pandas")


def minhash_lsh_pairs(
    ds: rd.Dataset,
    *,
    threshold: float = 0.7,
    num_hashes: int = 128,
    bands: int = 16,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple[int, int] = (1, 4),
) -> pd.DataFrame:
    """Driver-convenience wrapper: collect the VERIFIED pairs (small) and
    sort for deterministic output.  All heavy lifting is in
    :func:`minhash_lsh_pairs_ds`."""
    out = minhash_lsh_pairs_ds(
        ds, threshold=threshold, num_hashes=num_hashes, bands=bands,
        ngram=ngram, id_col=id_col, text_col=text_col, concurrency=concurrency,
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def pair_rep_map(pairs: pd.DataFrame) -> dict[int, int]:
    """Union-find (path-halving, min-id wins) over a verified pair frame →
    fully-resolved ``{id: min-rep}``.  NB: cluster ROOTS are omitted from
    the map (a min-id that never lost a union is not a key), as is every
    untouched id — both are implicitly their own rep, so consumers must
    read it as ``reps.get(i, i)``, never ``reps[i]`` (review fix r5).
    Driver-side by design: the pair set is tiny relative to the corpus.
    Shared by :func:`cluster_reps` and :func:`near_dup_cluster_assign` so
    the two clustering paths cannot diverge."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs.get("id_a", []), pairs.get("id_b", [])):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {i: find(i) for i in parent}


def cluster_reps(pairs: pd.DataFrame, all_ids: np.ndarray) -> pd.DataFrame:
    """Union-find over verified pairs → (doc_id, cluster_rep = min id).

    Driver-side: the verified pair set is tiny relative to the corpus.  At
    extreme scale this becomes a few rounds of min-label propagation via
    groupby (documented alternative)."""
    reps = pair_rep_map(pairs)
    return pd.DataFrame(
        {"doc_id": all_ids,
         "cluster_rep": [reps.get(int(i), int(i)) for i in all_ids]}
    )


# ---- SimHash ---------------------------------------------------------------

def _md5_token_hash(tokens: np.ndarray) -> np.ndarray:
    """uint64 token hash = first 8 md5 bytes read big-endian — exactly
    ``CAST('0x' || substr(md5(token), 1, 16) AS UBIGINT)`` in DuckDB, so the
    SimHash oracle can mirror the engine bit-for-bit."""
    import hashlib

    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
    return out


def simhash64(texts: list[str]) -> np.ndarray:
    """64-bit SimHash over word features (weight = term frequency).

    Scalar reference twin — used by tests to pin the vectorized
    :func:`simhash64_batch`, which is the production kernel."""
    out = np.empty(len(texts), dtype=np.uint64)
    bitcols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall(t.lower())
        if not toks:
            out[i] = 0
            continue
        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        hs = _md5_token_hash(uniq)
        bits = ((hs[:, None] & bitcols[None, :]) != 0).astype(np.int64)
        score = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        out[i] = np.bitwise_or.reduce(bitcols[score > 0], initial=np.uint64(0))
    return out


def simhash64_batch(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized batch SimHash, bit-identical to :func:`simhash64`.

    Arrow tokenization for the whole batch, ``dictionary_encode`` so md5
    runs ONCE per UNIQUE token per batch (not once per token per doc — the
    round-2 scale-killer), then per-doc ±1 bit votes via one
    ``np.add.reduceat`` over the doc-grouped occurrence matrix.  The only
    remaining Python loop is over unique tokens (md5) and the 64 bit
    positions."""
    tokens, parent = _batch_token_strings(texts)
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if len(tokens) == 0:
        return out
    enc = tokens.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    hs = _md5_token_hash(uniques)
    # Byte-sliced vote counting: bit b is set iff 2·(#occurrences with bit
    # set) > (#occurrences).  Per byte position j, one bincount over the
    # combined key (doc, byte value) then a (256×8) popcount-table matmul
    # turns byte-value counts into the 8 per-bit sums — 8 passes over the
    # occurrence array instead of 64 (or an occurrences×64 matrix; a
    # reduceat over that measured ~100× slower).
    hs_occ = hs[codes]
    tot = np.bincount(parent, minlength=n)
    bytes_occ = hs_occ.view(np.uint8).reshape(-1, 8)  # LE: byte j = bits 8j..8j+7
    bit_table = ((np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1).astype(np.int64)
    ones = np.empty((n, 64), dtype=np.int64)
    for j in range(8):
        key = parent * 256 + bytes_occ[:, j].astype(np.int64)
        cnt = np.bincount(key, minlength=n * 256).reshape(n, 256)
        ones[:, 8 * j : 8 * j + 8] = cnt @ bit_table
    pos = 2 * ones > tot[:, None]  # ties (score == 0) → bit stays 0
    for b in range(64):
        out |= pos[:, b].astype(np.uint64) << np.uint64(b)
    out[tot == 0] = 0  # token-less docs hash to 0, as in the scalar twin
    return out


def simhash_map_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sh = simhash64_batch(batch[text_col])
    t = batch.append_column("simhash", pa.array(sh.astype(np.int64)))
    # 4×16-bit block keys for hamming≤3 candidate bucketing
    for blk in range(4):
        part = ((sh >> np.uint64(blk * 16)) & np.uint64(0xFFFF)).astype(np.int32)
        t = t.append_column(f"sh_block_{blk}", pa.array(part))
    return t


def simhash_near_dup_pairs(ds: rd.Dataset, *, max_hamming: int = 3,
                           id_col: str = "doc_id", text_col: str = "text",
                           n_rows: int | None = None) -> pd.DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole bucketing (hamming ≤3 ⇒ ≥1 of the 4 16-bit blocks equal):
    one exploded (shard, block, key, id, simhash) table, ONE groupby on the
    shard, vectorized candidate generation per shard, hamming verify.
    Pass ``n_rows`` to skip the shard-sizing count when ``ds`` is an
    expensive lazy chain (parquet-backed counts are metadata-only)."""
    sh = ds.map_batches(lambda t: simhash_map_batch(t, text_col), batch_format="pyarrow")
    # sqrt-of-exploded-rows, uncapped — same balanced-shard rule (and same
    # removed-8192-cap rationale) as minhash_lsh_pairs_ds above.
    n = n_rows if n_rows is not None else ds.count()
    n_shards = max(64, int(np.sqrt(max(1, n * 4))))

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = np.repeat(t[id_col].to_numpy(), 4)
        sims = np.repeat(t["simhash"].to_numpy(), 4)
        blk = np.tile(np.arange(4, dtype=np.int32), n)
        keys = np.stack([t[f"sh_block_{b}"].to_numpy() for b in range(4)], axis=1).ravel()
        shard = (
            mix64(keys.astype(np.uint64) + (np.uint64(0x9E3779B9) * (blk.astype(np.uint64) + 1)))
            % np.uint64(n_shards)
        ).astype(np.int32)
        return pa.table({"shard": pa.array(shard), "blk": pa.array(blk),
                         "key": pa.array(keys), id_col: pa.array(ids),
                         "simhash": pa.array(sims)})

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        cand = bucket_pairs_vectorized(g, ["blk", "key"], id_col, max_bucket=500)
        if cand.empty:
            # typed empty — an untyped {} literal makes float64 id blocks
            # that silently promote int64 ids through the concat
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        lut = dict(zip(g[id_col], g["simhash"].astype(np.int64)))
        ha = np.array([lut[i] for i in cand["id_a"]], dtype=np.int64).astype(np.uint64)
        hb = np.array([lut[i] for i in cand["id_b"]], dtype=np.int64).astype(np.uint64)
        x = ha ^ hb
        ham = np.zeros(len(x), dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        m = ham <= max_hamming
        return pd.DataFrame({"id_a": cand["id_a"][m], "id_b": cand["id_b"][m],
                             "hamming": ham[m]})

    out = (
        sh.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    out = out.drop_duplicates(subset=["id_a", "id_b"])
    out = out.astype({"id_a": "int64", "id_b": "int64", "hamming": "int64"})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---- n-gram Jaccard --------------------------------------------------------

def minhash_bands_for(threshold: float, num_hashes: int = 128,
                      target_recall: float = 0.98) -> int:
    """Bands for a banded-MinHash LSH so a pair at exactly ``threshold``
    Jaccard is bucketed with probability ≥ ``target_recall``: largest rows-
    per-band r (fewest candidate collisions) with 1-(1-t^r)^(H/r) ≥ R."""
    for r in range(num_hashes, 0, -1):
        if num_hashes % r:
            continue
        b = num_hashes // r
        if 1.0 - (1.0 - threshold ** r) ** b >= target_recall:
            return b
    return num_hashes


def ngram_jaccard_pairs(ds: rd.Dataset, *, threshold: float = 0.5, ngram: int = 3,
                        id_col: str = "doc_id", text_col: str = "text") -> pd.DataFrame:
    """Word-n-gram Jaccard pairs ≥ threshold — the PRODUCTION path.

    Routes through :func:`minhash_lsh_pairs` with bands auto-derived from
    the threshold (``minhash_bands_for``), so candidates are LSH-bucketed
    and every emitted pair is verified by exact Jaccard: precision is exact,
    recall ≥98% at the threshold (→1 above it).  Nothing corpus-sized
    touches the driver.  The all-pairs exact twin
    (:func:`ngram_jaccard_pairs_exact`) is oracle-scale only and row-guarded."""
    bands = minhash_bands_for(threshold)
    return minhash_lsh_pairs(ds, threshold=threshold, num_hashes=128,
                             bands=bands, ngram=ngram, id_col=id_col,
                             text_col=text_col)


def ngram_jaccard_pairs_exact(
    ds: rd.Dataset, *, threshold: float = 0.5, ngram: int = 3,
    id_col: str = "doc_id", text_col: str = "text", max_rows: int = 20_000,
) -> pd.DataFrame:
    """All-pairs exact word-n-gram Jaccard ≥ threshold — ORACLE SCALE ONLY.

    O(n²) comparisons with every shingle set broadcast; refuses corpora
    larger than ``max_rows`` so the trap is explicit (the scale path is
    :func:`ngram_jaccard_pairs` / :func:`minhash_lsh_pairs`)."""
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"ngram_jaccard_pairs_exact is an O(n²) verification twin capped "
            f"at {max_rows} rows (got {n}); use ngram_jaccard_pairs (LSH-"
            f"bucketed, exact-verified) for production corpora")
    pdf = ds.select_columns([id_col, text_col]).to_pandas()
    sh = {int(r[id_col]): _word_ngram_hashes(r[text_col], ngram) for _, r in pdf.iterrows()}
    ref = ray.put(sh)

    def compare(batch: pd.DataFrame) -> pd.DataFrame:
        shingles = ray.get(ref)
        rows_a, rows_b, js = [], [], []
        ids_all = np.array(sorted(shingles))
        for i in batch[id_col]:
            i = int(i)
            for j in ids_all[ids_all > i]:
                jac = _jaccard(shingles[i], shingles[int(j)])
                if jac >= threshold:
                    rows_a.append(i); rows_b.append(int(j)); js.append(jac)
        return pd.DataFrame({"id_a": rows_a, "id_b": rows_b, "jaccard": js})

    out = ds.select_columns([id_col]).map_batches(compare, batch_format="pandas").to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def near_dup_cluster_assign(
    ds: rd.Dataset, pairs: pd.DataFrame, *, id_col: str = "doc_id"
) -> rd.Dataset:
    """Assign every row its near-dup cluster representative (min id).

    Scale shape: union-find runs over the PAIR set only (tiny relative to the
    corpus); the resulting {id → rep} map covers just pair-touched ids and is
    broadcast once via ``ray.put`` — untouched rows are their own rep, so the
    corpus itself never leaves the cluster.  Keep-first dedup is then a simple
    ``doc_id == cluster_rep`` filter.
    """
    import ray

    map_ref = ray.put(pair_rep_map(pairs))

    def assign(t: pa.Table) -> pa.Table:
        reps = ray.get(map_ref)
        ids = t[id_col].combine_chunks().to_numpy()
        out = np.fromiter((reps.get(int(i), int(i)) for i in ids),
                          dtype=np.int64, count=len(ids))
        return t.append_column("cluster_rep", pa.array(out))

    return ds.map_batches(assign, batch_format="pyarrow")


# ---- distributed connected components ---------------------------------------

def cluster_reps_ds(
    pairs: rd.Dataset,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_partitions: int | None = None,
    max_rounds: int = 40,
) -> rd.Dataset:
    """Distributed connected components over a pair Dataset → ``(node, label)``
    with ``label`` = min node id in the component (Dataset stays on the
    cluster; nothing corpus-sized touches the driver).

    Algorithm: min-label propagation with pointer jumping.  Each round is
    two hash-partitioned joins + one combining groupby over the LABELS table
    (pair-touched nodes only — tiny relative to the corpus):

    1. neighbor-min  ``l(v) ← min(l(v), min_{u∈N(v)} l(u))`` — join edge
       endpoints to labels, union with current labels, ``groupby(node).min``.
    2. pointer jump  ``l(v) ← l(l(v))`` — join labels to themselves on the
       label column (every label is itself a touched node, so the join is
       total).  This is pointer doubling: combined with step 1 it converges
       in O(log(longest chain)) rounds instead of O(diameter).

    Invariant ``l(v) ≤ v`` holds throughout and labels are per-node
    non-increasing, so a round that changes no label is a fixed point; at a
    fixed point labels are constant per component and equal to the component
    min.  Convergence is detected by an exact changed-row count (join old vs
    new on node), NOT a sum of labels — an int64 label sum can overflow at
    10^12-row id spaces.

    ``max_rounds=40`` is a safety backstop (2^40 chain length), never the
    expected exit.  Pinned against the driver-side union-find twin
    (:func:`cluster_reps`) in tests/test_dedup.py.
    """
    import pyarrow.compute as pc

    if num_partitions is None:
        # The hash-shuffle JoinOperator spins up one aggregator actor per
        # partition; sizing past the CPU budget wedges small clusters (the
        # q3 lesson), and each CC round contains a join — keep it ≤ CPU/2.
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(2, min(16, cpus // 2))

    def sym(t: pa.Table) -> pa.Table:
        a = pc.cast(t[id_a].combine_chunks(), pa.int64())
        b = pc.cast(t[id_b].combine_chunks(), pa.int64())
        return pa.table({
            "node": pa.concat_arrays([a, b]),
            "nbr": pa.concat_arrays([b, a]),
        })

    edges = (
        pairs.select_columns([id_a, id_b])
        .map_batches(sym, batch_format="pyarrow")
        .materialize()
    )
    if edges.count() == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
        }))
    # initial labels: every touched node labels itself
    labels = (
        edges.select_columns(["node"])
        .groupby("node")
        .aggregate(Min("node", alias_name="label"))
        .materialize()
    )

    def count_changed(t: pa.Table) -> pa.Table:
        ne = pc.not_equal(t["label"], t["old_label"])
        n = pc.sum(pc.cast(ne, pa.int64())).as_py() or 0
        return pa.table({"changed": pa.array([n], pa.int64())})

    for _ in range(max_rounds):
        # 1. neighbor-min
        msgs = (
            edges.join(labels.rename_columns({"node": "nbr"}),
                       join_type="inner", num_partitions=num_partitions,
                       on=("nbr",))
            .select_columns(["node", "label"])
        )
        stepped = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            # materialize so each executed graph carries ONE JoinOperator:
            # two concurrent hash-shuffle joins in a fused graph oversubscribe
            # their aggregator actors and wedge on small CPU budgets (the
            # label table is pair-touched-nodes-sized — cheap to pin)
            .materialize()
        )
        # 2. pointer jump: l(v) <- l(l(v))
        lut = stepped.rename_columns({"node": "label_key", "label": "label_parent"})
        jumped = (
            stepped.join(lut, join_type="inner", num_partitions=num_partitions,
                         on=("label",), right_on=("label_key",))
            .select_columns(["node", "label_parent"])
            .rename_columns({"label_parent": "label"})
            .materialize()
        )
        changed = (
            jumped.join(labels.rename_columns({"label": "old_label"}),
                        join_type="inner", num_partitions=num_partitions,
                        on=("node",))
            .map_batches(count_changed, batch_format="pyarrow")
            .sum("changed")
        )
        labels = jumped
        if not changed:
            break
    return labels


def near_dup_cluster_assign_ds(
    ds: rd.Dataset,
    pairs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Fully distributed cluster-rep assignment: connected components over the
    verified pair Dataset (:func:`cluster_reps_ds`), then a LEFT OUTER hash
    join of the corpus onto the label table — untouched rows coalesce to their
    own id.  The scale path for :func:`near_dup_cluster_assign` (which
    broadcasts a driver-built union-find map: right choice while the verified
    pair set is driver-small, wrong choice at 10^12 rows)."""
    import pyarrow.compute as pc

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(2, min(16, cpus // 2))
    labels = cluster_reps_ds(pairs, num_partitions=num_partitions)
    if labels.count() == 0:  # no pairs: everyone is their own rep (and the
        # Arrow hash join rejects a zero-block right side)
        def own(t: pa.Table) -> pa.Table:
            return t.append_column(
                "cluster_rep", pc.cast(t[id_col], pa.int64()))
        return ds.map_batches(own, batch_format="pyarrow")
    joined = ds.join(
        labels.rename_columns({"node": id_col, "label": "cluster_rep"}),
        join_type="left_outer", num_partitions=num_partitions, on=(id_col,),
    )

    def fill(t: pa.Table) -> pa.Table:
        rep = pc.coalesce(pc.cast(t["cluster_rep"], pa.int64()),
                          pc.cast(t[id_col], pa.int64()))
        i = t.schema.get_field_index("cluster_rep")
        return t.set_column(i, "cluster_rep", rep)

    return joined.map_batches(fill, batch_format="pyarrow")


# ---- benchmark decontamination ------------------------------------------------

def _batch_shingle_strings(texts: pa.Array | pa.ChunkedArray,
                           ngram: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """(shingle STRINGS, parent doc index) for a whole batch — the exact
    string shingles the SQL oracles define (``_word_ngram_hashes`` semantics:
    lowercased SHINGLE_TOKEN_PATTERN tokens, space-joined n-grams, docs with
    < n tokens contribute one all-token shingle; zero-token docs contribute
    the empty-string shingle, mirroring SQL's array_to_string([], ' ')).
    Tokenization is the Arrow sentinel-wrap kernel; the n-gram window join is
    one elementwise object-array concat pass (no per-doc Python loop on the
    common path)."""
    tokens, parent = _batch_token_strings(texts)
    n = len(texts)
    tok = np.asarray(tokens.to_pandas(), dtype=object)
    S = tok.size

    shingles: list[np.ndarray] = []
    parents: list[np.ndarray] = []
    if S >= ngram:
        m = S - ngram + 1
        valid = parent[:m] == parent[ngram - 1:]
        acc = tok[:m].copy()
        for k in range(1, ngram):
            acc = acc + " "
            acc = acc + tok[k:m + k]
        shingles.append(acc[valid])
        parents.append(parent[:m][valid])
    counts = np.bincount(parent, minlength=n) if S else np.zeros(n, dtype=np.int64)
    short = np.flatnonzero((counts > 0) & (counts < ngram))
    if short.size:
        starts = np.searchsorted(parent, short)
        for d, s in zip(short, starts):
            shingles.append(np.array([" ".join(tok[s:s + counts[d]])], dtype=object))
            parents.append(np.array([d], dtype=parent.dtype))
    empty_docs = np.flatnonzero(counts == 0)
    if empty_docs.size:
        shingles.append(np.full(empty_docs.size, "", dtype=object))
        parents.append(empty_docs.astype(parent.dtype if S else np.int64))
    sh = (np.concatenate(shingles) if shingles
          else np.zeros(0, dtype=object))
    par = np.concatenate(parents) if parents else np.zeros(0, dtype=np.int64)
    order = np.argsort(par, kind="stable")
    return sh[order], par[order]


def benchmark_shingle_set(bench: rd.Dataset, *, text_col: str = "text",
                          ngram: int = 3) -> np.ndarray:
    """Distinct string shingles of the benchmark corpus as a SORTED numpy
    unicode array (the broadcast side of decontamination).  Benchmark/eval
    sets are small by construction (they are hand-curated test suites), so
    collecting their distinct shingles to the driver is the right call even
    at 100 TB corpus scale — the CORPUS never materializes."""
    def sh(t: pa.Table) -> pa.Table:
        s, _ = _batch_shingle_strings(t[text_col], ngram)
        return pa.table({"shingle": pa.array(np.unique(s.astype(str)))})

    parts = bench.map_batches(sh, batch_format="pyarrow").to_pandas()
    return np.unique(parts["shingle"].to_numpy(dtype=str))


class DecontaminateStage:
    """Actor-pool stage: the benchmark shingle set is fetched from the object
    store ONCE per actor; each batch flags docs sharing any word n-gram with
    the benchmark (np.searchsorted membership over the sorted set + per-doc
    bincount — no Python row loop)."""

    def __init__(self, bench_ref, id_col: str = "doc_id",
                 text_col: str = "text", ngram: int = 3):
        self.bench = ray.get(bench_ref)
        self.id_col, self.text_col, self.ngram = id_col, text_col, ngram

    def __call__(self, t: pa.Table) -> pa.Table:
        s, parent = _batch_shingle_strings(t[self.text_col], self.ngram)
        contaminated = np.zeros(t.num_rows, dtype=np.int64)
        if s.size and self.bench.size:
            ss = s.astype(str)
            idx = np.searchsorted(self.bench, ss)
            idx[idx >= self.bench.size] = self.bench.size - 1
            hit = self.bench[idx] == ss
            if hit.any():
                contaminated[:] = np.bincount(
                    parent[hit], minlength=t.num_rows).astype(bool)
        return pa.table({
            self.id_col: t[self.id_col],
            "contaminated": pa.array(contaminated),
        })


def decontaminate(ds: rd.Dataset, bench: rd.Dataset, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  ngram: int = 3, concurrency=(1, 4)) -> rd.Dataset:
    """Benchmark decontamination: flag every corpus doc that shares a word
    n-gram shingle with the benchmark/eval set (the standard guard against
    test-set leakage into training data).  Benchmark shingles broadcast via
    ``ray.put`` (read once per actor); the corpus streams through one
    actor-pool map_batches — no shuffle, no corpus materialization."""
    bench_set = benchmark_shingle_set(bench, text_col=text_col, ngram=ngram)
    ref = ray.put(bench_set)
    return ds.map_batches(
        DecontaminateStage, fn_constructor_args=(ref, id_col, text_col, ngram),
        batch_format="pyarrow", concurrency=concurrency)
