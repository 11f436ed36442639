"""Local replica of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry and its ``oracle_sql()`` twin at
a given sf dir, comparing row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified with
float rounding).  Usage:

    cd /root/repo && python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(got: pd.DataFrame, want: pd.DataFrame) -> str | None:
    """STRICT compare mimicking the driver's value hash: canon() both sides
    (sorted cols, sorted rows, floats rounded to 6, everything stringified)
    then require EXACT string equality.  A dtype skew (int64 vs float64 from
    DuckDB HUGEINT) stringifies as '3' vs '3.0' and fails here, exactly as it
    fails the driver — round 1's three hash_match=false queries all passed
    the old 1e-9-tolerance compare."""
    if len(got) != len(want):
        return f"row count {len(got)} != {len(want)}"
    if sorted(got.columns) != sorted(want.columns):
        return f"columns {sorted(got.columns)} != {sorted(want.columns)}"
    g, w = canon(got), canon(want)
    for c in g.columns:
        gs, ws = g[c].astype(str), w[c].astype(str)
        if not (gs == ws).all():
            bad = gs != ws
            i = bad.idxmax()
            loose = ""
            try:
                if np.allclose(g[c].astype(float), w[c].astype(float), rtol=1e-9, atol=1e-9):
                    loose = " [would pass 1e-9-loose: dtype/last-bit skew]"
            except (ValueError, TypeError):
                pass
            return (f"col {c}: {bad.sum()} rows differ "
                    f"(e.g. row {i}: {gs[i]!r} vs {ws[i]!r}){loose}")
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1].startswith("/") else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if not a.startswith("/")]

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = fn(sf_dir)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            elif hasattr(got, "to_pydict"):
                got = pd.DataFrame(got.to_pydict())
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name in oracles:
            try:
                want = con.sql(oracles[name]).df()
            except Exception as exc:  # noqa: BLE001
                print(f"FAIL {name}: oracle raised {exc}")
                failures += 1
                continue
            err = compare(got, want)
            if err:
                print(f"FAIL {name}: {err}  ({dt:.1f}s)")
                failures += 1
            else:
                print(f"ok   {name}: {len(got)} rows match oracle  ({dt:.1f}s)")
        else:
            print(f"ok   {name}: {len(got)} rows (rows-only)  ({dt:.1f}s)")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(main())
