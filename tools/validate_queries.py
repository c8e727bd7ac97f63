"""Local stand-in for the driver's correctness gate: run every queries()
entry and compare against oracle_sql() via DuckDB (row count + schema +
order-insensitive values).  Usage:

    python tools/validate_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    # Driver-window gate (VERDICT r2 #1/#9): the driver snapshots only the
    # first _DRIVER_WINDOW queries() entries into CORRECTNESS_r{N}.json, so
    # every oracle-backed entry (minus the declared tail parkings) must sit
    # inside that window or it grades "untested" at the gate that counts.
    window = getattr(e, "_DRIVER_WINDOW", 50)
    tail_ok = set(getattr(e, "_TAIL_ORACLES", ()))
    for pos, name in enumerate(qs):
        if pos >= window and name in oracles and name not in tail_ok:
            print(f"FAIL {name}: oracle-backed query at position {pos} "
                  f"is outside the driver's {window}-row window")
            failures += 1
    for orphan in sorted(set(oracles) - set(qs)):
        print(f"FAIL {orphan}: oracle_sql entry has no queries() entry")
        failures += 1
    unknown = only - set(qs)
    if unknown:
        for u in sorted(unknown):
            print(f"FAIL {u}: no such query")
        failures += len(unknown)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            continue
        want = canon(con.sql(oracles[name]).df())
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(want)}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = np.allclose(a.astype(float), b.astype(float),
                                 rtol=0, atol=0, equal_nan=True)
            elif a.dtype.kind != b.dtype.kind and not (
                    {a.dtype.kind, b.dtype.kind} <= {"i", "u"}):
                # driver hashes values WITH their schema: silently coercing
                # the oracle into the query's dtype would hide a mismatch
                # the driver gate reports
                eq = False
            else:
                eq = a.equals(b.astype(a.dtype))
            if not eq:
                bad = c
                break
        if bad:
            merged = pd.DataFrame({"got": got[bad], "want": want[bad]})
            diff = merged[merged["got"].astype(str) != merged["want"].astype(str)]
            print(f"FAIL {name}: column {bad} differs; first diffs:\n{diff.head(3)}")
            failures += 1
        else:
            print(f"ok   {name}: {len(got)} rows exact-match")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
