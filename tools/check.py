#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check.py <sf_dir> <verify_out_dir>

Reads <out_dir>/oracle_sql.json, runs each SQL in DuckDB with views over
the sf_dir parquet tables, loads the Spark result parquet from
<out_dir>/<name>/, sorts columns by name (like the driver), and compares
values cell-by-cell in row order. Exits non-zero on any mismatch.
"""
import duckdb
import glob
import json
import math
import os
import sys
from decimal import Decimal

import pandas as pd


def canon(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if v is pd.NaT:
        return None
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return ("arr", tuple(canon(x) for x in v))
        if not isinstance(v, (str, bytes, list, tuple, dict)) and pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, Decimal):
        return ("dec", str(v))  # keep scale: '1.00' renders unlike '1.0'
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, (int,)):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return ("ts", v.isoformat())
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):  # numpy scalar
        return canon(v.item())
    return v


def cell_eq(a, b):
    # STRICT: the driver hashes the RENDERED result, so a Spark
    # DECIMAL(18,2) "137869.00" vs a DuckDB float64 "137869.0" is a
    # mismatch even though the values are numerically equal (this is
    # exactly what hash-failed 13 queries in round 2). Compare the
    # canonical typed rendering with no numeric coercion.
    ca, cb = canon(a), canon(b)
    if ca is None or cb is None:
        return ca is None and cb is None
    if isinstance(ca, tuple) and isinstance(cb, tuple) and ca[0] != cb[0]:
        return False  # decimal vs float vs int: rendered differently
    if isinstance(ca, tuple) and isinstance(cb, tuple) and ca[0] == "dec":
        # trailing zeros render: Decimal('1.00') != Decimal('1.0')
        return str(ca[1]) == str(cb[1])
    return ca == cb


def driver_sort(df):
    """The REAL driver's row canonicalization: columns sorted by name,
    then pandas sort_values over the RAW (un-canonicalized) frame. This
    is the code path that errored on an array column in round 7 while
    the old mirror (row-order compare, no sort) stayed green — the
    mirror must run the same sort so it can never pass where the driver
    fails."""
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    n_ok = 0
    failures = []
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        try:
            s = pd.read_parquet(path)
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            s = driver_sort(s)
        except Exception as e:
            failures.append((name, f"driver sort_values failed (the r7 gate-crash class): {e}"))
            continue
        if name not in oracle:
            print(f"  ~ {name}: rows-only ({len(s)} rows)")
            if len(s) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            else:
                n_ok += 1
            continue
        try:
            d = con.sql(oracle[name]).df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        try:
            d = driver_sort(d)
        except Exception as e:
            failures.append((name, f"oracle sort_values failed: {e}"))
            continue
        if list(s.columns) != list(d.columns):
            failures.append((name, f"columns differ: spark={list(s.columns)} duckdb={list(d.columns)}"))
            continue
        if len(s) != len(d):
            failures.append((name, f"row count: spark={len(s)} duckdb={len(d)}"))
            continue
        bad = None
        for c in s.columns:
            sv, dv = list(s[c]), list(d[c])
            for i, (a, b) in enumerate(zip(sv, dv)):
                if not cell_eq(a, b):
                    bad = f"col {c} row {i}: spark={a!r} duckdb={b!r}"
                    break
            if bad:
                break
        if bad:
            failures.append((name, bad))
        else:
            print(f"  ✓ {name}: {len(s)} rows match")
            n_ok += 1

    written = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for m in set(oracle) - written:
        failures.append((m, "oracle declared but no spark output written"))
    # the Verify-side manifest covers rows-only queries too: a query
    # that failed to dump (schema guard, runtime error) must fail the
    # mirror, not silently vanish from it
    manifest = os.path.join(out_dir, "_queries.json")
    if os.path.exists(manifest):
        expected = set(json.load(open(manifest)))
        for m in sorted(expected - written - set(oracle)):
            failures.append((m, "registered query produced no spark output (see [verify] stderr)"))
    print(f"\n{n_ok} ok, {len(failures)} failed")
    for name, why in failures:
        print(f"  ✗ {name}: {why}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
