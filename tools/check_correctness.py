#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and (where present)
its ``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column names, and order-insensitive values (columns sorted by
name, rows sorted, NaN-safe, float tolerance 0 — the driver hashes, so we
demand exact equality modulo representation).

Usage:
    python tools/check_correctness.py [query ...]
    SF_DIR=/root/testdata/sf0.01 python tools/check_correctness.py
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0; repr for shortest-roundtrip comparison
        if v == 0:
            return "0.0"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, x or "") for x in t))
    return out


def main():
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.001")

    from akka_graph_db_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"rows-only  {name}: {len(srows)} rows "
                f"({time.time() - t0:.1f}s)"
            )
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if ok:
            sn = normalize(srows, scols)
            on = normalize(orows, ocols)
            if sn != on:
                ok = False
                diff = [
                    (a, b) for a, b in zip(sn, on) if a != b
                ][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        if ok:
            print(
                f"PASS  {name}: {len(srows)} rows ({time.time() - t0:.1f}s)"
            )
            n_pass += 1
        else:
            print(f"FAIL  {name}: {'; '.join(msgs)}")
            n_fail += 1
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only "
        f"(sf_dir={sf_dir})"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
