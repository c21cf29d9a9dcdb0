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


def type_class(t: str) -> str:
    """Collapse a Spark or DuckDB type name into a hash-equivalence class.

    The driver hashes values after a pandas round-trip, so dtype families
    that pandas represents differently must not be mixed even when str()
    of every cell agrees: DuckDB HUGEINT (windowed SUM over BIGINT widens
    to int128) lands as float/object while Spark BIGINT is int64 — that
    exact mismatch made the value-identical pack_chunks row driver-red in
    round 5. Classes are deliberately coarse (all machine ints are one
    class) so representational noise the driver provably tolerates
    (CORRECTNESS_r04/r05: 98 green rows across int/decimal/date/string
    mixes) does not false-fail locally.
    """
    t = t.strip().lower()
    if t.endswith("[]"):  # duckdb list
        return "arr<" + type_class(t[:-2]) + ">"
    if t.startswith("array<") and t.endswith(">"):
        return "arr<" + type_class(t[6:-1]) + ">"
    if t.startswith("decimal"):
        # precision widens differently (duckdb SUM -> DECIMAL(38,s)),
        # scale must agree or string forms diverge ("1.50" vs "1.5000").
        # Precision > 18 is hash-UNSAFE the same way HUGEINT is: at
        # 15-16+ significant digits DuckDB's pandas round-trip degrades
        # the value to float64 while Spark keeps exact Decimal, so the
        # driver hash diverges on value-identical rows
        # (CORRECTNESS_r09 order_reconciliation). Flag it even when
        # both sides are wide.
        import re as _re

        m = _re.search(r"\(\s*(\d+)\s*,\s*(\d+)\s*\)", t)
        if m and int(m.group(1)) > 18:
            return "decwide"
        return f"dec({m.group(2)})" if m else "dec(?)"
    if t in ("tinyint", "smallint", "int", "integer", "bigint"):
        return "int"
    if t in ("hugeint", "uhugeint"):
        return "hugeint"  # int128: pandas degrades it; never hash-safe
    if t in ("float", "real", "double"):
        return "float"
    if t in ("string", "varchar", "text"):
        return "str"
    if t in ("boolean", "bool"):
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "ts"
    return "other"


def _classes_compatible(a: str, b: str) -> bool:
    # wide decimal (precision > 18) is never hash-safe, even paired
    # with itself: both engines may print identical values while only
    # one keeps the exact Decimal through the pandas round-trip
    if "decwide" in (a, b):
        return False
    if a == b or "other" in (a, b):
        return True
    # float vs decimal is driver-tolerated (empirical: update_edge_merge,
    # spark double vs oracle DECIMAL, green in CORRECTNESS_r04). No
    # HUGEINT pairing has ever been driver-green, so that stays flagged.
    if {a.split("(")[0], b.split("(")[0]} == {"float", "dec"}:
        return True
    return False


def dtype_mismatches(scols, stypes, ocols, otypes):
    """Pair Spark and oracle columns by name; return cross-class pairs."""
    s = {c: type_class(t) for c, t in zip(scols, stypes)}
    o = {c: type_class(t) for c, t in zip(ocols, otypes)}
    return [
        f"{c}: spark {s[c]} vs oracle {o[c]}"
        for c in sorted(set(s) & set(o))
        if not _classes_compatible(s[c], o[c])
    ]


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


def duplicate_registry_keys(entry_path: str) -> dict[str, list[str]]:
    """Source-level duplicate-key scan of queries()/oracle_sql().

    Python dict literals silently keep the LAST duplicate key, which in
    round 8 let a new query shadow the driver-certified ``rfm_segments``
    in both registries (VERDICT r8 "What's wrong" #1). Parse the module
    AST and return {func_name: [duplicated keys]} so a collision fails
    loudly instead of shipping.
    """
    import ast
    from collections import Counter

    with open(entry_path) as fh:
        tree = ast.parse(fh.read())
    dupes: dict[str, list[str]] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in (
            "queries",
            "oracle_sql",
        ):
            keys: list[str] = []
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict):
                    keys.extend(
                        k.value
                        for k in sub.keys
                        if isinstance(k, ast.Constant)
                        and isinstance(k.value, str)
                    )
            dup = [k for k, c in Counter(keys).items() if c > 1]
            if dup:
                dupes[node.name] = sorted(dup)
    return dupes


def main():
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.001")

    from akka_graph_db_spark.session import get_spark

    import __spark_entry__ as entrymod

    dupes = duplicate_registry_keys(entrymod.__file__)
    if dupes:
        print(f"FATAL: duplicate registry keys (later wins, silently "
              f"shadowing the earlier query): {dupes}")
        return 1

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
            stypes = [f.dataType.simpleString() for f in sdf.schema.fields]
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
            desc = con.execute(
                f"DESCRIBE {oracles[name]}"
            ).fetchall()
            otypes_by_col = {r[0]: r[1] for r in desc}
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            otypes = [otypes_by_col.get(c, "other") for c in ocols]
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
        tmis = dtype_mismatches(scols, stypes, ocols, otypes)
        if tmis:
            ok = False
            msgs.append(f"dtypes {tmis}")
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
