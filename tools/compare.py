"""Dev harness replicating the driver's DuckDB-oracle correctness check.

Runs every __spark_entry__.queries() entry on Spark and the matching
oracle_sql() on DuckDB over the same parquet tables, then compares
row-count, column names, and order-insensitive values (stricter than a
hash: exact canonicalized row multiset equality).

Usage:  python tools/compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonicalize a value for cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, Decimal):
        s = f"{v:f}"
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return s or "0"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter("\x1f".join(canon(r[i]) for i in order) for r in rows)


def type_class(t: str) -> str:
    """Coarse cross-engine type class. The driver's hasher is TYPED, so
    two engines can agree on every canonicalized value yet hash apart
    when classes differ (round 3: DECIMAL/TIMESTAMP; round 5: DuckDB
    SUM(int)=HUGEINT vs Spark BIGINT). canon() is type-blind on ints
    and rounds floats to 9 digits, so this check is the only place the
    dev harness can see that bug class."""
    t = t.upper()
    if "HUGEINT" in t:
        return "int128"
    if "DECIMAL" in t:
        return "decimal"
    if "TIMESTAMP" in t:
        return "timestamp"
    if t.endswith("[]") or "ARRAY" in t or "STRUCT" in t or "MAP" in t:
        return "nested"
    if "BOOL" in t:
        return "bool"
    if any(x in t for x in ("BIGINT", "LONG")):
        return "int64"
    if any(x in t for x in ("SMALLINT", "TINYINT", "SHORT", "BYTE", "INT")):
        return "int32"
    if any(x in t for x in ("DOUBLE", "FLOAT", "REAL")):
        return "float"
    if any(x in t for x in ("VARCHAR", "STRING", "TEXT", "CHAR")):
        return "string"
    if "DATE" in t:
        return "date"
    return t


# Classes the driver's hasher has EMPIRICALLY diverged on when they
# appear on either side of a mismatch (r3: decimal/timestamp/nested;
# r5: int128). int32-vs-int64 and even string-vs-int mismatches have
# repeatedly been driver-GREEN (r2 a5, r4 bm25/hll, r5 semdedup), so
# flagging them would be pure noise — the hasher canonicalizes those.
RISKY_CLASSES = {"int128", "decimal", "timestamp", "nested"}


def type_warnings(scols, sdtypes, dcols, dtypes) -> list[str]:
    """Per-column coarse-class comparison (columns matched by name);
    warns only when the divergence involves a class with a track record
    of typed-hash failure."""
    s = {c: type_class(t) for c, t in zip(scols, sdtypes)}
    d = {c: type_class(str(t)) for c, t in zip(dcols, dtypes)}
    return [
        f"{c}: spark={s[c]} duckdb={d[c]}"
        for c in sorted(s)
        if c in d
        and s[c] != d[c]
        and (s[c] in RISKY_CLASSES or d[c] in RISKY_CLASSES)
    ]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import duckdb
    import __spark_entry__ as entrymod
    from go_nonrat_annotation_pipeline_spark.session import get_spark

    spark = get_spark("compare-harness")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = f"SPARK-ERROR: {e}"
            continue
        sql = oracles.get(name)
        if sql is None:
            results[name] = f"rows-only ({len(srows)} rows)"
            continue
        try:
            cur = con.execute(sql)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            continue
        if len(srows) != len(drows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(srows)} duckdb={len(drows)}"
            continue
        if sorted(scols) != sorted(dcols):
            results[name] = f"SCHEMA-MISMATCH spark={sorted(scols)} duckdb={sorted(dcols)}"
            continue
        sm, dm = row_multiset(scols, srows), row_multiset(dcols, drows)
        if sm != dm:
            diff_s = list((sm - dm).items())[:3]
            diff_d = list((dm - sm).items())[:3]
            results[name] = f"VALUE-MISMATCH spark-only={diff_s} duckdb-only={diff_d}"
        else:
            # values agree — but the driver's hash is TYPED; warn on any
            # per-column engine type-class divergence (doesn't fail the
            # harness, but every round-3/round-5 red would have warned)
            try:
                rel = con.sql(sql)
                warns = type_warnings(
                    scols, [t for _, t in sdf.dtypes], rel.columns, rel.types
                )
            except Exception:  # noqa: BLE001 — typing is advisory
                warns = []
            suffix = f"  TYPE-WARN [{'; '.join(warns)}]" if warns else ""
            results[name] = f"OK ({len(srows)} rows){suffix}"

    fails = 0
    for name in sorted(results):
        status = results[name]
        mark = "PASS" if status.startswith(("OK", "rows-only")) else "FAIL"
        if mark == "FAIL":
            fails += 1
        print(f"{mark:4} {name:40} {status}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
