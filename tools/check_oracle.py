"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir and
compares it with the matching oracle_sql() via DuckDB:
row count, sorted column names, and an order-insensitive multiset of
rows (columns sorted by name, floats canonicalized). Importable:
tests/test_entry_oracle.py reuses compare_one().

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def connect_oracle(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = float(f"{v:.10g}") + 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def compare_one(spark, con, name: str, spark_fn, oracle: str | None, sf_dir: str):
    """Returns (status, detail): status in {'ok','rows','fail'}."""
    sdf = spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if oracle is None:
        return "rows", f"{len(srows)} rows (rows-only)"
    rel = con.sql(oracle)
    ocols = list(rel.columns)
    orows = rel.fetchall()
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
        problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
    if not problems:
        cs, co = canon(srows, scols), canon(orows, ocols)
        if cs != co:
            diffs = [(a, b) for a, b in zip(cs, co) if a != b]
            problems.append(
                f"values differ: {len(diffs)} rows, first: {diffs[0] if diffs else (cs[-1], co[-1])}"
            )
    if problems:
        return "fail", "; ".join(problems)
    return "ok", f"{len(srows)} rows"


def main():
    from __spark_entry__ import oracle_sql, queries
    from pdf_parser_spark.plans.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")
    con = connect_oracle(sf)
    qs, os_ = queries(), oracle_sql()
    counts = {"ok": 0, "rows": 0, "fail": 0}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            status, detail = compare_one(spark, con, name, fn, os_.get(name), sf)
        except Exception as e:
            status, detail = "fail", f"error: {e}"
        counts[status] += 1
        label = {"ok": "ok   ", "rows": "rows ", "fail": "FAIL "}[status]
        print(f"{label} {name}: {detail} [{time.time()-t0:.1f}s]")
    print(f"\n{counts['ok']} ok, {counts['rows']} rows-only, {counts['fail']} fail")
    sys.exit(1 if counts["fail"] else 0)


if __name__ == "__main__":
    main()
