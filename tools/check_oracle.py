"""Local stand-in for the driver's correctness gate — TYPE-STRICT.

Runs every __spark_entry__.queries() entry at a given sf dir and
compares it with the matching oracle_sql() via DuckDB. Round-1 lesson
(VERDICT.md): the driver's value hash is type-sensitive — a DuckDB
HUGEINT (SUM over ints) against a Spark BIGINT is a red row even when
the numbers are equal, and a laxer local gate is worse than none. So
both sides are fetched as **Arrow** tables and compared on:

  - row count;
  - column names (case-insensitive, order-free);
  - canonical Arrow type labels per column (int width, decimal
    precision/scale, float width, list element types — all strict;
    DuckDB HUGEINT surfaces as decimal(38,0) and fails loudly);
  - exact values, with doubles compared BITWISE (no %.10g rounding,
    -0.0 != 0.0, NaN bit patterns literal), order-insensitive rows.

Importable: tests/test_entry_oracle.py reuses compare_one().

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import struct
import sys
import time
from decimal import Decimal
from pathlib import Path

import duckdb
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def connect_oracle(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def type_label(t: pa.DataType) -> str:
    """Canonical cross-engine label for an Arrow type, calibrated to
    the DRIVER's observed behavior (CORRECTNESS_r01): int *width* is
    invisible to its hash (q17 int32-vs-int64 passed), but int-vs-
    decimal is fatal (every HUGEINT oracle failed — DuckDB HUGEINT
    surfaces as decimal128(38,0)). So all signed ints collapse to
    'int' while decimal/float/int kinds stay strict."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        sign = "u" if pa.types.is_unsigned_integer(t) else ""
        return f"{sign}int"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit},tz={t.tz}]"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_label(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{type_label(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def _canon_val(v):
    """Hashable, type-tagged, bit-exact canonical value."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        return ("f64", struct.pack("<d", v).hex())
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_canon_val(x) for x in v))
    if isinstance(v, dict):
        return ("struct", tuple(sorted((k, _canon_val(x)) for k, x in v.items())))
    if isinstance(v, bytes):
        return ("bytes", v)
    if isinstance(v, str):
        return ("str", v)
    return (type(v).__name__, repr(v))


def canon_table(tbl: pa.Table):
    """(sorted col names, {col: type label}, sorted canonical rows)."""
    names = sorted(tbl.column_names, key=str.lower)
    types = {
        name.lower(): type_label(tbl.schema.field(name).type) for name in tbl.column_names
    }
    cols = [tbl.column(n).to_pylist() for n in names]
    rows = sorted(
        (tuple(_canon_val(c[i]) for c in cols) for i in range(tbl.num_rows)), key=repr
    )
    return names, types, rows


def compare_one(spark, con, name: str, spark_fn, oracle: str | None, sf_dir: str):
    """Returns (status, detail): status in {'ok','rows','fail'}."""
    sdf = spark_fn(spark, sf_dir)
    stbl = sdf.toArrow()
    if oracle is None:
        return "rows", f"{stbl.num_rows} rows (rows-only)"
    otbl = con.sql(oracle).fetch_arrow_table()
    problems = []
    if stbl.num_rows != otbl.num_rows:
        problems.append(f"rowcount spark={stbl.num_rows} oracle={otbl.num_rows}")
    snames, stypes, srows = canon_table(stbl)
    onames, otypes, orows = canon_table(otbl)
    if [n.lower() for n in snames] != [n.lower() for n in onames]:
        problems.append(f"cols spark={snames} oracle={onames}")
    elif stypes != otypes:
        diff = {
            k: (stypes[k], otypes[k]) for k in stypes if stypes[k] != otypes.get(k)
        }
        problems.append(f"types differ (spark, oracle): {diff}")
    if not problems and srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
        problems.append(
            f"values differ: {len(diffs)} rows, first: "
            f"{diffs[0] if diffs else (srows[-1], orows[-1])}"
        )
    if problems:
        return "fail", "; ".join(problems)
    return "ok", f"{stbl.num_rows} rows"


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
