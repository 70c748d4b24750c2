"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count, column names, and an order-insensitive
value multiset (floats rounded to 6). Usage:

    python tools/check_contract.py [name ...]
"""

from __future__ import annotations

import sys
import os
import decimal
import math

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from ocrd_segment_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_strict(v):
    """Type-strict normalization matching the driver's typed hash:
    Decimal stays Decimal, float stays exact, int stays int — a
    Spark DECIMAL vs oracle DOUBLE mismatch MUST fail here (round-1
    lesson: the loose gate let 3 type-only mismatches through)."""
    if isinstance(v, float) and math.isnan(v):
        return ("float", "NaN")
    return (type(v).__name__, repr(v))


def norm_loose(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def rows_multiset(cols, rows, norm):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main(names=None):
    spark = build_session(app="check_contract", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = names or list(qs)
    failed = []
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            srows = df.collect()
            scols = df.columns
        except Exception as ex:
            print(f"FAIL {name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:300]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: DUCKDB ERROR {type(ex).__name__}: {str(ex)[:300]}")
            failed.append(name)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sm = rows_multiset(scols, [tuple(r) for r in srows], norm_strict)
            dm = rows_multiset(dcols, drows, norm_strict)
            if sm != dm:
                sl = rows_multiset(scols, [tuple(r) for r in srows], norm_loose)
                dl = rows_multiset(dcols, drows, norm_loose)
                kind = (
                    "TYPE-ONLY mismatch (values equal loosely)"
                    if sl == dl
                    else "VALUES differ"
                )
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"{kind}, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS {name} ({len(srows)} rows)")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
