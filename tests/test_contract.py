"""Guard for the driver contract: entry() smoke + a representative
subset of queries() vs oracle_sql() through DuckDB (the full gate is
tools/check_contract.py; this keeps `pytest -x -q` fast but honest)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_contract import TABLES, norm_strict, rows_multiset

SF_DIR = "/root/testdata/sf0.01"

SUBSET = [
    "extract_single_para",
    "extract_boiler_reading_order",
    "extract_region_spans",
    "plausibilize_kernel",
    "g9_simplify_gap_merge",
    "j1_full_outer_align",
    "a1_a2_match_stats",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "events_hourly_window",
    "extract_word_spans",
    "eval_map_summary",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"lang", "pages", "regions_kept"} <= set(df.columns)
    assert sum(r["pages"] for r in rows) == 500


def test_contract_completeness():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 35
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    qs = entrymod.queries()
    df = qs[name](spark, SF_DIR)
    srows = [tuple(r) for r in df.collect()]
    res = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(df.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert rows_multiset(df.columns, srows, norm_strict) == rows_multiset(
        dcols, drows, norm_strict
    )
