"""Driver-contract self-check: every queries() entry vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS gate (sf0.01): row count + schema-width +
order-insensitive value comparison, floats to 1e-9 after the declared rounding.
"""

import math

import duckdb
import pytest

import __spark_entry__ as contract

SF_DIR = "/root/testdata/sf0.01"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
            )
        except duckdb.IOException:
            pass
    return con


def normalize(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(round(v, 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out)


def approx_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) or isinstance(vb, float):
                if not math.isclose(float(va), float(vb), abs_tol=1e-9, rel_tol=1e-9):
                    return False
            elif va != vb:
                return False
    return True


ORACLE = contract.oracle_sql()
QUERIES = contract.queries()


def test_all_queries_have_callables():
    assert QUERIES, "queries() must not be empty"
    for name in ORACLE:
        assert name in QUERIES, f"oracle_sql has {name} but queries() doesn't"


@pytest.mark.spark
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    got = normalize([tuple(r) for r in df.collect()])
    sql = ORACLE.get(name)
    if sql is None:
        # rows-only check (driver's weaker gate): plan executes, schema stable
        assert df.columns, name
        return
    want = normalize(ddb.execute(sql).fetchall())
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    # bit-exact equality (the driver value-hashes rows; verified attainable
    # for every float-producing query thanks to identical rounding + op order)
    if got != want:
        assert approx_equal(got, want), (
            f"{name}: value mismatch\n got[:5]={got[:5]}\nwant[:5]={want[:5]}"
        )
        raise AssertionError(
            f"{name}: rows equal only approximately (1e-9), not bit-exact — "
            "driver value-hash would likely fail"
        )


@pytest.mark.spark
def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns == ["doc_id", "score"]
