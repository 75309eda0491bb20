"""Local replica of the driver's correctness gate: every queries()
entry with an oracle_sql() twin must match DuckDB on the same parquet
(row count + order-insensitive values), at sf0.01 like the driver."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )


ORACLED = sorted(set(entry_mod.oracle_sql()) & set(entry_mod.queries()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(cols) == sorted(ocols), f"{name}: column names differ"
    assert len(spark_rows) == len(orows), f"{name}: row count differs"
    a = _normalize(spark_rows, cols)
    b = _normalize(orows, ocols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, f"{name}: first mismatch {a[mism[0]]} vs {b[mism[0]]}"


def test_oracle_keys_subset_of_queries():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


def test_rows_only_queries_run(spark):
    """Queries intentionally without an oracle still must execute and
    return a stable schema at small scale."""
    qs = entry_mod.queries()
    for name in ("dedup_minhash_lsh", "dedup_simhash"):
        df = qs[name](spark, "/root/testdata/sf0.001")
        assert df.count() >= 0
        assert df.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert df.filter("is_empty").count() < n  # extraction actually extracts


def test_spans_consistency_all_true(spark):
    """The scalar path's n_chunks and the posexplode span transport
    must agree for every conversation — the internal-consistency gate
    over the two intentionally-no-oracle projections."""
    import __spark_entry__ as em

    rows = em.queries()["extract_spans_consistency"](spark, SF_DIR).collect()
    assert rows
    bad = [r.conv_id for r in rows if not r.consistent]
    assert not bad, bad[:5]


def test_half_up_exact_beyond_double_precision(spark):
    """The review fix: HALF_UP of a per-group cents sum must stay
    exact past 2^53, where the earlier floor((S+k)/d)-on-a-double
    formulation silently drifts by a cent."""
    from pyspark.sql import functions as F

    from engine.spark.relational import _half_up

    vals = [
        0, 49, 50, 51, 99, 100, 12345,
        2**53 + 49, 2**53 + 51,          # past double's integer range
        2**60 + 49, 2**60 + 50, 2**60 + 51,
        9_223_372_036_854_775_007,       # near long max, still safe +50
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s long")
    got = {
        r.i: r.c
        for r in df.groupBy("i").agg(_half_up(F.sum("s"), 100).alias("c")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == (v + 50) // 100, (v, got[i], (v + 50) // 100)
