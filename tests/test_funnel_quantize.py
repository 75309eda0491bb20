"""Semantics tests for event_funnel / retention_cohorts /
embedding_quantize on hand-built fixtures (DuckDB twins are covered by
test_entry_oracle.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

UTC = dt.timezone.utc


def _ts(d: int, s: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1 + d, tzinfo=UTC) + dt.timedelta(seconds=s)


def test_event_funnel_strict_ordering(spark, tmp_path):
    """A click BEFORE the first view must not convert; equal timestamps
    must not convert (strictly after); repeat events don't double
    count."""
    rows = [
        # u1: full ordered funnel
        (1, "view", _ts(0)), (1, "click", _ts(1)), (1, "purchase", _ts(2)),
        # u2: click before view -> stops at view
        (2, "click", _ts(0)), (2, "view", _ts(1)),
        # u3: click at the SAME instant as view -> not strictly after
        (3, "view", _ts(0)), (3, "click", _ts(0)),
        # u4: purchase before click -> converts view+click only
        (4, "view", _ts(0)), (4, "purchase", _ts(1)), (4, "click", _ts(2)),
        # u5: never views
        (5, "purchase", _ts(0)),
    ]
    df = spark.createDataFrame(
        [(u, 100 + i, t, ty) for i, (u, ty, t) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp_ntz, event_type string",
    )
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)

    from engine.spark.relational import event_funnel

    got = {
        r["step"]: r for r in event_funnel(spark, str(tmp_path)).collect()
    }
    assert got["view"]["users"] == 4  # u1 u2 u3 u4
    assert got["click"]["users"] == 2  # u1, u4
    assert got["purchase"]["users"] == 1  # u1 only
    assert got["click"]["conv_from_prev"] == pytest.approx(0.5)
    assert got["purchase"]["conv_from_prev"] == pytest.approx(0.5)
    assert got["purchase"]["conv_from_first"] == pytest.approx(0.25)


def test_retention_cohorts_matrix(spark, tmp_path):
    """Two cohorts a week apart; retention is the share of the cohort's
    week-0 size, and week offsets are exact integer buckets."""
    rows = [
        # cohort week W: users 1,2 first seen day 0; user 1 returns
        # in week W+1
        (1, _ts(0)), (2, _ts(0)), (1, _ts(8)),
        # cohort W+1: user 3
        (3, _ts(8)),
    ]
    df = spark.createDataFrame(
        [(u, 100 + i, t, "view") for i, (u, t) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp_ntz, event_type string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))

    from engine.spark.relational import retention_cohorts

    got = {
        (r["cohort_week"], r["week_offset"]): r
        for r in retention_cohorts(spark, str(tmp_path)).collect()
    }
    weeks = sorted({k[0] for k in got})
    w0, w1 = weeks[0], weeks[-1]
    assert w1 == w0 + 1
    assert got[(w0, 0)]["users"] == 2
    assert got[(w0, 1)]["users"] == 1
    assert got[(w0, 1)]["retention"] == pytest.approx(0.5)
    assert got[(w1, 0)]["users"] == 1
    assert got[(w1, 0)]["retention"] == pytest.approx(1.0)


def test_embedding_quantize_error_bound(spark):
    """int8 symmetric quantization: max reconstruction error is bounded
    by half a code step (scale/127/2 per element, with rounding), codes
    lie in [-127, 127], and zero vectors are handled."""
    from engine.spark.analytics import embedding_quantize

    out = embedding_quantize(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        if r["scale"] == 0:
            assert r["max_abs_err"] == 0
            continue
        # half-step bound (plus rounding slack on the 6dp outputs)
        assert r["max_abs_err"] <= r["scale"] / 127 / 2 + 1e-5, r
        for c in r["codes_preview"].split(","):
            assert -127 <= int(c) <= 127


def test_embedding_quantize_scale_alias_not_shadowed(spark):
    """Regression: the error math must use the RAW scale, not the
    rounded output alias (Spark lateral-column-alias precedence bug we
    hit). With the raw scale the max error respects the half-step
    bound tightly; the shadowed version drifts past it for vectors
    whose scale rounds down."""
    from engine.spark.analytics import embedding_quantize

    out = embedding_quantize(spark, "/root/testdata/sf0.001").collect()
    viol = [
        r for r in out
        if r["scale"] > 0 and r["max_abs_err"] > r["scale"] / 127 / 2 + 1e-5
    ]
    assert not viol, viol[:3]


def test_source_scorecard_semantics(spark, tmp_path):
    """Known source layout: dup rate, token sums, and shares computed
    from a hand-built corpus with one exact duplicate."""
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["aaaa bbbb", "aaaa bbbb", "cccc", "dddd eeee ffff"],
            "source": ["s1", "s1", "s1", "s2"],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))

    from engine.spark.analytics import source_scorecard

    got = {
        r["source"]: r
        for r in source_scorecard(spark, str(tmp_path)).collect()
    }
    s1, s2 = got["s1"], got["s2"]
    assert s1["n_docs"] == 3 and s1["n_unique"] == 2
    assert s1["dup_rate"] == pytest.approx(1 / 3, abs=1e-6)
    # tokens: len/4 floored, min 1 -> 2+2+1 = 5 for s1, 3 for s2
    assert s1["tokens"] == 5 and s2["tokens"] == 3
    assert s2["dup_rate"] == 0.0
    assert s1["token_share"] == pytest.approx(5 / 8, abs=1e-6)


def test_simsearch_int8_recall_vs_float(spark):
    """The quantized serving path must recover most of the float
    brute-force top-k (127 levels per dim loses little), and its
    integer dots must be exact (spot-checked in Python)."""
    from engine.spark.analytics import simsearch_bruteforce, simsearch_int8

    sf = "/root/testdata/sf0.01"
    exact = simsearch_bruteforce(spark, sf, n_queries=5, k=10).collect()
    quant = simsearch_int8(spark, sf, n_queries=5, k=10).collect()
    etop = {}
    for r in exact:
        etop.setdefault(r["query_id"], set()).add(r["vec_id"])
    qtop = {}
    for r in quant:
        qtop.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(etop[q] & qtop[q]) / len(etop[q]) for q in etop if q in qtop
    ]
    assert recalls and sum(recalls) / len(recalls) >= 0.8, recalls

    # exactness of one integer dot, recomputed in pure Python
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet') WHERE vec_id IN (0, 1)"
    ).fetchall()
    vecs = {vid: [float(x) for x in emb] for vid, emb in rows}

    def codes(v):
        import math

        n = math.sqrt(sum(x * x for x in v))
        u = [x / n for x in v]
        s = max(abs(x) for x in u)
        return [
            int(math.floor(x * 127 / s + 0.5))
            if x >= 0
            else -int(math.floor(-x * 127 / s + 0.5))
            for x in u
        ], s

    c0, _ = codes(vecs[0])
    c1, _ = codes(vecs[1])
    expected_dot = sum(a * b for a, b in zip(c0, c1))
    got = {
        (r["query_id"], r["vec_id"]): r["dot"]
        for r in quant
    }
    if (0, 1) in got:
        assert got[(0, 1)] == expected_dot
    if (1, 0) in got:
        assert got[(1, 0)] == expected_dot


def test_embedding_clusters_composition(spark):
    """The composition report must cover every non-zero-norm vector
    exactly once, shares must sum to 1, and the assignment must agree
    with the IVF search's own cell assignment (same codebook)."""
    import __spark_entry__ as em

    rows = em.queries()["embedding_clusters"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    total = sum(r["n_vectors"] for r in rows)
    import duckdb

    n_valid = duckdb.connect().execute(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet') "
        "WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0"
    ).fetchone()[0]
    assert total == n_valid
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert all(r["avg_sq_dist"] >= 0 for r in rows)


def test_embedding_clusters_drops_zero_norm(spark, tmp_path):
    """Regression (review finding): a zero-norm sentinel vector must be
    excluded from the composition report — NULL distances would
    otherwise sort first and land it in cluster 0, diverging from the
    DuckDB twin."""
    import pandas as pd

    from engine.spark.analytics import embedding_clusters

    pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [[1.0, 0.1], [0.1, 1.0], [0.0, 0.0]],
            "label": [0, 1, 0],
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"))
    out = embedding_clusters(
        spark, str(tmp_path), codebook=[[1.0, 0.0], [0.0, 1.0]]
    ).collect()
    assert sum(r["n_vectors"] for r in out) == 2
    assert sum(r["share"] for r in out) == pytest.approx(1.0, abs=1e-5)


def test_user_engagement_trailing_window(spark, tmp_path):
    """Hand-built activity: a user active on day d contributes to WAU
    for days d..d+6; stickiness is DAU over the trailing-7-day
    distinct actives."""
    import datetime as dt

    UTC = dt.timezone.utc

    def ts(day):
        return dt.datetime(2024, 1, 1 + day, 12, 0, tzinfo=UTC)

    rows = [
        (1, 100, ts(0), "view"),
        (2, 101, ts(0), "view"),
        (1, 102, ts(3), "view"),  # user 1 returns on day 3
        (3, 103, ts(3), "view"),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, event_type string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))

    from engine.spark.relational import user_engagement

    got = {r["day"]: r for r in user_engagement(spark, str(tmp_path)).collect()}
    days = sorted(got)
    d0, d3 = days[0], days[0] + 3
    assert got[d0]["dau"] == 2 and got[d0]["wau"] == 2
    assert got[d0]["stickiness"] == pytest.approx(1.0)
    # day 3: users 1,3 active; trailing window covers day 0 too -> WAU
    # = {1,2,3}; user 1 counted once despite two active days
    assert got[d3]["dau"] == 2 and got[d3]["wau"] == 3
    assert got[d3]["stickiness"] == pytest.approx(2 / 3, abs=1e-6)
    # only days with activity are reported
    assert set(days) == {d0, d3}


def test_corpus_diff_statuses(spark):
    """Hand-built snapshots: added / removed / changed classified
    exactly; unchanged docs never emitted."""
    from engine.spark.analytics import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "fresh")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_event_value_trend_range_frame(spark, tmp_path):
    """RANGE frame vs calendar gaps: a day more than 6 days after the
    previous activity must NOT include it in the moving average."""
    import datetime as dt

    UTC = dt.timezone.utc

    def ts(day):
        return dt.datetime(2024, 1, 1 + day, 12, 0, tzinfo=UTC)

    rows = [
        (1, 100, ts(0), "view", 10.0),
        (1, 101, ts(1), "view", 20.0),
        (1, 102, ts(10), "view", 40.0),  # gap > 6 days
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))

    from engine.spark.relational import event_value_trend

    got = {r["day"]: r for r in event_value_trend(spark, str(tmp_path)).collect()}
    days = sorted(got)
    d0, d1, d10 = days
    assert got[d0]["ma7_value"] == pytest.approx(10.0)
    assert got[d1]["ma7_value"] == pytest.approx(15.0)  # (10+20)/2
    # a ROWS frame would average (10,20,40); RANGE excludes the gap
    assert got[d10]["ma7_value"] == pytest.approx(40.0)


def test_order_percentiles_by_segment_shape(spark):
    """Every segment emits deciles 0..9 with non-overlapping price
    bounds and counts summing to the segment's orders."""
    from engine.spark.relational import order_percentiles_by_segment

    rows = order_percentiles_by_segment(
        spark, "/root/testdata/sf0.01"
    ).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(r)
    for seg, ds in by_seg.items():
        ds = sorted(ds, key=lambda r: r["decile"])
        assert [d["decile"] for d in ds] == list(range(10)), seg
        for a, b in zip(ds, ds[1:]):
            assert a["max_price"] <= b["min_price"] + 1e-9, (seg, a, b)


def test_supplier_balance_outliers_planted(spark, tmp_path):
    """A planted extreme balance is flagged with the textbook z-score;
    a tight cluster yields no outliers."""
    import pandas as pd

    pd.DataFrame(
        {
            "s_suppkey": list(range(1, 12)),
            "s_name": [f"s{i}" for i in range(1, 12)],
            # nation 1: ten near-identical balances + one extreme
            "s_nationkey": [1] * 11,
            "s_acctbal": [100.0, 101.0, 99.0, 100.5, 99.5,
                          100.0, 101.0, 99.0, 100.5, 99.5, 500.0],
        }
    ).to_parquet(str(tmp_path / "supplier.parquet"))
    pd.DataFrame(
        {"n_nationkey": [1], "n_name": ["X"], "n_regionkey": [0]}
    ).to_parquet(str(tmp_path / "nation.parquet"))

    from engine.spark.relational import supplier_balance_outliers

    got = supplier_balance_outliers(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0]["s_suppkey"] == 11 and got[0]["z"] > 2


def test_event_volume_anomalies_planted(spark, tmp_path):
    """A planted volume spike on one day is flagged; steady traffic
    yields nothing."""
    import datetime as dt

    UTC = dt.timezone.utc
    rows = []
    eid = 0
    for d in range(10):
        n = 50 if d == 7 else 5  # spike on day 7
        for i in range(n):
            rows.append(
                (1, eid, dt.datetime(2024, 1, 1 + d, 8, 0, i % 60,
                                     tzinfo=UTC), "view")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, event_type string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    from engine.spark.relational import event_volume_anomalies

    got = event_volume_anomalies(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0]["n_events"] == 50 and got[0]["z"] > 2
