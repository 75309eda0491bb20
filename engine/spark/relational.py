"""Relational operators over the driver's TPC-H-ish tables, mapping the
reference's aggregation/join/window/set semantics (SURVEY.md §2.4–2.7)
onto table-scale data. Each has an ANSI-SQL oracle twin in
__spark_entry__.oracle_sql. All aggregates are rounded identically on
both sides so the driver's value-hash is FP-stable.

Scale notes: joins against small dims (region/nation/supplier) are
explicitly broadcast; aggregations rely on map-side partial agg; the
ranking windows partition on the natural key so no global sort occurs.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def _t(spark: "SparkSession", sf_dir: str, name: str) -> "DataFrame":
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(name: str):
    """Money/rate column as exact DECIMAL(18,2): the parquet doubles
    are 2-dp values, so the cast is lossless and every sum over them
    is exact — double sums can land within 1e-9 of a .xx5 rounding
    boundary and round differently per engine depending on
    accumulation order (hit twice at sf0.1: order_consistency line
    revenue). Decimal arithmetic makes round() deterministic and
    engine-identical; final outputs cast back to double."""
    return F.col(name).cast("decimal(18,2)")


def _half_up(sum_col: "F.Column", unit_div: int) -> "F.Column":
    """HALF_UP rounding of an exact integer sum to cents, in INTEGER
    arithmetic end-to-end: (S + unit_div/2) div unit_div — never
    floor((S+k)/d) on a double, whose exactness dies at 2^53 (a
    per-group sum a large-SF corpus can reach long before the long
    itself overflows). The long sum's own capacity bounds the per-
    GROUP volume: ≤ ~8·10^9 lineitems/group for the 2-factor product,
    ≤ ~7.6·10^7 for the 3-factor one; beyond that, the DECIMAL(18,2)
    formulation the DuckDB oracles keep (sum widens to DECIMAL(28,2))
    is the drop-in replacement — the trade is documented, not
    silent."""
    half = unit_div // 2
    # the one division happens per GROUP, in decimal: (38,0)/literal is
    # exact for any long (x/100 has ≤ 2 fractional digits, well inside
    # the result scale), so floor never sees a double
    return F.floor(
        (sum_col + half).cast("decimal(38,0)") / unit_div
    ).cast("long")


def _cents_revenue() -> "F.Column":
    """Exact discounted revenue `round(sum(price·(1−disc)), 2)` in
    integer cents: p_c·(100−d_c) is the exact product in 10^-4-dollar
    units, so the long sum is exact and HALF_UP at 2 dp is
    (S+50) div 100 in integer math — bit-identical to the
    DECIMAL(18,2) formulation (the oracles keep DECIMAL as the
    cross-arithmetic check) with whole-stage-codegen long math
    instead of Decimal128. Scale bound: see _half_up."""
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    dc = F.round(F.col("l_discount") * 100).cast("long")
    return _half_up(F.sum(pc * (100 - dc)), 100).cast("double") / 100


def q1_pricing_summary(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """TPC-H Q1 shape (A1/A6 batch roll-up analogue): grouped money
    math — exact INTEGER-CENTS arithmetic (see order_consistency):
    2-dp inputs as longs, so every sum is exact, the disc-price
    product sum is p_c·(100−d_c) in 10^-4-dollar units with HALF_UP =
    floor((S+50)/100)/100, and the averages divide exact integer
    numerators — bit-identical to the DECIMAL(18,2) chain
    (A/B-verified at sf0.01 + sf0.1) and ~1.5× faster (long codegen
    vs Decimal128 for the product). The DuckDB oracle keeps DECIMAL,
    cross-checking the two exact arithmetics; avg() over raw doubles
    stays banned (accumulation-order-dependent)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    qc = F.round(F.col("l_quantity") * 100).cast("long")
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    dc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qc).cast("double") / 100).alias("sum_qty"),
            (F.sum(pc).cast("double") / 100).alias("sum_base_price"),
            _cents_revenue().alias("sum_disc_price"),
            F.round(
                (F.sum(qc).cast("double") / 100) / F.count(F.lit(1)), 4
            ).alias("avg_qty"),
            F.round(
                (F.sum(dc).cast("double") / 100) / F.count(F.lit(1)), 4
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def top_orders_per_segment(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """W1 ranking analogue: top-3 orders by revenue within each market
    segment (window + broadcast dim join)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), F.col("rnk").cast("long").alias("rnk"))
    )


def score_distribution(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """A7 bucket roll-up: order value buckets (percentile analogue of the
    ranker's excellent/good/acceptable/poor bands)."""
    orders = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 300000, "excellent")
        .when(F.col("o_totalprice") >= 150000, "good")
        .when(F.col("o_totalprice") >= 50000, "acceptable")
        .otherwise("poor")
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_price"),
        )
    )


def customers_without_orders(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """P3/J1 anti-join analogue: required-relation missing → anti join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def suppliers_in_region(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """J1 semi-join tier: suppliers located in AMERICA-region nations
    (two broadcast dims, one semi join)."""
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nat_am = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey, "left_semi")
    return sup.join(
        F.broadcast(nat_am), sup.s_nationkey == nat_am.n_nationkey, "left_semi"
    ).select("s_suppkey", "s_name")


def order_consistency(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """A2 amount-consistency analogue at table scale: per-order line
    revenue vs o_totalprice with the reference's warning semantics.

    Exact money math in INTEGER CENTS: price·(1−disc)·(1+tax) =
    p_c·(100−d_c)·(100+t_c) / 10^6 with 2-dp inputs, so the long
    product-sum S is exact and HALF_UP rounding to 2 dp is
    floor((S+5000)/10^4)/100 — bit-identical to the three-factor
    DECIMAL(18,2) chain (A/B-verified on all 147k sf0.1 orders) but
    ~1.6× faster: the decimal product grows past long-backed
    Decimal128 while the cents path stays in whole-stage-codegen long
    arithmetic. The DuckDB oracle keeps the DECIMAL formulation, so
    the gate cross-checks two different exact arithmetics."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    dc = F.round(F.col("l_discount") * 100).cast("long")
    tc = F.round(F.col("l_tax") * 100).cast("long")
    line_sums = (
        li.groupBy("l_orderkey")
        .agg(F.sum(pc * (100 - dc) * (100 + tc)).alias("S"))
        .select(
            "l_orderkey",
            (_half_up(F.col("S"), 10000).cast("double") / 100).alias(
                "line_revenue"
            ),
        )
    )
    j = orders.join(line_sums, orders.o_orderkey == line_sums.l_orderkey)
    return j.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "line_revenue",
        (F.abs(F.col("o_totalprice") - F.col("line_revenue")) > 0.02).alias("mismatch"),
    )


def event_set_ops(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """SO1–SO4 analogue: users who purchased but never errored
    (EXCEPT), with their view counts."""
    ev = _t(spark, sf_dir, "events")
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    erroring = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    clean = purchasers.exceptAll(erroring)
    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.count("*").alias("n_views")
    )
    return (
        clean.join(views, "user_id", "left")
        .select("user_id", F.coalesce("n_views", F.lit(0)).alias("n_views"))
    )


def sessionize_events(spark: "SparkSession", sf_dir: str, gap_minutes: int = 30) -> "DataFrame":
    """W2 ordering at work: lag-based sessionization per user (the
    stable-order window pattern the north rule requires)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ: route through ltz (session tz is UTC)
    # before the epoch-seconds cast, matching DuckDB floor(epoch(ts))
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    sessioned = marked.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessioned.withColumn("session_seq", F.col("session_seq").cast("long")).groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(_dec("value")), 4).cast("double").alias("session_value"),
    )


def event_props_json(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """§2.8 json family: parse the props JSON column natively."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


def part_type_shares(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """§2.8 string family + A5-ish ratio math: revenue share by part
    brand with string-extracted type class."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", F.substring_index("p_type", " ", 1).alias("type_class")
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.groupBy("p_brand", "type_class").agg(
        _cents_revenue().alias("revenue"),
        F.count("*").alias("n_items"),
    )


def ats_keyword_match(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """J2/A5 analogue at table scale: broadcast JD keyword list matched
    by substring containment against each document (scorer.py:197-206
    keyword containment + :219-240 ratio scoring), ATS-style score out
    of 100 with the reference's skills/keywords weighting collapsed to
    the keyword tier."""
    docs = _t(spark, sf_dir, "documents")
    required = ["join", "filter", "window", "partition", "shuffle"]
    preferred = ["merge", "batch", "stream"]
    lower = F.lower(F.col("text"))
    req_hits = sum(
        F.when(F.instr(lower, kw) > 0, 1).otherwise(0) for kw in required
    )
    pref_hits = sum(
        F.when(F.instr(lower, kw) > 0, 1).otherwise(0) for kw in preferred
    )
    # required 70% + preferred 30%; explicit floor — Spark's int cast
    # truncates while DuckDB's rounds, and Python int() (scorer.py:219)
    # truncates, so floor is the portable spelling
    score = F.floor(
        (req_hits / len(required)) * 70 + (pref_hits / len(preferred)) * 30
    ).cast("int")
    return docs.select(
        "doc_id",
        req_hits.cast("int").alias("matched_required"),
        pref_hits.cast("int").alias("matched_preferred"),
        score.alias("ats_score"),
        F.when(score >= 85, "excellent")
        .when(score >= 70, "good")
        .when(score >= 50, "acceptable")
        .otherwise("poor")
        .alias("bucket"),
    )


def candidate_pairwise(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """J3 analogue: pairwise comparison of top candidates — self-join of
    the ATS scores over a bounded id range with set ops on matched
    keyword bitmasks (ranker.py:167-252 winner rule: ties → first)."""
    scored = ats_keyword_match(spark, sf_dir).filter(F.col("doc_id") < 20)
    a, b = scored.alias("a"), scored.alias("b")
    j = a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
    diff = F.col("a.ats_score") - F.col("b.ats_score")
    return j.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.ats_score").alias("score_a"),
        F.col("b.ats_score").alias("score_b"),
        diff.cast("int").alias("score_diff"),
        F.when(diff >= 0, 1).otherwise(2).alias("winner"),
    )


def revenue_by_nation(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """TPC-H Q5 shape: multi-join (fact ⋈ fact ⋈ dims) revenue rollup
    by customer nation, date-bounded; dims broadcast."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    )
    return j.groupBy("n_name").agg(
        _cents_revenue().alias("revenue"),
        F.count("*").alias("n_items"),
    )


def text_preview(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """W3 truncation: 100-char word-snapped preview with ellipsis,
    exactly the reference's get_text_preview semantics
    (extractor.py:209-223: text[:N].rsplit(' ', 1)[0] + '...')."""
    docs = _t(spark, sf_dir, "documents")
    head = F.substring("text", 1, 100)
    snapped = F.regexp_replace(head, " [^ ]*$", "")
    return docs.select(
        "doc_id",
        F.when(F.length("text") <= 100, F.col("text"))
        .otherwise(F.concat(snapped, F.lit("...")))
        .alias("preview"),
    )


def date_normalize(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """T14 natively: render o_orderdate into US/EU string styles, then
    re-normalize through the coalesce(to_date(...)) chain in the
    reference's rule order (ISO → m/d/Y → d.m.Y,
    post_processor.py:50-62) and check the round trip."""
    rendered = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("truth"),
        F.date_format("o_orderdate", "MM/dd/yyyy").alias("rendered_us"),
        F.date_format("o_orderdate", "dd.MM.yyyy").alias("rendered_eu"),
    )

    def chain(name: str):
        # try_to_date: Spark 4's to_date raises on unparseable input
        return F.coalesce(
            F.expr(f"try_to_date({name}, 'yyyy-MM-dd')"),
            F.expr(f"try_to_date({name}, 'MM/dd/yyyy')"),
            F.expr(f"try_to_date({name}, 'dd.MM.yyyy')"),
        )

    return rendered.select(
        "o_orderkey",
        "rendered_us",
        "rendered_eu",
        chain("rendered_us").alias("parsed_us"),
        chain("rendered_eu").alias("parsed_eu"),
        (
            (chain("rendered_us") == F.col("truth"))
            & (chain("rendered_eu") == F.col("truth"))
        ).alias("roundtrip_ok"),
    )


def validation_score(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """A3 weighted validation score (validator.py:564-605) at table
    scale: derive deterministic per-order field scores + issue
    severities (P4-style predicates over order columns), then apply the
    native weighted-mean/penalty operator
    (engine.spark.validation.with_validation_score)."""
    from engine.spark.validation import with_validation_score

    orders = _t(spark, sf_dir, "orders")
    fs = F.array(
        F.struct(
            F.lit("invoice_number").alias("field_name"),
            F.when(F.col("o_orderkey") % 7 == 0, 0.6).otherwise(1.0).alias("score"),
        ),
        F.struct(
            F.lit("total_amount").alias("field_name"),
            F.when(F.col("o_totalprice") > 300000, 0.7).otherwise(0.95).alias("score"),
        ),
        F.struct(
            F.lit("invoice_date").alias("field_name"),
            F.lit(0.9).alias("score"),
        ),
        F.struct(
            F.lit("customer_name").alias("field_name"),
            F.when(F.col("o_custkey") % 5 == 0, 0.0).otherwise(0.9).alias("score"),
        ),
    )
    issues = F.filter(
        F.array(
            F.when(F.col("o_custkey") % 5 == 0, "critical"),
            F.when(F.col("o_totalprice") > 300000, "warning"),
            F.when(F.col("o_orderkey") % 7 == 0, "info"),
        ),
        lambda x: x.isNotNull(),
    )
    scored = with_validation_score(
        orders.select(
            "o_orderkey",
            fs.alias("field_scores"),
            issues.alias("issue_severities"),
        )
    )
    return scored.select(
        "o_orderkey",
        F.size("issue_severities").alias("n_issues"),
        "validation_score",
    )


def order_rollup(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """A7 multi-dimensional roll-up (SURVEY.md §2.4 "grouping-sets
    style"): subtotals over (status, priority) hierarchy via ROLLUP —
    one shuffle, all grouping sets computed in a single pass with
    map-side partial aggregation; grouping_id disambiguates subtotal
    rows from real NULL keys."""
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count("*").alias("n_orders"),
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("revenue"),
    )


def candidate_rank(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """W1 + A7 closing the rank_candidates lifecycle (resume.py:605-610,
    ranker.py:86-114): ATS-scored candidates ranked per cohort with
    row_number (ties broken by doc_id like the reference's stable sort),
    recommendation from the top-score distribution bucket. Cohort =
    doc_id % 10 stands in for the per-job grouping — the window
    partitions by it exactly as production partitions by job_id."""
    scored = ats_keyword_match(spark, sf_dir).withColumn(
        "cohort", (F.col("doc_id") % 10).cast("int")
    )
    w = Window.partitionBy("cohort").orderBy(
        F.desc("ats_score"), F.asc("doc_id")
    )
    return scored.select(
        "cohort",
        "doc_id",
        "ats_score",
        F.row_number().over(w).cast("int").alias("rnk"),
    ).filter(F.col("rnk") <= 3)


# deterministic skill assignment for skill_match_tiers: every doc gets
# vocab[doc_id % 8] and vocab[(doc_id*7+3) % 8]
SKILL_VOCAB = (
    "python", "k8s", "reactjs", "postgresql",
    "java", "ml", "tensorflow", "go",
)
JD_SKILLS = (
    "kubernetes", "python", "react", "sql", "machine learning", "javascript",
)


def skill_match_tiers(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """J1 three-tier fuzzy skill matching as a real driver-visible join
    (scorer.py:72-97,155-196): candidates' skills (deterministic picks
    from SKILL_VOCAB per doc_id) vs a JD skill list, matched exact >
    partial (substring either way) > synonym (broadcast synonym dim),
    one row per (candidate, jd_skill) at the best tier."""
    from engine.spark.validation import skill_match_join

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    vocab = F.array(*[F.lit(s) for s in SKILL_VOCAB])
    n = len(SKILL_VOCAB)
    resume_skills = docs.select(
        F.col("doc_id").alias("candidate_id"),
        F.explode(
            F.array_distinct(
                F.array(
                    F.element_at(vocab, (F.col("doc_id") % n + 1).cast("int")),
                    F.element_at(
                        vocab, ((F.col("doc_id") * 7 + 3) % n + 1).cast("int")
                    ),
                )
            )
        ).alias("skill"),
    )
    jd = spark.createDataFrame([(s,) for s in JD_SKILLS], "skill string")
    return skill_match_join(spark, resume_skills, jd)


FUNNEL_STEPS = ("view", "click", "purchase")


def event_funnel(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Ordered multi-step funnel (view → click → purchase) with strict
    temporal sequencing: a user converts a step only with an event of
    that type strictly after their earliest completion of the previous
    step. Three sequential min-over-user windows share one exchange on
    the high-cardinality user key (Spark plans a single shuffle + sort,
    then stacked window frames), the per-user table is one distinct
    projection, and the final step table is |steps| rows."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = ev.withColumn(
        "t0",
        F.min(
            F.when(F.col("event_type") == FUNNEL_STEPS[0], F.col("ts"))
        ).over(w),
    )
    staged = staged.withColumn(
        "t1",
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL_STEPS[1])
                & (F.col("ts") > F.col("t0")),
                F.col("ts"),
            )
        ).over(w),
    )
    staged = staged.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL_STEPS[2])
                & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    # t0/t1/t2 are constant per user, so a groupBy(user_id) collapses
    # to one row per user WITHOUT a new shuffle (the window already
    # hash-partitioned on user_id; a distinct over 4 columns would
    # re-exchange on a wider key — verified in the executed plan:
    # one Exchange total before the final global agg)
    per_user = staged.groupBy("user_id").agg(
        F.max("t0").alias("t0"),
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
    )
    counts = per_user.agg(
        F.count(F.col("t0")).alias("c0"),
        F.count(F.col("t1")).alias("c1"),
        F.count(F.col("t2")).alias("c2"),
    )
    steps = counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("step_idx"),
                    F.lit(FUNNEL_STEPS[0]).alias("step"),
                    F.col("c0").alias("users"),
                    F.col("c0").alias("prev"),
                    F.col("c0").alias("first"),
                ),
                F.struct(
                    F.lit(1).alias("step_idx"),
                    F.lit(FUNNEL_STEPS[1]).alias("step"),
                    F.col("c1").alias("users"),
                    F.col("c0").alias("prev"),
                    F.col("c0").alias("first"),
                ),
                F.struct(
                    F.lit(2).alias("step_idx"),
                    F.lit(FUNNEL_STEPS[2]).alias("step"),
                    F.col("c2").alias("users"),
                    F.col("c1").alias("prev"),
                    F.col("c0").alias("first"),
                ),
            )
        ).alias("s")
    )
    return steps.select(
        F.col("s.step_idx").alias("step_idx"),
        F.col("s.step").alias("step"),
        F.col("s.users").cast("long").alias("users"),
        # try_divide: an empty / non-converting funnel (prev or first = 0)
        # yields NULL rates, matching the DuckDB twin, instead of an
        # ANSI-mode DIVIDE_BY_ZERO crash.
        F.round(F.try_divide(F.col("s.users"), F.col("s.prev")), 6).alias(
            "conv_from_prev"
        ),
        F.round(F.try_divide(F.col("s.users"), F.col("s.first")), 6).alias(
            "conv_from_first"
        ),
    )


WEEK_US = 604_800_000_000


def retention_cohorts(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Classic cohort retention matrix: users grouped by first-seen
    week, counted in each subsequent activity week, with retention as
    a share of the cohort. One scan, one user-keyed aggregation
    (first-seen week + distinct active weeks in the same pass), then a
    cohort-sized groupBy — nothing event-sized shuffles twice. Week
    bucketing is integer microseconds so both engines compute
    identical buckets."""
    ev = _t(spark, sf_dir, "events").select(
        # events.ts is TIMESTAMP_NTZ; the session tz is pinned UTC so
        # the cast is a no-op reinterpretation, matching epoch_us(ts)
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    # ONE scan + ONE user-keyed exchange: first-seen week and the
    # distinct active-week set come out of the same aggregate
    # (collect_set state is bounded by corpus duration in weeks),
    # replacing the two-scan + distinct + join plan whose second
    # exchange keyed on (user_id, week) could not co-locate with the
    # first — verified in the executed plan
    per_user = ev.groupBy("user_id").agg(
        F.floor(F.min("us") / WEEK_US).alias("cohort_week"),
        F.collect_set(F.floor(F.col("us") / WEEK_US)).alias("weeks"),
    )
    j = per_user.select(
        "cohort_week", F.explode("weeks").alias("week")
    )
    cohort = j.groupBy(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
    ).agg(F.count("*").cast("long").alias("users"))
    base = Window.partitionBy("cohort_week")
    return cohort.select(
        "cohort_week",
        "week_offset",
        "users",
        F.round(
            F.col("users")
            / F.max(F.when(F.col("week_offset") == 0, F.col("users"))).over(
                base
            ),
            6,
        ).alias("retention"),
    )


def nation_trade_volume(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """TPC-H Q7 shape: cross-border shipping volume between supplier
    and customer nations by ship year — the two-role dimension join
    (nation joined once per side). Dims broadcast; revenue is the
    exact integer-cents sum; the only corpus-sized exchange is the
    final (supp_nation, cust_nation, year) aggregate with map-side
    partials."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        _cents_revenue().alias("revenue"),
        F.count("*").alias("n_items"),
    )


DAY_US = 86_400_000_000


def user_engagement(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Daily engagement: DAU, trailing-7-day WAU, and stickiness
    (DAU/WAU) per day — the product-analytics staple.

    The trailing-window distinct is computed WITHOUT a distinct-over-
    range-window (unsupported) or a 7-way self-join: each distinct
    (user, day) row contributes itself to the 7 window days it falls
    in (explode of a 7-element sequence), and after the (user,
    window-day) dedup the WAU is a plain count — shuffle volume is
    user-days × 7, linear in activity, partition-friendly at any
    scale. Day buckets are integer microsecond arithmetic, identical
    in both engines."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(DAY_US)
        ).alias("day"),
    )
    ud = ev.distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + F.lit(6))
            ).alias("wday"),
        )
        .distinct()
    )
    wau = contrib.groupBy(F.col("wday").alias("day")).agg(
        F.count("*").cast("long").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


def event_value_trend(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Daily event value with a trailing-7-day moving average — the
    RANGE-frame window (rangeBetween on the day value, so calendar
    gaps shrink the window rather than sliding over them, unlike a
    ROWS frame). The frame runs over the per-day aggregate (~n_days
    rows), never raw events; the per-day aggregate itself is the only
    event-sized exchange. Sums are exact integer cents."""
    ev = _t(spark, sf_dir, "events").select(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(DAY_US)
        ).alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    daily = ev.groupBy("day").agg(
        F.sum("vc").alias("vc_sum"), F.count("*").cast("long").alias("n_events")
    )
    w = Window.orderBy("day").rangeBetween(-6, 0)
    return daily.select(
        "day",
        (F.col("vc_sum").cast("double") / 100).alias("day_value"),
        "n_events",
        F.round(
            (F.sum("vc_sum").over(w).cast("double") / 100)
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("ma7_value"),
    )


def order_percentiles_by_segment(
    spark: "SparkSession", sf_dir: str
) -> "DataFrame":
    """Decile table of order values WITHIN each market segment —
    percent_rank (ties share a rank, so the bucketing is deterministic
    without a tie-break column) bucketed to 10 deciles, then per
    (segment, decile) counts and exact price bounds. The window
    partitions on the segment key, so each partition sorts locally —
    no global sort at any scale."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice")
    pr = F.percent_rank().over(w)
    decile = F.least(F.floor(pr * 10).cast("int"), F.lit(9))
    return (
        j.select("c_mktsegment", "o_totalprice", decile.alias("decile"))
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


def supplier_balance_outliers(
    spark: "SparkSession", sf_dir: str, z_threshold: float = 2.0
) -> "DataFrame":
    """Statistical outlier detection with DETERMINISTIC moments:
    suppliers whose account balance sits more than ``z_threshold``
    sample standard deviations from their nation's mean. The moments
    come from exact integer-cent sums (sum and sum-of-squares are
    longs — cents² × suppliers stays far under 2^63 at any realistic
    dim size), so mean/std/z are single divisions of exact integers:
    bit-identical in both engines, unlike a native stddev whose float
    accumulation order differs per partitioning. One supplier-keyed
    aggregate + a broadcast of the per-nation moment table."""
    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey",
        F.round(F.col("s_acctbal") * 100).cast("long").alias("bc"),
    )
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    m = sup.groupBy("s_nationkey").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("bc").alias("s1"),
        F.sum(F.col("bc") * F.col("bc")).alias("s2"),
    ).filter(F.col("n") >= 2)
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / (F.col("n") - 1)
    # var == 0 (all balances in a nation identical) must yield NULL z, not
    # an ANSI DIVIDE_BY_ZERO crash; NULL fails the |z| filter, matching the
    # DuckDB twin where NULL/0-stddev rows are silently filtered.
    z = F.when(var > 0, (F.col("bc").cast("double") - mean) / F.sqrt(var))
    return (
        sup.join(F.broadcast(m), "s_nationkey")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.abs(z) > F.lit(z_threshold))
        .select(
            "s_suppkey",
            "n_name",
            (F.col("bc").cast("double") / 100).alias("acctbal"),
            F.round(z, 4).alias("z"),
        )
    )


def event_volume_anomalies(
    spark: "SparkSession", sf_dir: str, z_threshold: float = 2.0
) -> "DataFrame":
    """Volume-anomaly days per event type — the monitoring query a
    pipeline alert reads: days whose event count deviates more than
    ``z_threshold`` sample standard deviations from that type's mean
    daily volume. Counts are integers, so the per-type moments (sum,
    sum of squares over daily counts) are exact longs and the z-scores
    are deterministic single divisions — same discipline as
    supplier_balance_outliers. Two bounded aggregates ((type, day),
    then type) plus a broadcast moment join; nothing event-sized
    shuffles twice."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(DAY_US)
        ).alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("c")
    )
    m = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    ).filter(F.col("n") >= 2)
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / (F.col("n") - 1)
    # constant daily volume (var == 0) = "no anomalies", not a crash:
    # NULL z fails the filter on both engines (see supplier_balance_outliers).
    z = F.when(var > 0, (F.col("c").cast("double") - mean) / F.sqrt(var))
    return (
        daily.join(F.broadcast(m), "event_type")
        .filter(F.abs(z) > F.lit(z_threshold))
        .select(
            "event_type",
            "day",
            F.col("c").alias("n_events"),
            F.round(mean, 4).alias("mean_daily"),
            F.round(z, 4).alias("z"),
        )
    )
