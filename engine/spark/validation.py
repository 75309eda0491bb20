"""Native validation & candidate-analysis expressions (P4, A8, A9, J1).

Mirrors engine.kernel.validators with pure Catalyst expressions so the
checks run JVM-side at table scale; tests assert native == kernel on
the overlap (SURVEY.md §7.1.4). The invoice fields arrive as the
extraction stage's fields_json column and are projected through
from_json with an explicit schema (T12 strategy-1 natively).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql import types as T

from engine.kernel.scoring import SKILL_SYNONYMS
from engine.kernel.validators import VALID_CURRENCIES

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

INVOICE_FIELDS_SCHEMA = T.StructType(
    [
        T.StructField("invoice_number", T.StringType()),
        T.StructField("invoice_date", T.StringType()),
        T.StructField("due_date", T.StringType()),
        T.StructField("vendor_name", T.StringType()),
        T.StructField("subtotal", T.DoubleType()),
        T.StructField("tax_amount", T.DoubleType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("currency", T.StringType()),
    ]
)

AS_OF = "2026-01-01"  # frozen 'today' (SURVEY.md §7.3.2)


def _issues(*pairs):
    """Build array<string> of issue tags from (condition, tag) pairs."""
    return F.filter(
        F.array(*[F.when(cond, F.lit(tag)).otherwise(F.lit(None)) for cond, tag in pairs]),
        lambda x: x.isNotNull(),
    )


def validate_invoice_extractions(results: "DataFrame") -> "DataFrame":
    """P4 natively over extraction output (rlike / length / datediff /
    allowlist), keyed by turn identity."""
    f = F.from_json("fields_json", INVOICE_FIELDS_SCHEMA)
    df = results.filter(F.col("doc_type") == "invoice").select(
        "conv_id", "turn_idx", f.alias("f")
    )
    num = F.col("f.invoice_number")
    dt = F.expr("try_to_date(f.invoice_date, 'yyyy-MM-dd')")
    amt = F.col("f.total_amount")
    cur = F.upper(F.col("f.currency"))
    return df.select(
        "conv_id",
        "turn_idx",
        _issues(
            (num.isNull() | (num == ""), "missing"),
            (num.isNotNull() & ~num.rlike(r"^[A-Za-z0-9\-_/]+$"), "bad_format"),
            (num.isNotNull() & ~F.length(num).between(2, 50), "bad_length"),
        ).alias("invoice_number_issues"),
        _issues(
            (F.col("f.invoice_date").isNull(), "missing"),
            (F.col("f.invoice_date").isNotNull() & dt.isNull(), "unparseable"),
            (dt > F.lit(AS_OF), "future_date"),
            (F.datediff(F.lit(AS_OF), dt) > 5 * 365, "too_old"),
        ).alias("invoice_date_issues"),
        _issues(
            (amt.isNull(), "missing"),
            (amt < 0, "negative"),
            (amt == 0, "zero"),
            (amt > 10_000_000, "implausibly_large"),
        ).alias("total_amount_issues"),
        _issues(
            (cur.isNull(), "missing"),
            (cur.isNotNull() & ~cur.isin(*VALID_CURRENCIES), "unknown_code"),
        ).alias("currency_issues"),
    )


def issue_scalar(col) -> "F.Column":
    """Driver-canonicalizable form of an issue array: sorted tags joined
    with ';' ('' when clean). pandas can sort strings but not lists, so
    contract queries emit this instead of array<string>."""
    return F.concat_ws(";", F.sort_array(col))


def scalarize_issue_columns(df: "DataFrame") -> "DataFrame":
    """Replace every *_issues array column with its issue_scalar twin."""
    out = df
    for name, dtype in df.dtypes:
        if name.endswith("_issues") and dtype.startswith("array"):
            out = out.withColumn(name, issue_scalar(F.col(name)))
    return out


def validate_invoice_fields_table(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """P4 at table scale with a full DuckDB oracle: deterministic
    synthetic invoice fields derived from the orders table (planted
    nulls / bad formats / future + stale dates / negative + zero +
    implausible amounts / unknown currency codes), validated by the
    same native predicates as validate_invoice_extractions
    (validator.py:171-266 semantics). Map-only — zero shuffles."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    num = (
        F.when(k % 97 == 0, F.lit(None).cast("string"))
        .when(k % 13 == 0, F.concat(F.lit("INV "), k.cast("string")))
        .when(k % 31 == 0, F.lit("A"))
        .otherwise(F.concat(F.lit("INV-"), k.cast("string")))
    )
    date_str = (
        F.when(k % 41 == 0, F.lit(None).cast("string"))
        .when(k % 19 == 0, F.lit("2026-02-30"))   # invalid calendar day
        .when(k % 23 == 0, F.lit("2026-06-01"))   # future vs AS_OF
        .when(k % 29 == 0, F.lit("2019-01-01"))   # > 5y before AS_OF
        .otherwise(
            F.date_format(
                F.date_add(F.lit("2025-01-01").cast("date"), (k % 300).cast("int")),
                "yyyy-MM-dd",
            )
        )
    )
    amt = (
        F.when(k % 37 == 0, F.lit(None).cast("double"))
        .when(k % 17 == 0, -F.col("o_totalprice"))
        .when(k % 11 == 0, F.lit(0.0))
        .when(k % 43 == 0, F.lit(99_000_000.0))
        .otherwise(F.round("o_totalprice", 2))
    )
    cur_raw = (
        F.when(k % 5 == 0, F.lit("USD"))
        .when(k % 5 == 1, F.lit("EUR"))
        .when(k % 5 == 2, F.lit("XYZ"))
        .when(k % 5 == 3, F.lit(None).cast("string"))
        .otherwise(F.lit("pkr"))
    )
    derived = orders.select(
        "o_orderkey",
        num.alias("num"),
        date_str.alias("date_str"),
        amt.alias("amt"),
        F.upper(cur_raw).alias("cur"),
    )
    dt = F.expr("try_to_date(date_str, 'yyyy-MM-dd')")
    n = F.col("num")
    a = F.col("amt")
    c = F.col("cur")
    num_issues = _issues(
        (n.isNull() | (n == ""), "missing"),
        (n.isNotNull() & ~n.rlike(r"^[A-Za-z0-9\-_/]+$"), "bad_format"),
        (n.isNotNull() & ~F.length(n).between(2, 50), "bad_length"),
    )
    date_issues = _issues(
        (F.col("date_str").isNull(), "missing"),
        (F.col("date_str").isNotNull() & dt.isNull(), "unparseable"),
        (dt > F.lit(AS_OF), "future_date"),
        (F.datediff(F.lit(AS_OF), dt) > 5 * 365, "too_old"),
    )
    amt_issues = _issues(
        (a.isNull(), "missing"),
        (a < 0, "negative"),
        (a == 0, "zero"),
        (a > 10_000_000, "implausibly_large"),
    )
    cur_issues = _issues(
        (c.isNull(), "missing"),
        (c.isNotNull() & ~c.isin(*VALID_CURRENCIES), "unknown_code"),
    )
    return derived.select(
        "o_orderkey",
        issue_scalar(num_issues).alias("invoice_number_issues"),
        issue_scalar(date_issues).alias("invoice_date_issues"),
        issue_scalar(amt_issues).alias("total_amount_issues"),
        issue_scalar(cur_issues).alias("currency_issues"),
        (
            F.size(num_issues) + F.size(date_issues)
            + F.size(amt_issues) + F.size(cur_issues)
        ).cast("int").alias("n_issues"),
    )


def candidate_analysis(resumes: "DataFrame") -> "DataFrame":
    """A8/A9/W4 natively over an ``experience array<struct<...>>``
    column: short-stint counting via filter(), average tenure via
    aggregate(), most-recent pick via element_at (W4), total years."""
    exp = F.col("experience")
    short_stints = F.size(
        F.filter(
            exp,
            lambda j: (~j["is_current"])
            & (~j["is_internship"])
            & j["duration_months"].isNotNull()
            & (j["duration_months"] > 0)
            & (j["duration_months"] < 12),
        )
    )
    past = F.filter(exp, lambda j: ~j["is_current"])
    tenure_vals = F.filter(
        F.transform(past, lambda j: j["duration_months"]),
        lambda m: m.isNotNull() & (m != 0),
    )
    avg_tenure = F.aggregate(
        tenure_vals, F.lit(0.0), lambda acc, m: acc + m
    ) / F.greatest(F.size(tenure_vals), F.lit(1))
    latest = F.element_at(exp, 1)
    stale = (
        (F.size(exp) > 0)
        & ~latest["is_current"]
        & ~F.coalesce(latest["end_date"], F.lit("")).rlike("2024|2025|2026")
    )
    flags = _issues(
        (short_stints >= 3, "job_hopping_high"),
        ((short_stints == 2), "job_hopping"),
        ((F.size(past) >= 4) & (F.size(tenure_vals) > 0) & (avg_tenure < 18), "low_avg_tenure"),
        (stale, "employment_gap"),
    )
    total_years = F.round(
        F.aggregate(exp, F.lit(0.0), lambda a, j: a + F.coalesce(j["duration_months"], F.lit(0.0)))
        / 12.0,
        1,
    )
    return resumes.withColumn("red_flags", flags).withColumn(
        "total_experience_years", total_years
    )


def _normalize_skill_expr(col) -> "F.Column":
    """normalize_skill natively (scorer.py:49-51): lower → strip →
    '-'/'_' → space, in exactly that order (a leading '-' therefore
    leaves a leading space, like the reference)."""
    return F.replace(
        F.replace(F.trim(F.lower(col)), F.lit("-"), F.lit(" ")),
        F.lit("_"), F.lit(" "),
    )


def harvest_resume_skills(resumes: "DataFrame") -> "DataFrame":
    """SO1 skill-set union at table scale (scorer.py:121-135): declared
    ``skills`` ∪ ``technical_skills`` ∪ capitalized-word harvest from
    ``experience[*].highlights`` (regexp_extract_all of
    \\b[A-Z][a-zA-Z+#]+\\b), all normalized + deduped — one map-only
    pass with higher-order functions, no Python. Adds a sorted
    ``all_skills`` column (sorted for deterministic comparison; the
    reference keeps a set)."""
    harvested = F.flatten(
        F.transform(
            F.col("experience"),
            lambda e: F.flatten(
                F.transform(
                    F.coalesce(e["highlights"], F.array().cast("array<string>")),
                    lambda h: F.regexp_extract_all(
                        h, F.lit(r"\b[A-Z][a-zA-Z+#]+\b"), 0
                    ),
                )
            ),
        )
    )
    unioned = F.concat(
        F.coalesce(F.col("skills"), F.array().cast("array<string>")),
        F.coalesce(F.col("technical_skills"), F.array().cast("array<string>")),
        harvested,
    )
    return resumes.withColumn(
        "all_skills",
        F.array_sort(
            F.array_distinct(F.transform(unioned, _normalize_skill_expr))
        ),
    )


def synonym_table(spark: "SparkSession") -> "DataFrame":
    """J1 synonym dimension: (variant → canonical) rows expanded from
    the kernel's table — the broadcast side of the skill join."""
    rows = []
    for canonical, syns in SKILL_SYNONYMS.items():
        rows.append((canonical, canonical))
        for s in syns:
            rows.append((s, canonical))
    return spark.createDataFrame(rows, "variant string, canonical string")


def skill_match_join(spark: "SparkSession", resume_skills: "DataFrame",
                     jd_skills: "DataFrame") -> "DataFrame":
    """J1 at table scale: three match tiers as real joins —
    exact (equality), synonym (both sides mapped through the broadcast
    synonym dim), partial (substring theta-join) — returning the best
    tier per (candidate, jd_skill) with the reference's precedence
    exact > partial > synonym (scorer.py:72-97)."""
    syn = F.broadcast(synonym_table(spark))
    r = resume_skills.select(
        "candidate_id", F.lower(F.trim("skill")).alias("r_skill")
    )
    j = jd_skills.select(F.lower(F.trim("skill")).alias("jd_skill"))

    exact = r.join(j, r.r_skill == j.jd_skill).select(
        "candidate_id", "jd_skill", F.lit("exact").alias("match_type")
    )
    contains_either = (F.instr(r.r_skill, j.jd_skill) > 0) | (
        F.instr(j.jd_skill, r.r_skill) > 0
    )
    partial = r.join(
        j, (r.r_skill != j.jd_skill) & contains_either
    ).select("candidate_id", "jd_skill", F.lit("partial").alias("match_type"))
    r_canon = r.join(syn, r.r_skill == syn.variant).select(
        "candidate_id", F.col("canonical").alias("r_canon")
    )
    j_canon = j.join(syn, j.jd_skill == syn.variant).select(
        "jd_skill", F.col("canonical").alias("j_canon")
    )
    synonym = r_canon.join(j_canon, r_canon.r_canon == j_canon.j_canon).select(
        "candidate_id", "jd_skill", F.lit("synonym").alias("match_type")
    )

    tier = F.when(F.col("match_type") == "exact", 0).when(
        F.col("match_type") == "partial", 1
    ).otherwise(2)
    from pyspark.sql import Window

    w = Window.partitionBy("candidate_id", "jd_skill").orderBy(tier)
    return (
        exact.unionByName(partial).unionByName(synonym)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


def with_validation_score(
    df: "DataFrame",
    field_scores_col: str = "field_scores",
    issues_col: str = "issue_severities",
    out_col: str = "validation_score",
) -> "DataFrame":
    """A3 weighted validation score natively (validator.py:564-605).

    Expects ``field_scores_col: array<struct<field_name:string,
    score:double>>`` and ``issues_col: array<string>`` (severities).
    Weighted mean over the FIELD_WEIGHTS table (unknown fields 0.5,
    empty-weight base 0.5, no-fields 0.0) minus capped severity
    penalties (critical 0.3 / warning 0.1 / info 0.02, cap 0.5),
    floored at 0, rounded to 3 — identical to
    engine.kernel.scoring.overall_validation_score (parity-tested).
    """
    from engine.kernel.scoring import FIELD_WEIGHTS, ISSUE_PENALTIES

    wmap = F.create_map(
        *[F.lit(x) for kv in FIELD_WEIGHTS.items() for x in kv]
    )
    pmap = F.create_map(
        *[F.lit(x) for kv in ISSUE_PENALTIES.items() for x in kv]
    )
    fs = F.col(field_scores_col)
    weight = lambda s: F.coalesce(F.element_at(wmap, s["field_name"]), F.lit(0.5))
    weighted_sum = F.aggregate(
        fs, F.lit(0.0), lambda acc, s: acc + s["score"] * weight(s)
    )
    total_weight = F.aggregate(fs, F.lit(0.0), lambda acc, s: acc + weight(s))
    base = F.when(total_weight == 0, F.lit(0.5)).otherwise(
        weighted_sum / total_weight
    )
    penalty = F.least(
        F.aggregate(
            F.col(issues_col),
            F.lit(0.0),
            lambda acc, s: acc + F.coalesce(F.element_at(pmap, s), F.lit(0.0)),
        ),
        F.lit(0.5),
    )
    score = F.when(F.size(fs) <= 0, F.lit(0.0)).otherwise(
        F.round(F.greatest(base - penalty, F.lit(0.0)), 3)
    )
    return df.withColumn(out_col, score)


# --- career progression (analyzer.py:443-470, candidate.py:72-80) ---

def synthetic_resume_experience(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Deterministic experience arrays derived from doc_id (the same
    synthetic-derivation pattern every other candidate query uses):
    1-5 roles, most-recent first, each with duration / level / company
    / gap-to-next-older — the input shape the reference's candidate
    analyzer receives from parsed resumes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    d = F.col("doc_id")
    n = (d % 5 + 1).cast("int")
    exp = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            (6 + (d * 7 + i * 11) % 48).cast("int").alias("duration_months"),
            ((d + 2 * i) % 4).cast("int").alias("level"),
            F.concat(F.lit("company-"), ((d + 3 * i) % 7).cast("string")).alias(
                "company"
            ),
            ((d + 5 * i) % 9).cast("int").alias("gap_after_months"),
        ),
    )
    return docs.select("doc_id", exp.alias("experience"))


def career_progression_cols(resumes: "DataFrame") -> "DataFrame":
    """CareerProgression natively over an ``experience`` array column —
    the deterministic counterpart of the reference's LLM-filled
    response model (analyzer.py:443-470; schema candidate.py:72-80),
    numerically identical to engine.kernel.scoring.career_progression
    (parity-tested). One map-only pass of higher-order functions: no
    shuffle, no Python — the 100 TB shape for a per-row derivation."""
    from engine.kernel.scoring import CAREER_TITLES

    exp = F.col("experience")
    n = F.size(exp)
    durs = F.transform(exp, lambda j: j["duration_months"])
    levels = F.transform(exp, lambda j: j["level"])
    comps = F.transform(exp, lambda j: j["company"])
    # slice length clamps at 0: an empty experience array would
    # otherwise feed slice a -1 length (runtime error, not null)
    n1 = F.greatest(n - 1, F.lit(0))
    gaps = F.slice(F.transform(exp, lambda j: j["gap_after_months"]), 1, n1)
    # chronological level step = newer minus next-older (stored order
    # is most-recent first)
    climbs = F.zip_with(
        F.slice(levels, 1, n1),
        F.slice(levels, 2, n1),
        lambda newer, older: newer - older,
    )
    any_up = F.exists(climbs, lambda c: c > 0)
    any_down = F.exists(climbs, lambda c: c < 0)
    traj = (
        F.when(any_up & any_down, "mixed")
        .when(any_up, "upward")
        .when(any_down, "downward")
        .otherwise("lateral")
    )
    # try_element_at + coalesce: an EMPTY experience array (failed
    # resume parse) must yield the kernel's degenerate lateral record,
    # not an ANSI INVALID_ARRAY_INDEX crash
    recent_level = F.try_element_at(levels, F.lit(1))
    earliest_level = F.try_element_at(levels, F.lit(-1))
    n_companies = F.size(F.array_distinct(comps)).cast("int")
    # empty history → ''; a POPULATED row with an out-of-range level
    # must still fail loudly (ANSI element_at), matching the kernel's
    # IndexError — a blanket coalesce would silently swallow that bug
    title = F.when(n == 0, F.lit("")).otherwise(
        F.element_at(
            F.array(*[F.lit(t) for t in CAREER_TITLES]), recent_level + 1
        )
    )
    return resumes.select(
        "doc_id",
        n.cast("int").alias("n_roles"),
        F.coalesce(
            F.round(
                F.try_divide(F.aggregate(durs, F.lit(0), lambda a, x: a + x), n),
                4,
            ),
            F.lit(0.0),
        ).alias("avg_tenure_months"),
        F.coalesce(F.array_max(durs), F.lit(0)).cast("int").alias(
            "longest_tenure_months"
        ),
        n_companies.alias("total_companies"),
        F.coalesce(F.array_max(gaps), F.lit(0)).cast("int").alias(
            "longest_gap_months"
        ),
        traj.alias("trajectory"),
        F.coalesce(
            (recent_level >= 2) & (recent_level > earliest_level),
            F.lit(False),
        ).alias("has_leadership_progression"),
        title.alias("most_recent_title"),
        F.concat(
            traj, F.lit(" trajectory across "), n_companies.cast("string"),
            F.lit(" companies over "), n.cast("string"), F.lit(" roles"),
        ).alias("progression_summary"),
    )


def career_progression_table(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """queries() entry: the generic operator applied to the
    deterministic synthetic experience table."""
    return career_progression_cols(synthetic_resume_experience(spark, sf_dir))


# --- candidate-fit response normalization (analyzer.py:401-505) ---

# list entries captured as RAW JSON text so each element is parsed
# (or skipped) individually — a whole-array struct schema would null
# the entire array on one malformed element, where the kernel (and
# the reference's per-item try/except) skip just that element
FIT_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("fit_score", T.IntegerType()),
        T.StructField("recommendation", T.StringType()),
        T.StructField("recommendation_text", T.StringType()),
        T.StructField("red_flags", T.ArrayType(T.StringType())),
        T.StructField("strengths", T.ArrayType(T.StringType())),
        T.StructField("executive_summary", T.StringType()),
    ]
)

_FLAG_SCHEMA = T.StructType(
    [
        T.StructField("flag_type", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
    ]
)

_STRENGTH_SCHEMA = T.StructType(
    [
        T.StructField("category", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("relevance_score", T.IntegerType()),
    ]
)


def _parse_items(raw_array_col, schema) -> "F.Column":
    """Per-item parse of raw-JSON list entries: keep only JSON objects
    (the kernel's isinstance-dict skip — non-object elements like
    strings/numbers are dropped, not nulled-into), then from_json each
    survivor."""
    objects = F.filter(
        F.coalesce(raw_array_col, F.array().cast("array<string>")),
        lambda s: F.trim(s).startswith("{"),
    )
    return F.transform(objects, lambda s: F.from_json(s, schema))


def parse_candidate_fit_cols(df: "DataFrame", json_col: str = "analysis_json") -> "DataFrame":
    """Native twin of engine.kernel.scoring.parse_candidate_fit (the
    reference's deterministic post-LLM normalization,
    analyzer.py:401-505): from_json + transform/when-chains, no
    Python. Emits driver-comparable scalars; array details are
    scalarized as ';'-joined strings."""
    from engine.kernel.scoring import RECOMMENDATION_TYPES, RED_FLAG_TYPES

    p = F.from_json(F.col(json_col), FIT_RESPONSE_SCHEMA)
    flags = _parse_items(p["red_flags"], _FLAG_SCHEMA)
    types_upper = [t.upper() for t in RED_FLAG_TYPES]
    norm_flags = F.transform(
        flags,
        lambda rf: F.struct(
            F.lower(
                F.when(
                    F.upper(F.coalesce(rf["flag_type"], F.lit("OTHER"))).isin(
                        types_upper
                    ),
                    F.coalesce(rf["flag_type"], F.lit("OTHER")),
                ).otherwise("OTHER")
            ).alias("flag_type"),
            F.when(
                F.lower(F.coalesce(rf["severity"], F.lit("medium"))).isin(
                    "high", "medium", "low"
                ),
                F.lower(F.coalesce(rf["severity"], F.lit("medium"))),
            )
            .otherwise("medium")
            .alias("severity"),
        ),
    )
    strengths = _parse_items(p["strengths"], _STRENGTH_SCHEMA)
    rec_upper = F.upper(F.coalesce(p["recommendation"], F.lit("NEEDS_REVIEW")))
    rec = F.lower(
        F.when(
            rec_upper.isin([r.upper() for r in RECOMMENDATION_TYPES]), rec_upper
        ).otherwise("NEEDS_REVIEW")
    )
    return df.select(
        "doc_id",
        F.coalesce(p["fit_score"], F.lit(50)).cast("int").alias("fit_score"),
        rec.alias("recommendation"),
        F.size(norm_flags).cast("int").alias("red_flag_count"),
        F.exists(norm_flags, lambda x: x["severity"] == "high").alias(
            "has_critical_red_flags"
        ),
        F.concat_ws(
            ";",
            F.transform(
                norm_flags,
                lambda x: F.concat_ws(":", x["flag_type"], x["severity"]),
            ),
        ).alias("flags_scalar"),
        F.size(strengths).cast("int").alias("n_strengths"),
        F.concat_ws(
            ";",
            F.transform(
                strengths,
                lambda s: F.coalesce(s["relevance_score"], F.lit(80)).cast(
                    "string"
                ),
            ),
        ).alias("strength_relevance"),
    )


def synthetic_fit_responses(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Deterministic LLM-shaped fit-response JSON per doc_id, covering
    the normalization branches: valid enums, unknown flag type + bad
    severity, lowercase recommendation, empty payload, multi-flag with
    default relevance."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    d = F.col("doc_id")
    fs = (d % 101).cast("string")
    rel = (d % 100).cast("string")
    m = d % 5
    payload = (
        F.when(
            m == 0,
            F.concat(
                F.lit('{"fit_score": '), fs,
                F.lit(
                    ', "recommendation": "STRONG_HIRE", "red_flags": '
                    '[{"flag_type": "SHORT_TENURE", "severity": "HIGH", '
                    '"title": "t"}], "strengths": [{"category": "skills", '
                    '"title": "x", "relevance_score": '
                ),
                rel, F.lit("}]}"),
            ),
        )
        .when(
            m == 1,
            F.lit(
                '{"recommendation": "maybe", "red_flags": '
                '[{"flag_type": "ALIEN", "severity": "urgent"}]}'
            ),
        )
        .when(
            m == 2,
            F.lit(
                '{"fit_score": 93, "recommendation": "good_fit", '
                '"red_flags": [], "strengths": []}'
            ),
        )
        .when(m == 3, F.lit("{}"))
        .otherwise(
            F.lit(
                '{"fit_score": 10, "recommendation": "NOT_RECOMMENDED", '
                '"red_flags": [{"flag_type": "employment_gap", "severity": '
                '"low"}, {"flag_type": "no_progression", "severity": "high"}]'
                ', "strengths": [{"title": "a"}, {"title": "b", '
                '"relevance_score": 95}]}'
            )
        )
    )
    return docs.select("doc_id", payload.alias("analysis_json"))


def candidate_fit_parse_table(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """queries() entry: the normalization applied to the synthetic
    responses."""
    return parse_candidate_fit_cols(synthetic_fit_responses(spark, sf_dir))
