"""P1/P4/A8/A9 kernel golden tests + native==kernel parity + the J1
skill-match joins + P2 error routing."""

from datetime import date

import pytest
from pyspark.sql import functions as F

from engine.kernel.validators import (
    check_amount,
    check_currency,
    check_invoice_date,
    check_invoice_number,
    red_flags,
    scanned_like,
    total_experience_years,
)


# ---------------- kernel golden (P4, validator.py:261-407,536-562) ----

def test_invoice_number_rules():
    assert check_invoice_number("INV-2024/001_A") == []
    assert check_invoice_number(None) == ["missing"]
    assert check_invoice_number("x") == ["bad_length"]
    assert check_invoice_number("bad number!") == ["bad_format"]
    assert check_invoice_number("a" * 51) == ["bad_length"]


def test_invoice_date_rules():
    as_of = date(2026, 1, 1)
    assert check_invoice_date("2025-06-01", as_of) == []
    assert check_invoice_date("2026-06-01", as_of) == ["future_date"]
    assert check_invoice_date("2019-01-01", as_of) == ["too_old"]
    assert check_invoice_date("not a date", as_of) == ["unparseable"]
    assert check_invoice_date(None, as_of) == ["missing"]


def test_amount_and_currency_rules():
    assert check_amount(100.5) == []
    assert check_amount(-1) == ["negative"]
    assert check_amount(0) == ["zero"]
    assert check_amount(20_000_000) == ["implausibly_large"]
    assert check_amount("abc") == ["not_numeric"]
    assert check_currency("usd") == []
    assert check_currency("XXX") == ["unknown_code"]
    assert check_currency(None) == ["missing"]


def test_scanned_like_heuristics():
    assert scanned_like(10, 300, 10) is True          # avg 30 < 50
    assert scanned_like(10, 5000, 2) is True          # coverage 0.2 < 0.3
    assert scanned_like(10, 1500, 10, 0.9) is True    # image + avg<200
    assert scanned_like(10, 30000, 10) is False


# ---------------- kernel golden (A8/A9, analyzer.py:264-349) ----------

def _job(months, current=False, intern=False, end="2025-06"):
    return {
        "duration_months": months,
        "is_current": current,
        "is_internship": intern,
        "end_date": end,
    }


def test_red_flags_job_hopping():
    assert "job_hopping" in red_flags([_job(6), _job(8), _job(40)])
    assert "job_hopping_high" in red_flags([_job(6), _job(8), _job(10)])
    # current/intern stints don't count
    assert red_flags([_job(6, current=True), _job(8, intern=True), _job(40)]) == []


def test_red_flags_tenure_and_gap():
    flags = red_flags([_job(12), _job(14), _job(15), _job(16)])
    assert "low_avg_tenure" in flags
    stale = red_flags([_job(40, end="2019-05")])
    assert "employment_gap" in stale
    assert red_flags([_job(40, current=True, end=None)]) == []


def test_total_experience_years():
    assert total_experience_years([_job(24), _job(18)]) == 3.5
    assert total_experience_years([]) == 0.0
    assert total_experience_years([_job(None), _job(6)]) == 0.5


# ---------------- native == kernel parity -----------------------------

EXP_SCHEMA = (
    "candidate_id long, experience array<struct<duration_months: double, "
    "is_current: boolean, is_internship: boolean, end_date: string>>"
)

CASES = [
    [_job(6), _job(8), _job(40)],
    [_job(6), _job(8), _job(10)],
    [_job(6, current=True), _job(8, intern=True), _job(40)],
    [_job(12), _job(14), _job(15), _job(16)],
    [_job(40, end="2019-05")],
    [_job(40, current=True, end=None)],
    [_job(24), _job(18)],
    [],
    [_job(None), _job(6)],
]


def test_native_candidate_analysis_matches_kernel(spark):
    from engine.spark.validation import candidate_analysis

    rows = [
        (
            i,
            [
                (
                    float(j["duration_months"]) if j["duration_months"] is not None else None,
                    j["is_current"], j["is_internship"], j["end_date"],
                )
                for j in case
            ],
        )
        for i, case in enumerate(CASES)
    ]
    df = spark.createDataFrame(rows, EXP_SCHEMA)
    out = {r.candidate_id: r for r in candidate_analysis(df).collect()}
    for i, case in enumerate(CASES):
        assert sorted(out[i].red_flags) == sorted(red_flags(case)), f"case {i}"
        assert out[i].total_experience_years == pytest.approx(
            total_experience_years(case)
        ), f"case {i}"


def test_native_invoice_validation(spark):
    import json

    from engine.spark.validation import validate_invoice_extractions

    recs = [
        ("c", 0, "invoice", json.dumps({"invoice_number": "INV-1", "invoice_date": "2025-06-01", "total_amount": 10.0, "currency": "USD"})),
        ("c", 1, "invoice", json.dumps({"invoice_number": "b!", "invoice_date": "2026-06-01", "total_amount": 0.0, "currency": "XXX"})),
        ("c", 2, "invoice", json.dumps({})),
        ("c", 3, "resume", json.dumps({})),  # filtered out
    ]
    df = spark.createDataFrame(
        recs, "conv_id string, turn_idx int, doc_type string, fields_json string"
    )
    out = {r.turn_idx: r for r in validate_invoice_extractions(df).collect()}
    assert 3 not in out
    ok = out[0]
    assert (
        list(ok.invoice_number_issues) == [] and list(ok.invoice_date_issues) == []
        and list(ok.total_amount_issues) == [] and list(ok.currency_issues) == []
    )
    bad = out[1]
    assert list(bad.invoice_number_issues) == ["bad_format"]
    assert list(bad.invoice_date_issues) == ["future_date"]
    assert list(bad.total_amount_issues) == ["zero"]
    assert list(bad.currency_issues) == ["unknown_code"]
    empty = out[2]
    assert list(empty.invoice_number_issues) == ["missing"]
    assert list(empty.total_amount_issues) == ["missing"]


# ---------------- J1 skill joins + SO set ops --------------------------

def test_skill_match_join_tiers(spark):
    from engine.kernel.scoring import skills_match
    from engine.spark.validation import skill_match_join

    resume = spark.createDataFrame(
        [(1, "Python"), (1, "k8s"), (1, "react native"), (2, "cobol")],
        "candidate_id long, skill string",
    )
    jd = spark.createDataFrame(
        [("python",), ("kubernetes",), ("react",), ("rust",)], "skill string"
    )
    got = {
        (r.candidate_id, r.jd_skill): r.match_type
        for r in skill_match_join(spark, resume, jd).collect()
    }
    assert got[(1, "python")] == "exact"
    assert got[(1, "kubernetes")] == "synonym"
    assert got[(1, "react")] == "partial"
    assert (2, "rust") not in got
    # parity with the kernel tiers for the matched pairs
    assert skills_match("k8s", "kubernetes") == (True, "synonym")
    assert skills_match("react native", "react") == (True, "partial")


def test_so_set_ops_native(spark):
    a = F.array(*[F.lit(x) for x in ("py", "sql", "go")])
    b = F.array(*[F.lit(x) for x in ("sql", "rust")])
    row = spark.range(1).select(
        F.array_distinct(F.concat(a, b)).alias("union"),
        F.array_intersect(a, b).alias("common"),
        F.array_except(a, b).alias("only_a"),
    ).collect()[0]
    assert sorted(row.union) == ["go", "py", "rust", "sql"]
    assert list(row.common) == ["sql"]
    assert sorted(row.only_a) == ["go", "py"]


# ---------------- P2 routing ------------------------------------------

def test_split_valid_routes_errors(spark):
    from engine.spark.pipeline import split_valid

    rows = [
        ("c1", 0, "user", "ok text", None, None),
        ("c1", 1, "user", None, None, None),
        (None, 2, "user", "x", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    valid, errors = split_valid(df)
    assert valid.count() == 1
    errs = {r.error for r in errors.collect()}
    assert errs == {"null_text", "null_conv_id"}


def test_overall_validation_score_golden():
    """A3 kernel golden cases (validator.py:564-605)."""
    from engine.kernel.scoring import overall_validation_score as s

    # weighted mean: (1.0*1.0 + 0.9*1.0) / 2.0 = 0.95
    assert s([("invoice_number", 1.0), ("total_amount", 0.9)], []) == 0.95
    # penalties: 0.3 + 0.1 + 0.1 = 0.5 (== cap); 1.0 - 0.5 = 0.5
    assert s([("invoice_number", 1.0)], ["critical", "warning", "warning"]) == 0.5
    # penalty cap at 0.5 even with 30 infos (0.6 uncapped)
    assert s([("unknownfield", 0.8)], ["info"] * 30) == 0.3
    # no fields → 0.0 regardless of issues
    assert s([], []) == 0.0
    # unknown field defaults to weight 0.5 (mean unaffected for one field)
    assert s([("mystery", 0.7)], []) == 0.7
    # floor at 0
    assert s([("notes", 0.1)], ["critical", "critical"]) == 0.0


def test_native_validation_score_matches_kernel(spark):
    """A3 native == kernel over a grid of field/issue combinations."""
    from engine.kernel.scoring import overall_validation_score
    from engine.spark.validation import with_validation_score

    cases = [
        (1, [("invoice_number", 1.0), ("total_amount", 0.9)], []),
        (2, [("invoice_number", 0.6), ("notes", 0.2)], ["warning"]),
        (3, [("mystery", 0.7), ("vendor_name", 0.8)], ["info", "info"]),
        (4, [("invoice_number", 1.0)], ["critical", "warning", "warning"]),
        (5, [("subtotal", 0.0), ("tax_amount", 0.0)], ["critical"] * 3),
        (6, [("payment_terms", 0.4), ("line_items", 0.5),
             ("customer_name", 0.9)], ["warning", "unknown_sev"]),
        (7, [], ["critical"]),
    ]
    rows = [
        (i, [{"field_name": n, "score": v} for n, v in fs], sev)
        for i, fs, sev in cases
    ]
    df = spark.createDataFrame(
        rows,
        "id int, field_scores array<struct<field_name:string,score:double>>, "
        "issue_severities array<string>",
    )
    got = {
        r["id"]: r["validation_score"]
        for r in with_validation_score(df).collect()
    }
    for i, fs, sev in cases:
        assert got[i] == pytest.approx(
            overall_validation_score(fs, sev), abs=1e-9
        ), f"case {i}"


def test_skill_harvest_kernel_golden():
    from engine.kernel.scoring import harvest_skills

    got = harvest_skills(
        ["Python", "Machine-Learning"],
        ["k8s", "  SQL  "],
        [["Built ETL with Spark and Kafka", "led team"], ["Used C# and F#"]],
    )
    # declared skills normalized; capitalized words harvested from
    # highlights. Reference quirk preserved: the trailing \b in
    # \b[A-Z][a-zA-Z+#]+\b cannot follow '#', so 'C#'/'F#' are NOT
    # harvested (scorer.py:131).
    assert "python" in got and "machine learning" in got
    assert "k8s" in got and "sql" in got
    assert "spark" in got and "kafka" in got and "built" in got
    assert "etl" in got and "used" in got
    assert "c#" not in got and "f#" not in got
    assert "led" not in got and "team" not in got  # lowercase: not harvested
    assert got == sorted(set(got))


def test_harvest_resume_skills_matches_kernel(spark):
    from engine.kernel.scoring import harvest_skills
    from engine.spark.validation import harvest_resume_skills

    rows = [
        (1, ["Python", "Go-Lang"], ["SQL"],
         [(["Shipped Spark jobs", "tuned GC"], ), ((["Wrote C++ and C#"]), )]),
        (2, [], None, [(["Plain lowercase only"], )]),
        (3, None, ["TS_Node"], []),
    ]
    df = spark.createDataFrame(
        rows,
        "id int, skills array<string>, technical_skills array<string>, "
        "experience array<struct<highlights: array<string>>>",
    )
    got = {r.id: list(r.all_skills) for r in harvest_resume_skills(df).collect()}
    for rid, skills, tech, exp in rows:
        expected = harvest_skills(
            list(skills or []), list(tech or []),
            [list(e[0] or []) for e in (exp or [])],
        )
        assert got[rid] == expected, rid


def test_career_progression_native_matches_kernel(spark):
    """Native career-progression columns == kernel derivation for every
    doc in sf0.001 (same doc_id formula on both sides)."""
    from engine.kernel.scoring import career_progression
    from engine.spark.validation import career_progression_table

    got = {
        r.doc_id: r.asDict()
        for r in career_progression_table(spark, "/root/testdata/sf0.001").collect()
    }
    assert got
    for doc_id, row in got.items():
        n = doc_id % 5 + 1
        jobs = [
            {
                "duration_months": 6 + (doc_id * 7 + i * 11) % 48,
                "level": (doc_id + 2 * i) % 4,
                "company": f"company-{(doc_id + 3 * i) % 7}",
                "gap_after_months": (doc_id + 5 * i) % 9,
            }
            for i in range(n)
        ]
        want = career_progression(jobs)
        for k, v in want.items():
            assert row[k] == v, (doc_id, k, row[k], v)


def test_career_progression_trajectories_cover_all_classes(spark):
    from engine.spark.validation import career_progression_table

    trajs = {
        r.trajectory
        for r in career_progression_table(spark, "/root/testdata/sf0.001").collect()
    }
    # single-role → lateral; 2-role ±2 climbs → upward/downward;
    # 3+ roles alternate → mixed: all four classes must appear
    assert trajs == {"lateral", "upward", "downward", "mixed"}


def test_career_progression_properties():
    """Property sweep over the kernel derivation (no Spark): output
    invariants hold for arbitrary job histories."""
    import random

    from engine.kernel.scoring import CAREER_TITLES, career_progression

    rng = random.Random(13)
    for _ in range(300):
        n = rng.randint(1, 8)
        jobs = [
            {
                "duration_months": rng.randint(1, 120),
                "level": rng.randint(0, 3),
                "company": f"c{rng.randint(0, 5)}",
                "gap_after_months": rng.randint(0, 24),
            }
            for _ in range(n)
        ]
        got = career_progression(jobs)
        assert got["n_roles"] == n
        assert got["trajectory"] in {"upward", "downward", "lateral", "mixed"}
        assert 0 < got["avg_tenure_months"] <= got["longest_tenure_months"]
        assert 1 <= got["total_companies"] <= n
        assert got["most_recent_title"] == CAREER_TITLES[jobs[0]["level"]]
        if n == 1:
            assert got["trajectory"] == "lateral"
            assert got["longest_gap_months"] == 0
            assert not got["has_leadership_progression"]
        levels = [j["level"] for j in jobs]
        if got["has_leadership_progression"]:
            assert levels[0] >= 2 and levels[0] > levels[-1]


def test_career_progression_empty_history(spark):
    """A resume with no parseable experience yields the degenerate
    lateral record on BOTH sides (kernel dict == native row), not a
    ZeroDivisionError / ANSI array-index crash."""
    from engine.kernel.scoring import career_progression
    from engine.spark.validation import career_progression_cols

    want = career_progression([])
    assert want["n_roles"] == 0 and want["trajectory"] == "lateral"

    df = spark.createDataFrame(
        [(1, [])],
        "doc_id long, experience array<struct<duration_months: int, "
        "level: int, company: string, gap_after_months: int>>",
    )
    row = career_progression_cols(df).collect()[0].asDict()
    for k, v in want.items():
        assert row[k] == v, (k, row[k], v)


def test_candidate_fit_parse_native_matches_kernel(spark):
    """Native fit-response normalization == kernel on every synthetic
    branch (same doc_id formula both sides)."""
    from engine.kernel.scoring import parse_candidate_fit
    from engine.spark.validation import candidate_fit_parse_table

    def synth(doc_id):
        m = doc_id % 5
        if m == 0:
            return {
                "fit_score": doc_id % 101,
                "recommendation": "STRONG_HIRE",
                "red_flags": [
                    {"flag_type": "SHORT_TENURE", "severity": "HIGH", "title": "t"}
                ],
                "strengths": [
                    {"category": "skills", "title": "x",
                     "relevance_score": doc_id % 100}
                ],
            }
        if m == 1:
            return {"recommendation": "maybe",
                    "red_flags": [{"flag_type": "ALIEN", "severity": "urgent"}]}
        if m == 2:
            return {"fit_score": 93, "recommendation": "good_fit",
                    "red_flags": [], "strengths": []}
        if m == 3:
            return {}
        return {
            "fit_score": 10, "recommendation": "NOT_RECOMMENDED",
            "red_flags": [
                {"flag_type": "employment_gap", "severity": "low"},
                {"flag_type": "no_progression", "severity": "high"},
            ],
            "strengths": [{"title": "a"}, {"title": "b", "relevance_score": 95}],
        }

    rows = {
        r.doc_id: r
        for r in candidate_fit_parse_table(spark, "/root/testdata/sf0.001").collect()
    }
    assert rows
    for doc_id, row in rows.items():
        want = parse_candidate_fit(synth(doc_id))
        assert row.fit_score == want["fit_score"], doc_id
        assert row.recommendation == want["recommendation"], doc_id
        assert row.red_flag_count == want["red_flag_count"], doc_id
        assert row.has_critical_red_flags == want["has_critical_red_flags"], doc_id
        assert row.n_strengths == want["n_strengths"], doc_id
        want_flags = ";".join(
            f"{f['flag_type']}:{f['severity']}" for f in want["red_flags"]
        )
        assert row.flags_scalar == want_flags, doc_id
        want_rel = ";".join(str(s["relevance_score"]) for s in want["strengths"])
        assert row.strength_relevance == want_rel, doc_id


def test_parse_candidate_fit_kernel_edge_cases():
    from engine.kernel.scoring import parse_candidate_fit

    got = parse_candidate_fit(
        {"red_flags": ["not-a-dict", {"severity": "HIGH"}],
         "strengths": [None, {"title": "ok"}],
         "recommendation": "potential_fit"}
    )
    # non-dict entries skipped like the reference's try/except
    assert got["red_flag_count"] == 1
    assert got["red_flags"][0] == {
        "flag_type": "other", "severity": "high",
        "title": "Unspecified flag", "description": "",
    }
    assert got["has_critical_red_flags"] is True
    assert got["n_strengths"] == 1
    assert got["strengths"][0]["relevance_score"] == 80
    assert got["recommendation"] == "potential_fit"
    assert got["fit_score"] == 50


def test_candidate_fit_parse_malformed_and_null_payloads(spark):
    """Engine JSON-error-model alignment: a type-mismatched array
    entry is skipped on both sides (kernel isinstance-skip, Spark
    null-struct filter); explicit JSON nulls take the defaults on
    both sides (kernel _or_default == native coalesce)."""
    from engine.kernel.scoring import parse_candidate_fit
    from engine.spark.validation import parse_candidate_fit_cols

    payloads = [
        (0, '{"fit_score": 93, "red_flags": ["oops", '
            '{"severity": "high"}]}'),
        (1, '{"fit_score": null, "recommendation": null, "strengths": '
            '[{"relevance_score": null}], "red_flags": null}'),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, analysis_json string")
    rows = {r.doc_id: r for r in parse_candidate_fit_cols(df).collect()}

    k0 = parse_candidate_fit(
        {"fit_score": 93, "red_flags": ["oops", {"severity": "high"}]}
    )
    assert rows[0].fit_score == k0["fit_score"] == 93
    assert rows[0].red_flag_count == k0["red_flag_count"] == 1
    assert rows[0].has_critical_red_flags == k0["has_critical_red_flags"] is True
    assert rows[0].flags_scalar == "other:high"

    k1 = parse_candidate_fit(
        {"fit_score": None, "recommendation": None,
         "strengths": [{"relevance_score": None}], "red_flags": None}
    )
    assert rows[1].fit_score == k1["fit_score"] == 50
    assert rows[1].recommendation == k1["recommendation"] == "needs_review"
    assert rows[1].red_flag_count == k1["red_flag_count"] == 0
    assert rows[1].n_strengths == k1["n_strengths"] == 1
    assert rows[1].strength_relevance == "80"
    assert k1["strengths"][0]["relevance_score"] == 80
