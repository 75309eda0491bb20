"""Native ATS scoring pipeline at table scale (SURVEY.md §2.4 A5 +
the reference's suggestion/summary/recommendation generators).

Re-expresses the full deterministic half of the reference's candidate
analysis as Catalyst expressions — zero Python in any of it:

- piecewise experience fit (scorer.py:314-348)
- degree-lattice education score (scorer.py:350-408)
- skills 70/30 + keyword ratio + 0.40/0.25/0.25/0.10 blend
  (scorer.py:207-240)
- improvement suggestions, max 7 (scorer.py:410-479)
- graded summary string (scorer.py:481-517)
- pool-level hiring recommendation (ranker.py:135-165) over the
  0.4·ATS + 0.6·fit overall (resume.py:349,437; fit is the LLM half —
  a deterministic stand-in is used, clearly derived from doc_id)

Candidate attributes (skills hit/miss, years, degree, summary/cert
presence, fit) are deterministic functions of the documents table so
every query has a DuckDB oracle twin; the scalar score functions are
additionally parity-tested against engine.kernel.scoring.

Scale notes: everything through ats_full_score / ats_suggestions is
map-only over the documents scan (no shuffle, whole-stage codegen).
hiring_recommendation is one partial-agg groupBy per cohort plus a
per-cohort top-1 window — both shuffle on the (low-cardinality but
NOT single-key) cohort, the same layout production uses per job_id.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from engine.kernel.scoring import DEGREE_LEVELS

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame, SparkSession

# deterministic JD stand-in (same containment-vocabulary style as
# relational.ats_keyword_match; the three vocabularies are disjoint so
# the reference's "not already in missing skills" keyword filters are
# identity — noted where they apply)
REQUIRED_SKILLS = ("join", "filter", "window", "partition", "shuffle")
PREFERRED_SKILLS = ("merge", "batch", "stream")
JD_KEYWORDS = ("aggregate", "schema", "cluster", "parquet")
JD_MIN_YEARS = 3.0
JD_MAX_YEARS = 8.0
REQUIRED_EDU = "bachelor"
JD_CERTS = (
    "AWS Certified Solutions Architect",
    "Certified Kubernetes Administrator",
)
# rule-based fit fallback (analyzer.py:506-559): required-skill set for
# the exact-lowercase overlap term; resume skills reuse the J1 vocab
# assignment (relational.SKILL_VOCAB picks per doc_id)
FIT_REQUIRED_SKILLS = ("python", "java", "go", "sql")
DEGREE_POOL = (
    "PhD in Computer Science",
    "Master of Science",
    "Bachelor of Arts",
    "Associate Degree",
    "Certificate in Data Engineering",
    "",  # ← no degrees listed
)


def experience_score_expr(resume_years: "Column",
                          min_years: float | None = JD_MIN_YEARS,
                          max_years: float | None = JD_MAX_YEARS) -> "Column":
    """Piecewise experience fit (scorer.py:314-348), numerically
    identical to engine.kernel.scoring.experience_score: the JD bounds
    are plan-time constants so the None branches fold in Python, and
    int() truncation maps to floor (both subexpressions are ≥ 0)."""
    if min_years is None and max_years is None:
        return F.lit(100)
    if min_years is None:
        min_years = 0.0
    if max_years is None:
        max_years = min_years + 10
    ry = resume_years
    under = F.lit(min_years) - ry
    return (
        F.when(
            ry >= min_years,
            F.when(ry <= max_years, F.lit(100)).otherwise(
                F.greatest(
                    F.lit(60),
                    (F.lit(100) - F.floor((ry - max_years) * 5)).cast("int"),
                )
            ),
        )
        .otherwise(
            F.when(under <= 1, F.lit(70))
            .when(under <= 2, F.lit(50))
            .otherwise(
                F.greatest(
                    F.lit(20), (F.lit(50) - F.floor(under * 10)).cast("int")
                )
            )
        )
        .cast("int")
    )


def _required_edu_level(required_edu: str) -> int:
    """First DEGREE_LEVELS key contained in the requirement string
    (scorer.py:366-371) — plan-time constant."""
    req = (required_edu or "").lower()
    for key, level in DEGREE_LEVELS.items():
        if key in req:
            return level
    return 0


def degree_level_expr(degree: "Column") -> "Column":
    """Max DEGREE_LEVELS level whose key appears in the lowered degree
    string (scorer.py:373-380), 0 when none match."""
    dl = F.lower(degree)
    return F.greatest(
        *[
            F.when(F.instr(dl, key) > 0, F.lit(level)).otherwise(F.lit(0))
            for key, level in DEGREE_LEVELS.items()
        ]
    )


def education_score_expr(degrees: "Column",
                         required_edu: str = REQUIRED_EDU) -> "Column":
    """Degree-lattice education score over an array<string> of degrees
    (scorer.py:350-408): meets-or-exceeds 100, one-below 70, lower 40;
    no degrees 30; no requirement 100."""
    if not (required_edu or "").strip():
        return F.lit(100)
    req_level = _required_edu_level(required_edu)
    cand = F.coalesce(
        F.array_max(F.transform(degrees, degree_level_expr)), F.lit(0)
    )
    return (
        F.when(F.size(degrees) == 0, F.lit(30))
        .when(cand >= req_level, F.lit(100))
        .when(cand == req_level - 1, F.lit(70))
        .otherwise(F.lit(40))
        .cast("int")
    )


def _hits(lower_text: "Column", vocab: tuple[str, ...]) -> "Column":
    return sum(
        F.when(F.instr(lower_text, kw) > 0, 1).otherwise(0) for kw in vocab
    )


def _missing(lower_text: "Column", vocab: tuple[str, ...]) -> "Column":
    """Vocab terms absent from the text, in vocab order (matching the
    reference's list-append order)."""
    return F.filter(
        F.array(
            *[
                F.when(F.instr(lower_text, kw) == 0, F.lit(kw)).otherwise(
                    F.lit(None)
                )
                for kw in vocab
            ]
        ),
        lambda x: x.isNotNull(),
    )


def _present(lower_text: "Column", vocab: tuple[str, ...]) -> "Column":
    """Vocab terms present in the text, in vocab order."""
    return F.filter(
        F.array(
            *[
                F.when(F.instr(lower_text, kw) > 0, F.lit(kw)).otherwise(
                    F.lit(None)
                )
                for kw in vocab
            ]
        ),
        lambda x: x.isNotNull(),
    )


def fit_fallback_score_expr(
    years: "Column",
    matched_fit: "Column",
    n_red_flags: "Column",
    min_years: float = JD_MIN_YEARS,
    n_required: int = len(FIT_REQUIRED_SKILLS),
) -> "Column":
    """The reference's rule-based fit score (analyzer.py:514-537),
    numerically identical to engine.kernel.scoring.fit_fallback:
    base 50 + experience step (+15 / +5 above 70% of min / −10) +
    ⌊overlap·20⌋ − 5·flags, clamped to [0, 100]."""
    step = (
        F.when(years >= min_years, F.lit(15))
        .when(years >= min_years * 0.7, F.lit(5))
        .otherwise(F.lit(-10))
    )
    overlap = F.floor(matched_fit / n_required * 20).cast("int")
    raw = F.lit(50) + step + overlap - n_red_flags * 5
    return F.greatest(F.lit(0), F.least(F.lit(100), raw)).cast("int")


def with_candidate_attrs(docs: "DataFrame") -> "DataFrame":
    """Deterministic candidate attributes derived from (doc_id, text):
    skill/keyword hits by containment; years/degree/summary/cert/flag
    stand-ins by doc_id arithmetic (each branch of the scoring rules is
    exercised; DuckDB re-derives them identically). fit_score is the
    reference's own rule-based fallback formula — the deterministic
    half of the fit analysis (the LLM half is out of gate) — over the
    J1 vocab skill assignment."""
    from engine.spark.relational import SKILL_VOCAB

    lower = F.lower(F.col("text"))
    k = F.col("doc_id")
    degree = F.element_at(
        F.array(*[F.lit(d) for d in DEGREE_POOL]), (k % 6 + 1).cast("int")
    )
    vocab = F.array(*[F.lit(s) for s in SKILL_VOCAB])
    n = len(SKILL_VOCAB)
    skills = F.array(
        F.element_at(vocab, (k % n + 1).cast("int")),
        F.element_at(vocab, ((k * 7 + 3) % n + 1).cast("int")),
    )
    matched_fit = F.size(
        F.array_intersect(skills, F.array(*[F.lit(s) for s in FIT_REQUIRED_SKILLS]))
    )
    years = (k % 25) * 0.5
    n_flags = (k % 4).cast("int")
    return docs.select(
        "doc_id",
        _hits(lower, REQUIRED_SKILLS).cast("int").alias("matched_required"),
        _hits(lower, PREFERRED_SKILLS).cast("int").alias("matched_preferred"),
        _hits(lower, JD_KEYWORDS).cast("int").alias("matched_keywords"),
        _missing(lower, REQUIRED_SKILLS).alias("missing_required"),
        _missing(lower, PREFERRED_SKILLS).alias("missing_preferred"),
        _missing(lower, JD_KEYWORDS).alias("missing_keywords"),
        _present(lower, REQUIRED_SKILLS).alias("matched_required_list"),
        _present(lower, PREFERRED_SKILLS).alias("matched_preferred_list"),
        _present(lower, JD_KEYWORDS).alias("matched_keywords_list"),
        years.alias("resume_years"),
        F.when(degree == "", F.array().cast("array<string>"))
        .otherwise(F.array(degree))
        .alias("degrees"),
        (k % 3 != 0).alias("has_summary"),
        (k % 4 == 0).alias("has_certifications"),
        skills.alias("fit_skills"),
        matched_fit.cast("int").alias("fit_matched_required"),
        n_flags.alias("n_red_flags"),
        fit_fallback_score_expr(years, matched_fit, n_flags).alias("fit_score"),
        (k % 7 == 0).alias("has_critical_red_flags"),
    )


def candidate_fit_fallback(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """The reference's deterministic fit path end-to-end (analyzer.py:
    506-559): fit score, recommendation type and text per candidate —
    map-only, fully oracled, kernel-parity-tested."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = with_candidate_attrs(docs)
    s = F.col("fit_score")
    rec = (
        F.when(s >= 70, F.lit("good_fit"))
        .when(s >= 50, F.lit("potential_fit"))
        .otherwise(F.lit("needs_review"))
    )
    text = (
        F.when(s >= 70, F.lit("Candidate shows potential based on available data"))
        .when(s >= 50, F.lit("Some gaps identified, further review recommended"))
        .otherwise(F.lit("Significant gaps, careful evaluation needed"))
    )
    return a.select(
        "doc_id",
        "fit_matched_required",
        "n_red_flags",
        "fit_score",
        rec.alias("recommendation"),
        text.alias("recommendation_text"),
    )


def with_ats_scores(cands: "DataFrame") -> "DataFrame":
    """A5 complete: skills 70/30, keyword ratio, experience, education,
    and the 0.40/0.25/0.25/0.10 blend (scorer.py:207-240). int()
    truncation maps to floor (all parts ≥ 0); expression shape mirrors
    the kernel exactly so doubles round identically."""
    skills = F.floor(
        (F.col("matched_required") / len(REQUIRED_SKILLS)) * 70
        + (F.col("matched_preferred") / len(PREFERRED_SKILLS)) * 30
    ).cast("int")
    keywords = F.floor(
        (F.col("matched_keywords") / len(JD_KEYWORDS)) * 100
    ).cast("int")
    exp = experience_score_expr(F.col("resume_years"))
    edu = education_score_expr(F.col("degrees"))
    df = (
        cands.withColumn("skills_match_score", skills)
        .withColumn("keyword_match_score", keywords)
        .withColumn("experience_match_score", exp)
        .withColumn("education_match_score", edu)
    )
    ats = F.floor(
        F.col("skills_match_score") * 0.40
        + F.col("keyword_match_score") * 0.25
        + F.col("experience_match_score") * 0.25
        + F.col("education_match_score") * 0.10
    ).cast("int")
    return df.withColumn("ats_score", ats)


def summary_expr() -> "Column":
    """Graded summary string (scorer.py:481-517); total_required > 0
    here so the skill_info suffix is always present."""
    s = F.col("ats_score")
    grade = (
        F.when(s >= 90, F.lit("Excellent"))
        .when(s >= 75, F.lit("Good"))
        .when(s >= 60, F.lit("Fair"))
        .when(s >= 40, F.lit("Needs Work"))
        .otherwise(F.lit("Poor Match"))
    )
    detail = (
        F.when(s >= 90, F.lit("This resume is highly optimized for this job posting."))
        .when(s >= 75, F.lit("Strong match with room for minor improvements."))
        .when(s >= 60, F.lit("Moderate match - consider adding missing keywords."))
        .when(s >= 40, F.lit("Significant gaps in required skills or keywords."))
        .otherwise(F.lit("Major mismatch - this role may not be a good fit."))
    )
    return F.concat(
        grade, F.lit(" ("), s.cast("string"), F.lit("/100). "), detail,
        F.lit(" Matched "), F.col("matched_required").cast("string"),
        F.lit(f"/{len(REQUIRED_SKILLS)} required skills."),
    )


def suggestions_expr() -> "Column":
    """Max-7 improvement-suggestion array (scorer.py:410-479). The
    three vocabularies are disjoint, so the reference's cross-list
    exclusion filters ("not in missing_required", …) are identity here;
    the slice caps mirror [:5]/[:3]/[:5] and the final [:7]."""
    mr, mp, mk = (
        F.col("missing_required"),
        F.col("missing_preferred"),
        F.col("missing_keywords"),
    )
    sugg = F.filter(
        F.array(
            F.when(
                F.size(mr) > 0,
                F.concat(
                    F.lit("Add these required skills if you have experience: "),
                    F.array_join(F.slice(mr, 1, 5), ", "),
                ),
            ),
            F.when(
                (F.size(mp) > 0) & (F.size(mp) > F.size(mr)),
                F.concat(
                    F.lit("Consider highlighting these preferred skills: "),
                    F.array_join(F.slice(mp, 1, 3), ", "),
                ),
            ),
            F.when(
                F.size(mk) > 0,
                F.concat(
                    F.lit("Include these keywords in your resume: "),
                    F.array_join(F.slice(mk, 1, 5), ", "),
                ),
            ),
            F.when(
                F.col("experience_match_score") < 70,
                F.lit("Highlight relevant projects or freelance work to bridge experience gap"),
            ),
            F.when(
                F.col("education_match_score") < 70,
                F.lit("List relevant certifications or courses to strengthen education section"),
            ),
            F.when(
                ~F.col("has_summary"),
                F.lit("Add a professional summary highlighting your fit for this role"),
            ),
            F.when(
                ~F.col("has_certifications"),
                F.lit(
                    "Consider obtaining relevant certifications: "
                    + ", ".join(JD_CERTS[:3])
                ),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return F.slice(sugg, 1, 7)


def ats_full_score(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """A5 at table scale, fully oracled: all four sub-scores + blend +
    summary per candidate, plus the reference's result lists —
    matched_skills (required then preferred, scorer.py:271),
    missing required/preferred skills, matched keywords and the
    top-10-capped missing keywords (scorer.py:269-274) — as sorted-free
    ';' joins in the reference's vocab-append order. Map-only (single
    documents scan)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = with_ats_scores(with_candidate_attrs(docs))
    return scored.select(
        "doc_id",
        "skills_match_score",
        "keyword_match_score",
        "experience_match_score",
        "education_match_score",
        "ats_score",
        summary_expr().alias("summary"),
        F.concat_ws(
            ";",
            F.concat(
                F.col("matched_required_list"), F.col("matched_preferred_list")
            ),
        ).alias("matched_skills"),
        F.concat_ws(";", F.col("matched_keywords_list")).alias("matched_keywords"),
        F.concat_ws(";", F.col("missing_required")).alias("missing_required_skills"),
        F.concat_ws(";", F.col("missing_preferred")).alias("missing_preferred_skills"),
        F.concat_ws(";", F.slice(F.col("missing_keywords"), 1, 10)).alias(
            "missing_keywords"
        ),
    )


def ats_suggestions(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Improvement suggestions per candidate, driver-sortable: joined
    with '|' (no suggestion string contains '|')."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = with_ats_scores(with_candidate_attrs(docs))
    sugg = suggestions_expr()
    return scored.select(
        "doc_id",
        F.size(sugg).cast("int").alias("n_suggestions"),
        F.concat_ws("|", sugg).alias("suggestions"),
    )


def hiring_recommendation(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Pool-level ranking lifecycle per cohort (= per job): overall
    0.4·ATS + 0.6·fit (resume.py:349,437), ranker.py:94-105 score
    distribution, and the ranker.py:135-165 recommendation string from
    (top score, top candidate's red flags, strong-hire count).

    One aggregation shuffle + one top-1 window per cohort; the top-1 is
    computed as max(struct(overall, -doc_id, …)) inside the same
    aggregate — no second shuffle, ties broken by lowest doc_id exactly
    like the reference's stable sort."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = with_ats_scores(with_candidate_attrs(docs)).withColumn(
        "overall",
        F.floor(F.col("ats_score") * 0.4 + F.col("fit_score") * 0.6).cast("int"),
    )
    scored = scored.withColumn("cohort", (F.col("doc_id") % 10).cast("int"))
    agg = scored.groupBy("cohort").agg(
        F.count("*").cast("int").alias("total_candidates"),
        F.round(F.avg("overall"), 2).alias("average_score"),
        F.sum((F.col("overall") >= 85).cast("int")).cast("int").alias("n_excellent"),
        F.sum(((F.col("overall") >= 70) & (F.col("overall") < 85)).cast("int"))
        .cast("int").alias("n_good"),
        F.sum(((F.col("overall") >= 50) & (F.col("overall") < 70)).cast("int"))
        .cast("int").alias("n_acceptable"),
        F.sum((F.col("overall") < 50).cast("int")).cast("int").alias("n_poor"),
        F.max(
            F.struct(
                F.col("overall").alias("score"),
                (-F.col("doc_id")).alias("neg_id"),
                F.col("has_critical_red_flags").alias("flags"),
            )
        ).alias("top"),
    )
    top_score = F.col("top.score")
    top_id = (-F.col("top.neg_id")).cast("long")
    top_name = F.concat(F.lit("doc-"), top_id.cast("string"))
    strong = F.col("n_excellent")
    ts = top_score.cast("string")
    rec = (
        F.when(
            (top_score >= 85) & ~F.col("top.flags"),
            F.concat(
                F.lit("✅ STRONG RECOMMENDATION: Top candidate ("), top_name,
                F.lit(") is an excellent fit with "), ts,
                F.lit("/100 score and no critical red flags."),
            ),
        )
        .when(
            strong > 0,
            F.concat(
                F.lit("✅ GOOD POOL: "), strong.cast("string"),
                F.lit(" strong candidate(s) available. Top score: "), ts,
                F.lit("/100. Review red flags before proceeding."),
            ),
        )
        .when(
            top_score >= 70,
            F.concat(
                F.lit("⚠️ ACCEPTABLE: Top candidate at "), ts,
                F.lit("/100. Pool quality is moderate. Consider expanding search."),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("❌ WEAK POOL: Highest score is "), ts,
                F.lit("/100. Not recommended to proceed without additional candidates."),
            )
        )
    )
    return agg.select(
        "cohort",
        "total_candidates",
        "average_score",
        "n_excellent",
        "n_good",
        "n_acceptable",
        "n_poor",
        top_score.alias("top_score"),
        top_id.alias("top_doc_id"),
        rec.alias("recommendation"),
    )
