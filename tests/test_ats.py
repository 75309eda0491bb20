"""ATS completion (A5 + suggestion/summary/recommendation generators):
kernel goldens for every rule branch, and native-Spark == kernel parity
over the documents-derived candidate table (SURVEY.md §7.1.4 pattern)."""

import pytest

from engine.kernel.scoring import (
    ats_score,
    ats_suggestions,
    ats_summary,
    education_score,
    experience_score,
    hiring_recommendation,
    overall_candidate_score,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------- kernel goldens ----------

def test_experience_score_piecewise():
    # scorer.py:314-348 branch coverage
    assert experience_score(5, None, None) == 100
    assert experience_score(5, None, 8) == 100      # min defaults to 0
    assert experience_score(12, 3, None) == 100     # max defaults to min+10
    assert experience_score(5, 3, 8) == 100         # in range
    assert experience_score(9.5, 3, 8) == max(60, 100 - int(1.5 * 5))
    assert experience_score(30, 3, 8) == 60         # over-cap floor
    assert experience_score(2.5, 3, 8) == 70        # under by <=1
    assert experience_score(1.5, 3, 8) == 50        # under by <=2
    assert experience_score(0.0, 3, 8) == max(20, 50 - int(3.0 * 10))
    assert experience_score(0.0, 30, None) == 20    # deep-under floor


def test_education_score_lattice():
    # scorer.py:350-408
    assert education_score(["BSc Physics"], "") == 100        # no requirement
    assert education_score([], "bachelor") == 30              # no degrees
    assert education_score(["PhD in CS"], "bachelor") == 100  # exceeds
    assert education_score(["Bachelor of Arts"], "bachelor") == 100
    assert education_score(["Associate Degree"], "bachelor") == 70  # one below
    assert education_score(["Certificate in X"], "bachelor") == 40
    assert education_score(["Diploma", "Master of Science"], "master") == 100


def test_ats_suggestions_branches():
    # scorer.py:410-479; max-7 cap and each rule
    s = ats_suggestions(
        ["a", "b", "c", "d", "e", "f"], ["p1", "p2"], ["k1"],
        60, 60, False, [], ["CERT-1", "CERT-2", "CERT-3", "CERT-4"],
    )
    assert s[0] == "Add these required skills if you have experience: a, b, c, d, e"
    # preferred suggestion absent: len(preferred)=2 <= len(required)=6
    assert s[1] == "Include these keywords in your resume: k1"
    assert "experience gap" in s[2]
    assert "education section" in s[3]
    assert "professional summary" in s[4]
    assert s[5] == "Consider obtaining relevant certifications: CERT-1, CERT-2, CERT-3"
    assert len(s) <= 7
    # preferred fires when it outnumbers required; cert rule suppressed
    # when candidate has certifications
    s2 = ats_suggestions([], ["p1", "p2"], [], 100, 100, True, ["x"], ["C"])
    assert s2 == ["Consider highlighting these preferred skills: p1, p2"]
    assert ats_suggestions([], [], [], 100, 100, True, [], []) == []


def test_ats_summary_grades():
    # scorer.py:481-517
    assert ats_summary(95, 5, 5) == (
        "Excellent (95/100). This resume is highly optimized for this "
        "job posting. Matched 5/5 required skills."
    )
    assert ats_summary(75, 3, 5).startswith("Good (75/100). Strong match")
    assert ats_summary(60, 2, 5).startswith("Fair (60/100). Moderate match")
    assert ats_summary(45, 1, 5).startswith("Needs Work (45/100).")
    assert ats_summary(10, 0, 5).startswith("Poor Match (10/100).")
    assert ats_summary(90, 0, 0) == (
        "Excellent (90/100). This resume is highly optimized for this job posting."
    )


def test_hiring_recommendation_rules():
    # ranker.py:135-165
    assert hiring_recommendation([]) == "No candidates to evaluate."
    assert hiring_recommendation([(90, "A", False), (40, "B", False)]).startswith(
        "✅ STRONG RECOMMENDATION: Top candidate (A)"
    )
    # top has critical flags but pool still has a strong hire
    r = hiring_recommendation([(90, "A", True), (86, "B", False)])
    assert r.startswith("✅ GOOD POOL: 2 strong candidate(s)")
    assert hiring_recommendation([(72, "A", False)]).startswith("⚠️ ACCEPTABLE:")
    assert hiring_recommendation([(40, "A", False)]).startswith("❌ WEAK POOL:")


def test_overall_candidate_score_blend():
    # resume.py:349,437
    assert overall_candidate_score(80, 90) == int(80 * 0.4 + 90 * 0.6)
    assert overall_candidate_score(0, 0) == 0


def test_fit_fallback_branches():
    from engine.kernel.scoring import fit_fallback

    # analyzer.py:506-559 branch coverage
    r = fit_fallback(5, 3, ["Python", "go"], ["python", "java", "go", "sql"], 0)
    assert r["fit_score"] == 50 + 15 + int(2 / 4 * 20)
    assert r["recommendation"] == "good_fit"
    assert fit_fallback(2.5, 3, [], ["x"], 0)["fit_score"] == 55   # ≥ 0.7·min
    assert fit_fallback(0, 3, [], ["x"], 0)["fit_score"] == 40     # under
    assert fit_fallback(0, 3, [], ["x"], 0)["recommendation"] == "needs_review"
    assert fit_fallback(5, 3, [], [], 0)["fit_score"] == 65        # no req: no term
    assert fit_fallback(5, 3, [], [], 0)["recommendation"] == "potential_fit"
    assert fit_fallback(5, 3, [], [], 20)["fit_score"] == 0        # clamp floor
    assert fit_fallback(5, 0, ["a"], ["a"], 0)["fit_score"] == 85
    # years >= min when min is 0 → +15 branch
    assert fit_fallback(0, 0, [], ["a"], 0)["fit_score"] == 65


# ---------- native == kernel parity ----------

@pytest.fixture(scope="module")
def attrs_rows(spark):
    from engine.spark.ats import with_candidate_attrs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return {r.doc_id: r for r in with_candidate_attrs(docs).collect()}


def _kernel_scores(r):
    from engine.spark import ats as A

    exp = experience_score(r.resume_years, A.JD_MIN_YEARS, A.JD_MAX_YEARS)
    edu = education_score(list(r.degrees), A.REQUIRED_EDU)
    return ats_score(
        r.matched_required, len(A.REQUIRED_SKILLS),
        r.matched_preferred, len(A.PREFERRED_SKILLS),
        r.matched_keywords, len(A.JD_KEYWORDS),
        exp, edu,
    )


def test_candidate_attrs_match_text(spark, attrs_rows):
    # containment hits/misses recomputed in Python over the raw text
    from engine.spark import ats as A

    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()}
    for doc_id, r in list(attrs_rows.items())[:200]:
        lower = docs[doc_id].lower()
        assert r.matched_required == sum(kw in lower for kw in A.REQUIRED_SKILLS)
        assert list(r.missing_required) == [
            kw for kw in A.REQUIRED_SKILLS if kw not in lower
        ]
        assert r.resume_years == (doc_id % 25) * 0.5


def test_ats_full_score_matches_kernel(spark, attrs_rows):
    from engine.spark.ats import ats_full_score

    got = {r.doc_id: r for r in ats_full_score(spark, SF_DIR).collect()}
    assert len(got) == len(attrs_rows)
    for doc_id, r in got.items():
        k = _kernel_scores(attrs_rows[doc_id])
        assert r.skills_match_score == k["skills_match_score"], doc_id
        assert r.keyword_match_score == k["keyword_match_score"], doc_id
        assert r.experience_match_score == k["experience_match_score"], doc_id
        assert r.education_match_score == k["education_match_score"], doc_id
        assert r.ats_score == k["ats_score"], doc_id
        assert r.summary == ats_summary(
            k["ats_score"], attrs_rows[doc_id].matched_required, 5
        ), doc_id


def test_ats_suggestions_match_kernel(spark, attrs_rows):
    from engine.spark import ats as A

    got = {r.doc_id: r for r in A.ats_suggestions(spark, SF_DIR).collect()}
    for doc_id, r in got.items():
        a = attrs_rows[doc_id]
        k = _kernel_scores(a)
        expected = ats_suggestions(
            list(a.missing_required), list(a.missing_preferred),
            list(a.missing_keywords),
            k["experience_match_score"], k["education_match_score"],
            a.has_summary,
            ["present"] if a.has_certifications else [],
            list(A.JD_CERTS),
        )
        assert r.suggestions == "|".join(expected), doc_id
        assert r.n_suggestions == len(expected), doc_id


def test_fit_fallback_matches_kernel(spark, attrs_rows):
    from engine.kernel.scoring import fit_fallback
    from engine.spark import ats as A

    got = {r.doc_id: r for r in A.candidate_fit_fallback(spark, SF_DIR).collect()}
    assert len(got) == len(attrs_rows)
    for doc_id, r in got.items():
        a = attrs_rows[doc_id]
        k = fit_fallback(
            a.resume_years, A.JD_MIN_YEARS, list(a.fit_skills),
            list(A.FIT_REQUIRED_SKILLS), a.n_red_flags,
        )
        assert r.fit_score == k["fit_score"], doc_id
        assert a.fit_score == k["fit_score"], doc_id  # attrs carry the same
        assert r.recommendation == k["recommendation"], doc_id
        assert r.recommendation_text == k["recommendation_text"], doc_id


def test_hiring_recommendation_matches_kernel(spark, attrs_rows):
    from engine.spark import ats as A

    got = {r.cohort: r for r in A.hiring_recommendation(spark, SF_DIR).collect()}
    cohorts: dict[int, list] = {}
    for doc_id, a in attrs_rows.items():
        k = _kernel_scores(a)
        overall = overall_candidate_score(k["ats_score"], a.fit_score)
        cohorts.setdefault(doc_id % 10, []).append(
            (overall, f"doc-{doc_id}", a.has_critical_red_flags, doc_id)
        )
    for cohort, members in cohorts.items():
        ranked = sorted(members, key=lambda m: (-m[0], m[3]))
        expected = hiring_recommendation([(m[0], m[1], m[2]) for m in ranked])
        r = got[cohort]
        assert r.recommendation == expected, cohort
        assert r.top_score == ranked[0][0]
        assert r.top_doc_id == ranked[0][3]
        assert r.total_candidates == len(members)
        assert r.n_excellent == sum(m[0] >= 85 for m in members)
        assert r.n_poor == sum(m[0] < 50 for m in members)
