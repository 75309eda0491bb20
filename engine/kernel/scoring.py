"""Skill matching + ATS scoring + confidence kernel (SURVEY.md §2.4–2.5).

Re-derivation of the ATS scorer and confidence math
(/root/reference/backend/app/services/ats/scorer.py:16-408,
/root/reference/backend/app/services/extraction/orchestrator.py:430-474,
/root/reference/backend/app/services/candidate/ranker.py:94-105).
"""

from __future__ import annotations

from typing import Any

# synonym table (parity data, scorer.py:16-46)
SKILL_SYNONYMS: dict[str, tuple[str, ...]] = {
    "javascript": ("js", "ecmascript", "es6", "es2015"),
    "typescript": ("ts",),
    "python": ("py", "python3", "python2"),
    "kubernetes": ("k8s", "kube"),
    "postgresql": ("postgres", "psql", "pgsql"),
    "mongodb": ("mongo",),
    "elasticsearch": ("elastic", "es"),
    "amazon web services": ("aws",),
    "google cloud platform": ("gcp", "google cloud"),
    "microsoft azure": ("azure",),
    "machine learning": ("ml",),
    "artificial intelligence": ("ai",),
    "natural language processing": ("nlp",),
    "continuous integration": ("ci",),
    "continuous deployment": ("cd",),
    "ci/cd": ("cicd", "ci-cd", "continuous integration/continuous deployment"),
    "react": ("reactjs", "react.js"),
    "node": ("nodejs", "node.js"),
    "vue": ("vuejs", "vue.js"),
    "angular": ("angularjs", "angular.js"),
    "dotnet": (".net", "dot net", "asp.net"),
    "csharp": ("c#", "c sharp"),
    "cpp": ("c++", "cplusplus"),
    "sql server": ("mssql", "microsoft sql server"),
    "restful": ("rest", "rest api", "restful api"),
    "graphql": ("gql",),
    "docker": ("containerization", "containers"),
    "terraform": ("tf", "infrastructure as code", "iac"),
    "agile": ("scrum", "kanban"),
}

DEGREE_LEVELS: dict[str, int] = {
    "phd": 5, "doctorate": 5, "ph.d": 5,
    "master": 4, "msc": 4, "mba": 4, "ms": 4,
    "bachelor": 3, "bsc": 3, "ba": 3, "bs": 3,
    "associate": 2, "diploma": 1, "certificate": 1,
}


def normalize_skill(skill: str) -> str:
    """scorer.py:49-51."""
    return skill.lower().strip().replace("-", " ").replace("_", " ")


def harvest_skills(
    skills: list[str],
    technical_skills: list[str],
    highlight_lists: list[list[str]],
) -> list[str]:
    """SO1 skill-set union (scorer.py:121-135): declared skills ∪
    technical skills ∪ capitalized words harvested from experience
    highlights (``\\b[A-Z][a-zA-Z+#]+\\b``), all normalized; returned
    sorted for deterministic comparison (the reference keeps a set)."""
    import re

    out = set()
    for s in (skills or []):
        out.add(normalize_skill(s))
    for s in (technical_skills or []):
        out.add(normalize_skill(s))
    for highlights in (highlight_lists or []):
        for h in (highlights or []):
            for word in re.findall(r"\b[A-Z][a-zA-Z+#]+\b", h):
                if len(word) > 1:
                    out.add(normalize_skill(word))
    return sorted(out)


def skill_variations(skill: str) -> set[str]:
    """All synonyms/variants of a skill (scorer.py:54-69)."""
    norm = normalize_skill(skill)
    out = {norm}
    if norm in SKILL_SYNONYMS:
        out.update(SKILL_SYNONYMS[norm])
    for key, syns in SKILL_SYNONYMS.items():
        if norm == key or norm in syns:
            out.add(key)
            out.update(syns)
    return out


def skills_match(a: str, b: str) -> tuple[bool, str]:
    """Exact / partial(substring) / synonym tiers (scorer.py:72-97)."""
    s1, s2 = normalize_skill(a), normalize_skill(b)
    if s1 == s2:
        return True, "exact"
    if s1 in s2 or s2 in s1:
        return True, "partial"
    if skill_variations(a) & skill_variations(b):
        return True, "synonym"
    return False, "none"


def experience_score(resume_years: float, min_years: float | None,
                     max_years: float | None) -> int:
    """Piecewise experience fit (scorer.py:314-348)."""
    if min_years is None and max_years is None:
        return 100
    if min_years is None:
        min_years = 0
    if max_years is None:
        max_years = min_years + 10
    if resume_years >= min_years:
        if resume_years <= max_years:
            return 100
        return max(60, 100 - int((resume_years - max_years) * 5))
    under = min_years - resume_years
    if under <= 1:
        return 70
    if under <= 2:
        return 50
    return max(20, 50 - int(under * 10))


def education_score(degrees: list[str], required_edu: str) -> int:
    """Degree-level lattice match (scorer.py:350-408)."""
    req = (required_edu or "").lower()
    if not req:
        return 100
    if not degrees:
        return 30
    req_level = 0
    for key, level in DEGREE_LEVELS.items():
        if key in req:
            req_level = level
            break
    cand = 0
    for d in degrees:
        dl = d.lower()
        for key, level in DEGREE_LEVELS.items():
            if key in dl:
                cand = max(cand, level)
    if cand >= req_level:
        return 100
    if cand == req_level - 1:
        return 70
    return 40


def ats_score(matched_required: int, total_required: int,
              matched_preferred: int, total_preferred: int,
              matched_keywords: int, total_keywords: int,
              exp_score: int, edu_score: int) -> dict[str, int]:
    """Weighted ATS aggregate: skills .40, keywords .25, exp .25, edu .10
    (scorer.py:207-240)."""
    required_part = (matched_required / total_required) * 70 if total_required else 70
    preferred_part = (matched_preferred / total_preferred) * 30 if total_preferred else 30
    skills = int(required_part + preferred_part)
    keywords = int((matched_keywords / total_keywords) * 100) if total_keywords else 100
    overall = int(skills * 0.40 + keywords * 0.25 + exp_score * 0.25 + edu_score * 0.10)
    return {
        "skills_match_score": skills,
        "keyword_match_score": keywords,
        "experience_match_score": exp_score,
        "education_match_score": edu_score,
        "ats_score": overall,
    }


def ats_suggestions(
    missing_required: list[str],
    missing_preferred: list[str],
    missing_keywords: list[str],
    experience_score: int,
    education_score: int,
    has_summary: bool,
    certifications: list[str],
    jd_certs: list[str],
) -> list[str]:
    """Rule-based improvement suggestions, max 7 (scorer.py:410-479)."""
    suggestions: list[str] = []
    if missing_required:
        suggestions.append(
            "Add these required skills if you have experience: "
            + ", ".join(missing_required[:5])
        )
    if missing_preferred and len(missing_preferred) > len(missing_required):
        top = [s for s in missing_preferred[:3] if s not in missing_required]
        if top:
            suggestions.append(
                "Consider highlighting these preferred skills: " + ", ".join(top)
            )
    if missing_keywords:
        unique = [
            k for k in missing_keywords[:5]
            if k not in missing_required and k not in missing_preferred
        ]
        if unique:
            suggestions.append(
                "Include these keywords in your resume: " + ", ".join(unique)
            )
    if experience_score < 70:
        suggestions.append(
            "Highlight relevant projects or freelance work to bridge experience gap"
        )
    if education_score < 70:
        suggestions.append(
            "List relevant certifications or courses to strengthen education section"
        )
    if not has_summary:
        suggestions.append(
            "Add a professional summary highlighting your fit for this role"
        )
    if jd_certs and not certifications:
        suggestions.append(
            "Consider obtaining relevant certifications: " + ", ".join(jd_certs[:3])
        )
    return suggestions[:7]


def ats_summary(ats_score: int, matched_required: int, total_required: int) -> str:
    """Graded ATS score explanation string (scorer.py:481-517)."""
    if ats_score >= 90:
        grade, detail = "Excellent", "This resume is highly optimized for this job posting."
    elif ats_score >= 75:
        grade, detail = "Good", "Strong match with room for minor improvements."
    elif ats_score >= 60:
        grade, detail = "Fair", "Moderate match - consider adding missing keywords."
    elif ats_score >= 40:
        grade, detail = "Needs Work", "Significant gaps in required skills or keywords."
    else:
        grade, detail = "Poor Match", "Major mismatch - this role may not be a good fit."
    skill_info = (
        f" Matched {matched_required}/{total_required} required skills."
        if total_required > 0
        else ""
    )
    return f"{grade} ({ats_score}/100). {detail}{skill_info}"


def hiring_recommendation(
    ranked: list[tuple[int, str, bool]],
) -> str:
    """Pool-level hiring recommendation from the ranked score list
    (ranker.py:135-165). ``ranked`` is [(overall_score, name,
    has_critical_red_flags), ...] sorted by score descending."""
    if not ranked:
        return "No candidates to evaluate."
    top_score, top_name, top_flags = ranked[0]
    strong_hires = len([r for r in ranked if r[0] >= 85])
    if top_score >= 85 and not top_flags:
        return (
            f"✅ STRONG RECOMMENDATION: Top candidate ({top_name}) is an "
            f"excellent fit with {top_score}/100 score and no critical red flags."
        )
    if strong_hires > 0:
        return (
            f"✅ GOOD POOL: {strong_hires} strong candidate(s) available. "
            f"Top score: {top_score}/100. Review red flags before proceeding."
        )
    if top_score >= 70:
        return (
            f"⚠️ ACCEPTABLE: Top candidate at {top_score}/100. "
            f"Pool quality is moderate. Consider expanding search."
        )
    return (
        f"❌ WEAK POOL: Highest score is {top_score}/100. "
        f"Not recommended to proceed without additional candidates."
    )


def overall_candidate_score(ats_score: int, fit_score: int) -> int:
    """Overall = 40% ATS + 60% fit (resume.py:349,437)."""
    return int(ats_score * 0.4 + fit_score * 0.6)


def fit_fallback(
    total_years: float,
    min_years: float,
    skills: list[str],
    required_skills: list[str],
    n_red_flags: int,
) -> dict[str, Any]:
    """Deterministic fit score + recommendation — the reference's
    rule-based candidate-fit path (analyzer.py:506-559, the non-LLM
    half of the fit analysis): base 50, experience-vs-minimum step
    (+15 / +5 above 70% of min / −10), exact-lowercase required-skill
    overlap ratio × 20 (truncated), −5 per red flag, clamped to
    [0, 100]; recommendation good_fit ≥ 70 / potential_fit ≥ 50 /
    needs_review."""
    score = 50
    years = total_years or 0
    min_y = min_years or 0
    if years >= min_y:
        score += 15
    elif years >= min_y * 0.7:
        score += 5
    else:
        score -= 10
    have = {s.lower() for s in (skills or [])}
    req = {s.lower() for s in (required_skills or [])}
    if req:
        overlap = len(have & req) / len(req)
        score += int(overlap * 20)
    score -= n_red_flags * 5
    score = max(0, min(100, score))
    if score >= 70:
        rec, text = "good_fit", "Candidate shows potential based on available data"
    elif score >= 50:
        rec, text = "potential_fit", "Some gaps identified, further review recommended"
    else:
        rec, text = "needs_review", "Significant gaps, careful evaluation needed"
    return {
        "fit_score": score,
        "recommendation": rec,
        "recommendation_text": text,
    }


def field_confidence(data: dict[str, Any], required_fields: list[str],
                     detection_confidence: float) -> dict[str, float]:
    """A4: presence-based field scores + 0.7/0.3 overall blend
    (orchestrator.py:430-474)."""
    scores: dict[str, float] = {}
    for f in required_fields:
        v = data.get(f)
        if f in data and v is not None:
            base = 0.9
            if isinstance(v, str) and len(v) > 2:
                base = 0.95
            if isinstance(v, (int, float)) and not isinstance(v, bool) and v > 0:
                base = 0.95
            scores[f] = base
        else:
            scores[f] = 0.0
    if scores:
        overall = (sum(scores.values()) / len(scores)) * 0.7 + detection_confidence * 0.3
    else:
        overall = detection_confidence * 0.5
    scores["overall"] = min(1.0, overall)
    return scores


def score_bucket(overall_score: float) -> str:
    """A7 distribution buckets (ranker.py:94-105)."""
    if overall_score >= 85:
        return "excellent"
    if overall_score >= 70:
        return "good"
    if overall_score >= 50:
        return "acceptable"
    return "poor"


# A3 field-importance weights (validator.py:79-95); unknown fields
# default to 0.5 (validator.py:576)
FIELD_WEIGHTS: dict[str, float] = {
    "invoice_number": 1.0,
    "total_amount": 1.0,
    "invoice_date": 0.8,
    "vendor_name": 0.8,
    "subtotal": 0.7,
    "tax_amount": 0.6,
    "customer_name": 0.5,
    "line_items": 0.5,
    "payment_terms": 0.4,
    "notes": 0.2,
    "reference_number": 0.2,
}

# A3 issue penalties (validator.py:586-600); cap 0.5 (validator.py:603)
ISSUE_PENALTIES: dict[str, float] = {
    "critical": 0.3,
    "warning": 0.1,
    "info": 0.02,
}


def overall_validation_score(
    field_scores: list[tuple[str, float]],
    issue_severities: list[str],
) -> float:
    """A3 weighted validation score (validator.py:564-605).

    Weighted mean of per-field scores (weights table above, 0.5 for
    unknown fields; base 0.5 if total weight is 0, 0.0 if no fields),
    minus severity penalties (critical 0.3 / warning 0.1 / info 0.02)
    capped at 0.5; floored at 0 and rounded to 3 decimals.
    """
    if not field_scores:
        return 0.0
    total_weight = 0.0
    weighted_sum = 0.0
    for name, score in field_scores:
        w = FIELD_WEIGHTS.get(name, 0.5)
        weighted_sum += score * w
        total_weight += w
    base = 0.5 if total_weight == 0 else weighted_sum / total_weight
    penalty = sum(ISSUE_PENALTIES.get(s, 0.0) for s in issue_severities)
    penalty = min(penalty, 0.5)
    return round(max(0.0, base - penalty), 3)


# --- career progression (analyzer.py:443-470, schemas/candidate.py:72-80) ---

CAREER_TITLES = (
    "Engineer", "Senior Engineer", "Lead Engineer", "Engineering Manager",
)


def career_progression(jobs: list[dict]) -> dict:
    """Deterministic CareerProgression derivation from an experience
    array — the native counterpart of the reference's LLM-filled
    ``CareerProgression`` response model (backend/app/services/
    candidate/analyzer.py:443-470; schema backend/app/schemas/
    candidate.py:72-80): trajectory, avg/longest tenure, company
    count, leadership progression, summary — plus n_roles /
    longest-gap / most-recent-title, all derivable without an LLM.

    ``jobs`` is most-recent-first (resume order); each entry carries
    duration_months, level (0=IC..3=Manager), company,
    gap_after_months (gap to the NEXT-older role; the last entry's
    gap is ignored). Trajectory compares consecutive chronological
    level steps: all up → upward, all down → downward, flat →
    lateral, otherwise mixed; a single role is lateral.
    avg_tenure_months rounds to 4 dp (every tie-free rational with
    denominator ≤ 5, so engines agree bit-for-bit). An empty history
    (a resume whose experience failed to parse) yields the degenerate
    lateral record, not a crash."""
    n = len(jobs)
    if n == 0:
        return {
            "n_roles": 0,
            "avg_tenure_months": 0.0,
            "longest_tenure_months": 0,
            "total_companies": 0,
            "longest_gap_months": 0,
            "trajectory": "lateral",
            "has_leadership_progression": False,
            "most_recent_title": "",
            "progression_summary": (
                "lateral trajectory across 0 companies over 0 roles"
            ),
        }
    durs = [j["duration_months"] for j in jobs]
    levels = [j["level"] for j in jobs]
    comps = [j["company"] for j in jobs]
    gaps = [j["gap_after_months"] for j in jobs[:-1]]
    climbs = [levels[i] - levels[i + 1] for i in range(n - 1)]
    any_up = any(c > 0 for c in climbs)
    any_down = any(c < 0 for c in climbs)
    if any_up and any_down:
        traj = "mixed"
    elif any_up:
        traj = "upward"
    elif any_down:
        traj = "downward"
    else:
        traj = "lateral"
    n_companies = len(set(comps))
    return {
        "n_roles": n,
        "avg_tenure_months": round(sum(durs) / n, 4),
        "longest_tenure_months": max(durs),
        "total_companies": n_companies,
        "longest_gap_months": max(gaps) if gaps else 0,
        "trajectory": traj,
        "has_leadership_progression": levels[0] >= 2 and levels[0] > levels[-1],
        "most_recent_title": CAREER_TITLES[levels[0]],
        "progression_summary": (
            f"{traj} trajectory across {n_companies} companies "
            f"over {n} roles"
        ),
    }


# --- candidate-fit response normalization (analyzer.py:401-505) ---

RED_FLAG_TYPES = (
    "short_tenure", "employment_gap", "overqualified", "underqualified",
    "frequent_job_changes", "career_regression", "overlapping_jobs",
    "missing_recent_experience", "no_progression", "education_mismatch",
    "other",
)
RECOMMENDATION_TYPES = (
    "strong_hire", "good_fit", "potential_fit", "needs_review",
    "not_recommended",
)
_RED_FLAG_TYPES_UPPER = frozenset(t.upper() for t in RED_FLAG_TYPES)
_RECOMMENDATION_TYPES_UPPER = frozenset(r.upper() for r in RECOMMENDATION_TYPES)


def _or_default(value, default):
    """JSON-null behaves like a missing key (deliberate deviation from
    the reference's bare dict.get, whose explicit-null passthrough
    would crash its own pydantic model downstream); matches the native
    twin's coalesce semantics."""
    return default if value is None else value


def parse_candidate_fit(data: dict) -> dict:
    """The reference's deterministic post-LLM normalization of a
    candidate-fit response (backend/app/services/candidate/
    analyzer.py:401-505, enums schemas/candidate.py:13-45): red-flag
    type allowlist (unknown → "other"), severity allowlist (unknown →
    "medium"), per-item defaults (title "Unspecified flag", strength
    category "general" / relevance 80), recommendation uppercase-map
    with NEEDS_REVIEW fallback, fit_score default 50, derived
    red_flag_count and has_critical_red_flags (any normalized
    severity == high). Malformed (non-dict) list entries are skipped,
    like the reference's per-item try/except."""
    red_flags = []
    for rf in data.get("red_flags") or []:
        if not isinstance(rf, dict):
            continue
        ft = str(_or_default(rf.get("flag_type"), "OTHER")).upper()
        if ft not in _RED_FLAG_TYPES_UPPER:
            ft = "OTHER"
        sev = str(_or_default(rf.get("severity"), "medium")).lower()
        if sev not in ("high", "medium", "low"):
            sev = "medium"
        red_flags.append(
            {
                "flag_type": ft.lower(),
                "severity": sev,
                "title": _or_default(rf.get("title"), "Unspecified flag"),
                "description": _or_default(rf.get("description"), ""),
            }
        )
    strengths = []
    for s in data.get("strengths") or []:
        if not isinstance(s, dict):
            continue
        strengths.append(
            {
                "category": _or_default(s.get("category"), "general"),
                "title": _or_default(s.get("title"), ""),
                "description": _or_default(s.get("description"), ""),
                "relevance_score": _or_default(s.get("relevance_score"), 80),
            }
        )
    rec = str(_or_default(data.get("recommendation"), "NEEDS_REVIEW")).upper()
    if rec not in _RECOMMENDATION_TYPES_UPPER:
        rec = "NEEDS_REVIEW"
    return {
        "fit_score": _or_default(data.get("fit_score"), 50),
        "recommendation": rec.lower(),
        "recommendation_text": _or_default(data.get("recommendation_text"), ""),
        "red_flags": red_flags,
        "red_flag_count": len(red_flags),
        "has_critical_red_flags": any(
            f["severity"] == "high" for f in red_flags
        ),
        "strengths": strengths,
        "n_strengths": len(strengths),
        "executive_summary": _or_default(data.get("executive_summary"), ""),
    }
