"""Document-type detector kernel (SURVEY.md §2.3 T10).

Weighted keyword + regex-pattern classifier re-derived from the
reference detector (/root/reference/backend/app/services/pdf/detector.py
:50-320). The weight tables below are parity *data* (cited constants),
not copied code: keyword score per hit = w + 0.5*w*min(count-1, 3);
pattern score per hit = w * (1 + (min(matches,5)-1)*0.3); combined
0.6*kw + 0.4*pat, normalized by 15.0, capped at 1.0; argmax wins if
confidence >= min_confidence (ties go to invoice), else 'unknown'.
"""

from __future__ import annotations

import re
from typing import Any

# (keyword, weight) — detector.py:50-86
INVOICE_KEYWORDS = (
    ("invoice", 3.0), ("invoice number", 3.0), ("invoice #", 3.0),
    ("inv-", 2.5), ("invoice date", 2.5), ("due date", 2.0),
    ("payment terms", 2.0), ("bill to", 2.5), ("ship to", 1.5),
    ("purchase order", 2.0), ("po number", 2.0), ("po #", 2.0),
    ("subtotal", 2.0), ("total amount", 2.0), ("grand total", 2.0),
    ("balance due", 2.5), ("amount due", 2.5), ("tax", 1.5),
    ("vat", 1.5), ("gst", 1.5), ("discount", 1.0), ("shipping", 1.0),
    ("quantity", 1.0), ("qty", 1.0), ("unit price", 1.5), ("rate", 0.8),
    ("description", 0.5), ("item", 0.5), ("payment", 1.0), ("remit", 1.5),
    ("vendor", 1.5), ("supplier", 1.5),
)

# (keyword, weight) — detector.py:88-142
RESUME_KEYWORDS = (
    ("resume", 3.5), ("curriculum vitae", 3.5), ("cv", 2.5),
    ("career objective", 3.0), ("professional summary", 3.0),
    ("work experience", 3.5), ("professional experience", 3.5),
    ("employment history", 3.0), ("work history", 3.0),
    ("education", 2.5), ("skills", 2.5), ("technical skills", 3.0),
    ("core competencies", 2.5), ("key skills", 2.5),
    ("certifications", 2.5), ("certificates", 2.0),
    ("qualifications", 2.0), ("references", 2.0),
    ("references available", 2.5), ("achievements", 2.0),
    ("accomplishments", 2.0), ("projects", 2.0),
    ("personal projects", 2.5), ("bachelor", 2.0), ("master", 2.0),
    ("degree", 2.0), ("university", 1.5), ("college", 1.5),
    ("gpa", 2.0), ("cgpa", 2.0), ("graduated", 1.5), ("graduation", 1.5),
    ("proficient", 1.5), ("experienced in", 2.0),
    ("responsible for", 1.5), ("years of experience", 2.5),
    ("yrs experience", 2.5), ("linkedin", 2.5), ("github", 2.0),
    ("portfolio", 2.0), ("languages", 1.5), ("fluent", 1.5),
    ("native speaker", 2.0), ("seeking position", 2.5),
    ("looking for opportunities", 2.5), ("career goals", 2.0),
)

# (pattern, weight) — detector.py:145-160
INVOICE_PATTERNS = (
    (r"inv(?:oice)?[\s\-#:]*(?:no\.?|number)?[\s\-#:]*[A-Z0-9\-]+", 2.5),
    (r"#\s*\d{4,}", 1.0),
    (r"(?:invoice|due|payment)\s*date\s*[:\-]?\s*\d", 2.0),
    (r"\$[\d,]+\.?\d*", 1.5),
    (r"(?:USD|EUR|GBP|CAD)\s*[\d,]+\.?\d*", 1.5),
    (r"\d+\s*(?:x|@)\s*\$?[\d,]+\.?\d*", 1.5),
    (r"(?:sub)?total\s*[:\-]?\s*\$?[\d,]+\.?\d*", 2.0),
    (r"tax\s*\(?[\d.]+%?\)?", 1.5),
)

# (pattern, weight) — detector.py:162-177
RESUME_PATTERNS = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", 1.5),
    (r"(?:\+\d{1,3}[\s\-]?)?\(?\d{3}\)?[\s\-]?\d{3}[\s\-]?\d{4}", 1.0),
    (r"linkedin\.com/in/[\w\-]+", 2.0),
    (r"github\.com/[\w\-]+", 1.5),
    (r"(?:19|20)\d{2}\s*[-–]\s*(?:(?:19|20)\d{2}|present|current)", 2.0),
    (r"(?:B\.?S\.?|B\.?A\.?|M\.?S\.?|M\.?A\.?|Ph\.?D\.?|MBA)", 2.0),
    (r"GPA\s*[:\-]?\s*[0-4]\.\d+", 2.0),
)

_MAX_POSSIBLE = 15.0  # normalization constant (detector.py:225)

# necessary-literal guards per pattern (index-aligned): a pattern whose
# guard substrings are all absent from the lowercased text cannot match,
# so the full-document regex scan is skipped. Guards are
# (any-of-tuple-or-None, needs_digit); needs_digit marks patterns that
# cannot match a digit-free text (first-digit presence is computed once
# per document with a stop-at-first-hit scan). Pure optimization —
# match counts are identical with or without guards (tested).
_INV_GUARDS = (
    (("inv",), False),          # inv(oice)...
    (("#",), True),             # #\s*\d{4,}
    (("date",), True),          # (invoice|due|payment)\s*date\s*..\d
    (("$",), False),            # $ amounts ([\d,]+ matches bare ',')
    (("usd", "eur", "gbp", "cad"), False),  # [\d,]+ matches bare ','
    (("x", "@"), True),         # \d+ x price
    (("total",), False),        # (sub)?total ...[\d,]+ matches bare ','
    (("tax",), False),          # tax (\(?[\d.]+%?\)? matches bare '.')
)
_RES_GUARDS = (
    (("@",), False),            # email
    (None, True),               # phone (≥10 digits; no cheap literal)
    (("linkedin",), False),
    (("github",), False),
    (("19", "20"), True),       # year ranges
    (None, False),              # degree abbreviations
    (("gpa",), True),           # GPA\s*[:\-]?\s*[0-4]\.\d+
)

_INV_PAT = tuple(
    (re.compile(p, re.IGNORECASE), w, g, nd)
    for (p, w), (g, nd) in zip(INVOICE_PATTERNS, _INV_GUARDS)
)
_RES_PAT = tuple(
    (re.compile(p, re.IGNORECASE), w, g, nd)
    for (p, w), (g, nd) in zip(RESUME_PATTERNS, _RES_GUARDS)
)

_HAS_DIGIT = re.compile(r"\d")


def _keyword_score(lower_text: str, table) -> tuple[float, list[str]]:
    """(score, matched keywords in table order) — detector.py:264-291."""
    total = 0.0
    matched: list[str] = []
    count = lower_text.count
    for kw, w in table:
        n = count(kw)
        if n:
            total += w + (w * 0.5 * min(n - 1, 3))
            matched.append(kw)
    return total, matched


def _pattern_score(text: str, lower_text: str, compiled,
                   has_digit: bool) -> tuple[float, list[str]]:
    """(score, first-match example per hit pattern, 50-char cap) —
    detector.py:293-320. The guards never change which patterns hit
    (pure necessary conditions, equivalence-tested), so the matched
    list is guard-invariant too."""
    total = 0.0
    matched: list[str] = []
    for pat, w, guards, needs_digit in compiled:
        if needs_digit and not has_digit:
            continue
        if guards is not None and not any(g in lower_text for g in guards):
            continue
        # the score caps at 5 matches (detector.py:314), so stop
        # scanning there — identical result, no full-document findall
        n = 0
        first = None
        for m in pat.finditer(text):
            if n == 0:
                first = m.group()[:50]
            n += 1
            if n == 5:
                break
        if n:
            total += w * (1 + (n - 1) * 0.3)
            matched.append(first)
    return total, matched


def detect_document_type(text: str, min_confidence: float = 0.3) -> dict[str, Any]:
    """Classify text as invoice/resume/unknown with confidence scores
    and the winner's matched keyword/pattern evidence (top 10 / top 5,
    detector.py:250-256; empty for unknown)."""
    lower = text.lower()
    has_digit = _HAS_DIGIT.search(text) is not None
    inv_kw, inv_kw_m = _keyword_score(lower, INVOICE_KEYWORDS)
    res_kw, res_kw_m = _keyword_score(lower, RESUME_KEYWORDS)
    inv_pat, inv_pat_m = _pattern_score(text, lower, _INV_PAT, has_digit)
    res_pat, res_pat_m = _pattern_score(text, lower, _RES_PAT, has_digit)
    inv = inv_kw * 0.6 + inv_pat * 0.4
    res = res_kw * 0.6 + res_pat * 0.4
    inv_conf = min(1.0, inv / _MAX_POSSIBLE)
    res_conf = min(1.0, res / _MAX_POSSIBLE)

    if inv_conf >= res_conf and inv_conf >= min_confidence:
        doc_type, confidence = "invoice", inv_conf
        kw_m, pat_m = inv_kw_m, inv_pat_m
    elif res_conf > inv_conf and res_conf >= min_confidence:
        doc_type, confidence = "resume", res_conf
        kw_m, pat_m = res_kw_m, res_pat_m
    else:
        doc_type, confidence = "unknown", max(inv_conf, res_conf)
        kw_m, pat_m = [], []

    return {
        "document_type": doc_type,
        "confidence": confidence,
        "scores": {"invoice": inv_conf, "resume": res_conf},
        "matched_keywords": kw_m[:10],
        "matched_patterns": pat_m[:5],
    }
