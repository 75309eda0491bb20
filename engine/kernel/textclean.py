"""Text cleaning kernel (SURVEY.md §2.3 T1–T6, §2.2 P5).

Semantics re-derived from the reference text processor
(/root/reference/backend/app/services/pdf/processor.py:110-318,473-520):
encoding fixes are applied first, then whitespace normalization, then
standalone-page-number removal, then repeated header/footer removal,
then per-line strip with a cap of two consecutive blank lines, then a
final global strip. Order matters and is preserved exactly.
"""

from __future__ import annotations

import re
from typing import Any

# T1 — encoding fixes, applied sequentially in this order
# (processor.py:205-221; plain str.replace, first-to-last).
_ENCODING_FIXES: tuple[tuple[str, str], ...] = (
    ("ﬁ", "fi"),   # ﬁ ligature
    ("ﬂ", "fl"),   # ﬂ ligature
    ("ﬀ", "ff"),   # ﬀ ligature
    ("ﬃ", "ffi"),  # ﬃ ligature
    ("ﬄ", "ffl"),  # ﬄ ligature
    ("﻿", ""),     # byte-order mark
    (" ", " "),    # non-breaking space
    ("‘", "'"),    # left single quote
    ("’", "'"),    # right single quote
    ("“", '"'),    # left double quote
    ("”", '"'),    # right double quote
    ("–", "-"),    # en dash
    ("—", "-"),    # em dash
    ("…", "..."),  # ellipsis
    ("­", ""),     # soft hyphen
)

# T2 — collapse runs of non-newline whitespace (processor.py:150).
_INLINE_WS = re.compile(r"[^\S\n]+")

# T3 — standalone page-number lines (processor.py:239-241).
_PAGE_NO = re.compile(r"^(?:page\s*)?\d+(?:\s*(?:of|/)\s*\d+)?$", re.IGNORECASE)
_PAGE_NO_DASHED = re.compile(r"^[-–—]\s*\d+\s*[-–—]$")

# T6 — structured-data probes (processor.py:296-301).
_STRUCT_PROBES = (
    re.compile(r"\d{1,2}[/-]\d{1,2}[/-]\d{2,4}", re.IGNORECASE),
    re.compile(r"\$[\d,]+\.?\d*", re.IGNORECASE),
    re.compile(r"\b[A-Z]{2,}-?\d+\b", re.IGNORECASE),
    re.compile(r"total|subtotal|amount|qty|quantity", re.IGNORECASE),
)

_HAS_DIGIT = re.compile(r"\d")


def _has_structured_data(cleaned: str) -> bool:
    """Boolean-equivalent fast path for any(_STRUCT_PROBES): cheap
    necessary-condition guards (C substring scans / first-digit stop)
    before each full regex scan. The keyword probe reduces to plain
    substring membership ('subtotal' ⊃ 'total' so three checks cover
    the alternation); the other three all require a digit, and two
    require '$' / a separator besides. Guard-equivalence with the probe
    table is asserted in tests (same pattern as the detector guards).
    """
    lower = cleaned.lower()
    if "total" in lower or "amount" in lower or "qty" in lower or "quantity" in lower:
        return True
    # probe 1 ($ amount) can match digit-free text ("$," — [\d,]+ is
    # satisfied by a bare comma), so it runs before the digit gate
    if "$" in cleaned and _STRUCT_PROBES[1].search(cleaned):
        return True
    if _HAS_DIGIT.search(cleaned) is None:
        return False  # probes 0 and 2 both need a digit
    if ("/" in cleaned or "-" in cleaned) and _STRUCT_PROBES[0].search(cleaned):
        return True
    return _STRUCT_PROBES[2].search(cleaned) is not None


def fix_encoding(text: str) -> str:
    """Apply the 15 literal replacements of T1 in reference order."""
    for bad, good in _ENCODING_FIXES:
        if bad in text:
            text = text.replace(bad, good)
    return text


def normalize_whitespace(text: str) -> str:
    """T2: tabs→space, squeeze inline whitespace, CRLF/CR→LF."""
    text = text.replace("\t", " ")
    text = _INLINE_WS.sub(" ", text)
    return text.replace("\r\n", "\n").replace("\r", "\n")


def remove_page_numbers(text: str) -> str:
    """T3: drop lines that are only a page marker."""
    kept = []
    for line in text.split("\n"):
        s = line.strip()
        if _PAGE_NO.match(s) or _PAGE_NO_DASHED.match(s):
            continue
        kept.append(line)
    return "\n".join(kept)


def remove_repeated_lines(text: str) -> str:
    """T4: strip short lines repeating >=3 times (headers/footers).

    Frequency is counted over normalized (stripped, lowercased) short
    lines (3..100 chars); documents under 10 lines are left untouched
    (processor.py:255-283).
    """
    lines = text.split("\n")
    if len(lines) < 10:
        return text
    freq: dict[str, int] = {}
    for line in lines:
        s = line.strip()
        if 3 <= len(s) <= 100:
            key = s.lower()
            freq[key] = freq.get(key, 0) + 1
    boiler = {k for k, n in freq.items() if n >= 3}
    if not boiler:
        return text
    return "\n".join(l for l in lines if l.strip().lower() not in boiler)


def squeeze_blank_lines(text: str) -> str:
    """T5: strip each line, allow at most 2 consecutive blanks, strip ends."""
    out: list[str] = []
    blanks = 0
    for line in text.split("\n"):
        line = line.strip()
        if line:
            blanks = 0
            out.append(line)
        else:
            blanks += 1
            if blanks <= 2:
                out.append(line)
    return "\n".join(out).strip()


def quality_metrics(original: str, cleaned: str) -> dict[str, Any]:
    """T6: quality metrics over the cleaned text (processor.py:286-318)."""
    olen = len(original)
    clen = len(cleaned)
    lines = [l for l in cleaned.split("\n") if l.strip()]
    nlines = len(lines)
    avg_len = sum(len(l) for l in lines) / max(nlines, 1)
    has_struct = _has_structured_data(cleaned)
    return {
        "original_length": olen,
        "cleaned_length": clen,
        "reduction_ratio": 1 - (clen / max(olen, 1)),
        "line_count": nlines,
        "avg_line_length": avg_len,
        "has_structured_data": has_struct,
        "noise_ratio": (olen - clen) / max(olen, 1),
    }


def clean_text(
    text: str,
    normalize_ws: bool = True,
    strip_headers_footers: bool = True,
    fix_enc: bool = True,
    strip_page_numbers: bool = True,
) -> tuple[str, dict[str, Any]]:
    """T1–T6 composed in reference stage order (processor.py:110-199)."""
    cleaned = text
    if fix_enc:
        cleaned = fix_encoding(cleaned)
    if normalize_ws:
        cleaned = normalize_whitespace(cleaned)
    if strip_page_numbers:
        cleaned = remove_page_numbers(cleaned)
    if strip_headers_footers:
        cleaned = remove_repeated_lines(cleaned)
    cleaned = squeeze_blank_lines(cleaned)
    return cleaned, quality_metrics(text, cleaned)


def assess_quality(metrics: dict[str, Any]) -> dict[str, Any]:
    """P5: 100-point quality gate (processor.py:473-520).

    Penalties: cleaned<50 → −30 (elif <200 → −15); noise>0.5 → −20
    (elif >0.3 → −10); avg line <10 → −15; structured-data bonus +10
    capped at 100; floor 0; good≥70, fair≥50, else poor.
    """
    score = 100.0
    issues = 0
    if metrics["cleaned_length"] < 50:
        score -= 30
        issues += 1
    elif metrics["cleaned_length"] < 200:
        score -= 15
        issues += 1
    if metrics["noise_ratio"] > 0.5:
        score -= 20
        issues += 1
    elif metrics["noise_ratio"] > 0.3:
        score -= 10
        issues += 1
    if metrics["avg_line_length"] < 10:
        score -= 15
        issues += 1
    if metrics["has_structured_data"]:
        score = min(100.0, score + 10)
    score = max(0.0, score)
    quality = "good" if score >= 70 else "fair" if score >= 50 else "poor"
    return {"score": score, "quality": quality, "issue_count": issues}
