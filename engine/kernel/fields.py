"""Deterministic rule-based field extraction (SURVEY.md §2.3 T11 stand-in).

The reference delegates field extraction to a remote LLM
(/root/reference/backend/app/services/llm/prompts.py:42-433,
client.py:548-632) which is non-deterministic and excluded from the
correctness gate (SURVEY.md §7.3.6). This module supplies the gated
replacement: regex field extractors over the same document shapes the
reference's prompts target (invoice headers/amounts, resume contacts),
so the downstream normalize/validate/confidence stages (T13–T18, A2–A4)
exercise the full pipeline deterministically.
"""

from __future__ import annotations

import re
from typing import Any

_INVOICE_NO = re.compile(
    r"invoice\s*(?:no\.?|number|#)?\s*[:\-#]?\s*([A-Za-z]{0,5}[-_/]?\d[\w\-/]*)",
    re.IGNORECASE,
)
_DATE_LINE = re.compile(
    r"(invoice\s*date|due\s*date|date)\s*[:\-]?\s*([\w ./,\-]+)", re.IGNORECASE
)
_AMOUNT_LINE = re.compile(
    r"(subtotal|tax|shipping|discount|total\s*amount|grand\s*total|balance\s*due|"
    r"amount\s*due|total)\s*[:\-]?\s*([$€£₹]?\s*[\d.,]+)",
    re.IGNORECASE,
)
_VENDOR = re.compile(r"^(?:from|vendor|supplier|billed\s*by)\s*[:\-]\s*(.+)$",
                     re.IGNORECASE | re.MULTILINE)
_EMAIL = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}")
_PHONE = re.compile(r"(?:\+\d{1,3}[\s\-]?)?\(?\d{3}\)?[\s\-]?\d{3}[\s\-]?\d{4}")
_SKILLS_SECTION = re.compile(
    r"(?:technical\s+skills|skills)\s*[:\-]?\s*\n?(.+)", re.IGNORECASE
)
_NAME_LINE = re.compile(r"^(?:name)\s*[:\-]\s*(.+)$", re.IGNORECASE | re.MULTILINE)

_AMOUNT_KEY = {
    "subtotal": "subtotal",
    "tax": "tax_amount",
    "shipping": "shipping_amount",
    "discount": "discount_amount",
    "total amount": "total_amount",
    "grand total": "grand_total",
    "balance due": "balance_due",
    "amount due": "balance_due",
    "total": "total_amount",
}


def extract_invoice_fields(text: str) -> dict[str, Any]:
    out: dict[str, Any] = {}
    m = _INVOICE_NO.search(text)
    if m:
        out["invoice_number"] = m.group(1).strip()
    for m in _DATE_LINE.finditer(text):
        label = re.sub(r"\s+", " ", m.group(1).lower())
        value = m.group(2).strip()
        if label == "due date" and "due_date" not in out:
            out["due_date"] = value
        elif "invoice_date" not in out:
            out["invoice_date"] = value
    for m in _AMOUNT_LINE.finditer(text):
        label = re.sub(r"\s+", " ", m.group(1).lower())
        key = _AMOUNT_KEY.get(label)
        if key and key not in out:
            out[key] = m.group(2).strip()
    m = _VENDOR.search(text)
    if m:
        out["vendor_name"] = m.group(1).strip()
    return out


def extract_resume_fields(text: str) -> dict[str, Any]:
    out: dict[str, Any] = {}
    m = _NAME_LINE.search(text)
    if m:
        out["candidate_name"] = m.group(1).strip()
    else:
        first = text.strip().split("\n", 1)[0].strip()
        # heuristic: a short first line with 2-4 capitalized words is a name
        words = first.split()
        if 1 < len(words) <= 4 and all(w[:1].isupper() for w in words if w):
            out["candidate_name"] = first
    # '@' guard: the email regex's leading char class matches nearly every
    # position, so a doomed search is a full-text backtrack scan
    m = _EMAIL.search(text) if "@" in text else None
    if m:
        out["email"] = m.group(0)
    m = _PHONE.search(text)
    if m:
        out["phone"] = m.group(0).strip()
    m = _SKILLS_SECTION.search(text)
    if m:
        raw = m.group(1).split("\n", 1)[0]
        skills = [s.strip() for s in re.split(r"[,;|]", raw) if s.strip()]
        if skills:
            out["skills"] = skills
    return out


def extract_fields(text: str, doc_type: str) -> dict[str, Any]:
    """Dispatch on detected document type; unknown → contacts only."""
    if doc_type == "invoice":
        return extract_invoice_fields(text)
    if doc_type == "resume":
        return extract_resume_fields(text)
    out: dict[str, Any] = {}
    m = _EMAIL.search(text) if "@" in text else None
    if m:
        out["email"] = m.group(0)
    return out
