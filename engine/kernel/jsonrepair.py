"""Tiered JSON parse/repair kernel (SURVEY.md §2.3 T12).

Re-derivation of the reference's 4-strategy parser
(/root/reference/backend/app/services/llm/parser.py:36-224):
1. direct json.loads; 2. fenced ```json / ``` block; 3. first-{ to
last-} brace span (repaired on failure); 4. repair the whole payload.
Repairs: drop trailing commas, quote bare keys, single→double quotes
on key/value positions, append missing closing braces/brackets.
"""

from __future__ import annotations

import json
import re
from typing import Any

_FENCES = (
    re.compile(r"```json\s*([\s\S]*?)\s*```", re.IGNORECASE),
    re.compile(r"```\s*([\s\S]*?)\s*```", re.IGNORECASE),
)
_TRAILING_COMMA = re.compile(r",\s*([}\]])")
_SQ_KEY = re.compile(r"'(\w+)':")
_SQ_VALUE = re.compile(r":\s*'([^']*)'")
_BARE_KEY = re.compile(r"(\{|\,)\s*(\w+)\s*:")


def _try_load(candidate: str) -> dict | None:
    try:
        obj = json.loads(candidate)
    except json.JSONDecodeError:
        return None
    return obj if isinstance(obj, dict) else None


def _fenced_block(text: str) -> str | None:
    for pat in _FENCES:
        m = pat.search(text)
        if m:
            return m.group(1).strip()
    return None


def _brace_span(text: str) -> str | None:
    lo, hi = text.find("{"), text.rfind("}")
    if lo != -1 and hi > lo:
        return text[lo : hi + 1]
    return None


def repair_json(payload: str) -> str | None:
    """Best-effort mechanical repair (parser.py:187-224)."""
    if not payload:
        return None
    fixed = _TRAILING_COMMA.sub(r"\1", payload)
    fixed = _SQ_KEY.sub(r'"\1":', fixed)
    fixed = _SQ_VALUE.sub(r': "\1"', fixed)
    fixed = _BARE_KEY.sub(r'\1"\2":', fixed)
    missing_braces = fixed.count("{") - fixed.count("}")
    if missing_braces > 0:
        fixed += "}" * missing_braces
    missing_brackets = fixed.count("[") - fixed.count("]")
    if missing_brackets > 0:
        fixed += "]" * missing_brackets
    return fixed


def parse_json_loose(response: str) -> tuple[dict[str, Any] | None, bool, str]:
    """Parse arbitrary LLM-ish output into a dict.

    Returns (data_or_None, was_repaired, strategy) where strategy is one
    of direct/fence/brace/brace_repaired/full_repaired/failed/empty.
    """
    if not response or not response.strip():
        return None, False, "empty"
    raw = response.strip()

    data = _try_load(raw)
    if data is not None:
        return data, False, "direct"

    fenced = _fenced_block(raw)
    if fenced:
        data = _try_load(fenced)
        if data is not None:
            return data, False, "fence"

    span = _brace_span(raw)
    if span:
        data = _try_load(span)
        if data is not None:
            return data, False, "brace"
        repaired = repair_json(span)
        if repaired:
            data = _try_load(repaired)
            if data is not None:
                return data, True, "brace_repaired"

    repaired = repair_json(raw)
    if repaired:
        data = _try_load(repaired)
        if data is not None:
            return data, True, "full_repaired"

    return None, False, "failed"
