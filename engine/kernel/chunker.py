"""Token estimation and span-preserving chunker (SURVEY.md §2.3 T7, T8).

Semantics re-derived from the reference chunker
(/root/reference/backend/app/services/pdf/processor.py:90-107,321-434):
~4 chars per token; chunks of max_tokens*4 chars with overlap_tokens*4
char overlap; when a chunk would split mid-text, the boundary snaps to
the last sentence end within the final 20% of the window, falling back
to the last newline (if past 50%) then ';'/',' (if past 70%).
Character offsets (start_char, end_char) index into the *cleaned* text;
chunk content is the stripped slice.
"""

from __future__ import annotations

import re
from typing import Any

CHARS_PER_TOKEN = 4

_SENTENCE_END = re.compile(r"[.!?]+(?:\s|$)")


def estimate_tokens(text: str) -> int:
    """T7: max(1, len//4) (processor.py:94-107)."""
    return max(1, len(text) // CHARS_PER_TOKEN)


def _snap_to_boundary(window: str) -> int:
    """Best break position inside `window`, 0 if none (processor.py:409-434)."""
    last = None
    for m in _SENTENCE_END.finditer(window):
        last = m
    if last is not None:
        return last.end()
    nl = window.rfind("\n")
    if nl > len(window) * 0.5:
        return nl + 1
    for punct in (";", ","):
        pos = window.rfind(punct)
        if pos > len(window) * 0.7:
            return pos + 1
    return 0


def chunk_text(
    text: str,
    max_tokens: int = 3000,
    overlap_tokens: int = 100,
    preserve_sentences: bool = True,
) -> list[dict[str, Any]]:
    """T8: overlapping char-offset spans (processor.py:321-406)."""
    if not text.strip():
        return []

    max_chars = max_tokens * CHARS_PER_TOKEN
    overlap_chars = overlap_tokens * CHARS_PER_TOKEN

    if len(text) <= max_chars:
        return [
            {
                "content": text,
                "index": 0,
                "start_char": 0,
                "end_char": len(text),
                "estimated_tokens": estimate_tokens(text),
            }
        ]

    spans: list[dict[str, Any]] = []
    start = 0
    idx = 0
    n = len(text)
    while start < n:
        end = min(start + max_chars, n)
        if end < n and preserve_sentences:
            search_start = start + int(max_chars * 0.8)
            snap = _snap_to_boundary(text[search_start:end])
            if snap > 0:
                end = search_start + snap
        content = text[start:end].strip()
        if content:
            spans.append(
                {
                    "content": content,
                    "index": idx,
                    "start_char": start,
                    "end_char": end,
                    "estimated_tokens": estimate_tokens(content),
                }
            )
            idx += 1
        start = end - overlap_chars
        if start >= n - overlap_chars:
            break
    return spans
