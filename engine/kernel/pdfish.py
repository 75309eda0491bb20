"""Layout-aware PDF-ish parse path (north_star: line/box reconstruction).

From-scratch pdfminer-style reading-order reconstruction over a
deterministic serialized box format (the sandbox has no PDF libraries,
so the byte format is a plain-text stand-in; the geometry logic —
line grouping, column detection, positional header/footer stripping —
is real and tested).

Payload format (one box per line after the sentinel):
    %PDFBOX1
    page|x0|y0|x1|y1|text
x grows rightward, y grows downward, coordinates are floats in points
on a 612x792 page. Boxes may arrive in arbitrary order (as from a real
PDF content stream).

Reconstruction:
  1. Group boxes per page.
  2. Positional header/footer strip: a normalized text that appears on
     >=3 pages within the top or bottom 10% of the page at a similar y
     is boilerplate and dropped (layout analogue of SURVEY.md T4 /
     processor.py:249-283).
  3. Column detection per page: project box x-extents onto the x axis;
     a vertical whitespace gap >= 8% of page width with boxes on both
     sides splits the page into two columns read left column first
     (pdfminer's LAParams column behavior).
  4. Within a column, cluster boxes into lines by vertical overlap of
     their y centers (tolerance = half the median box height), order
     lines top-to-bottom, tokens left-to-right, join tokens with a
     single space and lines with newlines.
  5. Pages join with a blank line, mirroring the reference page join
     (/root/reference/backend/app/services/pdf/extractor.py:95).
"""

from __future__ import annotations

import re
from typing import NamedTuple

SENTINEL = "%PDFBOX1"

_DIGITS = re.compile(r"\d+")
PAGE_W = 612.0
PAGE_H = 792.0


class Box(NamedTuple):
    page: int
    x0: float
    y0: float
    x1: float
    y1: float
    text: str


def is_pdfbox_payload(text: str) -> bool:
    return text.startswith(SENTINEL)


def parse_boxes(payload: str) -> list[Box]:
    boxes: list[Box] = []
    for line in payload.split("\n")[1:]:
        if not line.strip():
            continue
        parts = line.split("|", 5)
        if len(parts) != 6:
            continue
        try:
            boxes.append(
                Box(int(parts[0]), float(parts[1]), float(parts[2]),
                    float(parts[3]), float(parts[4]), parts[5])
            )
        except ValueError:
            continue
    return boxes


def _strip_positional_boilerplate(boxes: list[Box]) -> list[Box]:
    pages = {b.page for b in boxes}
    if len(pages) < 3:
        return boxes
    margin_top = PAGE_H * 0.10
    margin_bot = PAGE_H * 0.90
    # digits are masked so "page 1"/"page 2" count as the same footer
    def norm(t: str) -> str:
        return _DIGITS.sub("#", t.strip().lower())

    seen: dict[str, set[int]] = {}
    for b in boxes:
        if b.y1 <= margin_top or b.y0 >= margin_bot:
            seen.setdefault(norm(b.text), set()).add(b.page)
    boiler = {t for t, pgs in seen.items() if len(pgs) >= 3}
    if not boiler:
        return boxes
    return [
        b for b in boxes
        if not (
            (b.y1 <= margin_top or b.y0 >= margin_bot)
            and norm(b.text) in boiler
        )
    ]


def _split_columns(page_boxes: list[Box]) -> list[list[Box]]:
    """Detect a two-column layout via an x-projection whitespace gap."""
    if len(page_boxes) < 4:
        return [page_boxes]
    # scan for the widest uncovered x interval strictly inside the content
    events = sorted(page_boxes, key=lambda b: b.x0)
    best_gap = 0.0
    best_split = None
    covered_until = events[0].x1
    for b in events[1:]:
        if b.x0 > covered_until:
            gap = b.x0 - covered_until
            if gap > best_gap:
                best_gap = gap
                best_split = (covered_until + b.x0) / 2.0
        covered_until = max(covered_until, b.x1)
    if best_split is None or best_gap < PAGE_W * 0.08:
        return [page_boxes]
    left = [b for b in page_boxes if b.x1 <= best_split]
    right = [b for b in page_boxes if b.x1 > best_split]
    if not left or not right:
        return [page_boxes]
    return [left, right]


def _lines_from_boxes(boxes: list[Box]) -> list[str]:
    if not boxes:
        return []
    heights = sorted(b.y1 - b.y0 for b in boxes)
    tol = max(heights[len(heights) // 2] / 2.0, 1.0)
    ordered = sorted(boxes, key=lambda b: ((b.y0 + b.y1) / 2.0, b.x0))
    lines: list[list[Box]] = []
    current: list[Box] = [ordered[0]]
    current_y = (ordered[0].y0 + ordered[0].y1) / 2.0
    for b in ordered[1:]:
        cy = (b.y0 + b.y1) / 2.0
        if abs(cy - current_y) <= tol:
            current.append(b)
        else:
            lines.append(current)
            current = [b]
            current_y = cy
    lines.append(current)
    return [" ".join(b.text for b in sorted(ln, key=lambda b: b.x0)) for ln in lines]


def reconstruct_text(payload: str) -> str:
    """Rebuild reading-order text from a %PDFBOX1 payload."""
    boxes = _strip_positional_boilerplate(parse_boxes(payload))
    if not boxes:
        return ""
    pages: dict[int, list[Box]] = {}
    for b in boxes:
        pages.setdefault(b.page, []).append(b)
    out_pages: list[str] = []
    for page in sorted(pages):
        cols = _split_columns(pages[page])
        col_text = ["\n".join(_lines_from_boxes(c)) for c in cols]
        out_pages.append("\n".join(t for t in col_text if t))
    return "\n\n".join(p.strip() for p in out_pages if p.strip()).strip()


def page_stats(payload: str) -> tuple[int, int, int]:
    """(pages_processed, total_chars, pages_with_text) for the P1
    scanned-document heuristics (extractor.py:81-92)."""
    pages: dict[int, int] = {}
    for b in parse_boxes(payload):
        pages[b.page] = pages.get(b.page, 0) + len(b.text)
    if not pages:
        return 0, 0, 0
    n_pages = max(pages) if pages else 0
    total = sum(pages.values())
    with_text = sum(1 for v in pages.values() if v >= 1)
    return max(n_pages, len(pages)), total, with_text


def serialize_boxes(boxes: list[Box]) -> str:
    """Inverse of parse_boxes (used by the synthetic generator)."""
    lines = [SENTINEL]
    lines += [
        f"{b.page}|{b.x0:.1f}|{b.y0:.1f}|{b.x1:.1f}|{b.y1:.1f}|{b.text}"
        for b in boxes
    ]
    return "\n".join(lines)
