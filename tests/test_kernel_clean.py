"""Golden tests for T1–T6 + P5 (textclean kernel).

Cases are lifted from the reference's own constants and thresholds
(processor.py:205-221 ligatures, :239-241 page-number regexes,
:255-283 repeated-line window, :473-520 quality gate).
"""

from engine.kernel.textclean import (
    assess_quality,
    clean_text,
    fix_encoding,
    normalize_whitespace,
    quality_metrics,
    remove_page_numbers,
    remove_repeated_lines,
    squeeze_blank_lines,
)


def test_ligatures_and_punctuation():
    assert fix_encoding("ﬁﬂﬀﬃﬄ") == "fiflffffiffl"
    assert fix_encoding("“quoted” — it’s…") == '"quoted" - it\'s...'
    assert fix_encoding("a b﻿c­d") == "a bcd"


def test_whitespace_normalization_preserves_newlines():
    # reference order: the [^\S\n]+ collapse runs BEFORE CRLF mapping, so
    # \r (non-\n whitespace) is already folded into a space
    # (processor.py:146-152); later line-strip removes the residue
    assert normalize_whitespace("a\tb   c\r\nd\re") == "a b c \nd e"
    # runs of spaces collapse but newlines survive
    assert normalize_whitespace("x  \n  y") == "x \n y"


def test_page_number_removal():
    text = "intro\n3\nPage 4\n2 of 10\n5 / 12\n- 7 -\n– 8 –\nbody 9 kept\nPage x"
    out = remove_page_numbers(text)
    assert out == "intro\nbody 9 kept\nPage x"


def test_repeated_lines_need_three_hits_and_ten_lines():
    hdr = "Acme Corp Confidential"
    body = [f"unique line {i} with content" for i in range(9)]
    doc = "\n".join([hdr, *body[:4], hdr, *body[4:], hdr])
    out = remove_repeated_lines(doc)
    assert hdr not in out
    # short docs (<10 lines) are untouched even with repeats
    short = "\n".join([hdr, hdr, hdr, "x"])
    assert remove_repeated_lines(short) == short
    # two occurrences are kept
    two = "\n".join([hdr, *body, hdr])
    assert remove_repeated_lines(two) == two


def test_repeated_lines_length_window():
    # 2-char and 101-char lines are never counted as headers
    tiny = "ab"
    huge = "z" * 101
    body = [f"line {i} stuff" for i in range(8)]
    doc = "\n".join([tiny, huge, *body, tiny, huge, tiny, huge])
    out = remove_repeated_lines(doc)
    assert tiny in out and huge in out


def test_blank_line_squeeze():
    assert squeeze_blank_lines("a\n\n\n\n\nb") == "a\n\n\nb"  # capped at 2 blanks
    assert squeeze_blank_lines("  x  \n\n  ") == "x"


def test_clean_text_pipeline_order():
    raw = "ﬁrst\tline\nPage 1\nsecond  line\r\nthird line\n\n\n\n\nend"
    cleaned, metrics = clean_text(raw)
    assert cleaned == "first line\nsecond line\nthird line\n\n\nend"
    assert metrics["original_length"] == len(raw)
    assert metrics["cleaned_length"] == len(cleaned)


def test_quality_metrics_structured_probe():
    m = quality_metrics("x", "Total: $1,234.50 due 12/31/2025")
    assert m["has_structured_data"] is True
    m2 = quality_metrics("x", "plain words only here")
    assert m2["has_structured_data"] is False


def test_quality_gate_thresholds():
    # short text: -30, no structure
    m = quality_metrics("a" * 100, "tiny line here now ok")
    q = assess_quality(m)
    assert q["score"] == 100 - 30 - 20  # short (<50) + noise (>0.5)
    # structured bonus caps at 100
    good = "This is a long enough line of text to pass every check. " * 10
    m2 = quality_metrics(good, good[:-10] + " total $5")
    q2 = assess_quality(m2)
    assert q2["score"] == 100.0
    assert q2["quality"] == "good"
