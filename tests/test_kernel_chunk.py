"""Golden tests for T7/T8 (token estimate + chunker spans).

Boundary math mirrors processor.py:321-434: max_chars = max_tokens*4,
sentence snap in the last 20%, overlap = overlap_tokens*4, progress
guard `start >= len - overlap`.
"""

from engine.kernel.chunker import chunk_text, estimate_tokens


def test_estimate_tokens():
    assert estimate_tokens("") == 1
    assert estimate_tokens("abc") == 1
    assert estimate_tokens("abcd") == 1
    assert estimate_tokens("a" * 400) == 100


def test_single_chunk_when_fits():
    text = "hello world. " * 10
    out = chunk_text(text, max_tokens=1000)
    assert len(out) == 1
    assert out[0]["content"] == text  # unstripped slice when single
    assert out[0]["start_char"] == 0
    assert out[0]["end_char"] == len(text)


def test_empty_and_blank():
    assert chunk_text("") == []
    assert chunk_text("   \n  ") == []


def test_sentence_snap_within_last_20pct():
    # max_tokens=25 → 100 chars; craft a sentence end at char 85
    text = ("x" * 83 + ". " + "y" * 200)
    out = chunk_text(text, max_tokens=25, overlap_tokens=0)
    # search window starts at 80; boundary at 85 ('. ' end)
    assert out[0]["end_char"] == 85
    assert out[0]["content"] == "x" * 83 + "."
    # next chunk starts at boundary (overlap 0)
    assert out[1]["start_char"] == 85


def test_overlap_and_offsets_consistent():
    text = ("word " * 500).strip()
    out = chunk_text(text, max_tokens=50, overlap_tokens=10)
    assert len(out) > 2
    for i, ch in enumerate(out):
        assert ch["index"] == i
        # content is the stripped slice of [start, end)
        assert ch["content"] == text[ch["start_char"] : ch["end_char"]].strip()
    # consecutive chunks overlap by 40 chars (10 tokens * 4)
    assert out[1]["start_char"] == out[0]["end_char"] - 40


def test_progress_guard_no_infinite_loop():
    # pathological: no sentence ends at all, heavy overlap
    text = "a" * 1000
    out = chunk_text(text, max_tokens=30, overlap_tokens=25)
    assert out  # terminated
    assert all(c["content"] for c in out)
