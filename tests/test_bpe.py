"""Distributed BPE trainer (engine/spark/bpe.py) vs the single-node
reference (engine/kernel/bpe.py), plus the merge-semantics edge cases
the padded-string replace() must honor. The generated DuckDB oracle is
covered by test_entry_oracle.py."""

import pytest

from engine.kernel.bpe import _apply_merge, bpe_merges, split_word


def test_kernel_greedy_left_nonoverlapping():
    # 'aaaa' with merge (a,a): greedy left-to-right -> [aa, aa]
    assert _apply_merge(split_word("aaaa"), "a", "a") == (
        "aa", "aa", "</w>",
    )
    # 'aaa' -> [aa, a] (the third 'a' cannot re-merge)
    assert _apply_merge(split_word("aaa"), "a", "a") == ("aa", "a", "</w>")


def test_kernel_overlapping_pair_counts():
    # canonical get_stats counts overlapping adjacencies: 'aaa' has
    # (a,a) twice -> first merge must be (a,a) with count 2
    merges = bpe_merges({"aaa": 1}, 1)
    assert merges[0] == (0, "a", "a", "aa", 2)


def test_kernel_tie_break_is_lexicographic():
    # 'ab' and 'ac' each give one pair with count 1; (a,b) < (a,c)
    merges = bpe_merges({"ab": 1, "ac": 1}, 1)
    assert merges[0][:3] == (0, "a", "b")


def test_kernel_early_stop():
    # single-char word: one pair (x, </w>) then nothing left
    merges = bpe_merges({"x": 5}, 10)
    # (x,</w>) collapses the word to one symbol; no pairs remain
    assert merges == [(0, "x", "</w>", "x</w>", 5)]


def test_spark_matches_kernel(spark):
    """The distributed trainer must reproduce the classic algorithm
    merge-for-merge on the same word counts (sf0.001 corpus)."""
    from engine.spark.bpe import bpe_train, word_counts

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    wc = {
        r["word"]: r["cnt"]
        for r in word_counts(docs, vocab_cap=500).collect()
    }
    expected = bpe_merges(wc, 6)
    got = [tuple(r) for r in bpe_train(spark, sf, 6, 500).collect()]
    assert got == expected
    # non-vacuity: some later merge must consume an earlier merge's
    # output as its left or right symbol (multi-char, not the marker)
    assert any(
        (len(m[1]) > 1 and m[1] != "</w>")
        or (len(m[2]) > 1 and m[2] != "</w>")
        for m in got
    ), got


def test_tokenize_matches_kernel_per_word(spark):
    """The map-only tokenizer's token counts must equal the kernel's
    rank-ordered merge application, word for word (sf0.001, re-derived
    from the raw text in Python)."""
    import re

    from engine.kernel.bpe import tokenize_word
    from engine.spark.bpe import bpe_tokenize, bpe_train, word_counts

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    wc = {
        r["word"]: r["cnt"]
        for r in word_counts(docs, vocab_cap=500).collect()
    }
    merges = bpe_merges(wc, 6)
    got = {
        r["doc_id"]: r
        for r in bpe_tokenize(spark, sf, 6, 500, preview_tokens=8).collect()
    }
    # Spark trains its own merges inside bpe_tokenize — they must be
    # the same ones (guarded by test_spark_matches_kernel); recompute
    # expectations per document in pure Python
    sample = docs.select("doc_id", "text").limit(20).collect()
    for row in sample:
        words = re.findall("[a-z]+", (row["text"] or "").lower())
        toks = [tokenize_word(w, merges) for w in words]
        exp_tokens = sum(len(t) for t in toks)
        flat = [s for t in toks for s in t][:8]
        g = got[row["doc_id"]]
        assert g["n_words"] == len(words)
        assert g["n_tokens"] == exp_tokens
        assert g["preview"] == " ".join(flat)


def test_tokenize_merges_reduce_token_count(spark):
    """More merges can only shrink (or keep) the corpus token count —
    and with real merges it must strictly shrink."""
    from pyspark.sql import functions as F

    from engine.spark.bpe import bpe_tokenize

    sf = "/root/testdata/sf0.001"
    n0 = (
        bpe_tokenize(spark, sf, n_merges=0, vocab_cap=500)
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    n6 = (
        bpe_tokenize(spark, sf, n_merges=6, vocab_cap=500)
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    assert n6 < n0


def test_persisted_merges_serve_identically(spark, tmp_path):
    """Train-once/persve-many: tokenizing from a persisted merge table
    must equal in-line training exactly (same split the IVF codebook
    persistence uses)."""
    from engine.spark.bpe import (
        bpe_tokenize,
        bpe_train,
        load_bpe_merges,
        save_bpe_merges,
    )

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "merges.parquet")
    save_bpe_merges(bpe_train(spark, sf, 6, 500), path)
    served = bpe_tokenize(
        spark, sf, merges=load_bpe_merges(spark, path)
    )
    inline = bpe_tokenize(spark, sf, n_merges=6, vocab_cap=500)
    a = sorted(map(tuple, served.collect()))
    b = sorted(map(tuple, inline.collect()))
    assert a == b


def test_spark_early_stop_returns_short_table(spark):
    """A degenerate corpus (all words single-char) runs out of pairs:
    the trainer must stop, not loop or crash."""
    import os

    import pandas as pd

    from engine.spark import bpe as bpe_mod

    tmp = "/tmp/bpe_degenerate_docs"
    os.makedirs(tmp, exist_ok=True)
    pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a b"]}).to_parquet(
        f"{tmp}/documents.parquet"
    )
    out = bpe_mod.bpe_train(spark, tmp, n_merges=10, vocab_cap=10)
    rows = [tuple(r) for r in out.collect()]
    # each single-char word yields one (c, </w>) merge; after the three
    # distinct merges no adjacent pairs remain anywhere
    assert len(rows) == 3
    assert {r[1] for r in rows} == {"a", "b", "c"}


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.dictionaries(
    st.text(alphabet="abcde", min_size=1, max_size=8),
    st.integers(min_value=1, max_value=50),
    min_size=1,
    max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(_words)
def test_kernel_bpe_invariants(wc):
    """For arbitrary word-count tables: ranks are sequential, merged
    symbols concatenate their pair, counts are positive, and applying
    the merges to any word reconstructs exactly that word + marker."""
    from engine.kernel.bpe import bpe_merges, tokenize_word

    merges = bpe_merges(wc, 10)
    for i, (rank, left, right, merged, count) in enumerate(merges):
        assert rank == i
        assert merged == left + right
        assert count > 0
    for w in wc:
        toks = tokenize_word(w, merges)
        assert "".join(toks) == w + "</w>"
        # no adjacent pair in the tokenized output equals an EARLIER
        # merge unless produced by a later merge boundary — weaker,
        # checkable form: the first merge's pair never survives
        # adjacent in any tokenized word
        if merges:
            _, l0, r0, _, _ = merges[0]
            assert not any(
                a == l0 and b == r0 for a, b in zip(toks, toks[1:])
            )
