"""Distributed BPE merge training.

The scale architecture every production tokenizer trainer uses: the
corpus is only ever touched ONCE, to build the word-frequency table
(one map-side-combined shuffle, volume ∝ distinct words); the merge
loop then runs over that vocab-sized table, never over the corpus.
At 100 TB the corpus pass is the same shape as ``vocab_top_k``; the
iteration state is the top-``vocab_cap`` word table (thousands of
rows), re-materialized per merge via localCheckpoint so the plan stays
flat. The driver holds exactly ONE row per iteration (the argmax
pair) — nothing corpus- or vocab-sized is ever collected.

Cross-engine determinism trick: each word's symbol sequence is carried
as a pipe-padded string ``|s1||s2||s3|``, so applying a merge is a
single ``replace(s, '|l||r|', '|lr|')`` — left-to-right non-overlapping
string replacement has exactly BPE's greedy-left merge semantics, and
Spark and DuckDB (the oracle unrolls the loop as generated CTEs, see
__spark_entry__.oracle_sql) compute it byte-identically. Symbols never
contain '|' because words are restricted to [a-z]+.

Pair counting matches the canonical get_stats [Sennrich et al., ACL
2016]: adjacent pairs, overlapping occurrences counted, weighted by
word frequency, argmax tie-broken (count DESC, left ASC, right ASC).
Single-node reference: engine/kernel/bpe.py (parity-tested).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

WORD_RE = "[a-z]+"
END = "</w>"

MERGES_SCHEMA = (
    "rank int, left_sym string, right_sym string, merged string, "
    "pair_count long"
)


def word_counts(docs: "DataFrame", vocab_cap: int) -> "DataFrame":
    """Top-``vocab_cap`` lowercase-word frequency table from a corpus
    with a ``text`` column. The single corpus-sized pass; deterministic
    under count ties via the (count DESC, word ASC) total order."""
    return (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower(text), '{WORD_RE}', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(vocab_cap)
    )


def _padded(word_col) -> "F.Column":
    """'abc' -> '|a||b||c||</w>|' — the carry format one replace() can
    merge in."""
    return F.concat(
        F.lit("|"),
        F.array_join(F.split(word_col, ""), "||"),
        F.lit(f"||{END}|"),
    )


def bpe_train(
    spark: "SparkSession",
    sf_dir: str,
    n_merges: int = 8,
    vocab_cap: int = 2000,
) -> "DataFrame":
    """Train ``n_merges`` BPE merges over the documents corpus; returns
    the merge table (rank, left_sym, right_sym, merged, pair_count) —
    the artifact a tokenizer ships."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = (
        word_counts(docs, vocab_cap)
        .select("cnt", _padded(F.col("word")).alias("s"))
        .localCheckpoint()
    )

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        syms = F.transform(
            F.split("s", r"\|\|"), lambda x: F.translate(x, "|", "")
        )
        staged = w.select("cnt", syms.alias("syms"))
        pair = F.transform(
            F.slice("syms", 1, F.size("syms") - 1),
            lambda x, i: F.struct(
                x.alias("l"),
                F.element_at(F.col("syms"), i + 2).alias("r"),
            ),
        )
        top = (
            staged.select("cnt", F.explode(pair).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, count = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rank, left, right, left + right, count))
        w = w.withColumn(
            "s",
            F.replace(
                "s",
                F.lit(f"|{left}||{right}|"),
                F.lit(f"|{left}{right}|"),
            ),
        ).localCheckpoint()

    return spark.createDataFrame(merges, MERGES_SCHEMA)


def save_bpe_merges(merges: "DataFrame", path: str) -> None:
    """Persist a trained merge table — train once, serve many (the
    same split the IVF codebook uses). The table IS the tokenizer."""
    merges.write.mode("overwrite").parquet(path)


def load_bpe_merges(spark: "SparkSession", path: str) -> list:
    """Load a persisted merge table back into the rank-ordered row
    list bpe_tokenize bakes into its plan. The sort is driver-side
    over k rows."""
    return sorted(
        spark.read.parquet(path).collect(), key=lambda r: r["rank"]
    )


def bpe_tokenize(
    spark: "SparkSession",
    sf_dir: str,
    n_merges: int = 8,
    vocab_cap: int = 2000,
    preview_tokens: int = 8,
    merges: list | None = None,
) -> "DataFrame":
    """Tokenize the documents corpus with the trained merges — the
    map-only serving half of BPE.

    The k merge rows are collected once (they are the model, k rows)
    and baked into the plan as a chain of literal ``replace()`` calls
    inside a higher-order ``transform`` over each document's words:
    zero shuffles, zero Python, whole-stage-codegen expressions only.
    At 100 TB this is a pure scan stage — tokenization cost rides the
    same wave as the read. Output per document: word count, exact BPE
    token count, and a preview of the first tokens (bounded columns;
    the full token stream would be emitted by the same expressions
    feeding a writer, never collected)."""
    trained = (
        merges
        if merges is not None
        else bpe_train(spark, sf_dir, n_merges, vocab_cap).collect()
    )

    def tokenized(word_col):
        s = _padded(word_col)
        for m in trained:
            s = F.replace(
                s,
                F.lit(f"|{m['left_sym']}||{m['right_sym']}|"),
                F.lit(f"|{m['merged']}|"),
            )
        return F.split(s, r"\|\|")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.expr(
        f"regexp_extract_all(coalesce(lower(text), ''), '{WORD_RE}', 0)"
    )
    staged = docs.select(
        "doc_id",
        F.transform(words, tokenized).alias("toks"),
    )
    return staged.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        F.aggregate(
            "toks",
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.size(t),
        ).alias("n_tokens"),
        F.array_join(
            F.transform(
                F.slice(F.flatten("toks"), 1, preview_tokens),
                lambda x: F.translate(x, "|", ""),
            ),
            " ",
        ).alias("preview"),
    )
