"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline on sf0.001;
``queries`` exposes every implemented operator from SURVEY.md §2 plus
the training-data ops (dedup / similarity / text analysis);
``oracle_sql`` gives the DuckDB twin for each SQL-expressible one.
Column names and integer widths are aligned on both sides; doubles are
rounded identically so the order-insensitive value-hash is FP-stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline (payload classify → HTML/PDF
    main-content extraction → clean → chunk spans → detect → field
    extraction → validate/score) over transcripts derived from the
    sf0.001 documents table, with stable ordering + salted partitions."""
    from engine.spark.pipeline import run_extraction, with_stable_order
    from engine.spark.transcripts import (
        synthesize_transcripts,
        transcripts_from_documents,
    )

    docs = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    # synthetic conversations add invoice/resume/html/pdf-layout payload
    # families (the documents corpus is plain prose), so the flagship
    # exercises detection + field extraction, not just cleaning
    synth = synthesize_transcripts(spark, 60, 4)
    t = docs.unionByName(synth.select(*docs.columns))
    results = run_extraction(t, num_partitions=16)
    return with_stable_order(results).select(
        "conv_id", "turn_idx", "turn_seq", "role", "ts", "payload_kind",
        "doc_type", "cleaned_text", "n_chunks", "estimated_tokens",
        "quality_score", "overall_confidence", "is_empty", "part_id",
    )


def _ex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction over document-derived transcripts (shared by the
    extraction queries below; deterministic, no LLM)."""
    from pyspark.sql import functions as F

    from engine.spark.pipeline import run_extraction
    from engine.spark.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, sf_dir)
    return run_extraction(t, num_partitions=32)


def _per_turn_path(sf_dir: str) -> str:
    # keyed by pid so concurrent sessions (bench + pytest) can't
    # overwrite the parquet while the other's DuckDB oracle reads it;
    # queries() and oracle_sql() run in one process, so both sides of a
    # comparison always derive the same path. Cleaned up at process
    # exit — pid keying otherwise leaks one parquet dir per run.
    import atexit
    import os
    import shutil
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(),
        f"entry_per_turn_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if path not in _TMP_PATHS:
        _TMP_PATHS.add(path)
        for p in (path, path + "_spans", path + "_cb"):
            atexit.register(shutil.rmtree, p, ignore_errors=True)
    return path


_TMP_PATHS: set[str] = set()
# memoized adaptive hyperplane plans keyed by vector-artifact path:
# (path, sign_dims, probes) — see _rp_plan
_RP_PLANS: dict[str, tuple[str, int, int]] = {}


def _per_turn_parquet(
    spark: SparkSession, sf_dir: str, df: DataFrame | None = None
) -> str:
    """Materialize per-turn extraction scalars to a deterministic local
    parquet (written eagerly when the query is invoked, before the
    oracle runs) so DuckDB can recompute corpus rollups from exactly
    the rows the Spark side aggregated. Extraction is deterministic, so
    repeated writes are byte-stable in content."""
    path = _per_turn_path(sf_dir)
    (df if df is not None else _ex(spark, sf_dir)).select(
        "conv_id", "turn_idx", "ts", "bytes_in", "is_empty",
        "estimated_tokens", "quality_score", "quality_bucket",
        "overall_confidence", "n_chunks",
    ).write.mode("overwrite").parquet(path)
    return path


def _spans_parquet(
    spark: SparkSession, sf_dir: str, df: DataFrame | None = None
) -> str:
    """Materialize the posexplode span transport (the extract_spans
    projection) so DuckDB can cross-check it against the scalar-path
    per-turn parquet — the two are independent projections of the same
    kernel output, so a drift in span explosion/transport shows up as
    count mismatches in extract_spans_consistency."""
    path = _per_turn_path(sf_dir) + "_spans"
    from pyspark.sql import functions as F

    if df is None:
        df = _ex(spark, sf_dir)
    df.select(
        "conv_id", "turn_idx", F.posexplode_outer("spans").alias("pos", "span")
    ).select(
        "conv_id", "turn_idx", "pos",
        F.col("span.estimated_tokens").alias("span_tokens"),
    ).write.mode("overwrite").parquet(path)
    return path


def _conv_text_parquet(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (conv_id, turn_idx, cleaned_text) from the
    deterministic extraction so DuckDB can recompute the conversation
    fingerprints (per-turn md5 → block hash → conv hash) from exactly
    the rows the Spark side consumed."""
    path = _per_turn_path(sf_dir) + "_dc"
    import atexit
    import shutil

    if path not in _TMP_PATHS:
        _TMP_PATHS.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    _ex(spark, sf_dir).select("conv_id", "turn_idx", "cleaned_text").write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _sft_turns_parquet(spark: SparkSession) -> str:
    """Materialize (conv_id, turn_idx, role, cleaned_text) from the
    synthetic multi-turn transcripts (the document-derived conversations
    are single-turn all-user, which would leave sft_examples with zero
    targets) so DuckDB can recompute the context-window math from the
    same rows. SF-independent; pid-keyed like the other materializers."""
    import atexit
    import shutil

    from engine.spark.pipeline import run_extraction
    from engine.spark.transcripts import synthesize_transcripts

    path = _sft_synth_path()
    if path not in _TMP_PATHS:
        # write-once per pid: the input is deterministic, and several
        # entries share it — re-running extraction per call would
        # multiply the materialization cost per pass. The memo is
        # recorded only AFTER the write succeeds, so a transient
        # failure doesn't poison every later call with a missing file.
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        t = synthesize_transcripts(spark, 120, 4)
        run_extraction(t, num_partitions=32).select(
            "conv_id", "turn_idx", "role", "cleaned_text"
        ).write.mode("overwrite").parquet(path)
        _TMP_PATHS.add(path)
    return path


def _sft_synth_path() -> str:
    import os
    import tempfile

    return os.path.join(tempfile.gettempdir(), f"entry_sft_synth_{os.getpid()}")


def _agent_turns_parquet(spark: SparkSession) -> str:
    """Materialize the raw synthetic transcript turns (conv_id,
    turn_idx, role, text, tool, ts) so DuckDB can recompute the
    agent-trajectory analytics (tool stats / transitions / timing /
    well-formedness) from exactly the rows the Spark side consumes.
    SF-independent (pure synthesis); pid-keyed like the others."""
    import atexit
    import shutil

    from engine.spark.transcripts import synthesize_transcripts

    path = _agent_synth_path()
    if path not in _TMP_PATHS:
        # memo recorded only AFTER a successful write (see
        # _sft_turns_parquet for why)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        synthesize_transcripts(spark, 120, 4).write.mode(
            "overwrite"
        ).parquet(path)
        _TMP_PATHS.add(path)
    return path


# canned template text both engines plant for canned_responses —
# ASCII-only so substring/substr previews agree byte-for-byte
_CANNED_TEXT = (
    "I am sorry, I cannot help with that request. Please rephrase or "
    "contact support for further assistance with this issue."
)

# planted truncation-artifact turns both engines add for
# truncation_detect — ASCII, no apostrophes (SQL-literal safe); the
# first trails off in an ellipsis, the second opens a ``` fence it
# never closes and stops mid-signature
_TRUNC_ELLIPSIS_TEXT = "Let me walk through the remaining steps..."
_TRUNC_FENCE_TEXT = "Here is the fix:\n```python\ndef handler(event):"

# planted prompt/response pair both engines add for assistant_echo —
# the response restates a long span of the prompt verbatim: 4 of its 6
# distinct 5-grams appear in the prompt (hand-counted), so the planted
# pair rates 4/6 ≈ 0.667 and trips the ≥0.5 high-echo arm, which the
# generator's natural boilerplate echo never reaches (max natural
# ≈0.32 at sf0.01). All-lowercase single-space words, so the
# tokenizer is the identity on them.
_ECHO_USER_TEXT = (
    "please summarize the quarterly revenue figures for the north "
    "region before friday morning"
)
_ECHO_ASSISTANT_TEXT = (
    "the quarterly revenue figures for the north region as requested"
)


def _agent_synth_path() -> str:
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), f"entry_agent_synth_{os.getpid()}"
    )


def _bpe_oracle(n_merges: int, vocab_cap: int) -> str:
    """Unrolled DuckDB twin of the distributed BPE trainer
    (engine/spark/bpe.py): one generated CTE block per merge iteration
    — pair counts from the zipped symbol lists, deterministic argmax,
    then the same padded-string replace() the Spark side applies. The
    loop is finite and known (n_merges), so unrolling IS the oracle
    for this iterative algorithm."""
    union = "\nUNION ALL\n".join(
        f"SELECT CAST(rnk AS INTEGER) AS rank, l AS left_sym, "
        f"r AS right_sym, merged, c AS pair_count FROM b{i}"
        for i in range(n_merges)
    )
    return "WITH " + ",\n".join(_bpe_ctes(n_merges, vocab_cap)) + "\n" + union


def _bpe_tokenize_oracle(
    n_merges: int, vocab_cap: int, preview_tokens: int
) -> str:
    """DuckDB twin of the map-only tokenizer: recompute the merges via
    the same unrolled CTEs, collapse them into one single-row pattern
    table (lambdas can't hold subqueries, but they CAN capture columns
    of a cross-joined row), then apply the identical replace chain
    inside list_transform over each document's words."""
    # coalesce each pattern to an impossible-match literal ('~' never
    # occurs in the padded chain — words are regexp_extract_all
    # '[a-z]+', so the chain alphabet is exactly [a-z|</w>] on both
    # engines; no corpus text can smuggle a tilde in): if the corpus
    # yields fewer than
    # n_merges merges, the empty b{i} subquery would otherwise return
    # NULL and replace(s, NULL, NULL) nulls the whole token chain in
    # DuckDB, while Spark's bpe_tokenize just applies the fewer trained
    # merges. A '~' -> '' replace is a no-op, matching Spark exactly.
    pats = ", ".join(
        f"coalesce((SELECT '|' || l || '||' || r || '|' FROM b{i}), '~')"
        f" AS f{i}, "
        f"coalesce((SELECT '|' || merged || '|' FROM b{i}), '') AS t{i}"
        for i in range(n_merges)
    )
    chain = "'|' || array_to_string(string_split(w, ''), '||') || '||</w>|'"
    for i in range(n_merges):
        chain = f"replace({chain}, p.f{i}, p.t{i})"
    ctes = _bpe_ctes(n_merges, vocab_cap)
    ctes.append(f"pats AS (SELECT {pats})")
    ctes.append(
        f"""tok AS (
            SELECT doc_id,
                   list_transform(
                       regexp_extract_all(coalesce(lower(text), ''),
                                          '[a-z]+'),
                       w -> string_split({chain}, '||')) AS toks
            FROM documents, pats p)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT doc_id,
               CAST(length(toks) AS BIGINT) AS n_words,
               CAST(coalesce(list_aggregate(
                   list_transform(toks, t -> length(t)), 'sum'), 0)
                   AS BIGINT) AS n_tokens,
               array_to_string(
                   list_transform(flatten(toks)[1:{preview_tokens}],
                                  x -> replace(x, '|', '')), ' ')
                   AS preview
        FROM tok"""
    )


def _bpe_ctes(n_merges: int, vocab_cap: int) -> list:
    ctes = [
        f"""w0 AS (
            SELECT cnt,
                   '|' || array_to_string(string_split(word, ''), '||')
                       || '||</w>|' AS s
            FROM (
                SELECT word, CAST(count(*) AS BIGINT) AS cnt
                FROM (SELECT unnest(regexp_extract_all(lower(text),
                                    '[a-z]+')) AS word FROM documents)
                GROUP BY word ORDER BY cnt DESC, word
                LIMIT {vocab_cap}))"""
    ]
    for i in range(n_merges):
        ctes.append(
            f"""p{i} AS (
            SELECT z[1] AS l, z[2] AS r, CAST(sum(cnt) AS BIGINT) AS c
            FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS z
                  FROM (SELECT cnt,
                               list_transform(string_split(s, '||'),
                                   x -> replace(x, '|', '')) AS syms
                        FROM w{i}))
            WHERE z[2] IS NOT NULL GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""b{i} AS (
            SELECT {i} AS rnk, l, r, l || r AS merged, c
            FROM p{i} ORDER BY c DESC, l, r LIMIT 1)"""
        )
        ctes.append(
            f"""w{i + 1} AS (
            SELECT cnt, replace(s, '|' || b.l || '||' || b.r || '|',
                                '|' || b.l || b.r || '|') AS s
            FROM w{i}, b{i} b)"""
        )
    return ctes


def _inv_fields_parquet(spark: SparkSession) -> str:
    """Materialize the kernel-extracted invoice fields (doc_type +
    fields_json per invoice turn, over the deterministic synthetic
    transcripts) so DuckDB can recompute the P4 validation predicates
    from exactly the rows the native expressions consume. SF-independent
    (the input is synthesized, not read from the sf tables), so one
    pid-keyed path serves every scale's comparison."""
    import atexit
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from engine.spark.pipeline import run_extraction
    from engine.spark.transcripts import synthesize_transcripts

    path = _inv_synth_path()
    if path not in _TMP_PATHS:
        _TMP_PATHS.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    t = synthesize_transcripts(spark, 120, 4)
    run_extraction(t, num_partitions=32).filter(
        F.col("doc_type") == "invoice"
    ).select("conv_id", "turn_idx", "doc_type", "fields_json").write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _inv_synth_path() -> str:
    import os
    import tempfile

    return os.path.join(tempfile.gettempdir(), f"entry_inv_synth_{os.getpid()}")


def _codebook_parquet(spark: SparkSession, sf_dir: str) -> str:
    """Train + persist the k-means codebook once per (pid, sf_dir) —
    shared by the IVF search and the cluster-composition entries, which
    previously each retrained the identical deterministic codebook.
    Memo recorded only after the write succeeds."""
    import atexit
    import shutil

    from engine.spark import analytics as A

    path = _per_turn_path(sf_dir) + "_cb"
    if path not in _TMP_PATHS:
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        A.train_ivf_codebook(spark, sf_dir).write.mode("overwrite").parquet(
            path
        )
        _TMP_PATHS.add(path)
    return path


def _simsearch_ivf_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-IVF in its serving shape: train the k-means codebook
    once (deterministic), persist it as a parquet table, and search
    from the loaded codebook — the train-once / serve-many split a
    real vector store runs. Persisting also makes the data-dependent
    codebook shared input, so the DuckDB twin can recompute the entire
    search (nearest-cell assignment, 2-probe cell selection, cell-local
    candidate join, cosine top-k) from the same table."""
    from engine.spark import analytics as A

    codebook = A.load_ivf_codebook(spark, _codebook_parquet(spark, sf_dir))
    return A.simsearch_ivf_centroids(spark, sf_dir, codebook=codebook)


def _embedding_clusters_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-composition report from the persisted codebook — same
    train-once/persist/serve split as _simsearch_ivf_served, sharing
    its codebook path so DuckDB recomputes assignment from the same
    table."""
    from engine.spark import analytics as A

    cb = A.load_ivf_codebook(spark, _codebook_parquet(spark, sf_dir))
    return A.embedding_clusters(spark, sf_dir, cb)


def _hash_vectors_parquet(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the nonzero hash-embed unit vectors once per
    (pid, sf_dir) — the shared artifact the adaptive semantic-dedup
    entry and its DuckDB twin both read (the _codebook_parquet
    pattern: the data-dependent embedding becomes a common table, so
    the twin can derive the adaptive sign width itself in SQL)."""
    import atexit
    import shutil

    from engine.spark import analytics as A

    path = _per_turn_path(sf_dir) + "_hv"
    if path not in _TMP_PATHS:
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        A.hash_embed_vectors(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ).write.mode("overwrite").parquet(path)
        _TMP_PATHS.add(path)
    return path


def _rp_plan(spark: SparkSession, sf_dir: str) -> tuple[str, int, int]:
    """The shared adaptive random-hyperplane plan: materialize the
    vector artifact, derive (sign_dims, probes) from rp_lsh_params,
    and persist the chosen plan next to the vectors so any DuckDB twin
    replays it exactly (transcendentals stay driver-side; the
    cross-engine contract is md5 + IEEE arithmetic only). Returns
    (vectors_path, sign_dims, probes). Memoized per (pid, sf_dir): a
    bench best-of-K must not pay a redundant count() job per timed
    iteration (round-5 review finding)."""
    import atexit
    import shutil

    from engine.spark import analytics as A

    path = _hash_vectors_parquet(spark, sf_dir)
    if path in _RP_PLANS:
        return _RP_PLANS[path]
    n = spark.read.parquet(path).count()
    sign_dims, probes = A.rp_lsh_params(n, threshold=0.9)
    prm = path + "_prm"
    if prm not in _TMP_PATHS:
        atexit.register(shutil.rmtree, prm, ignore_errors=True)
        spark.createDataFrame(
            [(n, sign_dims, probes)], "n long, sign_dims int, probes int"
        ).coalesce(1).write.mode("overwrite").parquet(prm)
        _TMP_PATHS.add(prm)
    _RP_PLANS[path] = (path, sign_dims, probes)
    return path, sign_dims, probes


def _dedup_text_semantic_adaptive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dedup_text_semantic at its production operating point (r4
    verdict task #4): persisted hash-embed vectors + random-hyperplane
    LSH with rp_lsh_params-derived width/probes, instead of the
    oracle-pinned coordinate-sign sign_dims=6 whose skewed buckets
    cost ~60 s at sf0.1 on this same-generator corpus. This is the
    form a pipeline actually runs — and benches."""
    from engine.spark import analytics as A

    path, sign_dims, probes = _rp_plan(spark, sf_dir)
    return A.dedup_text_semantic_served(
        spark, path, threshold=0.9, params=(sign_dims, probes)
    )


def _dedup_semantic_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-list tail of the semantic near-dup family: adaptive
    hyperplane pairs → min-label components → surviving vec_ids (the
    apply symmetry every other dedup modality has)."""
    from engine.spark import analytics as A

    path, sign_dims, probes = _rp_plan(spark, sf_dir)
    return A.dedup_semantic_apply(
        spark, path, threshold=0.9, params=(sign_dims, probes)
    )


def _quality_weights_parquet(spark: SparkSession, sf_dir: str) -> str:
    """Train the distilled quality classifier once per (pid, sf_dir)
    and persist its weight vector (one row, array<double> of dim+1) —
    the served-model artifact the scoring entry and its DuckDB twin
    both read. Labels distill the c4_clean document gate (keep_doc):
    the classic pipeline move of replacing a rule cascade with one
    dense scorer. Training is exact-integer Gram aggregation + a
    driver-side 65×65 ridge solve (plan-time, outside the
    cross-engine contract — only the persisted weights are replayed)."""
    import atexit
    import shutil

    from pyspark.sql import functions as F

    from engine.spark import analytics as A

    hv = _hash_vectors_parquet(spark, sf_dir)
    path = _per_turn_path(sf_dir) + "_qw"
    if path not in _TMP_PATHS:
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        vecs = spark.read.parquet(hv)
        labels = (
            A.c4_clean(spark, sf_dir)
            .select(
                F.col("doc_id").alias("vec_id"),
                F.col("keep_doc").cast("int").alias("label"),
            )
            .join(vecs.select("vec_id"), "vec_id")
        )
        wvec = A.quality_train(vecs, labels)
        spark.createDataFrame(
            [(wvec,)], "wvec array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(path)
        _TMP_PATHS.add(path)
    return path


def _quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the CCNet/fasttext-lineage
    component): score every document's hash-embed features with the
    ridge-trained linear distillation of the c4_clean gate, persisted
    as a served-weights artifact. Map-only scoring over the vector
    artifact; the DuckDB twin replays the identical ascending-j left
    fold + floor-round-5 from the same two parquets."""
    from engine.spark import analytics as A

    hv = _hash_vectors_parquet(spark, sf_dir)
    qw = _quality_weights_parquet(spark, sf_dir)
    return A.quality_score_served(spark, hv, qw)


def _planted_conv_turns(
    spark: SparkSession, with_dup: bool, with_role: bool = False
) -> DataFrame:
    """Synthetic multi-turn per-turn rows plus the planted duplicate
    copies the conversation-dedup entries share: md5-prefix-'0'
    conversations re-added as '~near' truncated copies (last turn
    dropped) and, when ``with_dup``, also as '~dup' exact copies.
    ``with_role`` keeps the role column (preference_pairs needs it).
    Single source of truth — the DuckDB side mirrors it in
    _conv_apply_drop_ctes / _conv_near_oracle / _planted_sql."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    cols = ["conv_id", "turn_idx"] + (["role"] if with_role else []) + [
        "cleaned_text"
    ]
    src = spark.read.parquet(_sft_turns_parquet(spark)).select(*cols)
    base = src.withColumn(
        "mx", F.max("turn_idx").over(W.partitionBy("conv_id"))
    )
    sel = F.substring(F.md5("conv_id"), 1, 1) == "0"
    copy_cols = [F.concat("conv_id", F.lit("~dup")).alias("conv_id")] + [
        F.col(c) for c in cols[1:]
    ]
    near_cols = [F.concat("conv_id", F.lit("~near")).alias("conv_id")] + [
        F.col(c) for c in cols[1:]
    ]
    out = src
    if with_dup:
        out = out.unionByName(base.filter(sel).select(*copy_cols))
    return out.unionByName(
        base.filter(sel & (F.col("turn_idx") < F.col("mx"))).select(*near_cols)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pyspark.sql import functions as F

    from engine.spark import analytics as A
    from engine.spark import ats as _ats
    from engine.spark import relational as R
    from engine.spark.pipeline import conversation_rollup

    def extract_turns_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ex(spark, sf_dir).select(
            "conv_id", "turn_idx", "payload_kind", "doc_type", "cleaned_length",
            "n_chunks", "estimated_tokens", "is_empty", "quality",
        )

    def extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _ex(spark, sf_dir)
        return df.select(
            "conv_id", "turn_idx", F.posexplode_outer("spans").alias("pos", "span")
        ).select(
            "conv_id", "turn_idx", "pos",
            F.col("span.start_char").alias("start_char"),
            F.col("span.end_char").alias("end_char"),
            F.col("span.estimated_tokens").alias("span_tokens"),
        )

    def extract_spans_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
        # internal-consistency oracle closing the silent-drift class on
        # the two no-oracle projections: per conversation, the scalar
        # path's sum(n_chunks) must equal the posexplode path's span
        # count (count of non-null pos — empty turns emit a null-span
        # row), with both sides re-aggregated by DuckDB from the
        # materialized parquets
        # one shared extraction pass feeds both materializations
        ex = _ex(spark, sf_dir).persist()
        try:
            turns = spark.read.parquet(_per_turn_parquet(spark, sf_dir, ex))
            spans = spark.read.parquet(_spans_parquet(spark, sf_dir, ex))
        finally:
            ex.unpersist()
        t = turns.groupBy("conv_id").agg(
            F.sum("n_chunks").cast("long").alias("chunks_sum"),
            F.count("*").alias("n_turns"),
        )
        s = spans.groupBy("conv_id").agg(
            F.count("pos").alias("spans_sum"),
            F.sum("span_tokens").cast("long").alias("span_tokens_sum"),
        )
        return t.join(s, "conv_id").select(
            "conv_id", "n_turns", "chunks_sum", "spans_sum",
            "span_tokens_sum",
            (F.col("chunks_sum") == F.col("spans_sum")).alias("consistent"),
        )

    def extract_conversation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
        # oracled via the materialized per-turn parquet: the rollup is
        # pure arithmetic over kernel outputs, so DuckDB recomputes it
        # from the same rows this query just wrote
        return conversation_rollup(
            spark.read.parquet(_per_turn_parquet(spark, sf_dir))
        )

    def validate_invoice_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
        # P4 at table scale, fully oracled: deterministic invoice fields
        # derived from orders, validated by the same native predicates
        # as the extraction-output path (kernel parity for those in
        # tests/test_validators.py). Issue columns are sorted ';' joins
        # so the driver's pandas canonicalization can sort them.
        from engine.spark.validation import validate_invoice_fields_table

        return validate_invoice_fields_table(spark, sf_dir)

    def validate_invoice_extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
        # P4 natively over extraction output. Runs over the synthetic
        # transcripts (the documents corpus has no invoices, which
        # would make this check vacuous); the kernel-extracted
        # fields_json rows are materialized to parquet first, so the
        # DuckDB twin recomputes the same predicates (from_json
        # projection, try_to_date, datediff, allowlist, issue
        # scalarization) from identical input — the kernel half stays
        # covered by tests/test_validators.py parity.
        from engine.spark.validation import (
            scalarize_issue_columns,
            validate_invoice_extractions,
        )

        src = spark.read.parquet(_inv_fields_parquet(spark))
        return scalarize_issue_columns(validate_invoice_extractions(src))

    def dedup_conversations(spark: SparkSession, sf_dir: str) -> DataFrame:
        # conversation-level exact dedup over extraction output,
        # oracled via the materialized per-turn cleaned-text parquet:
        # DuckDB recomputes md5 → block hash → conv fingerprint →
        # keeper from the same rows. The corpus has no naturally
        # duplicated documents, so both engines plant duplicates
        # identically: conversations whose md5(conv_id) starts with
        # '0' (~1/16) are re-added under a '~dup' suffix ('~' sorts
        # after alphanumerics, so the original stays the keeper) —
        # non-vacuity is pytest-asserted.
        from pyspark.sql import functions as F

        from engine.spark.pipeline import dedup_conversations as _dc

        src = spark.read.parquet(_conv_text_parquet(spark, sf_dir))
        dups = src.filter(
            F.substring(F.md5("conv_id"), 1, 1) == "0"
        ).withColumn("conv_id", F.concat("conv_id", F.lit("~dup")))
        return _dc(src.unionByName(dups))

    def transcript_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the transcript-native end-to-end pipeline: conversation dedup
        # (same planted '~dup' copies as dedup_conversations, so the
        # stage is non-vacuous) -> quality gate (token floor splits the
        # corpus) -> shard-windowed packing. DuckDB recomputes the full
        # chain from the same materialized cleaned-text parquet.
        from pyspark.sql import functions as F

        from engine.spark.pipeline import transcript_prepare as _tp

        src = spark.read.parquet(_conv_text_parquet(spark, sf_dir))
        dups = src.filter(
            F.substring(F.md5("conv_id"), 1, 1) == "0"
        ).withColumn("conv_id", F.concat("conv_id", F.lit("~dup")))
        return _tp(src.unionByName(dups))

    def sft_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
        # training-example construction: per assistant turn, the
        # contiguous preceding-context window that fits the token
        # budget, as pointers. Runs over the synthetic multi-turn
        # transcripts; DuckDB recomputes the window math (bounded
        # self-join + reverse running sum) from the same parquet.
        from engine.spark.pipeline import sft_examples as _sft

        return _sft(spark.read.parquet(_sft_turns_parquet(spark)))

    def extract_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
        # corpus-level quality/emptiness drift per event-time window,
        # oracled from the materialized per-turn parquet; window bounds
        # as epoch seconds (engine-portable, driver-sortable)
        from engine.spark.monitor import quality_drift

        qd = quality_drift(
            spark.read.parquet(_per_turn_parquet(spark, sf_dir)), window="7 days"
        )
        return qd.select(
            F.col("window_start").cast("long").alias("window_start_s"),
            F.col("window_end").cast("long").alias("window_end_s"),
            "quality_bucket", "n_turns", "avg_quality", "empty_rate",
            "avg_confidence", "bytes_in",
        )

    def doc_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
        # T7 as a pure native expression over raw documents (oracle-able)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return docs.select(
            "doc_id",
            F.greatest(F.lit(1), F.floor(F.length("text") / 4)).cast("long").alias("est_tokens"),
            F.length("text").cast("long").alias("n_chars_calc"),
        )

    def _bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
        # 8 merges over the top-2000 [a-z]+ vocab of the documents
        # corpus; parameters must match _bpe_oracle(8, 2000)
        from engine.spark.bpe import bpe_train

        return bpe_train(spark, sf_dir, n_merges=8, vocab_cap=2000)

    def _bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
        # map-only corpus tokenization with the 8 trained merges baked
        # in as literal replaces; must match _bpe_tokenize_oracle(8,
        # 2000, 8)
        from engine.spark.bpe import bpe_tokenize

        return bpe_tokenize(
            spark, sf_dir, n_merges=8, vocab_cap=2000, preview_tokens=8
        )

    def dedup_conversations_near(spark: SparkSession, sf_dir: str) -> DataFrame:
        # near-dup conversation pairs over the synthetic MULTI-turn
        # per-turn extraction output (the document-derived convs are
        # single-turn — they would leave the multi-row path untested).
        # No natural near-dup conversations exist, so both engines
        # plant truncated '~near' copies identically
        # (_planted_conv_turns; 2-turn convs may legitimately fall
        # below the 0.5 threshold, identically in both engines).
        from engine.spark.pipeline import dedup_conversations_near as _dcn

        return _dcn(_planted_conv_turns(spark, with_dup=False))

    def dedup_apply_conversations(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the surviving-conversation keep-list, both arms exercised:
        # planted conversations get BOTH an exact '~dup' copy AND a
        # truncated '~near' copy (_planted_conv_turns) — one component
        # per planted conversation, original always the survivor.
        from engine.spark.pipeline import dedup_apply_conversations as _dac

        return _dac(_planted_conv_turns(spark, with_dup=True))

    def conversation_language(spark: SparkSession, sf_dir: str) -> DataFrame:
        # per-conversation language vote over the multi-turn synthetic
        # transcripts (marker scores per turn, summed per conversation)
        from engine.spark.agent import conversation_language as _cl

        src = spark.read.parquet(_sft_turns_parquet(spark)).select(
            "conv_id", "cleaned_text"
        )
        return _cl(src)

    def transcript_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the full curation pipeline with the near arm on; same planted
        # '~dup'/'~near' copies as dedup_apply_conversations; token
        # floor 256 so the gate splits the synthetic conversations
        from engine.spark.pipeline import transcript_curate as _tc

        return _tc(
            _planted_conv_turns(spark, with_dup=True), min_conv_tokens=256
        )

    def transcript_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        # single-row transcript dataset card over the raw synthetic
        # turns (same materialized parquet as the agent analytics)
        from engine.spark.agent import transcript_stats as _ts

        return _ts(spark.read.parquet(_agent_turns_parquet(spark)))

    def mix_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
        # conversation-granularity temperature mixing over the per-turn
        # language vote (alpha 0.7: en majority downsampled, rarest
        # class keeps all — non-vacuous on the en/und split)
        from engine.spark.agent import mix_transcripts as _mt

        src = spark.read.parquet(_sft_turns_parquet(spark)).select(
            "conv_id", "cleaned_text"
        )
        return _mt(src, alpha=0.7)

    def corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
        # snapshot diff: snapshot A = documents as-is; snapshot B
        # derived deterministically in both engines — md5(text) prefix
        # '0' docs removed, prefix '1' docs text-mutated (suffix
        # appended), one synthetic doc added.
        from engine.spark.analytics import corpus_diff as _cd

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        pfx = F.substring(F.md5("text"), 1, 1)
        newsnap = (
            docs.filter(pfx != "0")
            .select(
                "doc_id",
                F.when(
                    pfx == "1", F.concat("text", F.lit(" [rev2]"))
                )
                .otherwise(F.col("text"))
                .alias("text"),
            )
            .unionByName(
                spark.createDataFrame(
                    [(10_000_000, "brand new document")],
                    "doc_id long, text string",
                )
            )
        )
        return _cd(docs, newsnap)

    def source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
        # per-source mixing scorecard. sf0.01 has zero natural exact
        # dups, so both engines plant copies identically (docs whose
        # md5(text) starts with '0', ~1/16) — dup_rate is non-vacuous
        # at every SF; sf0.1 adds 8 natural dups on top.
        from engine.spark.analytics import source_scorecard as _sc

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        dups = docs.filter(F.substring(F.md5("text"), 1, 1) == "0")
        return _sc(spark, sf_dir, docs=docs.unionByName(dups))

    def agent_tool_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        # per-tool usage over the synthetic agent transcripts; DuckDB
        # recomputes from the materialized raw turns. Two-level agg so
        # the low-cardinality tool key never receives raw turns.
        from engine.spark.agent import tool_usage_stats

        return tool_usage_stats(spark.read.parquet(_agent_turns_parquet(spark)))

    def agent_tool_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Markov bigrams of consecutive tool calls under stable order
        from engine.spark.agent import tool_transitions

        return tool_transitions(spark.read.parquet(_agent_turns_parquet(spark)))

    def conversation_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
        # per-conversation cadence (duration + inter-turn gaps)
        from engine.spark.agent import conversation_timing as _ct

        return _ct(spark.read.parquet(_agent_turns_parquet(spark)))

    def conversation_wellformed(spark: SparkSession, sf_dir: str) -> DataFrame:
        # structural SFT gate. The generator's role cycle never repeats
        # a role and always starts with 'user', so both engines plant
        # malformed copies identically (md5-prefix-'0' conversations
        # re-added under '~bad' with every role forced to 'assistant'
        # → starts_with_user false + adjacent repeats) — the
        # tool-role-missing-name violation occurs naturally.
        from engine.spark.agent import conversation_wellformed as _cw

        src = spark.read.parquet(_agent_turns_parquet(spark))
        bad = src.filter(
            F.substring(F.md5("conv_id"), 1, 1) == "0"
        ).select(
            F.concat("conv_id", F.lit("~bad")).alias("conv_id"),
            "turn_idx",
            F.lit("assistant").alias("role"),
            "text",
            "tool",
            "ts",
        )
        return _cw(src.unionByName(bad))

    def agent_loop_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
        # stuck-agent gate: longest consecutive identical-action run
        # per conversation. The generator never repeats an identical
        # (role, tool, text) triple back-to-back, so both engines plant
        # looping copies identically: md5-prefix-'1' conversations are
        # re-added under '~loop' with every turn tripled at
        # turn_idx*4+{0,1,2} — each original turn becomes a 3-run.
        from engine.spark.agent import loop_detect

        src = spark.read.parquet(_agent_turns_parquet(spark))
        looped = (
            src.filter(F.substring(F.md5("conv_id"), 1, 1) == "1")
            .withColumn("r", F.explode(F.array(*[F.lit(i) for i in range(3)])))
            .select(
                F.concat("conv_id", F.lit("~loop")).alias("conv_id"),
                (F.col("turn_idx") * F.lit(4) + F.col("r"))
                .cast("int")
                .alias("turn_idx"),
                "role",
                "text",
                "tool",
                "ts",
            )
        )
        return loop_detect(src.unionByName(looped))

    def canned_responses(spark: SparkSession, sf_dir: str) -> DataFrame:
        # template-turn detector. The generator derives every text from
        # (conv_id, turn_idx), so verbatim cross-conversation repeats
        # are planted identically by both engines: md5-prefix-'2'
        # conversations each get ONE extra assistant turn with the same
        # canned refusal text (turn_idx 9999, past the generator range).
        from engine.spark.agent import canned_responses as _cr

        src = spark.read.parquet(_agent_turns_parquet(spark))
        planted = (
            src.filter(F.substring(F.md5("conv_id"), 1, 1) == "2")
            .select("conv_id")
            .distinct()
            .select(
                "conv_id",
                F.lit(9999).cast("int").alias("turn_idx"),
                F.lit("assistant").alias("role"),
                F.lit(_CANNED_TEXT).alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
            )
        )
        return _cr(src.unionByName(planted))

    def context_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
        # context-window prefix fit (512-token limit) per conversation
        from engine.spark.agent import context_fit as _cf

        return _cf(spark.read.parquet(_agent_turns_parquet(spark)))

    def tool_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
        # per-tool execution latency (gap preceding each tool-result
        # turn, exact integer-µs two-level aggregation)
        from engine.spark.agent import tool_latency as _tl

        return _tl(spark.read.parquet(_agent_turns_parquet(spark)))

    def refusal_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
        # refusal-boilerplate gate. The generator's prose never
        # contains a refusal marker, so both engines plant identically:
        # md5-prefix-'3' conversations get ONE extra assistant turn
        # with the canned refusal text (which opens "I am sorry, I
        # cannot help..." — containing the 'i cannot' marker).
        from engine.spark.agent import refusal_detect as _rd

        src = spark.read.parquet(_agent_turns_parquet(spark))
        planted = (
            src.filter(F.substring(F.md5("conv_id"), 1, 1) == "3")
            .select("conv_id")
            .distinct()
            .select(
                "conv_id",
                F.lit(9999).cast("int").alias("turn_idx"),
                F.lit("assistant").alias("role"),
                F.lit(_CANNED_TEXT).alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
            )
        )
        return _rd(src.unionByName(planted))

    def truncation_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
        # mid-generation-truncation gate. mid_cut fires naturally (the
        # generator's invoices/plain docs end on digits); the fence and
        # ellipsis arms never occur naturally, so both engines plant
        # identically: md5-prefix-'4' conversations get TWO extra
        # assistant turns — one trailing off in '...', one with an
        # unterminated ``` code fence.
        from engine.spark.agent import truncation_detect as _td

        src = spark.read.parquet(_agent_turns_parquet(spark))
        convs = (
            src.filter(F.substring(F.md5("conv_id"), 1, 1) == "4")
            .select("conv_id")
            .distinct()
        )

        def _turn(idx: int, text: str):
            return convs.select(
                "conv_id",
                F.lit(idx).cast("int").alias("turn_idx"),
                F.lit("assistant").alias("role"),
                F.lit(text).alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
            )

        planted = _turn(9998, _TRUNC_ELLIPSIS_TEXT).unionByName(
            _turn(9999, _TRUNC_FENCE_TEXT)
        )
        return _td(src.unionByName(planted))

    def assistant_echo(spark: SparkSession, sf_dir: str) -> DataFrame:
        # prompt-parroting gate. The generator's repeated per-kind
        # boilerplate (document headers, invoice field labels) yields
        # NATURAL low-grade echo between adjacent turns (max ≈0.32 at
        # sf0.01) — real signal, kept; both engines additionally plant
        # a KNOWN strong pair: md5-prefix-'5' conversations get an
        # adjacent user(9998)/assistant(9999) pair whose response
        # restates the prompt at exactly 4/6 grams, tripping the
        # ≥0.5 high-echo arm that natural echo never reaches.
        from engine.spark.agent import assistant_echo as _ae

        src = spark.read.parquet(_agent_turns_parquet(spark))
        convs = (
            src.filter(F.substring(F.md5("conv_id"), 1, 1) == "5")
            .select("conv_id")
            .distinct()
        )

        def _turn(idx: int, role: str, text: str):
            return convs.select(
                "conv_id",
                F.lit(idx).cast("int").alias("turn_idx"),
                F.lit(role).alias("role"),
                F.lit(text).alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
            )

        planted = _turn(9998, "user", _ECHO_USER_TEXT).unionByName(
            _turn(9999, "assistant", _ECHO_ASSISTANT_TEXT)
        )
        return _ae(src.unionByName(planted))

    def turn_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
        # ingest-invariant audit. The generator's conversations are
        # perfect (unique contiguous turn_idx from 0, non-decreasing
        # ts), so both engines plant identical violations:
        # md5-prefix-'6' conversations get a duplicated turn_idx 9998
        # (two ts), then turn 9999 with a ts BEFORE them — one dup,
        # one regression, and the 9998 jump itself is the gap.
        from engine.spark.agent import turn_integrity as _ti

        src = spark.read.parquet(_agent_turns_parquet(spark))
        convs = (
            src.filter(F.substring(F.md5("conv_id"), 1, 1) == "6")
            .select("conv_id")
            .distinct()
        )

        def _turn(idx: int, ts: str):
            return convs.select(
                "conv_id",
                F.lit(idx).cast("int").alias("turn_idx"),
                F.lit("user").alias("role"),
                F.lit("x").alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.lit(ts).cast("timestamp").alias("ts"),
            )

        planted = (
            _turn(9998, "2026-06-01 00:00:01")
            .unionByName(_turn(9998, "2026-06-01 00:00:02"))
            .unionByName(_turn(9999, "2025-01-01 00:00:00"))
        )
        return _ti(src.unionByName(planted))

    full = {
        # relational / reference-semantics operators (SURVEY.md §2.4-2.7)
        "q1_pricing_summary": R.q1_pricing_summary,
        "top_orders_per_segment": R.top_orders_per_segment,
        "score_distribution": R.score_distribution,
        "customers_without_orders": R.customers_without_orders,
        "suppliers_in_region": R.suppliers_in_region,
        "order_consistency": R.order_consistency,
        "event_set_ops": R.event_set_ops,
        "sessionize_events": R.sessionize_events,
        "event_props_json": R.event_props_json,
        "part_type_shares": R.part_type_shares,
        "ats_keyword_match": R.ats_keyword_match,
        "candidate_pairwise": R.candidate_pairwise,
        "revenue_by_nation": R.revenue_by_nation,
        # Q7 shape: two-role nation dim join, cross-border volume
        "nation_trade_volume": R.nation_trade_volume,
        # daily DAU / trailing-7d WAU / stickiness (exact trailing
        # distinct via contribution-explode, no window-distinct)
        "user_engagement": R.user_engagement,
        # dataset-versioning snapshot diff (added/removed/changed by
        # content hash; unchanged majority never leaves the join)
        "corpus_diff": corpus_diff,
        # trailing-7-day RANGE-frame moving average over daily values
        "event_value_trend": R.event_value_trend,
        # percent_rank decile table per segment (partitioned window,
        # no global sort)
        "order_percentiles_by_segment": R.order_percentiles_by_segment,
        # per-nation balance outliers (exact integer-cent moments ->
        # deterministic z-scores; no float-accumulation stddev)
        "supplier_balance_outliers": R.supplier_balance_outliers,
        # volume-anomaly days per event type (exact integer moments ->
        # deterministic z) — the pipeline-alert monitoring query
        "event_volume_anomalies": R.event_volume_anomalies,
        "text_preview": R.text_preview,
        "date_normalize": R.date_normalize,
        "validation_score": R.validation_score,
        "order_rollup": R.order_rollup,
        "candidate_rank": R.candidate_rank,
        "skill_match_tiers": R.skill_match_tiers,
        "multimodal_features": _multimodal_features,
        # training-data ops
        "dedup_exact": A.dedup_exact,
        "dedup_ngram_jaccard": A.dedup_ngram_jaccard,
        # pairs -> connected components -> keep/drop decision -> applied
        "dedup_cluster_assign": A.dedup_cluster_assign,
        # O(log n) star algorithm over the same pairs -> same oracle
        "dedup_cluster_assign_star": A.dedup_cluster_assign_star,
        "dedup_apply": A.dedup_apply,
        # quality-aware survivor selection: cluster keeper = longest
        # member (ties -> min id), not min id — the canonical-
        # representative policy; same pair source, twin verifies WHICH
        # member survives
        "dedup_keep_best": A.dedup_keep_best,
        # budget-bounded corpus selection without a global sort (two-
        # pass histogram cutoff; only the boundary score group pays a
        # running-sum window) — twin replays the prefix rule exactly
        "token_budget_select": A.token_budget_select,
        # fully oracled since the portable md5 double-hash (DuckDB
        # computes bit-identical signatures/simhashes)
        "dedup_minhash_lsh": A.dedup_minhash_lsh,
        # band_bits pinned to 10 (6 bands) for the static oracle SQL;
        # the production default is adaptive (corpus-sized keyspace)
        "dedup_simhash": lambda s, d: A.dedup_simhash(s, d, band_bits=10),
        # the production composition: LSH candidates -> exact jaccard
        # verified on candidates only -> components -> anti-join
        "dedup_lsh_verified": A.lsh_verified_pairs,
        "dedup_apply_lsh": A.dedup_apply_lsh,
        # the full training-corpus pipeline in one call: quality
        # filter -> dedup -> pack (loader-ready bins)
        "corpus_prepare": A.corpus_prepare,
        # per-batch dedup against a persisted corpus state (exact
        # hashes + MinHash bands; no old text ever re-read) — the op an
        # ongoing ingestion pipeline runs per crawl shard. Driver form:
        # even ids = history, odd ids = new batch
        "dedup_incremental": A.dedup_incremental,
        # deterministic hash-keyed per-language downsampling (the
        # corpus-mixing knob); reproducible + partition-invariant
        "stratified_sample": A.stratified_sample,
        # eval-set n-gram decontamination (the GPT-3-style 13-gram
        # overlap rule); driver form: doc_id % 5 == 0 plays the
        # held-out benchmark set
        "decontaminate": A.decontaminate,
        # the paraphrase-robust near-dup arm of the same split: MinHash
        # bands bipartite-joined corpus-vs-eval (eval side broadcasts,
        # the corpus never shuffles past its signature agg)
        "decontaminate_fuzzy": A.decontaminate_fuzzy,
        # corpus-global repeated-n-gram table (the boilerplate detector
        # feeding strike-out rules); per-doc distinct map-side so the
        # plain count IS document frequency
        "boilerplate_ngrams": A.boilerplate_ngrams,
        # deterministic seeded shard manifest (loader-ready global
        # shuffle: shard = portable-hash mod k, pos = per-shard order);
        # partition-invariant, reseed = new epoch order
        "shuffle_shards": A.shuffle_shards,
        # per-eval-doc contamination audit (exact-13-gram hits + fuzzy
        # MinHash hits per burned benchmark doc) — the table beside the
        # keep-lists; both arms broadcast the eval side
        "contamination_report": A.contamination_report,
        # per-source tf-idf keyword table (crawl-triage: what a source
        # is about before weighting it); per-doc-distinct map-side so
        # the (source, word) count is the doc frequency
        "source_keywords": A.source_keywords,
        # single-row dedup dataset card (exact surplus, verified pairs,
        # components + largest, drop fraction) — the "how redundant is
        # this crawl" summary, composed from the oracled chain
        "dedup_report": A.dedup_report,
        # signed feature-hashing text embedding (Weinberger et al.) —
        # the in-engine text->vector path: integer bucket sums, exact
        # norm operands, flattened nonzero (doc_id, pos, value)
        "hash_embed": A.hash_embed,
        # text in -> semantic near-dup pairs out, no external model:
        # hash embeddings fed into the multi-probe sign-bucket cosine
        # machinery (order-insensitive complement to MinHash)
        "dedup_text_semantic": A.dedup_text_semantic,
        # the same composition at its production operating point:
        # persisted vector artifact + adaptive sign width (the pinned
        # sign_dims=6 entry above exists for its fully-static oracle)
        "dedup_text_semantic_adaptive": _dedup_text_semantic_adaptive,
        # keep-list tail of the semantic family (the apply symmetry
        # every other dedup modality has): pairs -> min-label
        # components -> surviving vec_ids
        "dedup_semantic_apply": _dedup_semantic_apply,
        # model-based quality filtering: ridge-distilled linear scorer
        # over hash-embed features (served-weights artifact; map-only
        # scoring, exact left-fold dot replayed by the twin)
        "quality_classifier": _quality_classifier,
        # Gopher-style repetition metrics + gate; map-only (sorted-
        # array fold for modes, no explode/groupBy shuffle)
        "repetition_metrics": A.repetition_metrics,
        # PII redaction (emails + phones counted and replaced); driver
        # form synthesizes a deterministic blob from customer keys
        "pii_scrub": A.pii_scrub,
        # corpus-wide word-frequency table (tokenizer-training input);
        # deterministic top-k under ties via (count DESC, word ASC)
        "vocab_top_k": A.vocab_top_k,
        # single-row corpus card: one scan, one reduce
        "corpus_stats": A.corpus_stats,
        # C4-style line/document cleaning (terminal-punct + min-words
        # line rule, brace/lorem flags); driver form synthesizes line
        # structure deterministically in both engines
        "c4_clean": A.c4_clean,
        # CCNet-style unigram-LM quality filter: corpus-trained vocab,
        # interpolated smoothing (SF-stable bits), fixed keep threshold
        "lm_unigram_score": A.lm_unigram_score,
        # bigram order: broadcast pruned model (top-64 bigrams +
        # top-16 unigrams), conditional + backoff + floor interpolation
        "lm_bigram_score": A.lm_bigram_score,
        # temperature mixing: data-derived per-language keep rates
        # (∝ p^(α−1), rarest keeps all) -> post-sample counts ∝ p^α
        "mix_corpus": A.mix_corpus,
        # RefinedWeb-style cross-document line dedup: corpus-global
        # line frequency -> boilerplate strike-out -> exact rebuild
        "line_dedup": A.line_dedup,
        # within-doc first-occurrence line dedup: map-only, zero shuffle
        "line_dedup_intra": A.line_dedup_intra,
        # ExactSubstr-style repeated-span signal: fraction of a doc's
        # n-grams also present in other docs (hashed before shuffle)
        "internal_ngram_overlap": A.internal_ngram_overlap,
        # sign_dims pinned to 6: the DuckDB twins hard-code the 6-bit
        # sign arithmetic; the functions' production default is adaptive
        # (corpus-sized keyspace, engine/spark/analytics.py)
        "dedup_embedding_cosine": lambda s, d: A.dedup_embedding_cosine(
            s, d, sign_dims=6
        ),
        # the vector-side keep-list (cosine pairs -> components ->
        # anti-join); same pinned sign_dims for the static oracle
        "dedup_apply_embeddings": lambda s, d: A.dedup_apply_embeddings(
            s, d, sign_dims=6
        ),
        "simsearch_bruteforce": A.simsearch_bruteforce,
        # quantized serving path: exact integer dot products over int8
        # codes (no FP in the hot loop), cosine reconstructed per
        # surviving candidate from the two scales
        "simsearch_int8": A.simsearch_int8,
        "simsearch_ivf": lambda s, d: A.simsearch_ivf(s, d, sign_dims=6),
        # served-codebook form: train once (deterministic), persist the
        # codebook parquet, serve from the loaded codebook — identical
        # to in-line training (test-asserted), and the persisted table
        # makes the data-dependent half shared input, so DuckDB can
        # independently recompute assignment → probe → candidate join →
        # cosine top-k (full oracle; training itself stays covered by
        # determinism + recall tests)
        "simsearch_ivf_centroids": _simsearch_ivf_served,
        # per-cluster corpus composition (volume/share/mean fit) from
        # the same persisted codebook — the topical-rebalance table
        "embedding_clusters": _embedding_clusters_served,
        "pack_sequences": A.pack_sequences,
        "lang_id": A.lang_id,
        # tokenizer fertility by language: subword-per-word ratio, the
        # multilingual-tokenizer diagnostic (one scan, <=5-row groupBy)
        "tokenizer_fertility": A.tokenizer_fertility,
        "text_quality": A.text_quality,
        "token_count": A.token_count,
        "fingerprint": A.fingerprint,
        # extraction pipeline (kernel-backed; rows-only vs oracle)
        "extract_turns_scalar": extract_turns_scalar,
        "extract_spans": extract_spans,
        "extract_spans_consistency": extract_spans_consistency,
        "extract_conversation_rollup": extract_conversation_rollup,
        "extract_quality_drift": extract_quality_drift,
        # conversation-level exact dedup (transcript-native): per-turn
        # md5 -> SKEW_BLOCK block hash -> ordered conv fingerprint ->
        # min-conv_id keeper; nothing text-sized ever shuffles
        "dedup_conversations": dedup_conversations,
        # near-dup conversation pairs (truncated/edited re-pastes):
        # per-turn shingles -> conv-keyed MinHash -> band-collision ->
        # exact verify; no conversation text is ever concatenated
        "dedup_conversations_near": dedup_conversations_near,
        # both arms composed: exact fingerprint drops + near-dup
        # component drops -> the surviving-conversation keep-list
        "dedup_apply_conversations": dedup_apply_conversations,
        # curation capstone: (exact ∪ near) dedup -> quality gate ->
        # shard-windowed packing, one call
        "transcript_curate": transcript_curate,
        # the transcript-native corpus_prepare: dedup -> quality gate
        # -> shard-windowed concat packing, one call, fully oracled
        "transcript_prepare": transcript_prepare,
        # SFT context-window construction: pointers, not copied text
        "sft_examples": sft_examples,
        # DPO/RLHF preference pairs: same first-user-turn prompt,
        # different responses -> (chosen, rejected) by assistant-token
        # count; identical-response groups (pure re-runs) excluded
        "preference_pairs": _preference_pairs,
        # retry-tree detection: deepest turn-prefix shared by >=2
        # conversations (the prefix duplication whole-conv dedup
        # misses), capped at 32 turns — the scale bound
        "conversation_branches": _conversation_branches,
        "validate_invoice_fields": validate_invoice_fields,
        "validate_invoice_extracted": validate_invoice_extracted,
        "doc_token_estimate": doc_token_estimate,
        # deterministic CareerProgression (the last reference response
        # field; analyzer.py:443-470, native over the experience array)
        "career_progression": _career_progression,
        # the reference's post-LLM fit-response normalization
        # (allowlists/defaults/rec-map, analyzer.py:401-505) over
        # deterministic synthetic responses
        "candidate_fit_parse": _candidate_fit_parse,
        # full ATS lifecycle (A5 complete + suggestion/summary/
        # recommendation generators, all native; engine/spark/ats.py)
        "ats_full_score": _ats.ats_full_score,
        "ats_suggestions": _ats.ats_suggestions,
        "hiring_recommendation": _ats.hiring_recommendation,
        "candidate_fit_fallback": _ats.candidate_fit_fallback,
        # agent-trajectory analytics over the transcript table
        # (engine/spark/agent.py): which tools fire, in what order,
        # with what cadence, and is the conversation structurally
        # trainable — all pure Catalyst, conv-keyed or map-side-reduced
        "agent_tool_stats": agent_tool_stats,
        "agent_tool_transitions": agent_tool_transitions,
        # stuck-agent loop gate (consecutive identical-action runs)
        "agent_loop_detect": agent_loop_detect,
        # verbatim cross-conversation template turns (canned refusals)
        "canned_responses": canned_responses,
        # context-window prefix fit per conversation
        "context_fit": context_fit,
        # per-tool execution-latency profile
        "tool_latency": tool_latency,
        # refusal-boilerplate rate per conversation (marker contains()
        # chain, map-only; one conv-keyed aggregate)
        "refusal_detect": refusal_detect,
        # mid-generation truncation gate (mid-sentence cut / unclosed
        # ``` fence / trailing ellipsis), map-only flags
        "truncation_detect": truncation_detect,
        # prompt-parroting rate (response 5-grams already present in
        # the preceding user turn); per-turn gram arrays, one exchange
        "assistant_echo": assistant_echo,
        # ingest-invariant audit (duplicate turn_idx / index gaps /
        # ts regressions under stable order); narrow columns only
        "turn_integrity": turn_integrity,
        "conversation_timing": conversation_timing,
        "conversation_wellformed": conversation_wellformed,
        # per-conversation language vote (turn scores summed conv-side)
        "conversation_language": conversation_language,
        # single-row transcript dataset card (volume, length
        # percentiles, role shares, tool-call rate)
        "transcript_stats": transcript_stats,
        # conversation-granularity temperature mixing (data-derived
        # per-language keep rates over the turn-vote language)
        "mix_transcripts": mix_transcripts,
        # distributed BPE merge training (engine/spark/bpe.py): corpus
        # touched once for word counts; the merge loop runs over the
        # vocab-sized table; the driver holds one argmax row per
        # iteration. Oracled by unrolling the loop as generated CTEs.
        "bpe_train": _bpe_train,
        "bpe_tokenize": _bpe_tokenize,
        # sequential-window funnel: strict temporal ordering, three
        # stacked min-over-user windows sharing one exchange
        "event_funnel": R.event_funnel,
        # weekly cohort retention matrix (integer-µs week bucketing)
        "retention_cohorts": R.retention_cohorts,
        # map-only symmetric int8 vector quantization (order-proof
        # max-abs reconstruction error)
        "embedding_quantize": A.embedding_quantize,
        # per-source corpus scorecard (docs/tokens/dup-rate/share) —
        # the crawl-mixing decision table; planted dups at every SF
        "source_scorecard": source_scorecard,
    }
    # Driver-coverage insurance (round-3 verdict task #7): the driver
    # samples the FIRST 50 entries, and round 3's sample covered exactly
    # positions 0-49 — leaving 45 entries (ats/agent ops, bpe, the
    # transcript compositions) with only the local oracle gate. Rotate
    # the previously-unsampled names to the front so CORRECTNESS_r04
    # records driver rows for them; the r3-green entries follow and
    # remain covered by tests/test_entry_oracle.py either way.
    sampled_r3 = {
        "q1_pricing_summary", "top_orders_per_segment", "score_distribution",
        "customers_without_orders", "suppliers_in_region",
        "order_consistency", "event_set_ops", "sessionize_events",
        "event_props_json", "part_type_shares", "ats_keyword_match",
        "candidate_pairwise", "revenue_by_nation", "nation_trade_volume",
        "user_engagement", "corpus_diff", "event_value_trend",
        "order_percentiles_by_segment", "supplier_balance_outliers",
        "event_volume_anomalies", "date_normalize", "validation_score",
        "skill_match_tiers", "text_preview", "candidate_rank",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_ngram_jaccard", "dedup_lsh_verified", "dedup_apply",
        "dedup_cluster_assign", "dedup_cluster_assign_star",
        "dedup_incremental", "order_rollup",
        "stratified_sample", "decontaminate", "repetition_metrics",
        "pii_scrub", "vocab_top_k", "corpus_stats", "c4_clean",
        "line_dedup", "internal_ngram_overlap", "lm_unigram_score",
        "lm_bigram_score", "mix_corpus", "corpus_prepare",
        "multimodal_features",
    }
    # Round-5 rotation (r4 verdict task #3). Front-load three groups
    # (WITHIN each group and between the first three the order is
    # whatever full.items() yields — only the group membership
    # matters, all front entries land well inside the 50-slot window):
    #   1. the 4 round-4 ops that have NEVER had a driver row (they sat
    #      at positions 50-53 last round, just outside the 50-entry
    #      sample window): source_keywords, dedup_report, hash_embed,
    #      dedup_text_semantic;
    #   2. the 2 round-4 red driver rows (transcript_prepare /
    #      transcript_curate — oracle-twin HUGEINT cast fixed this
    #      round) so CORRECTNESS_r05 re-records them;
    #   3. the 17 oracled round-5 additions (dedup_text_semantic_adaptive,
    #      dedup_semantic_apply, quality_classifier, tokenizer_fertility,
    #      dedup_keep_best, token_budget_select, line_dedup_intra,
    #      agent_loop_detect, canned_responses, context_fit,
    #      tool_latency, preference_pairs, conversation_branches,
    #      refusal_detect, truncation_detect, assistant_echo,
    #      turn_integrity);
    # then the r3-sampled entries (oldest driver evidence, refresh) and
    # the r4-green entries last (freshest evidence). With 23 front
    # slots, 27 of the 49 r3 entries also land in the 50-slot window.
    never_sampled = {
        "source_keywords", "dedup_report", "hash_embed",
        "dedup_text_semantic",
    }
    red_r4 = {"transcript_curate", "transcript_prepare"}
    new_r5 = {
        "dedup_text_semantic_adaptive",
        "dedup_semantic_apply",
        "quality_classifier",
        "tokenizer_fertility",
        "dedup_keep_best",
        "token_budget_select",
        "line_dedup_intra",
        "agent_loop_detect",
        "canned_responses",
        "context_fit",
        "tool_latency",
        "preference_pairs",
        "conversation_branches",
        "refusal_detect",
        "truncation_detect",
        "assistant_echo",
        "turn_integrity",
    }
    front = never_sampled | red_r4 | new_r5
    return {
        **{k: v for k, v in full.items() if k in front},
        **{k: v for k, v in full.items()
           if k in sampled_r3 and k not in front},
        **{k: v for k, v in full.items()
           if k not in front and k not in sampled_r3},
    }


_LANGS = {
    "en": ("the", "and", "of", "is", "to"),
    "es": ("el", "la", "que", "de", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
}


def _hits(word: str) -> str:
    token = f" {word} "
    return (
        f"CAST((length(' ' || lower(text) || ' ') - "
        f"length(replace(' ' || lower(text) || ' ', '{token}', ''))) / {len(token)} AS INT)"
    )


def _lang_scores() -> str:
    return ", ".join(
        "(" + " + ".join(_hits(w) for w in words) + f") AS s_{lang}"
        for lang, words in _LANGS.items()
    )


def _preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DPO pair construction over the synthetic multi-turn transcripts
    # with the shared planted copies: '~near' truncated copies answer
    # the same prompt with a shorter response (real pairs), '~dup'
    # exact copies carry no preference signal and must be excluded by
    # the identical-response-fingerprint gate — both arms exercised.
    from pyspark.sql import functions as F

    from engine.spark.pipeline import preference_pairs as _pp

    # third planted arm: '~alt' copies whose assistant turns are
    # halved — same prompt, strictly DIFFERENT response. The shared
    # '~dup'/'~near' copies alone are vacuous here: '~near' drops the
    # LAST turn, which in this corpus is never a mid-response
    # assistant turn (2-turn convs lose their only assistant turn and
    # are filtered; 4-turn convs end in a system turn), so every
    # response fingerprint in a group would tie and no pair forms.
    base = _planted_conv_turns(spark, with_dup=True, with_role=True)
    src = spark.read.parquet(_sft_turns_parquet(spark)).select(
        "conv_id", "turn_idx", "role", "cleaned_text"
    )
    alt = src.filter(F.substring(F.md5("conv_id"), 1, 1) == "0").select(
        F.concat("conv_id", F.lit("~alt")).alias("conv_id"),
        "turn_idx",
        "role",
        F.when(
            F.col("role") == "assistant",
            F.expr(
                "substring(cleaned_text, 1,"
                " cast(floor(length(cleaned_text) / 2) as int))"
            ),
        )
        .otherwise(F.col("cleaned_text"))
        .alias("cleaned_text"),
    )
    return _pp(base.unionByName(alt))


def _conversation_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    # retry-tree detection over the same planted corpus: '~dup' full
    # copies share every depth (deepest = full length), '~near'
    # truncated copies share exactly len-1 turns with a family of 3 —
    # the deepest-shared-prefix pick is verified per conversation.
    from engine.spark.pipeline import conversation_branches as _cb

    return _cb(_planted_conv_turns(spark, with_dup=True))


def _career_progression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from engine.spark.validation import career_progression_table

    return career_progression_table(spark, sf_dir)


def _candidate_fit_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from engine.spark.validation import candidate_fit_parse_table

    return candidate_fit_parse_table(spark, sf_dir)


# expected normalization outcomes per synthetic-response branch
# (doc_id % 5), derived independently of the JSON intermediate
_FIT_PARSE_SQL = """
    SELECT doc_id,
        CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN CAST(doc_id % 101 AS INT)
            WHEN 2 THEN 93 WHEN 4 THEN 10 ELSE 50 END AS fit_score,
        CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN 'strong_hire' WHEN 2 THEN 'good_fit'
            WHEN 4 THEN 'not_recommended' ELSE 'needs_review'
        END AS recommendation,
        CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 4 THEN 2 ELSE 0
        END AS red_flag_count,
        (doc_id % 5 IN (0, 4)) AS has_critical_red_flags,
        CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN 'short_tenure:high'
            WHEN 1 THEN 'other:medium'
            WHEN 4 THEN 'employment_gap:low;no_progression:high'
            ELSE '' END AS flags_scalar,
        CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN 1 WHEN 4 THEN 2 ELSE 0 END AS n_strengths,
        CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN CAST(doc_id % 100 AS VARCHAR)
            WHEN 4 THEN '80;95' ELSE '' END AS strength_relevance
    FROM documents
"""


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column pipeline, driver-checked: deterministic
    media table (opaque image/audio payloads with typed headers) through
    the Arrow-batched decode/feature stage (stub codec — the header
    fields are pure arithmetic of media_id, so DuckDB can re-derive
    them without any codec; mean_byte is excluded as bytes-dependent)."""
    from engine.spark.multimodal import extract_media_features, make_media_table

    media = make_media_table(spark, n=256)
    return extract_media_features(media).select(
        "media_id", "kind", "n_bytes", "width", "height",
        "sample_rate", "n_samples", "frame_count", "ok",
    )


def _skill_match_oracle() -> str:
    """DuckDB twin of J1 skill_match_tiers: same vocab assignment, same
    synonym table (engine.kernel.scoring.SKILL_SYNONYMS expanded to
    variant→canonical rows), same exact > partial > synonym precedence."""
    from engine.kernel.scoring import SKILL_SYNONYMS
    from engine.spark.relational import JD_SKILLS, SKILL_VOCAB

    vocab_rows = ", ".join(f"({i}, '{s}')" for i, s in enumerate(SKILL_VOCAB))
    jd_rows = ", ".join(f"('{s}')" for s in JD_SKILLS)
    syn_pairs = []
    for canonical, syns in SKILL_SYNONYMS.items():
        syn_pairs.append((canonical, canonical))
        syn_pairs.extend((v, canonical) for v in syns)
    syn_rows = ", ".join(
        "('{}', '{}')".format(v.replace("'", "''"), c.replace("'", "''"))
        for v, c in syn_pairs
    )
    n = len(SKILL_VOCAB)
    return f"""
        WITH vocab(idx, skill) AS (VALUES {vocab_rows}),
        jd(jd_skill) AS (VALUES {jd_rows}),
        syn(variant, canonical) AS (VALUES {syn_rows}),
        r AS (
            SELECT DISTINCT d.doc_id AS candidate_id, v.skill
            FROM documents d JOIN vocab v
              ON v.idx = d.doc_id % {n} OR v.idx = (d.doc_id * 7 + 3) % {n}),
        exact AS (
            SELECT candidate_id, jd_skill, 'exact' AS match_type, 0 AS pri
            FROM r JOIN jd ON r.skill = jd.jd_skill),
        part AS (
            SELECT DISTINCT candidate_id, jd_skill, 'partial' AS match_type, 1 AS pri
            FROM r JOIN jd ON r.skill != jd.jd_skill
             AND (contains(r.skill, jd.jd_skill) OR contains(jd.jd_skill, r.skill))),
        synm AS (
            SELECT DISTINCT r.candidate_id, jd.jd_skill, 'synonym' AS match_type, 2 AS pri
            FROM r JOIN syn sr ON r.skill = sr.variant
            JOIN syn sj ON sr.canonical = sj.canonical
            JOIN jd ON jd.jd_skill = sj.variant),
        u AS (SELECT * FROM exact UNION ALL SELECT * FROM part
              UNION ALL SELECT * FROM synm),
        best AS (
            SELECT candidate_id, jd_skill, match_type,
                   row_number() OVER (PARTITION BY candidate_id, jd_skill
                                      ORDER BY pri) AS rn
            FROM u)
        SELECT candidate_id, jd_skill, match_type FROM best WHERE rn = 1
    """


def _shingle_ctes(src: str = "documents", where: str = "") -> str:
    """Shared DuckDB CTE chain: distinct word-3-gram shingles per doc
    (identical tokenization to engine.spark.analytics._shingles)."""
    return rf"""
        words AS (
            SELECT doc_id,
                   string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS w
            FROM {src} {where}
        ), idx AS (
            SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
            FROM words WHERE len(w) >= 3
        ), sh AS (
            SELECT DISTINCT doc_id,
                   w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
            FROM idx
        )"""


def _bucket_pair_ctes(src: str, payload: str, max_bucket_docs: int) -> str:
    """DuckDB twin of analytics._bucketed_pairs: bucket self-join with
    the hub-star guard for oversized (boilerplate-skew) buckets."""
    return f"""
        sized AS (
            SELECT doc_id, {payload}, bucket,
                   count(*) OVER (PARTITION BY bucket) AS bsize,
                   min(doc_id) OVER (PARTITION BY bucket) AS hub
            FROM {src}
        ), bpairs AS (
            SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                   x.{payload} AS pa, y.{payload} AS pb
            FROM sized x JOIN sized y
              ON x.bucket = y.bucket AND x.doc_id < y.doc_id
            WHERE x.bsize <= {max_bucket_docs}
            UNION ALL
            SELECT h.doc_id, m.doc_id, h.{payload}, m.{payload}
            FROM sized h JOIN sized m ON h.bucket = m.bucket
            WHERE h.bsize > {max_bucket_docs}
              AND h.doc_id = h.hub AND m.doc_id <> m.hub
        )"""


def _sig_band_ctes(src: str = "documents") -> str:
    """MinHash(32) signatures + 8x4 LSH band buckets in DuckDB, bit-
    identical to analytics._minhash_bands via the portable md5 double
    hash (Kirsch–Mitzenmacher: h_k = a + k*(2b+1)). Emits CTEs
    sh/hsh/sig/bands; pairing lives in _minhash_ctes so consumers that
    pair a SUBSET of the bands (dedup_incremental) can reuse the chain
    without the name-colliding sized/bpairs tail."""
    from engine.spark.analytics import LSH_BANDS, MINHASH_K

    rows_per_band = MINHASH_K // LSH_BANDS
    sig_items = ", ".join(f"min(ha + {k} * hb)" for k in range(MINHASH_K))
    band_exprs = []
    for band in range(LSH_BANDS):
        parts = " || ',' || ".join(
            f"CAST(sig[{band * rows_per_band + r + 1}] AS VARCHAR)"
            for r in range(rows_per_band)
        )
        band_exprs.append(
            f"('0x' || substr(md5('{band}:' || {parts}), 1, 15))::BIGINT"
        )
    return f"""
        {_shingle_ctes(src)}, hsh AS (
            SELECT doc_id,
                   ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS ha,
                   ('0x' || substr(md5(shingle), 9, 8))::BIGINT * 2 + 1 AS hb
            FROM sh
        ), sig AS (
            SELECT doc_id, [{sig_items}] AS sig FROM hsh GROUP BY doc_id
        ), bands AS (
            SELECT doc_id, sig, unnest([{", ".join(band_exprs)}]) AS bucket
            FROM sig
        )"""


def _minhash_ctes(src: str = "documents") -> str:
    from engine.spark.analytics import LSH_MAX_BUCKET_DOCS, MINHASH_K

    return f"""
        {_sig_band_ctes(src)}, {_bucket_pair_ctes("bands", "sig", LSH_MAX_BUCKET_DOCS)}, est AS (
            SELECT DISTINCT doc_a, doc_b,
                   round(len(list_filter(range(1, {MINHASH_K + 1}),
                                         i -> pa[i] = pb[i])) / {MINHASH_K},
                         6) AS est_jaccard
            FROM bpairs
        )"""


def _minhash_lsh_oracle() -> str:
    return f"""
        WITH {_minhash_ctes()}
        SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
    """


def _simhash_oracle(band_bits: int = 10) -> str:
    """DuckDB twin of analytics.dedup_simhash: 60-bit SimHash bit-vote
    over the portable per-shingle hash, multi-band buckets (band index
    high, hash slice low), hub-star skew guard, full-hamming verify."""
    from engine.spark.analytics import LSH_MAX_BUCKET_DOCS, SIMHASH_BITS

    n_bands = max(1, SIMHASH_BITS // band_bits)
    mask = (1 << band_bits) - 1
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {bit}) & 1 = 1 THEN 1 ELSE -1 END) AS v{bit}"
        for bit in range(SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"(CASE WHEN v{bit} > 0 THEN (1::BIGINT << {bit}) ELSE 0::BIGINT END)"
        for bit in range(SIMHASH_BITS)
    )
    band_exprs = ", ".join(
        f"({b << band_bits} + ((simhash >> {b * band_bits}) & {mask}))"
        for b in range(n_bands)
    )
    return f"""
        WITH {_shingle_ctes()}, hsh AS (
            SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
            FROM sh
        ), votes AS (
            SELECT doc_id, {votes} FROM hsh GROUP BY doc_id
        ), simh AS (
            SELECT doc_id, ({assemble}) AS simhash FROM votes
        ), b AS (
            SELECT doc_id, simhash, unnest([{band_exprs}]) AS bucket
            FROM simh
        ), {_bucket_pair_ctes("b", "simhash", LSH_MAX_BUCKET_DOCS)}
        SELECT DISTINCT doc_a, doc_b,
               CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
        FROM bpairs
        WHERE bit_count(xor(pa, pb)) <= 6
    """


def _lsh_verified_ctes(min_jaccard: float, src: str = "documents") -> str:
    """LSH candidates (any band collision) verified with exact n-gram
    Jaccard computed only on those pairs — DuckDB twin of
    analytics.lsh_verified_pairs."""
    return f"""
        {_minhash_ctes(src)}, cand AS (
            SELECT doc_a, doc_b FROM est
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ), icounts AS (
            SELECT c.doc_a, c.doc_b, count(*) AS icount
            FROM cand c
            JOIN sh a ON a.doc_id = c.doc_a
            JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
            GROUP BY c.doc_a, c.doc_b
        ), ver AS (
            SELECT i.doc_a, i.doc_b,
                   round(icount / (na.n + nb.n - icount), 6) AS jaccard
            FROM icounts i
            JOIN sizes na ON na.doc_id = i.doc_a
            JOIN sizes nb ON nb.doc_id = i.doc_b
        ), vpairs AS (
            SELECT doc_a, doc_b, jaccard FROM ver WHERE jaccard >= {min_jaccard}
        )"""


def _lsh_verified_oracle() -> str:
    return f"""
        WITH {_lsh_verified_ctes(0.5)}
        SELECT doc_a, doc_b, jaccard FROM vpairs
    """


def _apply_lsh_drop_ctes(src: str = "documents") -> str:
    """Recursive-CTE transitive closure over the LSH-verified pairs +
    the exact-group drops — the shared tail of dedup_apply_lsh and
    corpus_prepare (DuckDB twin of analytics._apply_drops_docs).
    Yields a ``survivors`` CTE of surviving doc ids."""
    return f"""
        {_lsh_verified_ctes(0.5, src)},
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM vpairs
            UNION SELECT doc_b, doc_a FROM vpairs),
        nodes AS (SELECT DISTINCT a AS node FROM edges),
        reach(node, r) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
        ),
        near_drop AS (
            SELECT node AS doc_id FROM reach GROUP BY node
            HAVING node != min(r)),
        exact_drop AS (
            SELECT doc_id FROM (
                SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
                FROM {src})
            WHERE doc_id != keep_id),
        survivors AS (
            SELECT doc_id, text FROM {src}
            WHERE doc_id NOT IN (SELECT doc_id FROM near_drop
                                 UNION SELECT doc_id FROM exact_drop))
    """


def _conv_near_oracle() -> str:
    """Near-dup conversation pairs: the document LSH chain re-pointed
    at the per-turn cleaned text with doc_id = conv_id (a conversation's
    shingle set = union of its turns' shingles, so the multi-row source
    flows through the same sh/sig/band/verify CTEs unchanged)."""
    return f"""
        WITH base AS (
            SELECT conv_id, turn_idx, cleaned_text,
                   max(turn_idx) OVER (PARTITION BY conv_id) AS mx
            FROM read_parquet('{_sft_synth_path()}/*.parquet')),
        conv_src AS (
            SELECT conv_id AS doc_id,
                   coalesce(cleaned_text, '') AS text
            FROM base
            UNION ALL
            SELECT conv_id || '~near', coalesce(cleaned_text, '')
            FROM base
            WHERE substr(md5(conv_id), 1, 1) = '0' AND turn_idx < mx),
        {_lsh_verified_ctes(0.5, "conv_src")}
        SELECT doc_a AS conv_a, doc_b AS conv_b, jaccard FROM vpairs
    """


def _lm_bigram_oracle() -> str:
    """DuckDB twin of analytics.lm_bigram_score. The interpolation
    floor is computed in Python and inlined by repr so both engines
    add the bit-identical double; 0.6/0.3 are ::DOUBLE literals
    (bare decimals would be DECIMAL in DuckDB, a different rounding
    path than Spark's double arithmetic)."""
    from engine.spark.analytics import (
        LM2_BIGRAM_K,
        LM2_BITS_KEEP_T,
        LM2_LAM1,
        LM2_LAM2,
        LM_VOCAB_K,
    )

    floor = (1.0 - LM2_LAM2 - LM2_LAM1) / (LM_VOCAB_K + 1)
    return f"""
        WITH w AS (
            SELECT doc_id, string_split(
                regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
            FROM documents),
        words AS (SELECT doc_id, unnest(w) AS word FROM w),
        bi AS (
            SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
            FROM (SELECT doc_id, w,
                         unnest(generate_series(1, len(w) - 1)) AS i
                  FROM w WHERE len(w) >= 2)),
        uni AS (SELECT word, count(*) AS cu FROM words GROUP BY word
                ORDER BY cu DESC, word LIMIT {LM_VOCAB_K}),
        big AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2
                ORDER BY c12 DESC, w1, w2 LIMIT {LM2_BIGRAM_K}),
        t AS (SELECT count(*) AS t_words FROM words),
        s AS (SELECT bi.doc_id,
                     CASE WHEN b.c12 IS NULL THEN 1 ELSE 0 END
                         AS is_oov_bigram,
                     log2(
                       CASE WHEN u1.cu IS NOT NULL
                                 AND b.c12 IS NOT NULL
                            THEN {LM2_LAM2!r}::DOUBLE * b.c12 / u1.cu
                            ELSE 0.0::DOUBLE END
                       + {LM2_LAM1!r}::DOUBLE * coalesce(u2.cu, 0)
                         / t.t_words
                       + {floor!r}::DOUBLE) AS logp
              FROM bi
              LEFT JOIN big b ON b.w1 = bi.w1 AND b.w2 = bi.w2
              LEFT JOIN uni u1 ON u1.word = bi.w1
              LEFT JOIN uni u2 ON u2.word = bi.w2
              CROSS JOIN t),
        a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                     CAST(sum(is_oov_bigram) AS BIGINT)
                         AS n_oov_bigrams,
                     round(-avg(logp), 6) AS bits_per_bigram
              FROM s GROUP BY doc_id)
        SELECT doc_id, n_bigrams, n_oov_bigrams, bits_per_bigram,
               bits_per_bigram <= {LM2_BITS_KEEP_T!r} AS keep_doc
        FROM a
    """


def _conv_apply_drop_ctes() -> str:
    """Shared CTE chain of _conv_apply_oracle and
    _transcript_curate_oracle: the planted multi-turn base ('~dup'
    exact + '~near' truncated copies), the src-parameterized LSH
    verify chain, and the recursive-closure near_drop set. Factored so
    a planting-scheme change cannot silently diverge between the two
    oracles (the document analogue is _apply_lsh_drop_ctes)."""
    return f"""base AS (
            SELECT conv_id, turn_idx, cleaned_text,
                   max(turn_idx) OVER (PARTITION BY conv_id) AS mx
            FROM read_parquet('{_sft_synth_path()}/*.parquet')),
        pt AS (
            SELECT conv_id, turn_idx, cleaned_text FROM base
            UNION ALL
            SELECT conv_id || '~dup', turn_idx, cleaned_text FROM base
            WHERE substr(md5(conv_id), 1, 1) = '0'
            UNION ALL
            SELECT conv_id || '~near', turn_idx, cleaned_text FROM base
            WHERE substr(md5(conv_id), 1, 1) = '0' AND turn_idx < mx),
        conv_src AS (
            SELECT conv_id AS doc_id, coalesce(cleaned_text, '') AS text
            FROM pt),
        {_lsh_verified_ctes(0.5, "conv_src")},
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM vpairs
            UNION SELECT doc_b, doc_a FROM vpairs),
        enodes AS (SELECT DISTINCT a AS node FROM edges),
        reach(node, r) AS (
            SELECT node, node FROM enodes
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
        ),
        near_drop AS (
            SELECT node AS conv_id FROM reach GROUP BY node
            HAVING node != min(r))"""


def _planted_role_ctes() -> str:
    """Planted multi-turn base CTEs WITH the role column — the
    preference_pairs twin's mirror of _planted_conv_turns(with_dup=
    True, with_role=True) plus the '~alt' halved-assistant arm (the
    one that actually produces pairs; see _preference_pairs). Kept
    textually parallel to _conv_apply_drop_ctes' base/pt pair so a
    planting-scheme change is a two-site edit caught by the shared
    non-vacuity pytest."""
    return f"""base AS (
            SELECT conv_id, turn_idx, role, cleaned_text,
                   max(turn_idx) OVER (PARTITION BY conv_id) AS mx
            FROM read_parquet('{_sft_synth_path()}/*.parquet')),
        pt AS (
            SELECT conv_id, turn_idx, role, cleaned_text FROM base
            UNION ALL
            SELECT conv_id || '~dup', turn_idx, role, cleaned_text FROM base
            WHERE substr(md5(conv_id), 1, 1) = '0'
            UNION ALL
            SELECT conv_id || '~near', turn_idx, role, cleaned_text FROM base
            WHERE substr(md5(conv_id), 1, 1) = '0' AND turn_idx < mx
            UNION ALL
            SELECT conv_id || '~alt', turn_idx, role,
                   CASE WHEN role = 'assistant'
                        THEN substr(cleaned_text, 1, CAST(floor(
                            length(cleaned_text) / 2) AS INTEGER))
                        ELSE cleaned_text END
            FROM base WHERE substr(md5(conv_id), 1, 1) = '0')"""


def _preference_pairs_oracle() -> str:
    """DuckDB twin of pipeline.preference_pairs over the planted
    corpus: per-turn md5/token scalars -> SKEW_BLOCK block hashes ->
    conversation (prompt_h, resp_tokens, resp_fp) -> two row_number
    ranks -> one pair per prompt with distinct response fingerprints.
    Every sum is CAST AS BIGINT (the r4 HUGEINT lesson)."""
    return f"""
        WITH {_planted_role_ctes()},
        per AS (
            SELECT conv_id, turn_idx,
                   CAST(floor(turn_idx / 10000) AS BIGINT) AS blk,
                   role = 'assistant' AS ia, role = 'user' AS iu,
                   md5(turn_idx::VARCHAR || ':'
                       || coalesce(cleaned_text, '')) AS h,
                   greatest(1, CAST(floor(
                       length(coalesce(cleaned_text, '')) / 4) AS BIGINT))
                       AS toks
            FROM pt),
        blocks AS (
            SELECT conv_id, blk,
                   sum(CASE WHEN ia THEN toks ELSE 0 END) AS atoks,
                   sum(CASE WHEN ia THEN 1 ELSE 0 END) AS n_asst,
                   md5(string_agg(CASE WHEN ia THEN h END, chr(1)
                                  ORDER BY turn_idx)) AS bh
            FROM per GROUP BY conv_id, blk),
        prompt AS (
            SELECT conv_id,
                   arg_min(coalesce(cleaned_text, ''), turn_idx)
                       FILTER (WHERE role = 'user') AS ptext,
                   sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS n_user
            FROM pt GROUP BY conv_id),
        conv AS (
            SELECT conv_id,
                   CAST(sum(atoks) AS BIGINT) AS resp_tokens,
                   CAST(sum(n_asst) AS BIGINT) AS n_asst,
                   md5(string_agg(bh, chr(1) ORDER BY blk)) AS resp_fp
            FROM blocks GROUP BY conv_id),
        convq AS (
            SELECT c.conv_id, md5(p.ptext) AS prompt_h,
                   c.resp_tokens, c.resp_fp
            FROM conv c JOIN prompt p USING (conv_id)
            WHERE c.n_asst > 0 AND p.n_user > 0),
        ranked AS (
            SELECT *,
                   row_number() OVER (PARTITION BY prompt_h
                       ORDER BY resp_tokens DESC, conv_id ASC) AS rc,
                   row_number() OVER (PARTITION BY prompt_h
                       ORDER BY resp_tokens ASC, conv_id DESC) AS rr,
                   CAST(count(*) OVER (PARTITION BY prompt_h) AS BIGINT)
                       AS n_candidates
            FROM convq)
        SELECT c.prompt_h, c.n_candidates,
               c.conv_id AS chosen_conv, c.resp_tokens AS chosen_tokens,
               r.conv_id AS rejected_conv, r.resp_tokens AS rejected_tokens
        FROM ranked c JOIN ranked r
          ON c.prompt_h = r.prompt_h AND r.rr = 1
        WHERE c.rc = 1 AND c.resp_fp <> r.resp_fp
    """


def _conversation_branches_oracle() -> str:
    """DuckDB twin of pipeline.conversation_branches over the planted
    corpus: cumulative-prefix md5 per (conversation, depth<=32) via a
    windowed string_agg (positionally identical to the Spark side's
    sorted-array slice hashes), family counts, deepest-shared pick."""
    return f"""
        WITH base AS (
            SELECT conv_id, turn_idx, cleaned_text,
                   max(turn_idx) OVER (PARTITION BY conv_id) AS mx
            FROM read_parquet('{_sft_synth_path()}/*.parquet')),
        pt AS (
            SELECT conv_id, turn_idx, cleaned_text FROM base
            UNION ALL
            SELECT conv_id || '~dup', turn_idx, cleaned_text FROM base
            WHERE substr(md5(conv_id), 1, 1) = '0'
            UNION ALL
            SELECT conv_id || '~near', turn_idx, cleaned_text FROM base
            WHERE substr(md5(conv_id), 1, 1) = '0' AND turn_idx < mx),
        per AS (
            SELECT conv_id, turn_idx,
                   md5(turn_idx::VARCHAR || ':'
                       || coalesce(cleaned_text, '')) AS h,
                   greatest(1, CAST(floor(
                       length(coalesce(cleaned_text, '')) / 4) AS BIGINT))
                       AS toks
            FROM pt WHERE turn_idx < 32),
        pref AS (
            SELECT conv_id,
                   CAST(row_number() OVER w AS INTEGER) AS d,
                   md5(string_agg(h, chr(1)) OVER (PARTITION BY conv_id
                       ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)) AS sig,
                   CAST(sum(toks) OVER (PARTITION BY conv_id
                       ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS ctoks
            FROM per WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
        fam AS (
            SELECT d, sig, CAST(count(*) AS BIGINT) AS family_size
            FROM pref GROUP BY d, sig HAVING count(*) >= 2),
        shared AS (
            SELECT p.conv_id, p.d, p.sig, p.ctoks, f.family_size
            FROM pref p JOIN fam f USING (d, sig)),
        deep AS (
            SELECT *, row_number() OVER (PARTITION BY conv_id
                ORDER BY d DESC) AS rn
            FROM shared)
        SELECT conv_id, d AS shared_turns, sig AS family_id,
               family_size, ctoks AS shared_tokens
        FROM deep WHERE rn = 1
    """


def _conv_apply_oracle() -> str:
    """Survivors after both conversation-dedup arms: the shared
    planted+LSH+closure chain (_conv_apply_drop_ctes) plus the exact
    per-turn fingerprint chain (md5 -> ordered block hash -> conv
    hash) from the same planted rows."""
    return f"""
        WITH RECURSIVE {_conv_apply_drop_ctes()},
        per AS (
            SELECT conv_id, turn_idx,
                   md5(turn_idx::VARCHAR || ':'
                       || coalesce(cleaned_text, '')) AS h,
                   CAST(floor(turn_idx / 10000) AS BIGINT) AS blk
            FROM pt),
        blocks AS (
            SELECT conv_id, blk,
                   md5(string_agg(h, chr(1) ORDER BY turn_idx)) AS bh
            FROM per GROUP BY conv_id, blk),
        conv AS (
            SELECT conv_id,
                   md5(string_agg(bh, chr(1) ORDER BY blk)) AS conv_fp
            FROM blocks GROUP BY conv_id),
        exact_drop AS (
            SELECT conv_id FROM (
                SELECT conv_id,
                       min(conv_id) OVER (PARTITION BY conv_fp) AS keep
                FROM conv)
            WHERE conv_id != keep)
        SELECT DISTINCT conv_id FROM pt
        WHERE conv_id NOT IN (SELECT conv_id FROM near_drop
                              UNION SELECT conv_id FROM exact_drop)
    """


def _transcript_curate_oracle() -> str:
    """transcript_prepare's gate+pack SQL with the keep-set widened by
    the near-dup arm: fingerprint keepers minus the shared closure's
    near_drop set (token floor 256 so the gate splits the synthetic
    conversations)."""
    return f"""
        WITH RECURSIVE {_conv_apply_drop_ctes()},
        per AS (
            SELECT conv_id, turn_idx,
                   md5(turn_idx::VARCHAR || ':'
                       || coalesce(cleaned_text, '')) AS h,
                   CAST(floor(turn_idx / 10000) AS BIGINT) AS blk,
                   greatest(1, CAST(floor(
                       length(coalesce(cleaned_text, '')) / 4) AS BIGINT))
                       AS et,
                   CASE WHEN coalesce(cleaned_text, '') = ''
                        THEN 1 ELSE 0 END AS emp
            FROM pt),
        blocks AS (
            SELECT conv_id, blk, count(*) AS n, sum(et) AS et,
                   sum(emp) AS emp,
                   md5(string_agg(h, chr(1) ORDER BY turn_idx)) AS bh
            FROM per GROUP BY conv_id, blk),
        conv AS (
            SELECT conv_id, sum(n) AS n_turns,
                   CAST(sum(et) AS BIGINT) AS est_tokens,
                   sum(emp) AS n_empty,
                   md5(string_agg(bh, chr(1) ORDER BY blk)) AS conv_fp
            FROM blocks GROUP BY conv_id),
        keepers AS (
            SELECT conv_id, est_tokens FROM (
                SELECT conv_id, est_tokens, n_turns, n_empty,
                       conv_id = min(conv_id) OVER (PARTITION BY conv_fp)
                           AS is_keeper
                FROM conv)
            WHERE is_keeper
              AND conv_id NOT IN (SELECT conv_id FROM near_drop)
              AND est_tokens >= 256
              AND n_empty / n_turns <= 0.5),
        sharded AS (
            SELECT conv_id,
                   CAST(('0x' || substr(md5(conv_id), 1, 15))::BIGINT % 16
                        AS INTEGER) AS shard,
                   est_tokens
            FROM keepers),
        packed AS (
            -- CAST: DuckDB window sum(BIGINT) yields HUGEINT (decimal128
            -- in Arrow) while Spark emits bigint; the driver's value-hash
            -- is type-sensitive, so pin the twin to BIGINT (same form as
            -- the pack_sequences twin).
            SELECT conv_id, shard, est_tokens,
                   CAST(sum(est_tokens) OVER (
                       PARTITION BY shard ORDER BY conv_id
                       ROWS UNBOUNDED PRECEDING) - est_tokens
                       AS BIGINT) AS start_tok
            FROM sharded)
        SELECT conv_id, shard, est_tokens, start_tok,
               CAST(floor(start_tok / 4096) AS BIGINT) AS bin
        FROM packed
    """


def _dedup_apply_lsh_oracle() -> str:
    """The corpus minus exact-group and component non-keepers —
    DuckDB twin of analytics.dedup_apply_lsh."""
    return f"""
        WITH RECURSIVE {_apply_lsh_drop_ctes()}
        SELECT doc_id FROM survivors
    """


def _dedup_incremental_oracle() -> str:
    """DuckDB twin of analytics.dedup_incremental: even doc ids are the
    already-ingested corpus (state), odd ids the new batch. Signatures/
    bands are computed once over all documents — per-doc values are
    identical whichever side they're computed on — then filtered by
    parity per stage, exactly mirroring the Spark plan's state vs batch
    tables."""
    from engine.spark.analytics import LSH_MAX_BUCKET_DOCS, MINHASH_K

    est = (
        f"round(len(list_filter(range(1, {MINHASH_K + 1}), "
        f"i -> n.sig[i] = o.sig[i])) / {MINHASH_K}, 6)"
    )
    return f"""
        WITH RECURSIVE {_sig_band_ctes()}, newdocs AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        ), s1 AS (
            SELECT n.doc_id, n.text FROM newdocs n
            WHERE md5(n.text) NOT IN (
                    SELECT md5(text) FROM documents WHERE doc_id % 2 = 0)
              AND n.doc_id = (SELECT min(m.doc_id) FROM newdocs m
                              WHERE md5(m.text) = md5(n.text))
        ), hits_old AS (
            SELECT DISTINCT n.doc_id
            FROM bands n JOIN bands o ON n.bucket = o.bucket
            WHERE n.doc_id IN (SELECT doc_id FROM s1)
              AND o.doc_id % 2 = 0
              AND {est} >= 0.5
        ), s2 AS (
            SELECT doc_id, text FROM s1
            WHERE doc_id NOT IN (SELECT doc_id FROM hits_old)
        ), bands2 AS (
            SELECT doc_id, sig, bucket FROM bands
            WHERE doc_id IN (SELECT doc_id FROM s2)
        ), {_bucket_pair_ctes("bands2", "sig", LSH_MAX_BUCKET_DOCS)}, cand AS (
            SELECT DISTINCT doc_a, doc_b FROM bpairs
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ), icounts AS (
            SELECT c.doc_a, c.doc_b, count(*) AS icount
            FROM cand c
            JOIN sh a ON a.doc_id = c.doc_a
            JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
            GROUP BY c.doc_a, c.doc_b
        ), vpairs AS (
            SELECT i.doc_a, i.doc_b
            FROM icounts i
            JOIN sizes na ON na.doc_id = i.doc_a
            JOIN sizes nb ON nb.doc_id = i.doc_b
            WHERE round(icount / (na.n + nb.n - icount), 6) >= 0.5
        ), edges AS (
            SELECT doc_a AS a, doc_b AS b FROM vpairs
            UNION SELECT doc_b, doc_a FROM vpairs
        ), nodes AS (SELECT DISTINCT a AS node FROM edges),
        reach(node, r) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
        ), near_drop AS (
            SELECT node AS doc_id FROM reach GROUP BY node
            HAVING node != min(r)
        )
        SELECT doc_id FROM s2
        WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)
    """


def _corpus_prepare_oracle() -> str:
    """DuckDB twin of analytics.corpus_prepare: quality filter →
    dedup (exact + LSH-verified near-dup) → per-shard concat packing,
    with the filter folded in via a ``corpus`` CTE feeding the shared
    LSH chain."""
    quality = r"""
        corpus AS (
            SELECT doc_id, text FROM documents
            WHERE len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) >= 30
              AND coalesce(length(regexp_replace(text, '[^0-9]', '', 'g'))
                           / NULLIF(length(text), 0) <= 0.3, FALSE)
        )"""
    return f"""
        WITH RECURSIVE {quality}, {_apply_lsh_drop_ctes("corpus")},
        d AS (
            SELECT doc_id,
                   CAST(doc_id % 16 AS INT) AS shard,
                   greatest(1, CAST(floor(length(text) / 4) AS BIGINT)) AS est_tokens
            FROM survivors),
        c AS (
            SELECT *,
                   CAST(sum(est_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM d)
        SELECT doc_id, shard, est_tokens,
               cum - est_tokens AS start_tok,
               CAST(floor((cum - est_tokens) / 4096) AS BIGINT) AS bin
        FROM c
    """


_CAREER_PROGRESSION_SQL = """
    WITH c AS (
        SELECT doc_id, CAST(1 + doc_id % 5 AS INT) AS n_roles FROM documents
    ), r AS (
        SELECT doc_id, n_roles,
               list_transform(generate_series(0, n_roles - 1),
                              i -> 6 + (doc_id * 7 + i * 11) % 48) AS durs,
               list_transform(generate_series(0, n_roles - 1),
                              i -> (doc_id + 3 * i) % 7) AS comps,
               list_transform(generate_series(0, n_roles - 2),
                              i -> (doc_id + 5 * i) % 9) AS gaps,
               -- chronological level step newer-minus-older; stored
               -- 1-indexed level[i] = (doc_id + 2*(i-1)) % 4
               list_transform(generate_series(1, n_roles - 1),
                              i -> (doc_id + 2 * (i - 1)) % 4
                                 - (doc_id + 2 * i) % 4) AS climbs,
               doc_id % 4 AS recent_level,
               (doc_id + 2 * (n_roles - 1)) % 4 AS earliest_level
        FROM c
    ), t AS (
        SELECT *,
            len(list_filter(climbs, x -> x > 0)) > 0 AS any_up,
            len(list_filter(climbs, x -> x < 0)) > 0 AS any_down,
            CAST(len(list_distinct(comps)) AS INT) AS total_companies
        FROM r
    ), u AS (
        SELECT *,
            CASE WHEN any_up AND any_down THEN 'mixed'
                 WHEN any_up THEN 'upward'
                 WHEN any_down THEN 'downward'
                 ELSE 'lateral' END AS trajectory
        FROM t
    )
    SELECT doc_id, n_roles,
           round(list_sum(durs) / n_roles, 4) AS avg_tenure_months,
           CAST(list_max(durs) AS INT) AS longest_tenure_months,
           total_companies,
           CAST(coalesce(list_max(gaps), 0) AS INT) AS longest_gap_months,
           trajectory,
           (recent_level >= 2 AND recent_level > earliest_level)
               AS has_leadership_progression,
           CASE recent_level WHEN 0 THEN 'Engineer'
                WHEN 1 THEN 'Senior Engineer'
                WHEN 2 THEN 'Lead Engineer'
                ELSE 'Engineering Manager' END AS most_recent_title,
           trajectory || ' trajectory across '
               || CAST(total_companies AS VARCHAR) || ' companies over '
               || CAST(n_roles AS VARCHAR) || ' roles' AS progression_summary
    FROM u
"""


# sign-bucketed embedding near-dup pair CTEs (unit-normalized, 6-bit
# buckets × 2 probes — pinned to match the queries() lambda); shared by
# the pair-listing and keep-list oracles
_EMB_PAIR_CTES = """e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS u FROM embeddings),
                 e AS (SELECT vec_id,
                              list_transform(u, x -> x / sqrt(list_dot_product(u, u))) AS v
                       FROM e0 WHERE list_dot_product(u, u) > 0),
                 b0 AS (SELECT vec_id, v,
                              (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END)
                            + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
                            + (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END)
                            + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END)
                            + (CASE WHEN v[5] > 0 THEN 16 ELSE 0 END)
                            + (CASE WHEN v[6] > 0 THEN 32 ELSE 0 END) AS bucket
                       FROM e),
                 b1 AS (SELECT vec_id, v,
                              (CASE WHEN v[7] > 0 THEN 1 ELSE 0 END)
                            + (CASE WHEN v[8] > 0 THEN 2 ELSE 0 END)
                            + (CASE WHEN v[9] > 0 THEN 4 ELSE 0 END)
                            + (CASE WHEN v[10] > 0 THEN 8 ELSE 0 END)
                            + (CASE WHEN v[11] > 0 THEN 16 ELSE 0 END)
                            + (CASE WHEN v[12] > 0 THEN 32 ELSE 0 END) AS bucket
                       FROM e),
                 cand AS (
                     SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, a.v AS va, c.v AS vb
                     FROM b0 a JOIN b0 c
                       ON a.bucket = c.bucket AND a.vec_id < c.vec_id
                     UNION
                     SELECT a.vec_id, c.vec_id, a.v, c.v
                     FROM b1 a JOIN b1 c
                       ON a.bucket = c.bucket AND a.vec_id < c.vec_id),
                 sims AS (
                     -- unit vectors (normalized once in CTE e): cosine = dot
                     SELECT vec_a, vec_b,
                            round(list_dot_product(va, vb), 5) AS cosine
                     FROM cand)"""


_NGRAM_JACCARD_SQL = r"""
            WITH words AS (
                SELECT doc_id,
                       string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ') AS w
                FROM documents WHERE doc_id < 200
            ), idx AS (
                SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
                FROM words WHERE len(w) >= 3
            ), sh AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                FROM idx
            ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS icount
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
            SELECT doc_a, doc_b,
                   round(icount / (na.n + nb.n - icount), 6) AS jaccard
            FROM inter
            JOIN sizes na ON na.doc_id = doc_a
            JOIN sizes nb ON nb.doc_id = doc_b
            WHERE round(icount / (na.n + nb.n - icount), 6) >= 0.1
        """


def _decontaminate_oracle(n: int = 13, eval_mod: int = 5) -> str:
    """DuckDB twin of analytics.decontaminate: same lower +
    whitespace-normalize word split as the Spark side, word ``n``-grams,
    eval set = doc_id % eval_mod == 0; a training doc drops iff it
    shares ANY n-gram with any eval doc. Docs shorter than n words
    carry no grams and always survive — both engines by construction."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
        WITH words AS (
            SELECT doc_id,
                   string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
            FROM documents
        ), g AS (
            SELECT doc_id, {gram} AS gram
            FROM (SELECT doc_id, w,
                         unnest(generate_series(1, len(w) - {n - 1})) AS i
                  FROM words WHERE len(w) >= {n})
        ), ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {eval_mod} = 0),
        hits AS (
            SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gram)
            WHERE g.doc_id % {eval_mod} != 0)
        SELECT doc_id FROM documents
        WHERE doc_id % {eval_mod} != 0
          AND doc_id NOT IN (SELECT doc_id FROM hits)
    """


def _decontaminate_fuzzy_oracle(threshold: float = 0.5, eval_mod: int = 5) -> str:
    """DuckDB twin of analytics.decontaminate_fuzzy: MinHash bands over
    the full table (signatures are per-doc, so banding before or after
    the corpus/eval split is identical), eval-side bucket-size cap, a
    bipartite bucket join, signature-agreement Jaccard, anti-join."""
    from engine.spark.analytics import LSH_MAX_BUCKET_DOCS, MINHASH_K

    return f"""
        WITH {_sig_band_ctes()},
        eb AS (
            SELECT bucket, sig AS esig,
                   count(*) OVER (PARTITION BY bucket) AS bsize
            FROM bands WHERE doc_id % {eval_mod} = 0
        ),
        ebc AS (SELECT bucket, esig FROM eb WHERE bsize <= {LSH_MAX_BUCKET_DOCS}),
        cb AS (SELECT doc_id, sig, bucket FROM bands
               WHERE doc_id % {eval_mod} != 0),
        hits AS (
            SELECT DISTINCT c.doc_id
            FROM cb c JOIN ebc e ON c.bucket = e.bucket
            WHERE round(len(list_filter(range(1, {MINHASH_K + 1}),
                                        i -> c.sig[i] = e.esig[i])) / {MINHASH_K},
                        6) >= {threshold}
        )
        SELECT doc_id FROM documents
        WHERE doc_id % {eval_mod} != 0
          AND doc_id NOT IN (SELECT doc_id FROM hits)
    """


def _boilerplate_ngrams_oracle(
    n: int = 5, min_docs: int = 3, top_k: int = 100
) -> str:
    """DuckDB twin of analytics.boilerplate_ngrams: per-doc DISTINCT
    word n-grams (same tokenization as the shingle chain), document
    frequency, min_docs filter, deterministic (doc_freq DESC, gram)
    top-k — the gram is unique per row so the LIMIT is stable."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
        WITH words AS (
            SELECT doc_id,
                   string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
            FROM documents
        ), g AS (
            SELECT DISTINCT doc_id, {gram} AS gram
            FROM (SELECT doc_id, w,
                         unnest(generate_series(1, len(w) - {n - 1})) AS i
                  FROM words WHERE len(w) >= {n})
        )
        SELECT gram, CAST(count(*) AS BIGINT) AS doc_freq
        FROM g GROUP BY gram HAVING count(*) >= {min_docs}
        ORDER BY doc_freq DESC, gram LIMIT {top_k}
    """


def _shuffle_shards_oracle(n_shards: int = 8, seed: str = "r4") -> str:
    """DuckDB twin of analytics.shuffle_shards: the portable 60-bit
    md5 hash (non-negative, so % agrees across engines), shard by
    modulus, per-shard row_number under the identical (h, doc_id)
    order."""
    return f"""
        WITH h AS (
            SELECT doc_id,
                   ('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
            FROM documents
        )
        SELECT doc_id, CAST(h % {n_shards} AS INT) AS shard_id,
               CAST(row_number() OVER (
                   PARTITION BY h % {n_shards} ORDER BY h, doc_id
               ) AS BIGINT) AS pos
        FROM h
    """


def _hash_embed_ctes(dim: int = 64) -> str:
    """Shared hash-embed CTE chain: same portable md5 bucket hash as
    the Spark side, the sign from exact integer arithmetic
    (h % 2dim >= dim), signed-count bucket sums (exact integers), the
    L2 norm over exact integer squares — so sqrt and the final divide
    see identical operands on both engines and round-6 values match
    bit-for-bit. Emits CTEs hw/hhb/hs/hn (prefixed: the consumers mix
    in other chains)."""
    return f"""
        hw AS (
            SELECT doc_id, word FROM (
                SELECT doc_id,
                       unnest(string_split(regexp_replace(lower(text),
                           '\\s+', ' ', 'g'), ' ')) AS word
                FROM documents)
            WHERE word <> ''
        ), hhb AS (
            SELECT doc_id,
                   CAST(h % {dim} AS INT) AS bucket,
                   CASE WHEN h % {2 * dim} >= {dim} THEN 1 ELSE -1 END AS sign
            FROM (SELECT doc_id,
                         ('0x' || substr(md5('e:' || word), 1, 15))::BIGINT AS h
                  FROM hw)
        ), hs AS (
            SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS v
            FROM hhb GROUP BY doc_id, bucket
        ), hn AS (
            SELECT doc_id,
                   sqrt(sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS norm
            FROM hs GROUP BY doc_id
        )"""


def _hash_embed_oracle(dim: int = 64) -> str:
    """DuckDB twin of analytics.hash_embed: flattened nonzero
    (doc_id, pos, value) rows, like the Spark side."""
    return f"""
        WITH {_hash_embed_ctes(dim)}
        SELECT hs.doc_id, hs.bucket AS pos, round(v / norm, 6) AS value
        FROM hs JOIN hn ON hs.doc_id = hn.doc_id
        WHERE norm > 0 AND round(v / norm, 6) != 0.0
    """


def _dedup_text_semantic_oracle(
    dim: int = 64, threshold: float = 0.9, sign_dims: int = 6
) -> str:
    """DuckDB twin of analytics.dedup_text_semantic: dense round-6
    hash-embed vectors (zero-norm docs excluded, exactly the Spark
    filter), two 6-bit sign-bucket probes, bucket-local candidate
    pairs, round-5 dot (the vectors are unit — _cosine contract)."""
    def bucket_expr(offset: int) -> str:
        return " + ".join(
            f"(CASE WHEN v[{offset + i + 1}] > 0 THEN {2**i} ELSE 0 END)"
            for i in range(sign_dims)
        )

    return f"""
        WITH {_hash_embed_ctes(dim)},
        hvals AS (
            SELECT hs.doc_id, hs.bucket, round(v / norm, 6) AS val
            FROM hs JOIN hn ON hs.doc_id = hn.doc_id WHERE norm > 0
        ), hdense AS (
            SELECT doc_id,
                   map(list(bucket ORDER BY bucket),
                       list(val ORDER BY bucket)) AS m
            FROM hvals GROUP BY doc_id
        ), he AS (
            SELECT doc_id AS vec_id,
                   list_transform(range(0, {dim}),
                                  i -> CAST(coalesce(m[i][1], 0.0) AS DOUBLE))
                       AS v
            FROM hdense
        ), hb0 AS (
            SELECT vec_id, v, {bucket_expr(0)} AS bucket FROM he
        ), hb1 AS (
            SELECT vec_id, v, {bucket_expr(sign_dims)} AS bucket FROM he
        ), hcand AS (
            SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
                   a.v AS va, c.v AS vb
            FROM hb0 a JOIN hb0 c
              ON a.bucket = c.bucket AND a.vec_id < c.vec_id
            UNION
            SELECT a.vec_id, c.vec_id, a.v, c.v
            FROM hb1 a JOIN hb1 c
              ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        )
        , hsims AS (
            -- dot as the SAME left fold Spark's F.aggregate runs
            -- (0.0 + p1 + p2 + ...): list_dot_product may sum in a
            -- different order (pairwise/FMA) and diverged by 1 ulp on
            -- 22 of 1.1M pairs at sf0.1. Rounding is the explicit
            -- floor(x*1e5 + 0.5)/1e5 IEEE formula — engine round()
            -- builtins disagree within an ulp of a 5-dp boundary
            -- (0.8040849999999999: Spark 0.80408, DuckDB 0.80409)
            SELECT vec_a, vec_b,
                   floor(list_reduce(
                       list_prepend(0.0,
                           list_transform(range(1, {dim + 1}),
                                          i -> va[i] * vb[i])),
                       (acc, x) -> acc + x) * 100000.0 + 0.5) / 100000.0
                       AS cosine
            FROM hcand
        )
        SELECT vec_a, vec_b, cosine FROM hsims WHERE cosine >= {threshold}
    """


def _rp_pairs_ctes(dim: int, sf_dir: str) -> str:
    """The shared adaptive random-hyperplane CTE body (artifact scan →
    md5-regenerated hyperplanes → exact-integer bucketing → distinct
    candidate id-pairs → floor-round-5 left-fold cosines in ``hsims``)
    — composed by the adaptive pair oracle and the semantic-apply
    oracle."""
    path = _per_turn_path(sf_dir) + "_hv"
    return f"""he AS (
            SELECT vec_id, v, w FROM read_parquet('{path}/*.parquet')
        ), prm AS (
            SELECT sign_dims, probes FROM read_parquet('{path}_prm/*.parquet')
        ), proj AS (
            -- Rademacher hyperplanes: +1 iff first md5 nibble < 8,
            -- exactly analytics._rp_sign; INTEGER signs so the dots
            -- over w stay exact BIGINT arithmetic
            SELECT pp.probe, bb.bit,
                   list_transform(range(0, {dim}), j ->
                       CASE WHEN ('0x' || substr(md5('rp:' || pp.probe
                                      || ':' || bb.bit || ':' || j),
                                      1, 1))::BIGINT < 8
                            THEN CAST(1 AS BIGINT)
                            ELSE CAST(-1 AS BIGINT) END) AS pv
            FROM (SELECT unnest(range(0, (SELECT probes FROM prm)))
                      AS probe) pp,
                 (SELECT unnest(range(0, (SELECT sign_dims FROM prm)))
                      AS bit) bb
        ), hbit AS (
            -- hyperplane dot over the RAW INTEGER counts w: exact
            -- arithmetic, so the sign is aggregation-order-free and
            -- matches Spark's sparse groupBy sum bit-for-bit
            SELECT h.vec_id, p.probe, p.bit,
                   CASE WHEN list_reduce(
                            list_prepend(CAST(0 AS BIGINT),
                                list_transform(range(1, {dim + 1}),
                                               j -> h.w[j] * p.pv[j])),
                            (acc, x) -> acc + x) > 0
                        THEN CAST(2**p.bit AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END AS bval
            FROM he h, proj p
        ), hbuck AS (
            SELECT vec_id, probe, sum(bval) AS bucket
            FROM hbit GROUP BY vec_id, probe
        ), hcand AS (
            SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
            FROM hbuck a JOIN hbuck c
              ON a.probe = c.probe AND a.bucket = c.bucket
                 AND a.vec_id < c.vec_id
        ), hsims AS (
            SELECT hc.vec_a, hc.vec_b,
                   floor(list_reduce(
                       list_prepend(0.0,
                           list_transform(range(1, {dim + 1}),
                                          j -> x.v[j] * y.v[j])),
                       (acc, q) -> acc + q) * 100000.0 + 0.5) / 100000.0
                       AS cosine
            FROM hcand hc
            JOIN he x ON hc.vec_a = x.vec_id
            JOIN he y ON hc.vec_b = y.vec_id
        )"""


def _dedup_text_semantic_adaptive_oracle(
    dim: int = 64,
    threshold: float = 0.9,
    sf_dir: str = "/root/testdata/sf0.01",
) -> str:
    """DuckDB twin of the SERVED random-hyperplane form: reads the
    persisted vector artifact AND its plan-params table (both written
    when the Spark query runs — the IVF-codebook run-order contract),
    regenerates every hyperplane from the same md5('rp:probe:bit:j')
    nibble rule, and replays bucketing → distinct candidate id-pairs →
    vector re-join → floor-round-5 left-fold cosine. No transcendental
    enters the contract: (sign_dims, probes) come from the params
    table, signs from md5, dots from explicit IEEE left folds."""
    return f"""
        WITH {_rp_pairs_ctes(dim, sf_dir)}
        SELECT vec_a, vec_b, cosine FROM hsims WHERE cosine >= {threshold}
    """


def _dedup_semantic_apply_oracle(
    dim: int = 64,
    threshold: float = 0.9,
    sf_dir: str = "/root/testdata/sf0.01",
) -> str:
    """DuckDB twin of the semantic keep-list: adaptive hyperplane pairs
    (shared CTE body) → recursive-closure components (root = min
    reachable id, provably the same labels as min-label propagation) →
    surviving vec_ids."""
    path = _per_turn_path(sf_dir) + "_hv"
    return f"""
        WITH RECURSIVE {_rp_pairs_ctes(dim, sf_dir)},
        spairs AS (
            SELECT vec_a, vec_b FROM hsims WHERE cosine >= {threshold}),
        sedges AS (
            SELECT vec_a AS a, vec_b AS b FROM spairs
            UNION SELECT vec_b, vec_a FROM spairs),
        snodes AS (SELECT DISTINCT a AS node FROM sedges),
        sreach(node, r) AS (
            SELECT node, node FROM snodes
            UNION
            SELECT e.a, sreach.r FROM sedges e JOIN sreach ON e.b = sreach.node
        ),
        sdrop AS (
            SELECT node AS vec_id FROM sreach GROUP BY node
            HAVING node != min(r))
        SELECT vec_id FROM read_parquet('{path}/*.parquet')
        WHERE vec_id NOT IN (SELECT vec_id FROM sdrop)
    """


def _quality_classifier_oracle(
    dim: int = 64,
    threshold: float = 0.5,
    sf_dir: str = "/root/testdata/sf0.01",
) -> str:
    """DuckDB twin of the served quality classifier: reads the SAME
    two parquets the Spark query reads (vector artifact + trained
    weights — written when the Spark query runs, the served-artifact
    run-order contract) and replays scoring verbatim: ascending-j left
    fold over wⱼ·θⱼ int×double products, + bias, floor-round-5,
    threshold. Training (the ridge solve) never enters the contract —
    it happened driver-side at plan time and only its output table is
    compared."""
    path = _per_turn_path(sf_dir)
    return f"""
        WITH he AS (
            SELECT vec_id, w FROM read_parquet('{path}_hv/*.parquet')
        ), wt AS (
            SELECT wvec FROM read_parquet('{path}_qw/*.parquet')
        ), scored AS (
            SELECT vec_id,
                   floor((list_reduce(
                       list_prepend(0.0,
                           list_transform(range(1, {dim + 1}),
                                          j -> he.w[j] * wt.wvec[j])),
                       (acc, x) -> acc + x) + wt.wvec[{dim + 1}])
                       * 100000.0 + 0.5) / 100000.0 AS score
            FROM he, wt
        )
        SELECT vec_id, score, score >= {threshold} AS pred_keep
        FROM scored
    """


def _dedup_report_oracle() -> str:
    """DuckDB twin of analytics.dedup_report: component stats from the
    recursive-closure reach table (component root = min reachable id —
    identical to min-label propagation), exact surplus from a distinct
    hash count, survivors from the shared keep-list tail."""
    return f"""
        WITH RECURSIVE {_apply_lsh_drop_ctes()},
        comp AS (SELECT node, min(r) AS root FROM reach GROUP BY node),
        csizes AS (SELECT root, count(*) AS sz FROM comp GROUP BY root),
        stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_components,
                   CAST(coalesce(max(sz), 0) AS BIGINT) AS largest_component
            FROM csizes),
        base AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
                       AS n_exact_extra
            FROM documents),
        np AS (SELECT CAST(count(*) AS BIGINT) AS n_near_pairs FROM vpairs),
        kept AS (SELECT count(*) AS n_kept FROM survivors)
        SELECT n_docs, n_exact_extra, n_near_pairs, n_components,
               largest_component,
               CAST(n_docs - n_kept AS BIGINT) AS n_dropped,
               round((n_docs - n_kept) / n_docs, 6) AS dup_fraction
        FROM base, np, stats, kept
    """


def _contamination_report_oracle(
    n: int = 13, threshold: float = 0.5, eval_mod: int = 5
) -> str:
    """DuckDB twin of analytics.contamination_report: the exact-13-gram
    pair chain (renamed w13/g13 to avoid colliding with the shingle
    CTEs) and the bipartite fuzzy pair chain, both counted per eval
    doc; only eval docs with ≥1 hit survive."""
    from engine.spark.analytics import LSH_MAX_BUCKET_DOCS, MINHASH_K

    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
        WITH {_sig_band_ctes()},
        w13 AS (
            SELECT doc_id,
                   string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
            FROM documents
        ), g13 AS (
            SELECT doc_id, {gram} AS gram
            FROM (SELECT doc_id, w,
                         unnest(generate_series(1, len(w) - {n - 1})) AS i
                  FROM w13 WHERE len(w) >= {n})
        ),
        evg AS (SELECT DISTINCT doc_id AS eval_id, gram FROM g13
                WHERE doc_id % {eval_mod} = 0),
        expairs AS (
            SELECT DISTINCT e.eval_id, c.doc_id
            FROM g13 c JOIN evg e ON c.gram = e.gram
            WHERE c.doc_id % {eval_mod} != 0),
        exc AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_exact
                FROM expairs GROUP BY eval_id),
        eb AS (
            SELECT doc_id AS eval_id, sig AS esig, bucket,
                   count(*) OVER (PARTITION BY bucket) AS bsize
            FROM bands WHERE doc_id % {eval_mod} = 0),
        ebc AS (SELECT eval_id, esig, bucket FROM eb
                WHERE bsize <= {LSH_MAX_BUCKET_DOCS}),
        fzpairs AS (
            SELECT DISTINCT e.eval_id, c.doc_id
            FROM bands c JOIN ebc e ON c.bucket = e.bucket
            WHERE c.doc_id % {eval_mod} != 0
              AND round(len(list_filter(range(1, {MINHASH_K + 1}),
                                        i -> c.sig[i] = e.esig[i])) / {MINHASH_K},
                        6) >= {threshold}),
        fzc AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_fuzzy
                FROM fzpairs GROUP BY eval_id)
        SELECT d.doc_id AS eval_id,
               coalesce(n_exact, 0)::BIGINT AS n_exact,
               coalesce(n_fuzzy, 0)::BIGINT AS n_fuzzy
        FROM documents d
        LEFT JOIN exc ON exc.eval_id = d.doc_id
        LEFT JOIN fzc ON fzc.eval_id = d.doc_id
        WHERE d.doc_id % {eval_mod} = 0
          AND (coalesce(n_exact, 0) > 0 OR coalesce(n_fuzzy, 0) > 0)
    """


def _source_keywords_oracle(top_k: int = 5, min_df: int = 2) -> str:
    """DuckDB twin of analytics.source_keywords: per-doc DISTINCT
    words, (source, word) doc frequency, corpus df as a second
    aggregate, round-6 tf-idf, deterministic (score DESC, word)
    row_number top-k per source."""
    return f"""
        WITH d AS (
            SELECT doc_id, source,
                   string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
            FROM documents
        ), dw AS (
            SELECT DISTINCT doc_id, source, word
            FROM (SELECT doc_id, source, unnest(w) AS word FROM d)
            WHERE word <> ''
        ), sw AS (
            SELECT source, word, CAST(count(*) AS BIGINT) AS df_source
            FROM dw GROUP BY source, word
        ), wa AS (
            SELECT word, sum(df_source) AS df_corpus FROM sw GROUP BY word
        ), nd AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT source, sw.word, df_source,
                   round(df_source * ln(n_docs / df_corpus), 6) AS score
            FROM sw JOIN wa ON sw.word = wa.word, nd
            WHERE df_source >= {min_df}
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY score DESC, word) AS rk
            FROM scored
        )
        SELECT source, word, df_source, score FROM r WHERE rk <= {top_k}
    """


def _repetition_oracle() -> str:
    """DuckDB twin of analytics.repetition_metrics: the relational
    formulation (unnest + two-level GROUP BY for counts/modes) of what
    the Spark side computes with map-only array folds — thresholds
    injected from the module so the gate can never drift."""
    from engine.spark.analytics import REP_DUP_2GRAM_T, REP_TOP_WORD_T

    return f"""
        WITH words AS (
            SELECT doc_id,
                   string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
            FROM documents
        ), wstat AS (
            SELECT doc_id, sum(c) AS n, count(*) AS nd, max(c) AS topc
            FROM (SELECT doc_id, word, count(*) AS c
                  FROM (SELECT doc_id, unnest(w) AS word FROM words)
                  GROUP BY doc_id, word)
            GROUP BY doc_id
        ), gstat AS (
            SELECT doc_id, sum(c) AS n, count(*) AS nd, max(c) AS topc
            FROM (SELECT doc_id, gram, count(*) AS c
                  FROM (SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
                        FROM (SELECT doc_id, w,
                                     unnest(generate_series(1, len(w) - 1)) AS i
                              FROM words WHERE len(w) >= 2))
                  GROUP BY doc_id, gram)
            GROUP BY doc_id
        )
        SELECT w.doc_id,
               CAST(ws.n AS BIGINT) AS n_words,
               round((ws.n - ws.nd) / ws.n, 6) AS dup_word_frac,
               round(ws.topc / ws.n, 6) AS top_word_frac,
               round((gs.n - gs.nd) / gs.n, 6) AS dup_2gram_frac,
               round(gs.topc / gs.n, 6) AS top_2gram_frac,
               coalesce(round(ws.topc / ws.n, 6) >= {REP_TOP_WORD_T}, false)
                 OR coalesce(round((gs.n - gs.nd) / gs.n, 6) >= {REP_DUP_2GRAM_T}, false)
                 AS repetitive
        FROM words w
        JOIN wstat ws USING (doc_id)
        LEFT JOIN gstat gs USING (doc_id)
    """


def _pii_scrub_oracle() -> str:
    """DuckDB twin of analytics.pii_scrub: identical blob synthesis
    (pure key arithmetic + name rewrite) and the same regexes injected
    from the module — RE2 and Java agree on this pattern subset."""
    from engine.spark.analytics import EMAIL_RE, PHONE_RE

    return f"""
        WITH blob AS (
            SELECT c_custkey,
                   c_name || ' segment ' || c_mktsegment || ' email: ' ||
                   CASE WHEN c_custkey % 3 = 0 THEN 'none'
                        ELSE lower(replace(c_name, '#', '.')) || '@example.com'
                   END || ' phone: ' ||
                   CASE WHEN c_custkey % 4 = 0 THEN 'unlisted'
                        ELSE (c_custkey % 90 + 10)::VARCHAR || '-' ||
                             ((c_custkey * 7) % 900 + 100)::VARCHAR || '-' ||
                             ((c_custkey * 13) % 900 + 100)::VARCHAR || '-' ||
                             ((c_custkey * 31) % 9000 + 1000)::VARCHAR
                   END AS t
            FROM customer)
        SELECT c_custkey,
               CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phones,
               regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g') AS scrubbed
        FROM blob
    """


def _invoice_fields_oracle() -> str:
    """DuckDB twin of validate_invoice_fields: same orders-derived
    synthetic invoice fields, same predicates, same sorted ';'-joined
    issue scalars; the currency allowlist is injected from the kernel
    table so both sides can never drift."""
    from engine.kernel.validators import VALID_CURRENCIES

    cur_list = ", ".join(f"'{c}'" for c in sorted(VALID_CURRENCIES))
    return r"""
        WITH d AS (
            SELECT o_orderkey,
                CASE WHEN o_orderkey % 97 = 0 THEN NULL
                     WHEN o_orderkey % 13 = 0 THEN 'INV ' || CAST(o_orderkey AS VARCHAR)
                     WHEN o_orderkey % 31 = 0 THEN 'A'
                     ELSE 'INV-' || CAST(o_orderkey AS VARCHAR) END AS num,
                CASE WHEN o_orderkey % 41 = 0 THEN NULL
                     WHEN o_orderkey % 19 = 0 THEN '2026-02-30'
                     WHEN o_orderkey % 23 = 0 THEN '2026-06-01'
                     WHEN o_orderkey % 29 = 0 THEN '2019-01-01'
                     ELSE strftime(DATE '2025-01-01' + CAST(o_orderkey % 300 AS INT),
                                   '%Y-%m-%d') END AS date_str,
                CASE WHEN o_orderkey % 37 = 0 THEN NULL
                     WHEN o_orderkey % 17 = 0 THEN -o_totalprice
                     WHEN o_orderkey % 11 = 0 THEN 0.0
                     WHEN o_orderkey % 43 = 0 THEN 99000000.0
                     ELSE round(o_totalprice, 2) END AS amt,
                upper(CASE WHEN o_orderkey % 5 = 0 THEN 'USD'
                           WHEN o_orderkey % 5 = 1 THEN 'EUR'
                           WHEN o_orderkey % 5 = 2 THEN 'XYZ'
                           WHEN o_orderkey % 5 = 3 THEN NULL
                           ELSE 'pkr' END) AS cur
            FROM orders),
        p AS (SELECT *, CAST(try_strptime(date_str, '%Y-%m-%d') AS DATE) AS dt FROM d),
        i AS (
            SELECT o_orderkey,
                list_filter([
                    CASE WHEN num IS NULL OR num = '' THEN 'missing' END,
                    CASE WHEN num IS NOT NULL
                         AND NOT regexp_matches(num, '^[A-Za-z0-9\-_/]+$')
                         THEN 'bad_format' END,
                    CASE WHEN num IS NOT NULL
                         AND NOT (length(num) BETWEEN 2 AND 50)
                         THEN 'bad_length' END
                ], x -> x IS NOT NULL) AS num_i,
                list_filter([
                    CASE WHEN date_str IS NULL THEN 'missing' END,
                    CASE WHEN date_str IS NOT NULL AND dt IS NULL THEN 'unparseable' END,
                    CASE WHEN dt > DATE '2026-01-01' THEN 'future_date' END,
                    CASE WHEN date_diff('day', dt, DATE '2026-01-01') > 1825
                         THEN 'too_old' END
                ], x -> x IS NOT NULL) AS date_i,
                list_filter([
                    CASE WHEN amt IS NULL THEN 'missing' END,
                    CASE WHEN amt < 0 THEN 'negative' END,
                    CASE WHEN amt = 0 THEN 'zero' END,
                    CASE WHEN amt > 10000000 THEN 'implausibly_large' END
                ], x -> x IS NOT NULL) AS amt_i,
                list_filter([
                    CASE WHEN cur IS NULL THEN 'missing' END,
                    CASE WHEN cur IS NOT NULL AND cur NOT IN (__CURRENCIES__)
                         THEN 'unknown_code' END
                ], x -> x IS NOT NULL) AS cur_i
            FROM p)
        SELECT o_orderkey,
               -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
               -- concat_ws over an empty array is ''
               coalesce(array_to_string(list_sort(num_i), ';'), '') AS invoice_number_issues,
               coalesce(array_to_string(list_sort(date_i), ';'), '') AS invoice_date_issues,
               coalesce(array_to_string(list_sort(amt_i), ';'), '') AS total_amount_issues,
               coalesce(array_to_string(list_sort(cur_i), ';'), '') AS currency_issues,
               CAST(len(num_i) + len(date_i) + len(amt_i) + len(cur_i) AS INT)
                   AS n_issues
        FROM i
    """.replace("__CURRENCIES__", cur_list)


def _invoice_extracted_oracle() -> str:
    """DuckDB twin of validate_invoice_extracted: recomputes the P4
    predicates from the materialized kernel-extracted fields_json
    parquet. JSON projection parity with from_json's explicit schema:
    json_extract_string for the string fields, TRY_CAST of the raw
    JSON value to DOUBLE for total_amount (the kernel emits amounts as
    JSON numbers), json_valid guard mirroring from_json's
    null-struct-on-malformed."""
    from engine.kernel.validators import VALID_CURRENCIES

    cur_list = ", ".join(f"'{c}'" for c in sorted(VALID_CURRENCIES))
    return r"""
        WITH s AS (
            SELECT conv_id, turn_idx,
                   json_extract_string(fields_json, '$.invoice_number') AS num,
                   json_extract_string(fields_json, '$.invoice_date') AS date_str,
                   TRY_CAST(json_extract(fields_json, '$.total_amount') AS DOUBLE) AS amt,
                   upper(json_extract_string(fields_json, '$.currency')) AS cur
            FROM read_parquet('__INV_PATH__/*.parquet')
            WHERE doc_type = 'invoice'
              AND fields_json IS NOT NULL AND json_valid(fields_json)
            UNION ALL
            SELECT conv_id, turn_idx, NULL, NULL, NULL, NULL
            FROM read_parquet('__INV_PATH__/*.parquet')
            WHERE doc_type = 'invoice'
              AND (fields_json IS NULL OR NOT json_valid(fields_json))),
        p AS (SELECT *, CAST(try_strptime(date_str, '%Y-%m-%d') AS DATE) AS dt FROM s),
        i AS (
            SELECT conv_id, turn_idx,
                list_filter([
                    CASE WHEN num IS NULL OR num = '' THEN 'missing' END,
                    CASE WHEN num IS NOT NULL
                         AND NOT regexp_matches(num, '^[A-Za-z0-9\-_/]+$')
                         THEN 'bad_format' END,
                    CASE WHEN num IS NOT NULL
                         AND NOT (length(num) BETWEEN 2 AND 50)
                         THEN 'bad_length' END
                ], x -> x IS NOT NULL) AS num_i,
                list_filter([
                    CASE WHEN date_str IS NULL THEN 'missing' END,
                    CASE WHEN date_str IS NOT NULL AND dt IS NULL THEN 'unparseable' END,
                    CASE WHEN dt > DATE '2026-01-01' THEN 'future_date' END,
                    CASE WHEN date_diff('day', dt, DATE '2026-01-01') > 1825
                         THEN 'too_old' END
                ], x -> x IS NOT NULL) AS date_i,
                list_filter([
                    CASE WHEN amt IS NULL THEN 'missing' END,
                    CASE WHEN amt < 0 THEN 'negative' END,
                    CASE WHEN amt = 0 THEN 'zero' END,
                    CASE WHEN amt > 10000000 THEN 'implausibly_large' END
                ], x -> x IS NOT NULL) AS amt_i,
                list_filter([
                    CASE WHEN cur IS NULL THEN 'missing' END,
                    CASE WHEN cur IS NOT NULL AND cur NOT IN (__CURRENCIES__)
                         THEN 'unknown_code' END
                ], x -> x IS NOT NULL) AS cur_i
            FROM p)
        SELECT conv_id, turn_idx,
               coalesce(array_to_string(list_sort(num_i), ';'), '') AS invoice_number_issues,
               coalesce(array_to_string(list_sort(date_i), ';'), '') AS invoice_date_issues,
               coalesce(array_to_string(list_sort(amt_i), ';'), '') AS total_amount_issues,
               coalesce(array_to_string(list_sort(cur_i), ';'), '') AS currency_issues
        FROM i
    """.replace("__CURRENCIES__", cur_list).replace(
        "__INV_PATH__", _inv_synth_path()
    )


def _ats_oracles() -> dict[str, str]:
    """DuckDB twins of the three ATS queries, generated from the same
    constants engine/spark/ats.py uses (vocabularies, degree pool,
    DEGREE_LEVELS, JD bounds) so the two sides cannot drift."""
    from engine.kernel.scoring import DEGREE_LEVELS
    from engine.spark import ats as A

    def hits(vocab):
        return "(" + " + ".join(
            f"CASE WHEN contains(lower(text), '{kw}') THEN 1 ELSE 0 END"
            for kw in vocab
        ) + ")"

    def missing(vocab):
        cases = ", ".join(
            f"CASE WHEN NOT contains(lower(text), '{kw}') THEN '{kw}' END"
            for kw in vocab
        )
        return f"list_filter([{cases}], x -> x IS NOT NULL)"

    def present(vocab):
        cases = ", ".join(
            f"CASE WHEN contains(lower(text), '{kw}') THEN '{kw}' END"
            for kw in vocab
        )
        return f"list_filter([{cases}], x -> x IS NOT NULL)"

    degree_case = "CASE CAST(doc_id % 6 AS INT) " + " ".join(
        f"WHEN {i} THEN '{d}'" for i, d in enumerate(A.DEGREE_POOL)
    ) + " END"
    from engine.spark.relational import SKILL_VOCAB

    nv = len(SKILL_VOCAB)
    vocab_list = "[" + ", ".join(f"'{s}'" for s in SKILL_VOCAB) + "]"
    fit_req_list = "[" + ", ".join(f"'{s}'" for s in A.FIT_REQUIRED_SKILLS) + "]"
    matched_fit = (
        f"len(list_intersect([list_extract({vocab_list}, CAST(doc_id % {nv} + 1 AS INT)), "
        f"list_extract({vocab_list}, CAST((doc_id * 7 + 3) % {nv} + 1 AS INT))], "
        f"{fit_req_list}))"
    )
    fit_score = (
        "least(100, greatest(0, 50 "
        f"+ (CASE WHEN (doc_id % 25) * 0.5 >= {A.JD_MIN_YEARS} THEN 15 "
        f"        WHEN (doc_id % 25) * 0.5 >= {A.JD_MIN_YEARS * 0.7!r} THEN 5 "
        "         ELSE -10 END) "
        f"+ CAST(floor({matched_fit} / {len(A.FIT_REQUIRED_SKILLS)} * 20) AS INT) "
        "- CAST(doc_id % 4 AS INT) * 5))"
    )
    cand_level = "greatest(" + ", ".join(
        f"CASE WHEN contains(lower(degree), '{k}') THEN {v} ELSE 0 END"
        for k, v in DEGREE_LEVELS.items()
    ) + ")"
    req_level = A._required_edu_level(A.REQUIRED_EDU)
    lo, hi = A.JD_MIN_YEARS, A.JD_MAX_YEARS
    base = f"""
        WITH c AS (
            SELECT doc_id,
                   CAST({hits(A.REQUIRED_SKILLS)} AS INT) AS matched_required,
                   CAST({hits(A.PREFERRED_SKILLS)} AS INT) AS matched_preferred,
                   CAST({hits(A.JD_KEYWORDS)} AS INT) AS matched_keywords,
                   {missing(A.REQUIRED_SKILLS)} AS missing_required,
                   {missing(A.PREFERRED_SKILLS)} AS missing_preferred,
                   {missing(A.JD_KEYWORDS)} AS missing_keywords,
                   {present(A.REQUIRED_SKILLS)} AS matched_required_list,
                   {present(A.PREFERRED_SKILLS)} AS matched_preferred_list,
                   {present(A.JD_KEYWORDS)} AS matched_keywords_list,
                   (doc_id % 25) * 0.5 AS resume_years,
                   {degree_case} AS degree,
                   (doc_id % 3 != 0) AS has_summary,
                   (doc_id % 4 = 0) AS has_certifications,
                   CAST({matched_fit} AS INT) AS fit_matched_required,
                   CAST(doc_id % 4 AS INT) AS n_red_flags,
                   CAST({fit_score} AS INT) AS fit_score,
                   (doc_id % 7 = 0) AS has_flags
            FROM documents),
        s AS (
            SELECT *,
                CAST(floor((matched_required / {len(A.REQUIRED_SKILLS)}) * 70
                         + (matched_preferred / {len(A.PREFERRED_SKILLS)}) * 30) AS INT)
                    AS skills_match_score,
                CAST(floor((matched_keywords / {len(A.JD_KEYWORDS)}) * 100) AS INT)
                    AS keyword_match_score,
                CASE WHEN resume_years >= {lo} THEN
                         CASE WHEN resume_years <= {hi} THEN 100
                              ELSE greatest(60, 100 - CAST(floor((resume_years - {hi}) * 5) AS INT)) END
                     WHEN {lo} - resume_years <= 1 THEN 70
                     WHEN {lo} - resume_years <= 2 THEN 50
                     ELSE greatest(20, 50 - CAST(floor(({lo} - resume_years) * 10) AS INT))
                END AS experience_match_score,
                CASE WHEN degree = '' THEN 30
                     WHEN {cand_level} >= {req_level} THEN 100
                     WHEN {cand_level} = {req_level} - 1 THEN 70
                     ELSE 40
                END AS education_match_score
            FROM c),
        t AS (
            SELECT *,
                CAST(floor(skills_match_score * 0.40 + keyword_match_score * 0.25
                         + experience_match_score * 0.25 + education_match_score * 0.10)
                     AS INT) AS ats_score
            FROM s)
    """
    summary = f"""
        (CASE WHEN ats_score >= 90 THEN 'Excellent'
              WHEN ats_score >= 75 THEN 'Good'
              WHEN ats_score >= 60 THEN 'Fair'
              WHEN ats_score >= 40 THEN 'Needs Work'
              ELSE 'Poor Match' END)
        || ' (' || CAST(ats_score AS VARCHAR) || '/100). '
        || (CASE WHEN ats_score >= 90 THEN 'This resume is highly optimized for this job posting.'
                 WHEN ats_score >= 75 THEN 'Strong match with room for minor improvements.'
                 WHEN ats_score >= 60 THEN 'Moderate match - consider adding missing keywords.'
                 WHEN ats_score >= 40 THEN 'Significant gaps in required skills or keywords.'
                 ELSE 'Major mismatch - this role may not be a good fit.' END)
        || ' Matched ' || CAST(matched_required AS VARCHAR)
        || '/{len(A.REQUIRED_SKILLS)} required skills.'
    """
    jd_certs_joined = ", ".join(A.JD_CERTS[:3])
    sugg_list = f"""
        list_filter([
            CASE WHEN len(missing_required) > 0
                 THEN 'Add these required skills if you have experience: '
                      || array_to_string(missing_required[1:5], ', ') END,
            CASE WHEN len(missing_preferred) > 0
                  AND len(missing_preferred) > len(missing_required)
                 THEN 'Consider highlighting these preferred skills: '
                      || array_to_string(missing_preferred[1:3], ', ') END,
            CASE WHEN len(missing_keywords) > 0
                 THEN 'Include these keywords in your resume: '
                      || array_to_string(missing_keywords[1:5], ', ') END,
            CASE WHEN experience_match_score < 70
                 THEN 'Highlight relevant projects or freelance work to bridge experience gap' END,
            CASE WHEN education_match_score < 70
                 THEN 'List relevant certifications or courses to strengthen education section' END,
            CASE WHEN NOT has_summary
                 THEN 'Add a professional summary highlighting your fit for this role' END,
            CASE WHEN NOT has_certifications
                 THEN 'Consider obtaining relevant certifications: {jd_certs_joined}' END
        ], x -> x IS NOT NULL)[1:7]
    """
    rec_case = """
        CASE WHEN top_score >= 85 AND NOT top_flags
             THEN '✅ STRONG RECOMMENDATION: Top candidate (doc-'
                  || CAST(top_doc_id AS VARCHAR)
                  || ') is an excellent fit with ' || CAST(top_score AS VARCHAR)
                  || '/100 score and no critical red flags.'
             WHEN n_excellent > 0
             THEN '✅ GOOD POOL: ' || CAST(n_excellent AS VARCHAR)
                  || ' strong candidate(s) available. Top score: '
                  || CAST(top_score AS VARCHAR)
                  || '/100. Review red flags before proceeding.'
             WHEN top_score >= 70
             THEN '⚠️ ACCEPTABLE: Top candidate at ' || CAST(top_score AS VARCHAR)
                  || '/100. Pool quality is moderate. Consider expanding search.'
             ELSE '❌ WEAK POOL: Highest score is ' || CAST(top_score AS VARCHAR)
                  || '/100. Not recommended to proceed without additional candidates.'
        END
    """
    return {
        "candidate_fit_fallback": base + """
            SELECT doc_id, fit_matched_required, n_red_flags, fit_score,
                   CASE WHEN fit_score >= 70 THEN 'good_fit'
                        WHEN fit_score >= 50 THEN 'potential_fit'
                        ELSE 'needs_review' END AS recommendation,
                   CASE WHEN fit_score >= 70 THEN 'Candidate shows potential based on available data'
                        WHEN fit_score >= 50 THEN 'Some gaps identified, further review recommended'
                        ELSE 'Significant gaps, careful evaluation needed' END
                       AS recommendation_text
            FROM c
        """,
        "ats_full_score": base + f"""
            SELECT doc_id, skills_match_score, keyword_match_score,
                   experience_match_score, education_match_score, ats_score,
                   {summary} AS summary,
                   coalesce(array_to_string(
                       list_concat(matched_required_list, matched_preferred_list),
                       ';'), '') AS matched_skills,
                   coalesce(array_to_string(matched_keywords_list, ';'), '')
                       AS matched_keywords,
                   coalesce(array_to_string(missing_required, ';'), '')
                       AS missing_required_skills,
                   coalesce(array_to_string(missing_preferred, ';'), '')
                       AS missing_preferred_skills,
                   coalesce(array_to_string(missing_keywords[1:10], ';'), '')
                       AS missing_keywords
            FROM t
        """,
        "ats_suggestions": base + f"""
            , g AS (SELECT doc_id, {sugg_list} AS sugg FROM t)
            SELECT doc_id,
                   CAST(len(sugg) AS INT) AS n_suggestions,
                   coalesce(array_to_string(sugg, '|'), '') AS suggestions
            FROM g
        """,
        "hiring_recommendation": base + f"""
            , r AS (
                SELECT *,
                    CAST(floor(ats_score * 0.4 + fit_score * 0.6) AS INT) AS overall,
                    CAST(doc_id % 10 AS INT) AS cohort
                FROM t),
            top AS (
                SELECT cohort, overall AS top_score, doc_id AS top_doc_id,
                       has_flags AS top_flags,
                       row_number() OVER (PARTITION BY cohort
                                          ORDER BY overall DESC, doc_id) AS rn
                FROM r),
            a AS (
                SELECT cohort,
                       CAST(count(*) AS INT) AS total_candidates,
                       round(avg(overall), 2) AS average_score,
                       CAST(sum(CASE WHEN overall >= 85 THEN 1 ELSE 0 END) AS INT) AS n_excellent,
                       CAST(sum(CASE WHEN overall >= 70 AND overall < 85 THEN 1 ELSE 0 END) AS INT) AS n_good,
                       CAST(sum(CASE WHEN overall >= 50 AND overall < 70 THEN 1 ELSE 0 END) AS INT) AS n_acceptable,
                       CAST(sum(CASE WHEN overall < 50 THEN 1 ELSE 0 END) AS INT) AS n_poor
                FROM r GROUP BY cohort)
            SELECT a.cohort, a.total_candidates, a.average_score,
                   a.n_excellent, a.n_good, a.n_acceptable, a.n_poor,
                   p.top_score, CAST(p.top_doc_id AS BIGINT) AS top_doc_id,
                   {rec_case} AS recommendation
            FROM a JOIN top p ON a.cohort = p.cohort AND p.rn = 1
        """,
    }


def oracle_sql() -> dict[str, str]:
    from engine.spark.analytics import C4_SYN_BARE_WORDS, C4_SYN_DOT_WORDS

    # Shared line-synthesis CTE — single source of truth with
    # _c4_synthesize_lines' word lists (the Spark side reads the same
    # constants), spliced into the c4_clean / line_dedup /
    # line_dedup_intra twins via __LINES__ so the fixture cannot drift
    # between the engines or between the three SQL copies.
    line_synth_cte = (
        "s AS (\n"
        "                SELECT doc_id,\n"
        "                       regexp_replace(regexp_replace(text,\n"
        f"                           ' ({C4_SYN_DOT_WORDS}) ', "
        "' \\1.' || chr(10), 'g'),\n"
        f"                           ' ({C4_SYN_BARE_WORDS}) ', "
        "' \\1' || chr(10), 'g') AS t\n"
        "                FROM documents)"
    )
    lang_pred_case = (
        "CASE WHEN greatest(s_en, s_es, s_de, s_fr) <= 0 THEN 'und' "
        + " ".join(
            f"WHEN s_{l} = greatest(s_en, s_es, s_de, s_fr) THEN '{l}'"
            for l in _LANGS
        )
        + " ELSE 'und' END"
    )
    # refusal_detect marker chain — generated from the SAME tuple the
    # Spark side scans (engine.spark.agent.REFUSAL_MARKERS), with SQL
    # single-quote escaping, so the marker lists cannot drift
    from engine.spark.agent import REFUSAL_MARKERS

    refusal_cond = " OR ".join(
        "contains(low, '{}')".format(m.replace("'", "''"))
        for m in REFUSAL_MARKERS
    )
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   -- DECIMAL sums: exact + engine-identical rounding
                   -- (double sums can straddle a .xx5 boundary)
                   CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                                  * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
                   round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders_per_segment": """
            SELECT c_mktsegment, o_orderkey,
                   round(o_totalprice, 2) AS o_totalprice, rnk
            FROM (
                SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                       CAST(row_number() OVER (
                           PARTITION BY c.c_mktsegment
                           ORDER BY o.o_totalprice DESC, o.o_orderkey
                       ) AS BIGINT) AS rnk
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            ) WHERE rnk <= 3
        """,
        "score_distribution": """
            SELECT CASE WHEN o_totalprice >= 300000 THEN 'excellent'
                        WHEN o_totalprice >= 150000 THEN 'good'
                        WHEN o_totalprice >= 50000 THEN 'acceptable'
                        ELSE 'poor' END AS bucket,
                   count(*) AS n,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2) AS avg_price
            FROM orders GROUP BY bucket
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "suppliers_in_region": """
            SELECT s_suppkey, s_name FROM supplier s
            WHERE EXISTS (
                SELECT 1 FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
                WHERE r.r_name = 'AMERICA' AND n.n_nationkey = s.s_nationkey)
        """,
        "order_consistency": """
            WITH ls AS (
                SELECT l_orderkey,
                       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                                      * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE)
                           AS line_revenue
                FROM lineitem GROUP BY l_orderkey)
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, line_revenue,
                   (abs(o_totalprice - line_revenue) > 0.02) AS mismatch
            FROM orders JOIN ls ON o_orderkey = l_orderkey
        """,
        "event_set_ops": """
            WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
                 e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
                 clean AS (SELECT user_id FROM p EXCEPT SELECT user_id FROM e),
                 v AS (SELECT user_id, count(*) AS n_views FROM events
                       WHERE event_type = 'view' GROUP BY user_id)
            SELECT c.user_id, coalesce(v.n_views, 0) AS n_views
            FROM clean c LEFT JOIN v ON c.user_id = v.user_id
        """,
        "sessionize_events": """
            WITH m AS (
                SELECT user_id, event_id, value, ts,
                       CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
                                 OR CAST(floor(epoch(ts)) AS BIGINT)
                                    - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT user_id, value,
                       CAST(sum(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
                FROM m)
            SELECT user_id, session_seq, count(*) AS n_events,
                   CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE) AS session_value
            FROM s GROUP BY user_id, session_seq
        """,
        "event_props_json": """
            SELECT event_type, count(*) AS n,
                   round(avg(k), 4) AS avg_k, max(k) AS max_k
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS INT) AS k
                  FROM events)
            GROUP BY event_type
        """,
        "part_type_shares": """
            SELECT p.p_brand, split_part(p.p_type, ' ', 1) AS type_class,
                   CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand, type_class
        """,
        "event_volume_anomalies": """
            WITH daily AS (
                SELECT event_type,
                       CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
                           AS day,
                       CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY 1, 2),
            m AS (
                SELECT event_type,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(c) AS BIGINT) AS s1,
                       CAST(sum(c * c) AS BIGINT) AS s2
                FROM daily GROUP BY event_type HAVING count(*) >= 2),
            mv AS (
                SELECT event_type, n, s1,
                       (CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) AS var
                FROM m),
            z AS (
                -- var = 0 (constant daily volume) -> NULL z, row filtered:
                -- mirrors the Spark side's F.when(var > 0, ...) guard
                SELECT d.event_type, d.day, d.c,
                       CAST(m.s1 AS DOUBLE) / m.n AS mean_daily,
                       CASE WHEN m.var > 0 THEN
                           (CAST(d.c AS DOUBLE)
                            - CAST(m.s1 AS DOUBLE) / m.n) / sqrt(m.var)
                       END AS zval
                FROM daily d JOIN mv m USING (event_type))
            SELECT event_type, day, c AS n_events,
                   round(mean_daily, 4) AS mean_daily,
                   round(zval, 4) AS z
            FROM z WHERE abs(zval) > 2.0
        """,
        "supplier_balance_outliers": """
            WITH s AS (
                SELECT s_suppkey, s_nationkey,
                       CAST(round(s_acctbal * 100) AS BIGINT) AS bc
                FROM supplier),
            m AS (
                SELECT s_nationkey,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(bc) AS BIGINT) AS s1,
                       CAST(sum(bc * bc) AS BIGINT) AS s2
                FROM s GROUP BY s_nationkey HAVING count(*) >= 2),
            mv AS (
                SELECT s_nationkey, n, s1,
                       (CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) AS var
                FROM m),
            z AS (
                -- var = 0 (all balances identical) -> NULL z, row filtered:
                -- mirrors the Spark side's F.when(var > 0, ...) guard
                SELECT s.s_suppkey, s.s_nationkey, s.bc,
                       CASE WHEN m.var > 0 THEN
                           (CAST(s.bc AS DOUBLE)
                            - CAST(m.s1 AS DOUBLE) / m.n) / sqrt(m.var)
                       END AS zval
                FROM s JOIN mv m USING (s_nationkey))
            SELECT z.s_suppkey, n.n_name,
                   CAST(z.bc AS DOUBLE) / 100 AS acctbal,
                   round(z.zval, 4) AS z
            FROM z JOIN nation n ON z.s_nationkey = n.n_nationkey
            WHERE abs(z.zval) > 2.0
        """,
        "order_percentiles_by_segment": """
            WITH j AS (
                SELECT c.c_mktsegment, o.o_totalprice,
                       least(CAST(floor(percent_rank() OVER (
                                 PARTITION BY c.c_mktsegment
                                 ORDER BY o.o_totalprice) * 10)
                             AS INTEGER), 9) AS decile
                FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey)
            SELECT c_mktsegment, decile,
                   count(*) AS n_orders,
                   round(min(o_totalprice), 2) AS min_price,
                   round(max(o_totalprice), 2) AS max_price
            FROM j GROUP BY 1, 2
        """,
        "event_value_trend": """
            WITH ev AS (
                SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
                           AS day,
                       CAST(round(value * 100) AS BIGINT) AS vc
                FROM events),
            daily AS (
                SELECT day, CAST(sum(vc) AS BIGINT) AS vc_sum,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM ev GROUP BY day)
            SELECT day,
                   CAST(vc_sum AS DOUBLE) / 100 AS day_value,
                   n_events,
                   round((CAST(sum(vc_sum) OVER w AS DOUBLE) / 100)
                         / count(*) OVER w, 6) AS ma7_value
            FROM daily
            WINDOW w AS (ORDER BY day
                         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        """,
        "corpus_diff": """
            WITH docs AS (
                SELECT doc_id, text FROM documents),
            newsnap AS (
                SELECT doc_id,
                       CASE WHEN substr(md5(text), 1, 1) = '1'
                            THEN text || ' [rev2]' ELSE text END AS text
                FROM docs WHERE substr(md5(text), 1, 1) != '0'
                UNION ALL
                SELECT 10000000, 'brand new document'),
            a AS (SELECT doc_id, md5(text) AS h_old FROM docs),
            b AS (SELECT doc_id, md5(text) AS h_new FROM newsnap),
            j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                         h_old, h_new
                  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
            SELECT doc_id,
                   CASE WHEN h_old IS NULL THEN 'added'
                        WHEN h_new IS NULL THEN 'removed'
                        WHEN h_old != h_new THEN 'changed' END AS status,
                   h_old, h_new
            FROM j
            WHERE (CASE WHEN h_old IS NULL THEN 'added'
                        WHEN h_new IS NULL THEN 'removed'
                        WHEN h_old != h_new THEN 'changed' END)
                  IS NOT NULL
        """,
        "user_engagement": """
            WITH ud AS (
                SELECT DISTINCT user_id,
                       CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
                           AS day
                FROM events),
            dau AS (
                SELECT day, CAST(count(*) AS BIGINT) AS dau
                FROM ud GROUP BY day),
            contrib AS (
                SELECT DISTINCT user_id, wday
                FROM ud, unnest(generate_series(day, day + 6)) AS t(wday)),
            wau AS (
                SELECT wday AS day, CAST(count(*) AS BIGINT) AS wau
                FROM contrib GROUP BY wday)
            SELECT dau.day, dau.dau, wau.wau,
                   round(CAST(dau.dau AS DOUBLE) / wau.wau, 6)
                       AS stickiness
            FROM dau JOIN wau USING (day)
        """,
        "nation_trade_volume": """
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS INT) AS l_year,
                   CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                                  * (1 - CAST(l.l_discount
                                              AS DECIMAL(18,2)))), 2)
                        AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            WHERE sn.n_name <> cn.n_name
            GROUP BY 1, 2, 3
        """,
        "revenue_by_nation": """
            SELECT n.n_name,
                   CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY n.n_name
        """,
        "text_preview": """
            SELECT doc_id,
                   CASE WHEN length(text) <= 100 THEN text
                        ELSE regexp_replace(text[1:100], ' [^ ]*$', '') || '...'
                   END AS preview
            FROM documents
        """,
        "date_normalize": """
            WITH r AS (
                SELECT o_orderkey, o_orderdate,
                       strftime(o_orderdate, '%m/%d/%Y') AS rendered_us,
                       strftime(o_orderdate, '%d.%m.%Y') AS rendered_eu
                FROM orders),
            p AS (
                SELECT o_orderkey, o_orderdate, rendered_us, rendered_eu,
                       CAST(coalesce(try_strptime(rendered_us, '%Y-%m-%d'),
                                     try_strptime(rendered_us, '%m/%d/%Y'),
                                     try_strptime(rendered_us, '%d.%m.%Y')) AS DATE) AS parsed_us,
                       CAST(coalesce(try_strptime(rendered_eu, '%Y-%m-%d'),
                                     try_strptime(rendered_eu, '%m/%d/%Y'),
                                     try_strptime(rendered_eu, '%d.%m.%Y')) AS DATE) AS parsed_eu
                FROM r)
            SELECT o_orderkey, rendered_us, rendered_eu, parsed_us, parsed_eu,
                   (parsed_us = CAST(o_orderdate AS DATE)
                    AND parsed_eu = CAST(o_orderdate AS DATE)) AS roundtrip_ok
            FROM p
        """,
        "validation_score": """
            WITH s AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 7 = 0 THEN 0.6 ELSE 1.0 END AS s_inv,
                       CASE WHEN o_totalprice > 300000 THEN 0.7 ELSE 0.95 END AS s_tot,
                       0.9 AS s_date,
                       CASE WHEN o_custkey % 5 = 0 THEN 0.0 ELSE 0.9 END AS s_cust,
                       (CASE WHEN o_custkey % 5 = 0 THEN 1 ELSE 0 END
                      + CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END
                      + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS n_issues,
                       least(CASE WHEN o_custkey % 5 = 0 THEN 0.3 ELSE 0.0 END
                           + CASE WHEN o_totalprice > 300000 THEN 0.1 ELSE 0.0 END
                           + CASE WHEN o_orderkey % 7 = 0 THEN 0.02 ELSE 0.0 END,
                             0.5) AS penalty
                FROM orders)
            SELECT o_orderkey,
                   CAST(n_issues AS INT) AS n_issues,
                   round(greatest(
                       (s_inv * 1.0 + s_tot * 1.0 + s_date * 0.8 + s_cust * 0.5)
                           / 3.3 - penalty,
                       0.0), 3) AS validation_score
            FROM s
        """,
        "ats_keyword_match": """
            WITH h AS (
                SELECT doc_id,
                       (CASE WHEN contains(lower(text), 'join') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'filter') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'window') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'partition') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'shuffle') THEN 1 ELSE 0 END) AS req,
                       (CASE WHEN contains(lower(text), 'merge') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'batch') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'stream') THEN 1 ELSE 0 END) AS pref
                FROM documents),
            s AS (
                SELECT doc_id, req, pref,
                       CAST(floor((req / 5) * 70 + (pref / 3) * 30) AS INT) AS ats_score
                FROM h)
            SELECT doc_id,
                   CAST(req AS INT) AS matched_required,
                   CAST(pref AS INT) AS matched_preferred,
                   ats_score,
                   CASE WHEN ats_score >= 85 THEN 'excellent'
                        WHEN ats_score >= 70 THEN 'good'
                        WHEN ats_score >= 50 THEN 'acceptable'
                        ELSE 'poor' END AS bucket
            FROM s
        """,
        "candidate_pairwise": """
            WITH h AS (
                SELECT doc_id,
                       (CASE WHEN contains(lower(text), 'join') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'filter') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'window') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'partition') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'shuffle') THEN 1 ELSE 0 END) AS req,
                       (CASE WHEN contains(lower(text), 'merge') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'batch') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'stream') THEN 1 ELSE 0 END) AS pref
                FROM documents WHERE doc_id < 20),
            s AS (
                SELECT doc_id,
                       CAST(floor((req / 5) * 70 + (pref / 3) * 30) AS INT) AS ats_score
                FROM h)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.ats_score AS score_a, b.ats_score AS score_b,
                   CAST(a.ats_score - b.ats_score AS INT) AS score_diff,
                   CASE WHEN a.ats_score - b.ats_score >= 0 THEN 1 ELSE 2 END AS winner
            FROM s a JOIN s b ON a.doc_id < b.doc_id
        """,
        "dedup_exact": """
            SELECT md5(text) AS content_hash, count(*) AS dup_count,
                   min(doc_id) AS keep_id
            FROM documents GROUP BY md5(text)
        """,
        "dedup_ngram_jaccard": _NGRAM_JACCARD_SQL,
        "dedup_minhash_lsh": _minhash_lsh_oracle(),
        "dedup_simhash": _simhash_oracle(),
        "dedup_lsh_verified": _lsh_verified_oracle(),
        "dedup_conversations_near": _conv_near_oracle(),
        "lm_bigram_score": _lm_bigram_oracle(),
        "dedup_apply_conversations": _conv_apply_oracle(),
        "transcript_curate": _transcript_curate_oracle(),
        "simsearch_int8": """
            WITH e0 AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS u
                FROM embeddings),
            e AS (
                SELECT vec_id,
                       list_transform(u,
                           x -> x / sqrt(list_dot_product(u, u))) AS v
                FROM e0 WHERE list_dot_product(u, u) > 0),
            base AS (
                SELECT vec_id, v,
                       list_max(list_transform(v, x -> abs(x))) AS scale
                FROM e),
            c AS (
                SELECT vec_id, scale,
                       list_transform(v, x -> CAST(
                           CASE WHEN scale > 0
                                THEN round(x * 127 / scale, 0)
                                ELSE 0.0 END AS INTEGER)) AS codes
                FROM base),
            q AS (
                SELECT vec_id AS query_id, scale AS qscale,
                       codes AS qcodes
                FROM c WHERE vec_id < 5),
            s AS (
                SELECT c.vec_id, q.query_id, c.scale, q.qscale,
                       CAST(list_aggregate(
                           list_transform(list_zip(c.codes, q.qcodes),
                               z -> CAST(z[1] AS BIGINT) * z[2]),
                           'sum') AS BIGINT) AS dot
                FROM c, q WHERE c.vec_id <> q.query_id),
            r AS (
                SELECT query_id, vec_id, dot,
                       CAST(dot AS DOUBLE) * scale * qscale / 16129
                           AS dot_cos,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY CAST(dot AS DOUBLE) * scale * qscale
                                    / 16129 DESC, vec_id) AS rnk
                FROM s)
            SELECT query_id, vec_id, dot,
                   round(dot_cos, 6) AS approx_cosine,
                   CAST(rnk AS BIGINT) AS rnk
            FROM r WHERE rnk <= 10
        """,
        "dedup_apply_lsh": _dedup_apply_lsh_oracle(),
        "corpus_prepare": _corpus_prepare_oracle(),
        "dedup_incremental": _dedup_incremental_oracle(),
        "decontaminate": _decontaminate_oracle(),
        "decontaminate_fuzzy": _decontaminate_fuzzy_oracle(),
        "boilerplate_ngrams": _boilerplate_ngrams_oracle(),
        "shuffle_shards": _shuffle_shards_oracle(),
        "contamination_report": _contamination_report_oracle(),
        "source_keywords": _source_keywords_oracle(),
        "dedup_report": _dedup_report_oracle(),
        "hash_embed": _hash_embed_oracle(),
        "dedup_text_semantic": _dedup_text_semantic_oracle(),
        "dedup_text_semantic_adaptive":
            _dedup_text_semantic_adaptive_oracle(),
        "dedup_semantic_apply": _dedup_semantic_apply_oracle(),
        "quality_classifier": _quality_classifier_oracle(),
        "repetition_metrics": _repetition_oracle(),
        "pii_scrub": _pii_scrub_oracle(),
        "vocab_top_k": r"""
            SELECT word, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(string_split(
                      regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS word
                  FROM documents)
            GROUP BY word
            ORDER BY n DESC, word
            LIMIT 200
        """,
        "corpus_stats": f"""
            WITH pre AS (
                SELECT len(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS nw,
                       md5(text) AS h,
                       {lang_pred_case} AS lang
                FROM (SELECT text, {_lang_scores()} FROM documents)
            )
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(nw) AS BIGINT) AS total_words,
                   round(avg(nw), 6) AS avg_words,
                   round(quantile_cont(nw, 0.5), 6) AS p50_words,
                   round(quantile_cont(nw, 0.9), 6) AS p90_words,
                   round(avg(CASE WHEN lang = 'en' THEN 1 ELSE 0 END), 6) AS pct_en,
                   round(1 - count(DISTINCT h) / count(*), 6) AS exact_dup_rate
            FROM pre
        """,
        "lm_unigram_score": r"""
            WITH w AS (
                SELECT doc_id, unnest(string_split(
                    regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS word
                FROM documents),
            v AS (SELECT word, count(*) AS n FROM w
                  GROUP BY word ORDER BY n DESC, word LIMIT 16),
            t AS (SELECT count(*) AS t_words FROM w),
            s AS (SELECT w.doc_id,
                         CASE WHEN v.n IS NULL THEN 1 ELSE 0 END AS is_oov,
                         -- ::DOUBLE literals, deliberately: bare 0.9
                         -- is DECIMAL in DuckDB, whose product/divide
                         -- rounding differs from the double arithmetic
                         -- Spark runs; (1.0 - 0.9) mirrors the Python
                         -- (1.0 - lam) binary value exactly
                         log2(0.9::DOUBLE * coalesce(v.n, 0) / t.t_words
                              + (1.0::DOUBLE - 0.9::DOUBLE) / 17) AS logp
                  FROM w LEFT JOIN v USING (word) CROSS JOIN t),
            a AS (SELECT doc_id,
                         CAST(count(*) AS BIGINT) AS n_words,
                         CAST(sum(is_oov) AS BIGINT) AS n_oov,
                         round(-avg(logp), 6) AS bits_per_word
                  FROM s GROUP BY doc_id)
            SELECT doc_id, n_words, n_oov, bits_per_word,
                   bits_per_word <= 6.0 AS keep_doc
            FROM a
        """,
        "mix_corpus": f"""
            WITH langs AS (
                SELECT doc_id, {lang_pred_case} AS lang_pred
                FROM (SELECT doc_id, {_lang_scores()} FROM documents)
            ),
            shares AS (SELECT lang_pred, count(*) AS n FROM langs
                       GROUP BY lang_pred),
            -- (0.3::DOUBLE - 1.0::DOUBLE): IEEE-subtract the same
            -- doubles Python's (alpha - 1.0) does, so pow inputs are
            -- bit-identical on both engines
            r AS (SELECT lang_pred,
                         pow(n::DOUBLE, 0.3::DOUBLE - 1.0::DOUBLE)
                         / (SELECT max(pow(n::DOUBLE,
                                           0.3::DOUBLE - 1.0::DOUBLE))
                            FROM shares) AS rate
                  FROM shares),
            uu AS (
                SELECT doc_id, lang_pred,
                       ('0x' || substr(md5(doc_id::VARCHAR || ':mix-v1'), 1, 15))::BIGINT
                       / 1152921504606846976.0 AS u
                FROM langs)
            SELECT uu.doc_id, uu.lang_pred,
                   round(r.rate, 6) AS rate, round(uu.u, 6) AS u
            FROM uu JOIN r USING (lang_pred)
            WHERE uu.u < r.rate
        """,
        "internal_ngram_overlap": f"""
            WITH words AS (
                SELECT doc_id,
                       string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS w
                FROM documents
            ), g AS (
                SELECT DISTINCT doc_id,
                       ('0x' || substr(md5({" || ' ' || ".join(f"w[i+{j}]" for j in range(4))}), 1, 15))::BIGINT AS gh
                FROM (SELECT doc_id, w,
                             unnest(generate_series(1, len(w) - 3)) AS i
                      FROM words WHERE len(w) >= 4)
            ), freq AS (SELECT gh, count(*) AS nd FROM g GROUP BY gh),
            tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
            sh AS (SELECT g.doc_id, count(*) AS ns
                   FROM g JOIN freq USING (gh) WHERE freq.nd >= 2
                   GROUP BY g.doc_id)
            SELECT t.doc_id,
                   CAST(t.n_grams AS BIGINT) AS n_grams,
                   CAST(coalesce(s.ns, 0) AS BIGINT) AS n_shared,
                   round(coalesce(s.ns, 0) / t.n_grams, 6) AS shared_frac,
                   round(coalesce(s.ns, 0) / t.n_grams, 6) >= 0.2
                       AS has_repeated_spans
            FROM tot t LEFT JOIN sh s USING (doc_id)
        """,
        # within-doc first-occurrence line dedup over the same
        # synthesized line structure; keep iff pos == min(pos) over
        # (doc_id, normalized line)
        "line_dedup_intra": r"""
            WITH __LINES__,
            l AS (
                SELECT doc_id,
                       generate_subscripts(ls, 1) - 1 AS pos,
                       unnest(ls) AS line
                FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM s)),
            k AS (SELECT *,
                         min(pos) OVER (
                             PARTITION BY doc_id, trim(lower(line))) AS fp
                  FROM l)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(sum(CASE WHEN pos != fp THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_repeat,
                   round(sum(CASE WHEN pos != fp THEN 1 ELSE 0 END)
                         / count(*), 6) AS repeat_frac,
                   coalesce(string_agg(line, chr(10) ORDER BY pos)
                            FILTER (WHERE pos = fp), '') AS cleaned_text
            FROM k GROUP BY doc_id
        """.replace("__LINES__", line_synth_cte),
        "line_dedup": r"""
            WITH __LINES__,
            l AS (
                SELECT doc_id,
                       generate_subscripts(ls, 1) - 1 AS pos,
                       unnest(ls) AS line
                FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM s)),
            lh AS (SELECT *, md5(trim(lower(line))) AS h FROM l),
            freq AS (SELECT h, count(*) AS n FROM lh GROUP BY h),
            j AS (SELECT lh.*, freq.n >= 5 AS is_b
                  FROM lh JOIN freq USING (h))
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_boiler,
                   round(sum(CASE WHEN is_b THEN 1 ELSE 0 END)
                         / count(*), 6) AS boiler_frac,
                   coalesce(string_agg(line, chr(10) ORDER BY pos)
                            FILTER (WHERE NOT is_b), '') AS cleaned_text
            FROM j GROUP BY doc_id
        """.replace("__LINES__", line_synth_cte),
        "c4_clean": r"""
            WITH __LINES__,
            l AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines FROM s),
            k AS (SELECT doc_id, t, lines,
                         list_filter(lines, x ->
                             regexp_matches(trim(x), '[.!?"]$')
                             AND len(string_split(trim(x), ' ')) >= 3) AS kept
                  FROM l)
            SELECT doc_id,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST(len(kept) AS BIGINT) AS n_kept,
                   (contains(t, '{') OR contains(t, '}')) AS has_brace,
                   contains(lower(t), 'lorem ipsum') AS has_lorem,
                   coalesce(array_to_string(kept, chr(10)), '') AS cleaned_text,
                   (len(kept) >= 3
                    AND NOT (contains(t, '{') OR contains(t, '}'))
                    AND NOT contains(lower(t), 'lorem ipsum')) AS keep_doc
            FROM k
        """.replace("__LINES__", line_synth_cte),
        "stratified_sample": f"""
            WITH langs AS (
                SELECT doc_id, {lang_pred_case} AS lang_pred
                FROM (SELECT doc_id, {_lang_scores()} FROM documents)
            ), uu AS (
                SELECT doc_id, lang_pred,
                       ('0x' || substr(md5(doc_id::VARCHAR || ':strat-v1'), 1, 15))::BIGINT
                       / 1152921504606846976.0 AS u
                FROM langs
            )
            SELECT doc_id, lang_pred, round(u, 6) AS u FROM uu
            WHERE u < CASE lang_pred WHEN 'en' THEN 1.0 WHEN 'es' THEN 0.5
                      WHEN 'de' THEN 0.5 WHEN 'fr' THEN 0.5
                      WHEN 'und' THEN 0.25 ELSE 0.0 END
        """,
        # corpus minus exact-group and near-dup-component non-keepers
        "dedup_apply": """
            WITH RECURSIVE j AS (__PAIRS__),
            edges AS (
                SELECT doc_a AS a, doc_b AS b FROM j
                UNION SELECT doc_b, doc_a FROM j),
            nodes AS (SELECT DISTINCT a AS node FROM edges),
            reach(node, r) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
            ),
            near_drop AS (
                SELECT node AS doc_id FROM reach GROUP BY node
                HAVING node != min(r)),
            exact_drop AS (
                SELECT doc_id FROM (
                    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
                    FROM documents)
                WHERE doc_id != keep_id)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM near_drop
                                 UNION SELECT doc_id FROM exact_drop)
        """.replace("__PAIRS__", _NGRAM_JACCARD_SQL),
        # maximal (score DESC, doc_id) prefix whose running est_tokens
        # sum stays <= 20k (splits the corpus at BOTH gate SFs) — est >= 1
        # makes {cum <= B} a true prefix;
        # cum itself is never emitted (HUGEINT window sum stays inside
        # the WHERE)
        "token_budget_select": r"""
            WITH w AS (
                SELECT doc_id,
                       CAST(floor(length(text) / 4) + 1 AS BIGINT)
                           AS est_tokens,
                       CAST(len(list_distinct(string_split(
                           regexp_replace(lower(text), '\s+', ' ', 'g'),
                           ' '))) AS BIGINT) AS score
                FROM documents),
            r AS (
                SELECT *,
                       sum(est_tokens) OVER (
                           ORDER BY score DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
                FROM w)
            SELECT doc_id, score, est_tokens FROM r WHERE cum <= 20000
        """,
        # keep-best variant: cluster keeper = longest member (ties ->
        # min id); kept_over = cluster-mates the survivor displaced
        "dedup_keep_best": """
            WITH RECURSIVE j AS (__PAIRS__),
            edges AS (
                SELECT doc_a AS a, doc_b AS b FROM j
                UNION SELECT doc_b, doc_a FROM j),
            nodes AS (SELECT DISTINCT a AS node FROM edges),
            reach(node, r) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
            ),
            clusters AS (
                SELECT node AS doc_id, min(r) AS cluster_id
                FROM reach GROUP BY node),
            ranked AS (
                SELECT c.doc_id,
                       row_number() OVER (PARTITION BY c.cluster_id
                           ORDER BY length(d.text) DESC, c.doc_id) AS rk,
                       count(*) OVER (PARTITION BY c.cluster_id) AS csz
                FROM clusters c JOIN documents d USING (doc_id)),
            near_drop AS (SELECT doc_id FROM ranked WHERE rk > 1),
            exact_drop AS (
                SELECT doc_id FROM (
                    SELECT doc_id,
                           min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
                    FROM documents)
                WHERE doc_id != keep_id),
            best AS (SELECT doc_id, csz - 1 AS kept_over
                     FROM ranked WHERE rk = 1)
            SELECT d.doc_id,
                   CAST(coalesce(b.kept_over, 0) AS BIGINT) AS kept_over
            FROM documents d LEFT JOIN best b USING (doc_id)
            WHERE d.doc_id NOT IN (SELECT doc_id FROM near_drop
                                   UNION SELECT doc_id FROM exact_drop)
        """.replace("__PAIRS__", _NGRAM_JACCARD_SQL),
        # connected components over the jaccard pairs: recursive-CTE
        # transitive closure labels each node with the min reachable id
        "dedup_cluster_assign": """
            WITH RECURSIVE j AS (__PAIRS__),
            edges AS (
                SELECT doc_a AS a, doc_b AS b FROM j
                UNION SELECT doc_b, doc_a FROM j),
            nodes AS (SELECT DISTINCT a AS node FROM edges),
            reach(node, r) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
            )
            SELECT node AS doc_id, min(r) AS cluster_id,
                   (node = min(r)) AS is_keeper
            FROM reach GROUP BY node
        """.replace("__PAIRS__", _NGRAM_JACCARD_SQL),
        # the star algorithm must produce identical components — same
        # closure twin, full oracle row for the O(log n) variant
        "dedup_cluster_assign_star": """
            WITH RECURSIVE j AS (__PAIRS__),
            edges AS (
                SELECT doc_a AS a, doc_b AS b FROM j
                UNION SELECT doc_b, doc_a FROM j),
            nodes AS (SELECT DISTINCT a AS node FROM edges),
            reach(node, r) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
            )
            SELECT node AS doc_id, min(r) AS cluster_id,
                   (node = min(r)) AS is_keeper
            FROM reach GROUP BY node
        """.replace("__PAIRS__", _NGRAM_JACCARD_SQL),
        "career_progression": _CAREER_PROGRESSION_SQL,
        "candidate_fit_parse": _FIT_PARSE_SQL,
        "skill_match_tiers": _skill_match_oracle(),
        "validate_invoice_fields": _invoice_fields_oracle(),
        "validate_invoice_extracted": _invoice_extracted_oracle(),
        **_ats_oracles(),
        "multimodal_features": """
            WITH s AS (SELECT unnest(generate_series(0, 255)) AS i)
            SELECT CAST(i AS BIGINT) AS media_id,
                   CASE WHEN i % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
                   CAST(12 + least(8 * ((i % 97) + 4), 64 + (i % 512)) AS BIGINT) AS n_bytes,
                   CASE WHEN i % 2 = 0 THEN CAST(8 + i % 24 AS INT) END AS width,
                   CASE WHEN i % 2 = 0 THEN CAST(8 + (i // 2) % 16 AS INT) END AS height,
                   CASE WHEN i % 2 = 1 THEN CAST(16000 AS INT) END AS sample_rate,
                   CASE WHEN i % 2 = 1 THEN CAST(128 + i % 256 AS INT) END AS n_samples,
                   CASE WHEN i % 2 = 0 THEN CAST(1 AS INT)
                        ELSE CAST((128 + i % 256) // 64 AS INT) END AS frame_count,
                   TRUE AS ok
            FROM s
        """,
        "candidate_rank": """
            WITH h AS (
                SELECT doc_id,
                       (CASE WHEN contains(lower(text), 'join') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'filter') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'window') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'partition') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'shuffle') THEN 1 ELSE 0 END) AS req,
                       (CASE WHEN contains(lower(text), 'merge') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'batch') THEN 1 ELSE 0 END
                      + CASE WHEN contains(lower(text), 'stream') THEN 1 ELSE 0 END) AS pref
                FROM documents),
            s AS (
                SELECT doc_id,
                       CAST(doc_id % 10 AS INT) AS cohort,
                       CAST(floor((req / 5) * 70 + (pref / 3) * 30) AS INT) AS ats_score
                FROM h),
            r AS (
                SELECT cohort, doc_id, ats_score,
                       CAST(row_number() OVER (
                           PARTITION BY cohort
                           ORDER BY ats_score DESC, doc_id) AS INT) AS rnk
                FROM s)
            SELECT cohort, doc_id, ats_score, rnk FROM r WHERE rnk <= 3
        """,
        "order_rollup": """
            SELECT o_orderstatus, o_orderpriority,
                   CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS INT) AS gid,
                   count(*) AS n_orders,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "dedup_embedding_cosine": f"""
            WITH {_EMB_PAIR_CTES}
            SELECT vec_a, vec_b, cosine FROM sims WHERE cosine >= 0.35
        """,
        "dedup_apply_embeddings": f"""
            WITH RECURSIVE {_EMB_PAIR_CTES},
            p AS (SELECT vec_a, vec_b FROM sims WHERE cosine >= 0.35),
            edges AS (
                SELECT vec_a AS a, vec_b AS b FROM p
                UNION SELECT vec_b, vec_a FROM p),
            nodes AS (SELECT DISTINCT a AS node FROM edges),
            reach(node, r) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT e2.a, reach.r FROM edges e2 JOIN reach ON e2.b = reach.node
            ),
            dropped AS (
                SELECT node AS vec_id FROM reach GROUP BY node
                HAVING node != min(r))
            SELECT vec_id FROM embeddings
            WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
        """,
        "simsearch_bruteforce": """
            WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS u FROM embeddings),
                 e AS (SELECT vec_id,
                              list_transform(u, x -> x / sqrt(list_dot_product(u, u))) AS v
                       FROM e0 WHERE list_dot_product(u, u) > 0),
                 q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
                 sims AS (
                     SELECT q.query_id, e.vec_id,
                            round(list_dot_product(q.qv, e.v), 5) AS cosine
                     FROM e, q WHERE e.vec_id != q.query_id),
                 r AS (SELECT query_id, vec_id, cosine,
                              CAST(row_number() OVER (
                                  PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
                       FROM sims)
            SELECT query_id, vec_id, cosine, rnk FROM r WHERE rnk <= 10
        """,
        "simsearch_ivf": """
            WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS u FROM embeddings),
                 e AS (SELECT vec_id,
                              list_transform(u, x -> x / sqrt(list_dot_product(u, u))) AS v
                       FROM e0 WHERE list_dot_product(u, u) > 0),
                 b0 AS (SELECT vec_id, v,
                              (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END)
                            + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
                            + (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END)
                            + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END)
                            + (CASE WHEN v[5] > 0 THEN 16 ELSE 0 END)
                            + (CASE WHEN v[6] > 0 THEN 32 ELSE 0 END) AS bucket
                       FROM e),
                 b1 AS (SELECT vec_id, v,
                              (CASE WHEN v[7] > 0 THEN 1 ELSE 0 END)
                            + (CASE WHEN v[8] > 0 THEN 2 ELSE 0 END)
                            + (CASE WHEN v[9] > 0 THEN 4 ELSE 0 END)
                            + (CASE WHEN v[10] > 0 THEN 8 ELSE 0 END)
                            + (CASE WHEN v[11] > 0 THEN 16 ELSE 0 END)
                            + (CASE WHEN v[12] > 0 THEN 32 ELSE 0 END) AS bucket
                       FROM e),
                 q0 AS (SELECT vec_id AS query_id, v AS qv, bucket
                        FROM b0 WHERE vec_id < 20),
                 q1 AS (SELECT vec_id AS query_id, v AS qv, bucket
                        FROM b1 WHERE vec_id < 20),
                 cand AS (
                     SELECT q0.query_id, b0.vec_id, q0.qv, b0.v
                     FROM b0 JOIN q0 ON b0.bucket = q0.bucket
                     WHERE b0.vec_id != q0.query_id
                     UNION
                     SELECT q1.query_id, b1.vec_id, q1.qv, b1.v
                     FROM b1 JOIN q1 ON b1.bucket = q1.bucket
                     WHERE b1.vec_id != q1.query_id),
                 sims AS (
                     SELECT query_id, vec_id,
                            round(list_dot_product(qv, v), 5) AS cosine
                     FROM cand),
                 r AS (SELECT query_id, vec_id, cosine,
                              CAST(row_number() OVER (
                                  PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
                       FROM sims)
            SELECT query_id, vec_id, cosine, rnk FROM r WHERE rnk <= 3
        """,
        # recomputes the served-IVF search from the persisted codebook
        # parquet the query materializes at call time: squared-distance
        # argmin cell assignment (tie-break cid, matching the struct
        # ordering of array_min), 2-probe nearest cells per query,
        # cell-equality candidate join, cosine top-3. The distance sum
        # is a left fold in both engines (Spark F.aggregate; DuckDB
        # list_sum over the transformed zip), so assignment is
        # FP-identical.
        "embedding_clusters": f"""
            WITH cb AS (SELECT cid, CAST(centroid AS DOUBLE[]) AS c
                        FROM read_parquet('{_per_turn_path("/root/testdata/sf0.01")}_cb/*.parquet')),
                 e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS u
                        FROM embeddings),
                 e AS (SELECT vec_id,
                              list_transform(u,
                                  x -> x / sqrt(list_dot_product(u, u))) AS v
                       FROM e0 WHERE list_dot_product(u, u) > 0),
                 d AS (SELECT e.vec_id, cb.cid,
                              list_sum(list_transform(list_zip(e.v, cb.c),
                                  x -> (x[1] - x[2]) * (x[1] - x[2]))) AS dist
                       FROM e, cb),
                 dr AS (SELECT *, row_number() OVER (
                            PARTITION BY vec_id ORDER BY dist, cid) AS rn
                        FROM d),
                 assign AS (SELECT vec_id, cid AS cluster, dist
                            FROM dr WHERE rn = 1),
                 per AS (SELECT cluster,
                                CAST(count(*) AS BIGINT) AS n_vectors,
                                round(avg(dist), 6) AS avg_sq_dist
                         FROM assign GROUP BY cluster)
            SELECT cluster, n_vectors, avg_sq_dist,
                   round(CAST(n_vectors AS DOUBLE)
                         / CAST(sum(n_vectors) OVER () AS DOUBLE), 6)
                       AS share
            FROM per
        """,
        "simsearch_ivf_centroids": f"""
            WITH cb AS (SELECT cid, CAST(centroid AS DOUBLE[]) AS c
                        FROM read_parquet('{_per_turn_path("/root/testdata/sf0.01")}_cb/*.parquet')),
                 e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS u FROM embeddings),
                 e AS (SELECT vec_id,
                              list_transform(u, x -> x / sqrt(list_dot_product(u, u))) AS v
                       FROM e0 WHERE list_dot_product(u, u) > 0),
                 d AS (SELECT e.vec_id, e.v, cb.cid,
                              list_sum(list_transform(list_zip(e.v, cb.c),
                                  x -> (x[1] - x[2]) * (x[1] - x[2]))) AS dist
                       FROM e, cb),
                 dr AS (SELECT *, row_number() OVER (
                            PARTITION BY vec_id ORDER BY dist, cid) AS rn
                        FROM d),
                 assign AS (SELECT vec_id, v, cid AS cell FROM dr WHERE rn = 1),
                 qc AS (SELECT vec_id AS query_id, v AS qv, cid AS cell
                        FROM dr WHERE vec_id < 20 AND rn <= 2),
                 cand AS (SELECT qc.query_id, a.vec_id, qc.qv, a.v
                          FROM assign a JOIN qc ON a.cell = qc.cell
                          WHERE a.vec_id != qc.query_id),
                 sims AS (SELECT query_id, vec_id,
                                 round(list_dot_product(qv, v), 5) AS cosine
                          FROM cand),
                 r AS (SELECT query_id, vec_id, cosine,
                              CAST(row_number() OVER (
                                  PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
                       FROM sims)
            SELECT query_id, vec_id, cosine, rnk FROM r WHERE rnk <= 3
        """,
        "lang_id": f"""
            SELECT doc_id, s_en, s_es, s_de, s_fr, {lang_pred_case} AS lang_pred
            FROM (SELECT doc_id, {_lang_scores()} FROM documents)
        """,
        # fertility: exact BIGINT sums (CAST — DuckDB sum(BIGINT) is
        # HUGEINT), one round(x/y, 6) division per language row
        "tokenizer_fertility": (
            r"""
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(ws) AS BIGINT) AS ws_tokens,
                   CAST(sum(bp) AS BIGINT) AS bpeish_tokens,
                   CAST(sum(et) AS BIGINT) AS est_tokens,
                   round(CAST(sum(bp) AS BIGINT)
                         / CAST(sum(ws) AS BIGINT), 6) AS fertility,
                   round(CAST(sum(et) AS BIGINT)
                         / CAST(sum(ws) AS BIGINT), 6) AS est_fertility
            FROM (
                SELECT {LANG_PRED} AS lang,
                       CAST(len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS ws,
                       CAST((length(m) - length(replace(m, chr(1), '')))
                            + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS bp,
                       greatest(1, CAST(floor(length(text) / 4) AS BIGINT)) AS et
                FROM (SELECT doc_id, text,
                             regexp_replace(text, '[A-Za-z0-9]+', chr(1), 'g') AS m,
                             {SCORES}
                      FROM documents))
            GROUP BY lang
        """.replace("{LANG_PRED}", lang_pred_case)
            .replace("{SCORES}", _lang_scores())
        ),
        "text_quality": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_calc,
                   CAST(len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_words,
                   round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / NULLIF(length(text), 0), 6) AS punct_ratio,
                   round(length(regexp_replace(text, '[^0-9]', '', 'g')) / NULLIF(length(text), 0), 6) AS digit_ratio,
                   round(({en_hits}) / len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')), 6) AS stopword_ratio,
                   round((length(text) - len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) + 1)
                         / len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')), 6) AS avg_word_len
            FROM documents
        """.replace("{en_hits}", " + ".join(_hits(w) for w in _LANGS["en"])),
        "token_count": r"""
            SELECT doc_id,
                   CAST(len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS ws_tokens,
                   greatest(1, CAST(floor(length(text) / 4) AS BIGINT)) AS est_tokens,
                   CAST((length(m) - length(replace(m, chr(1), '')))
                        + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS bpeish_tokens
            FROM (SELECT doc_id, text,
                         regexp_replace(text, '[A-Za-z0-9]+', chr(1), 'g') AS m
                  FROM documents)
        """,
        "pack_sequences": """
            WITH d AS (
                SELECT doc_id,
                       CAST(doc_id % 16 AS INT) AS shard,
                       greatest(1, CAST(floor(length(text) / 4) AS BIGINT)) AS est_tokens
                FROM documents),
            c AS (
                SELECT *,
                       CAST(sum(est_tokens) OVER (
                           PARTITION BY shard ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM d)
            SELECT doc_id, shard, est_tokens,
                   cum - est_tokens AS start_tok,
                   CAST(floor((cum - est_tokens) / 4096) AS BIGINT) AS bin
            FROM c
        """,
        "fingerprint": r"""
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "doc_token_estimate": """
            SELECT doc_id,
                   greatest(1, CAST(floor(length(text) / 4) AS BIGINT)) AS est_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_calc
            FROM documents
        """,
        # the two corpus rollups are oracled against the per-turn parquet
        # the Spark query materializes at call time: DuckDB re-aggregates
        # the identical rows (the per-turn values themselves are gated by
        # the kernel-equality pytest)
        "extract_conversation_rollup": f"""
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(sum(bytes_in) AS BIGINT) AS bytes_in,
                   CAST(sum(CASE WHEN is_empty THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
                   CAST(sum(estimated_tokens) AS BIGINT) AS tokens,
                   max(quality_score) AS max_quality_score
            FROM read_parquet('{_per_turn_path("/root/testdata/sf0.01")}/*.parquet')
            GROUP BY conv_id
        """,
        # conversation dedup: DuckDB independently recomputes per-turn
        # md5 -> ordered block hash (SKEW_BLOCK=10000) -> conv
        # fingerprint -> min-keeper from the materialized cleaned text
        "dedup_conversations": f"""
            WITH src AS (
                SELECT conv_id, turn_idx, cleaned_text
                FROM read_parquet('{_per_turn_path("/root/testdata/sf0.01")}_dc/*.parquet')),
            planted AS (
                SELECT conv_id, turn_idx, cleaned_text FROM src
                UNION ALL
                SELECT conv_id || '~dup', turn_idx, cleaned_text FROM src
                WHERE substr(md5(conv_id), 1, 1) = '0'),
            per AS (
                SELECT conv_id, turn_idx,
                       md5(turn_idx::VARCHAR || ':'
                           || coalesce(cleaned_text, '')) AS h,
                       CAST(floor(turn_idx / 10000) AS BIGINT) AS blk
                FROM planted),
            blocks AS (
                SELECT conv_id, blk, count(*) AS n,
                       md5(string_agg(h, chr(1) ORDER BY turn_idx)) AS bh
                FROM per GROUP BY conv_id, blk),
            conv AS (
                SELECT conv_id, CAST(sum(n) AS BIGINT) AS n_turns,
                       md5(string_agg(bh, chr(1) ORDER BY blk)) AS conv_fp
                FROM blocks GROUP BY conv_id)
            SELECT conv_id, conv_fp, n_turns,
                   min(conv_id) OVER (PARTITION BY conv_fp) AS keep_conv_id,
                   conv_id = min(conv_id) OVER (PARTITION BY conv_fp)
                       AS is_keeper
            FROM conv
        """,
        # SFT windows: the contiguous-suffix fold is equivalent to
        # "count of reverse-cumulative sums within budget" because
        # tokens >= 1 makes the reverse cumsum strictly increasing —
        # DuckDB computes it that way (bounded self-join + window)
        "sft_examples": f"""
            WITH t AS (
                SELECT conv_id, turn_idx, role,
                       greatest(1, CAST(floor(
                           length(coalesce(cleaned_text, '')) / 4) AS BIGINT))
                           AS tokens
                FROM read_parquet('{_sft_synth_path()}/*.parquet')),
            tgt AS (SELECT * FROM t WHERE role = 'assistant'),
            pairs AS (
                SELECT g.conv_id, g.turn_idx AS target_idx,
                       c.turn_idx AS ctx_idx, c.tokens
                FROM tgt g JOIN t c ON c.conv_id = g.conv_id
                 AND c.turn_idx BETWEEN g.turn_idx - 16 AND g.turn_idx - 1),
            rc AS (
                SELECT *, sum(tokens) OVER (
                    PARTITION BY conv_id, target_idx ORDER BY ctx_idx DESC
                    ROWS UNBOUNDED PRECEDING) AS rcum
                FROM pairs),
            agg AS (
                SELECT conv_id, target_idx,
                       CAST(count(*) FILTER (WHERE rcum <= 256) AS INTEGER)
                           AS n_context_turns,
                       CAST(coalesce(max(rcum) FILTER (WHERE rcum <= 256), 0)
                            AS BIGINT) AS context_tokens
                FROM rc GROUP BY conv_id, target_idx)
            SELECT g.conv_id, g.turn_idx AS target_idx,
                   g.tokens AS target_tokens,
                   coalesce(a.n_context_turns, 0) AS n_context_turns,
                   coalesce(a.context_tokens, 0) AS context_tokens,
                   CAST(g.turn_idx - coalesce(a.n_context_turns, 0) AS INTEGER)
                       AS context_from_idx
            FROM tgt g LEFT JOIN agg a
              ON a.conv_id = g.conv_id AND a.target_idx = g.turn_idx
        """,
        # DPO pairs: same planted corpus as the conversation-dedup
        # twins; DuckDB recomputes block-hashed response fingerprints,
        # prompt hashes, and both rank windows independently
        "preference_pairs": _preference_pairs_oracle(),
        # retry-tree prefixes: cumulative windowed string_agg replays
        # the Spark side's positional slice hashes exactly
        "conversation_branches": _conversation_branches_oracle(),
        # the transcript pipeline: DuckDB re-runs the full chain —
        # planted dups -> fingerprint dedup -> token/empty gate ->
        # per-shard running-offset packing — from the same parquet
        "transcript_prepare": f"""
            WITH src AS (
                SELECT conv_id, turn_idx, cleaned_text
                FROM read_parquet('{_per_turn_path("/root/testdata/sf0.01")}_dc/*.parquet')),
            planted AS (
                SELECT conv_id, turn_idx, cleaned_text FROM src
                UNION ALL
                SELECT conv_id || '~dup', turn_idx, cleaned_text FROM src
                WHERE substr(md5(conv_id), 1, 1) = '0'),
            per AS (
                SELECT conv_id, turn_idx,
                       md5(turn_idx::VARCHAR || ':'
                           || coalesce(cleaned_text, '')) AS h,
                       CAST(floor(turn_idx / 10000) AS BIGINT) AS blk,
                       greatest(1, CAST(floor(
                           length(coalesce(cleaned_text, '')) / 4) AS BIGINT))
                           AS et,
                       CASE WHEN coalesce(cleaned_text, '') = ''
                            THEN 1 ELSE 0 END AS emp
                FROM planted),
            blocks AS (
                SELECT conv_id, blk, count(*) AS n, sum(et) AS et,
                       sum(emp) AS emp,
                       md5(string_agg(h, chr(1) ORDER BY turn_idx)) AS bh
                FROM per GROUP BY conv_id, blk),
            conv AS (
                SELECT conv_id, sum(n) AS n_turns,
                       CAST(sum(et) AS BIGINT) AS est_tokens,
                       sum(emp) AS n_empty,
                       md5(string_agg(bh, chr(1) ORDER BY blk)) AS conv_fp
                FROM blocks GROUP BY conv_id),
            keepers AS (
                SELECT conv_id, est_tokens FROM (
                    SELECT conv_id, est_tokens, n_turns, n_empty,
                           conv_id = min(conv_id) OVER (PARTITION BY conv_fp)
                               AS is_keeper
                    FROM conv)
                WHERE is_keeper AND est_tokens >= 64
                      AND n_empty / n_turns <= 0.5),
            sharded AS (
                SELECT conv_id,
                       CAST(('0x' || substr(md5(conv_id), 1, 15))::BIGINT % 16
                            AS INTEGER) AS shard,
                       est_tokens
                FROM keepers),
            packed AS (
                -- CAST: window sum(BIGINT) is HUGEINT in DuckDB/Arrow but
                -- bigint in Spark — cast so the driver's type-sensitive
                -- value-hash matches (see _transcript_curate_oracle).
                SELECT conv_id, shard, est_tokens,
                       CAST(sum(est_tokens) OVER (
                           PARTITION BY shard ORDER BY conv_id
                           ROWS UNBOUNDED PRECEDING) - est_tokens
                           AS BIGINT) AS start_tok
                FROM sharded)
            SELECT conv_id, shard, est_tokens, start_tok,
                   CAST(floor(start_tok / 4096) AS BIGINT) AS bin
            FROM packed
        """,
        "extract_spans_consistency": f"""
            WITH t AS (
                SELECT conv_id,
                       CAST(sum(n_chunks) AS BIGINT) AS chunks_sum,
                       CAST(count(*) AS BIGINT) AS n_turns
                FROM read_parquet('{_per_turn_path("/root/testdata/sf0.01")}/*.parquet')
                GROUP BY conv_id),
            s AS (
                SELECT conv_id,
                       CAST(count(pos) AS BIGINT) AS spans_sum,
                       CAST(sum(span_tokens) AS BIGINT) AS span_tokens_sum
                FROM read_parquet('{_per_turn_path("/root/testdata/sf0.01")}_spans/*.parquet')
                GROUP BY conv_id)
            SELECT t.conv_id, n_turns, chunks_sum, spans_sum,
                   span_tokens_sum,
                   (chunks_sum = spans_sum) AS consistent
            FROM t JOIN s ON t.conv_id = s.conv_id
        """,
        "extract_quality_drift": f"""
            WITH t AS (
                SELECT *, CAST(floor(epoch(ts) / 604800) AS BIGINT) * 604800 AS ws
                FROM read_parquet('{_per_turn_path("/root/testdata/sf0.01")}/*.parquet')
                WHERE ts IS NOT NULL)
            SELECT ws AS window_start_s,
                   ws + 604800 AS window_end_s,
                   quality_bucket,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   round(avg(quality_score), 3) AS avg_quality,
                   round(avg(CASE WHEN is_empty THEN 1.0 ELSE 0.0 END), 6) AS empty_rate,
                   round(avg(overall_confidence), 4) AS avg_confidence,
                   CAST(sum(bytes_in) AS BIGINT) AS bytes_in
            FROM t GROUP BY ws, quality_bucket
        """,
        # agent-trajectory analytics: DuckDB recomputes each from the
        # materialized raw synthetic turns (same rows Spark consumes)
        "agent_tool_stats": f"""
            WITH t AS (
                SELECT * FROM read_parquet('{_agent_synth_path()}/*.parquet')),
            calls AS (
                SELECT tool, conv_id,
                       length(coalesce(text, '')) AS tl
                FROM t WHERE tool IS NOT NULL),
            per AS (
                SELECT tool,
                       CAST(count(*) AS BIGINT) AS n_calls,
                       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
                       CAST(sum(tl) AS BIGINT) AS text_len
                FROM calls GROUP BY tool)
            SELECT tool, n_calls, n_convs,
                   round(CAST(text_len AS DOUBLE) / n_calls, 4)
                       AS avg_text_len,
                   round(CAST(n_calls AS DOUBLE)
                         / CAST(sum(n_calls) OVER () AS DOUBLE), 6)
                       AS call_share
            FROM per
        """,
        "agent_tool_transitions": f"""
            WITH calls AS (
                SELECT conv_id, turn_idx, ts, tool
                FROM read_parquet('{_agent_synth_path()}/*.parquet')
                WHERE tool IS NOT NULL),
            seq AS (
                SELECT coalesce(
                           lag(tool) OVER (
                               PARTITION BY conv_id ORDER BY turn_idx, ts),
                           '<START>') AS prev_tool,
                       tool
                FROM calls)
            SELECT prev_tool, tool,
                   CAST(count(*) AS BIGINT) AS n,
                   round(CAST(count(*) AS DOUBLE)
                         / CAST(sum(count(*)) OVER (
                               PARTITION BY prev_tool) AS DOUBLE), 6) AS p
            FROM seq GROUP BY prev_tool, tool
        """,
        "agent_loop_detect": f"""
            WITH src AS (
                SELECT conv_id, turn_idx, ts, role, tool, text
                FROM read_parquet('{_agent_synth_path()}/*.parquet')),
            planted AS (
                SELECT conv_id, turn_idx, ts, role, tool, text FROM src
                UNION ALL
                SELECT conv_id || '~loop', turn_idx * 4 + r.r, ts,
                       role, tool, text
                FROM src CROSS JOIN (VALUES (0), (1), (2)) AS r(r)
                WHERE substr(md5(conv_id), 1, 1) = '1'),
            sigd AS (
                -- same action signature Spark hashes: role/tool/text
                -- joined with the 0x1f unit separator
                SELECT conv_id, turn_idx, ts,
                       md5(coalesce(role, '') || chr(31)
                           || coalesce(tool, '') || chr(31)
                           || coalesce(text, '')) AS sig
                FROM planted),
            rn AS (
                SELECT conv_id, sig,
                       row_number() OVER (
                           PARTITION BY conv_id
                           ORDER BY turn_idx, ts) AS rn,
                       row_number() OVER (
                           PARTITION BY conv_id, sig
                           ORDER BY turn_idx, ts) AS rs
                FROM sigd),
            runs AS (
                SELECT conv_id, sig, rn - rs AS grp,
                       count(*) AS run_len,
                       min(rn) AS run_start
                FROM rn GROUP BY conv_id, sig, rn - rs)
            SELECT conv_id,
                   CAST(sum(run_len) AS BIGINT) AS n_turns,
                   CAST(max(run_len) AS BIGINT) AS max_run,
                   CAST(sum(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_loops,
                   CAST(sum(CASE WHEN run_len >= 3 THEN run_len ELSE 0 END)
                        AS BIGINT) AS n_loop_turns,
                   CAST(min(CASE WHEN run_len >= 3 THEN run_start END)
                        AS BIGINT) AS first_loop_at,
                   max(run_len) >= 3 AS is_looping
            FROM runs GROUP BY conv_id
        """,
        "canned_responses": f"""
            WITH src AS (
                SELECT conv_id, role, text
                FROM read_parquet('{_agent_synth_path()}/*.parquet')),
            planted AS (
                SELECT conv_id, role, text FROM src
                UNION ALL
                SELECT DISTINCT conv_id, 'assistant',
                       '{_CANNED_TEXT}'
                FROM src WHERE substr(md5(conv_id), 1, 1) = '2'),
            base AS (
                SELECT md5(coalesce(text, '')) AS h, conv_id,
                       substr(coalesce(text, ''), 1, 80) AS preview
                FROM planted WHERE role = 'assistant'),
            per_conv AS (
                SELECT h, conv_id,
                       count(*) AS n, min(preview) AS preview
                FROM base GROUP BY h, conv_id)
            SELECT min(preview) AS preview,
                   CAST(count(*) AS BIGINT) AS n_convs,
                   CAST(sum(n) AS BIGINT) AS n_uses
            FROM per_conv GROUP BY h
            HAVING count(*) >= 3
        """,
        "context_fit": f"""
            WITH cum AS (
                SELECT conv_id,
                       CAST(floor(length(coalesce(text, '')) / 4) + 1
                            AS BIGINT) AS est,
                       CAST(sum(CAST(floor(length(coalesce(text, '')) / 4)
                                     + 1 AS BIGINT)) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx, ts
                           ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum
                FROM read_parquet('{_agent_synth_path()}/*.parquet'))
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(sum(est) AS BIGINT) AS total_tokens,
                   CAST(sum(CASE WHEN cum <= 512 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_turns_fit,
                   CAST(coalesce(max(CASE WHEN cum <= 512 THEN cum END), 0)
                        AS BIGINT) AS tokens_fit,
                   max(cum) <= 512 AS fits
            FROM cum GROUP BY conv_id
        """,
        "tool_latency": f"""
            WITH g AS (
                SELECT role, tool, conv_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx, ts)
                           AS gap_us
                FROM read_parquet('{_agent_synth_path()}/*.parquet')),
            calls AS (
                SELECT tool, conv_id, gap_us FROM g
                WHERE role = 'tool' AND tool IS NOT NULL
                  AND gap_us IS NOT NULL),
            per_conv AS (
                SELECT tool, conv_id,
                       count(*) AS n,
                       sum(gap_us) AS s,
                       max(gap_us) AS mx
                FROM calls GROUP BY tool, conv_id)
            SELECT tool,
                   CAST(sum(n) AS BIGINT) AS n_results,
                   round(CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
                         / 1e6, 6) AS avg_latency_s,
                   round(CAST(max(mx) AS DOUBLE) / 1e6, 6)
                       AS max_latency_s
            FROM per_conv GROUP BY tool
        """,
        "refusal_detect": f"""
            WITH src AS (
                SELECT conv_id, turn_idx, role, text
                FROM read_parquet('{_agent_synth_path()}/*.parquet')),
            planted AS (
                SELECT conv_id, turn_idx, role, text FROM src
                UNION ALL
                SELECT DISTINCT conv_id, 9999, 'assistant',
                       '{_CANNED_TEXT}'
                FROM src WHERE substr(md5(conv_id), 1, 1) = '3'),
            low AS (
                SELECT conv_id, turn_idx,
                       lower(coalesce(text, '')) AS low
                FROM planted WHERE role = 'assistant'),
            b AS (
                SELECT conv_id, turn_idx,
                       CASE WHEN {refusal_cond} THEN 1 ELSE 0 END
                           AS is_refusal
                FROM low)
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns_scanned,
                   CAST(sum(is_refusal) AS BIGINT) AS n_refusals,
                   round(CAST(sum(is_refusal) AS DOUBLE) / count(*), 6)
                       AS refusal_rate,
                   CAST(min(CASE WHEN is_refusal = 1 THEN turn_idx END)
                        AS BIGINT) AS first_refusal_idx,
                   sum(is_refusal) > 0 AS has_refusal
            FROM b GROUP BY conv_id
        """,
        "truncation_detect": f"""
            WITH src AS (
                SELECT conv_id, role, text
                FROM read_parquet('{_agent_synth_path()}/*.parquet')),
            planted AS (
                SELECT conv_id, role, text FROM src
                UNION ALL
                SELECT DISTINCT conv_id, 'assistant',
                       '{_TRUNC_ELLIPSIS_TEXT}'
                FROM src WHERE substr(md5(conv_id), 1, 1) = '4'
                UNION ALL
                SELECT DISTINCT conv_id, 'assistant',
                       '{_TRUNC_FENCE_TEXT}'
                FROM src WHERE substr(md5(conv_id), 1, 1) = '4'),
            f AS (
                SELECT conv_id,
                       rtrim(coalesce(text, '')) AS tr,
                       coalesce(text, '') AS t
                FROM planted WHERE role = 'assistant'),
            b AS (
                SELECT conv_id,
                       CASE WHEN length(tr) > 0 AND right(tr, 1) NOT IN
                                ('.', '!', '?', '"', '''', ')', ']',
                                 '}}', '>')
                            THEN 1 ELSE 0 END AS mid_cut,
                       CASE WHEN ((length(t)
                                   - length(replace(t, '```', ''))) // 3)
                                 % 2 = 1
                            THEN 1 ELSE 0 END AS is_fence,
                       CASE WHEN right(tr, 3) = '...' THEN 1 ELSE 0 END
                           AS is_ellipsis
                FROM f)
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns_scanned,
                   CAST(sum(CASE WHEN mid_cut = 1 OR is_fence = 1
                                      OR is_ellipsis = 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_truncated,
                   CAST(sum(is_fence) AS BIGINT) AS n_fence_broken,
                   CAST(sum(is_ellipsis) AS BIGINT) AS n_ellipsis,
                   round(CAST(sum(CASE WHEN mid_cut = 1 OR is_fence = 1
                                            OR is_ellipsis = 1
                                       THEN 1 ELSE 0 END) AS DOUBLE)
                         / count(*), 6) AS trunc_rate,
                   sum(CASE WHEN mid_cut = 1 OR is_fence = 1
                                 OR is_ellipsis = 1
                            THEN 1 ELSE 0 END) > 0 AS has_truncation
            FROM b GROUP BY conv_id
        """,
        "assistant_echo": f"""
            WITH src AS (
                SELECT conv_id, turn_idx, ts, role, text
                FROM read_parquet('{_agent_synth_path()}/*.parquet')),
            planted AS (
                SELECT conv_id, turn_idx, ts, role, text FROM src
                UNION ALL
                SELECT DISTINCT conv_id, 9998,
                       TIMESTAMP '2025-01-01 00:00:00', 'user',
                       '{_ECHO_USER_TEXT}'
                FROM src WHERE substr(md5(conv_id), 1, 1) = '5'
                UNION ALL
                SELECT DISTINCT conv_id, 9999,
                       TIMESTAMP '2025-01-01 00:00:00', 'assistant',
                       '{_ECHO_ASSISTANT_TEXT}'
                FROM src WHERE substr(md5(conv_id), 1, 1) = '5'),
            wrd AS (
                SELECT conv_id, turn_idx, ts, role,
                       string_split(regexp_replace(
                           lower(coalesce(text, '')), '\\s+', ' ', 'g'),
                           ' ') AS w
                FROM planted),
            g AS (
                SELECT conv_id, turn_idx, ts, role,
                       CASE WHEN len(w) >= 5 THEN
                           list_distinct(list_transform(
                               range(1, len(w) - 3),
                               i -> w[i] || ' ' || w[i+1] || ' '
                                    || w[i+2] || ' ' || w[i+3] || ' '
                                    || w[i+4]))
                       ELSE CAST([] AS VARCHAR[]) END AS grams
                FROM wrd),
            p AS (
                SELECT conv_id, role, grams,
                       lag(role) OVER win AS prev_role,
                       lag(grams) OVER win AS prev_grams
                FROM g
                WINDOW win AS (
                    PARTITION BY conv_id ORDER BY turn_idx, ts)),
            pairs AS (
                SELECT conv_id,
                       len(grams) AS ng,
                       len(list_intersect(grams, prev_grams)) AS nm
                FROM p
                WHERE role = 'assistant' AND prev_role = 'user'
                  AND len(grams) > 0)
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(ng) AS BIGINT) AS n_grams,
                   CAST(sum(nm) AS BIGINT) AS n_echoed,
                   round(CAST(sum(nm) AS DOUBLE)
                         / CAST(sum(ng) AS DOUBLE), 6) AS echo_rate,
                   round(max(CAST(nm AS DOUBLE) / CAST(ng AS DOUBLE)), 6)
                       AS max_echo,
                   CAST(sum(CASE WHEN CAST(nm AS DOUBLE)
                                      / CAST(ng AS DOUBLE) >= 0.5
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_high_echo,
                   sum(nm) > 0 AS has_echo
            FROM pairs GROUP BY conv_id
        """,
        "turn_integrity": f"""
            WITH src AS (
                SELECT conv_id, turn_idx, ts
                FROM read_parquet('{_agent_synth_path()}/*.parquet')),
            planted AS (
                SELECT conv_id, turn_idx, ts FROM src
                UNION ALL
                SELECT DISTINCT conv_id, 9998,
                       TIMESTAMP '2026-06-01 00:00:01'
                FROM src WHERE substr(md5(conv_id), 1, 1) = '6'
                UNION ALL
                SELECT DISTINCT conv_id, 9998,
                       TIMESTAMP '2026-06-01 00:00:02'
                FROM src WHERE substr(md5(conv_id), 1, 1) = '6'
                UNION ALL
                SELECT DISTINCT conv_id, 9999,
                       TIMESTAMP '2025-01-01 00:00:00'
                FROM src WHERE substr(md5(conv_id), 1, 1) = '6'),
            g AS (
                SELECT conv_id, turn_idx,
                       lag(turn_idx) OVER win AS prev_idx,
                       epoch_us(ts) < lag(epoch_us(ts)) OVER win
                           AS ts_regress
                FROM planted
                WINDOW win AS (
                    PARTITION BY conv_id
                    ORDER BY turn_idx, epoch_us(ts))),
            agg AS (
                SELECT conv_id,
                       CAST(count(*) AS BIGINT) AS n_turns,
                       CAST(coalesce(sum(CASE WHEN turn_idx = prev_idx
                                              THEN 1 END), 0) AS BIGINT)
                           AS n_dup_idx,
                       CAST(coalesce(sum(CASE WHEN turn_idx > prev_idx + 1
                                              THEN 1 END), 0) AS BIGINT)
                           AS n_gaps,
                       CAST(coalesce(sum(CASE WHEN ts_regress
                                              THEN 1 END), 0) AS BIGINT)
                           AS n_ts_regressions,
                       min(turn_idx) = 0 AS starts_at_zero,
                       max(turn_idx) AS max_idx
                FROM g GROUP BY conv_id)
            SELECT conv_id, n_turns, n_dup_idx, n_gaps,
                   n_ts_regressions, starts_at_zero,
                   CAST(max_idx + 1 - (n_turns - n_dup_idx) AS BIGINT)
                       AS n_missing,
                   starts_at_zero AND n_dup_idx = 0 AND n_gaps = 0
                       AND n_ts_regressions = 0 AS is_intact
            FROM agg
        """,
        "conversation_timing": f"""
            WITH g AS (
                SELECT conv_id,
                       epoch_us(ts) AS us,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx, ts)
                           AS gap_us
                FROM read_parquet('{_agent_synth_path()}/*.parquet'))
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   round(CAST(max(us) - min(us) AS DOUBLE) / 1e6, 6)
                       AS duration_s,
                   round(CAST(sum(gap_us) AS DOUBLE)
                         / count(gap_us) / 1e6, 6) AS avg_gap_s,
                   round(CAST(max(gap_us) AS DOUBLE) / 1e6, 6) AS max_gap_s
            FROM g GROUP BY conv_id
        """,
        "mix_transcripts": f"""
            WITH per_turn AS (
                SELECT conv_id, coalesce(cleaned_text, '') AS text
                FROM read_parquet('{_sft_synth_path()}/*.parquet')),
            scored AS (
                SELECT conv_id, {_lang_scores()} FROM per_turn),
            agg AS (
                SELECT conv_id,
                       CAST(sum(s_en) AS BIGINT) AS s_en,
                       CAST(sum(s_es) AS BIGINT) AS s_es,
                       CAST(sum(s_de) AS BIGINT) AS s_de,
                       CAST(sum(s_fr) AS BIGINT) AS s_fr
                FROM scored GROUP BY conv_id),
            langs AS (
                SELECT conv_id, {lang_pred_case} AS lang_pred FROM agg),
            shares AS (SELECT lang_pred, count(*) AS n FROM langs
                       GROUP BY lang_pred),
            -- (0.7::DOUBLE - 1.0::DOUBLE): IEEE-subtract the same
            -- doubles Python's (alpha - 1.0) does
            r AS (SELECT lang_pred,
                         pow(n::DOUBLE, 0.7::DOUBLE - 1.0::DOUBLE)
                         / (SELECT max(pow(n::DOUBLE,
                                           0.7::DOUBLE - 1.0::DOUBLE))
                            FROM shares) AS rate
                  FROM shares),
            uu AS (
                SELECT conv_id, lang_pred,
                       ('0x' || substr(md5(conv_id || ':tmix-v1'), 1, 15))::BIGINT
                       / 1152921504606846976.0 AS u
                FROM langs)
            SELECT uu.conv_id, uu.lang_pred,
                   round(r.rate, 6) AS rate, round(uu.u, 6) AS u
            FROM uu JOIN r USING (lang_pred)
            WHERE uu.u < r.rate
        """,
        "transcript_stats": f"""
            WITH per_conv AS (
                SELECT conv_id,
                       count(*) AS nt,
                       sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END)
                           AS tc,
                       sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                           AS us,
                       sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                           AS asst
                FROM read_parquet('{_agent_synth_path()}/*.parquet')
                GROUP BY conv_id)
            SELECT CAST(count(*) AS BIGINT) AS n_convs,
                   CAST(sum(nt) AS BIGINT) AS n_turns,
                   round(avg(nt), 6) AS avg_turns,
                   round(quantile_cont(nt, 0.5), 6) AS p50_turns,
                   round(quantile_cont(nt, 0.9), 6) AS p90_turns,
                   CAST(max(nt) AS BIGINT) AS max_turns,
                   round(CAST(sum(tc) AS DOUBLE) / sum(nt), 6)
                       AS tool_call_rate,
                   round(CAST(sum(us) AS DOUBLE) / sum(nt), 6)
                       AS user_share,
                   round(CAST(sum(asst) AS DOUBLE) / sum(nt), 6)
                       AS assistant_share
            FROM per_conv
        """,
        "conversation_language": f"""
            WITH per_turn AS (
                SELECT conv_id, coalesce(cleaned_text, '') AS text
                FROM read_parquet('{_sft_synth_path()}/*.parquet')),
            scored AS (
                SELECT conv_id, {_lang_scores()} FROM per_turn),
            agg AS (
                SELECT conv_id,
                       CAST(sum(s_en) AS BIGINT) AS s_en,
                       CAST(sum(s_es) AS BIGINT) AS s_es,
                       CAST(sum(s_de) AS BIGINT) AS s_de,
                       CAST(sum(s_fr) AS BIGINT) AS s_fr
                FROM scored GROUP BY conv_id)
            SELECT conv_id, s_en, s_es, s_de, s_fr,
                   {lang_pred_case} AS lang_pred
            FROM agg
        """,
        "conversation_wellformed": f"""
            WITH src AS (
                SELECT conv_id, turn_idx, ts, role, tool
                FROM read_parquet('{_agent_synth_path()}/*.parquet')),
            planted AS (
                SELECT conv_id, turn_idx, ts, role, tool FROM src
                UNION ALL
                SELECT conv_id || '~bad', turn_idx, ts, 'assistant', tool
                FROM src WHERE substr(md5(conv_id), 1, 1) = '0'),
            flagged AS (
                -- ORDER BY (turn_idx, ts) mirrors the Spark _w_conv window
                -- exactly: duplicate turn_idx values with different roles
                -- must lag in the same order on both engines
                SELECT conv_id, turn_idx, role,
                       (lag(role) OVER (
                            PARTITION BY conv_id ORDER BY turn_idx, ts)
                        = role) AS same_role,
                       (role = 'tool' AND tool IS NULL) AS tool_missing
                FROM planted)
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(sum(CASE WHEN same_role THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_role_repeats,
                   CAST(sum(CASE WHEN tool_missing THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tool_missing,
                   arg_min(role, turn_idx) = 'user' AS starts_with_user,
                   (arg_min(role, turn_idx) = 'user'
                    AND sum(CASE WHEN same_role THEN 1 ELSE 0 END) = 0
                    AND sum(CASE WHEN tool_missing THEN 1 ELSE 0 END) = 0)
                       AS is_wellformed
            FROM flagged GROUP BY conv_id
        """,
        # distributed BPE trainer: the finite merge loop unrolls into
        # generated CTEs (one pair-count + argmax + replace block per
        # merge), so even this iterative algorithm gets a full oracle
        "bpe_train": _bpe_oracle(8, 2000),
        # map-only tokenizer twin: merges recomputed via the same CTEs,
        # applied through a cross-joined single-row pattern table
        "bpe_tokenize": _bpe_tokenize_oracle(8, 2000, 8),
        "event_funnel": """
            WITH s0 AS (
                SELECT user_id, event_type, ts,
                       min(CASE WHEN event_type = 'view' THEN ts END)
                           OVER (PARTITION BY user_id) AS t0
                FROM events),
            s1 AS (
                SELECT *, min(CASE WHEN event_type = 'click'
                                    AND ts > t0 THEN ts END)
                              OVER (PARTITION BY user_id) AS t1
                FROM s0),
            s2 AS (
                SELECT *, min(CASE WHEN event_type = 'purchase'
                                    AND ts > t1 THEN ts END)
                              OVER (PARTITION BY user_id) AS t2
                FROM s1),
            pu AS (SELECT DISTINCT user_id, t0, t1, t2 FROM s2),
            c AS (SELECT CAST(count(t0) AS BIGINT) AS c0,
                         CAST(count(t1) AS BIGINT) AS c1,
                         CAST(count(t2) AS BIGINT) AS c2 FROM pu)
            SELECT 0 AS step_idx, 'view' AS step, c0 AS users,
                   round(CAST(c0 AS DOUBLE) / c0, 6) AS conv_from_prev,
                   round(CAST(c0 AS DOUBLE) / c0, 6) AS conv_from_first
            FROM c
            UNION ALL
            SELECT 1, 'click', c1,
                   round(CAST(c1 AS DOUBLE) / c0, 6),
                   round(CAST(c1 AS DOUBLE) / c0, 6) FROM c
            UNION ALL
            SELECT 2, 'purchase', c2,
                   round(CAST(c2 AS DOUBLE) / c1, 6),
                   round(CAST(c2 AS DOUBLE) / c0, 6) FROM c
        """,
        "retention_cohorts": """
            WITH ev AS (
                SELECT user_id, epoch_us(ts) AS us FROM events),
            fw AS (
                SELECT user_id,
                       CAST(floor(min(us) / 604800000000) AS BIGINT)
                           AS cohort_week
                FROM ev GROUP BY user_id),
            active AS (
                SELECT DISTINCT user_id,
                       CAST(floor(us / 604800000000) AS BIGINT) AS week
                FROM ev),
            cohort AS (
                SELECT cohort_week, week - cohort_week AS week_offset,
                       CAST(count(*) AS BIGINT) AS users
                FROM active JOIN fw USING (user_id)
                GROUP BY 1, 2)
            SELECT cohort_week, week_offset, users,
                   round(CAST(users AS DOUBLE)
                         / CAST(max(CASE WHEN week_offset = 0
                                    THEN users END) OVER (
                                    PARTITION BY cohort_week)
                                AS DOUBLE), 6) AS retention
            FROM cohort
        """,
        "embedding_quantize": """
            WITH e AS (
                SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE)) AS vec
                FROM embeddings),
            s AS (
                SELECT vec_id, vec,
                       list_max(list_transform(vec, x -> abs(x)))
                           AS scale
                FROM e),
            c AS (
                SELECT vec_id, vec, scale,
                       list_transform(vec, x -> CAST(
                           CASE WHEN scale > 0
                                THEN round(x * 127 / scale, 0)
                                ELSE 0.0 END AS INTEGER)) AS codes
                FROM s)
            SELECT vec_id,
                   round(scale, 6) AS scale,
                   array_to_string(list_transform(codes[1:4],
                       x -> CAST(x AS VARCHAR)), ',') AS codes_preview,
                   round(list_max(list_transform(list_zip(vec, codes),
                       z -> abs(z[1] - CASE WHEN scale > 0
                                 THEN CAST(z[2] AS DOUBLE) * scale / 127
                                 ELSE 0.0 END))), 6) AS max_abs_err
            FROM c
        """,
        "source_scorecard": """
            WITH planted AS (
                SELECT source, text FROM documents
                UNION ALL
                SELECT source, text FROM documents
                WHERE substr(md5(text), 1, 1) = '0'),
            pt AS (
                SELECT source, md5(text) AS h,
                       greatest(1, CAST(floor(length(text) / 4)
                                        AS BIGINT)) AS tok
                FROM planted),
            g1 AS (
                SELECT source, h, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(tok) AS BIGINT) AS tok
                FROM pt GROUP BY 1, 2),
            g2 AS (
                SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
                       CAST(count(*) AS BIGINT) AS n_unique,
                       CAST(sum(tok) AS BIGINT) AS tokens
                FROM g1 GROUP BY 1)
            SELECT source, n_docs, n_unique,
                   round(1 - CAST(n_unique AS DOUBLE) / n_docs, 6)
                       AS dup_rate,
                   tokens,
                   round(CAST(tokens AS DOUBLE) / n_docs, 4)
                       AS avg_doc_tokens,
                   round(CAST(tokens AS DOUBLE)
                         / CAST(sum(tokens) OVER () AS DOUBLE), 6)
                       AS token_share
            FROM g2
        """,
        # extract_turns_scalar / extract_spans: intentionally no oracle
        # — kernel-backed whole-document Python semantics (rows-only
        # check); their correctness gate is the per-turn oracle-equality
        # pytest, and their corpus-level distributions are cross-checked
        # by extract_spans_consistency / extract_conversation_rollup.
    }
