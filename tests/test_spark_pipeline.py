"""Spark-side gate: per-turn equality vs the single-node oracle under
stable (conv_id, turn_idx, ts) ordering (the north rule), salted-skew
partitioning sanity, native==kernel expression parity, checkpoint
resume, and parallelism-invariance of the synthesizer."""

import json

import pytest
from pyspark.sql import functions as F

from engine.kernel.transcript import extract_turn
from engine.spark.pipeline import (
    conversation_rollup,
    part_expr,
    run_extraction,
    with_stable_order,
)
from engine.spark.transcripts import synthesize_transcripts

N_CONVS = 24
SCALE_TURNS = 4


@pytest.fixture(scope="module")
def transcripts(spark):
    return synthesize_transcripts(spark, N_CONVS, SCALE_TURNS, parallelism=4).persist()


@pytest.fixture(scope="module")
def results(spark, transcripts):
    return run_extraction(transcripts, num_partitions=8).persist()


def test_per_turn_equality_vs_oracle(transcripts, results):
    """THE gate: Spark output == kernel oracle, keyed by stable order."""
    inputs = {
        (r.conv_id, r.turn_idx): r.text
        for r in transcripts.select("conv_id", "turn_idx", "text").collect()
    }
    got = results.select(
        "conv_id", "turn_idx", "cleaned_text", "spans", "doc_type",
        "fields_json", "overall_confidence", "n_chunks",
    ).collect()
    assert len(got) == len(inputs)
    mismatches = 0
    for row in got:
        oracle = extract_turn(inputs[(row.conv_id, row.turn_idx)])
        assert row.cleaned_text == oracle["cleaned_text"], (row.conv_id, row.turn_idx)
        spark_spans = [
            # bracket access: Row.index shadows the namedtuple method
            (s["content"], s["index"], s["start_char"], s["end_char"], s["estimated_tokens"])
            for s in row.spans
        ]
        oracle_spans = [
            (s["content"], s["index"], s["start_char"], s["end_char"], s["estimated_tokens"])
            for s in oracle["spans"]
        ]
        assert spark_spans == oracle_spans
        assert row.doc_type == oracle["doc_type"]
        assert json.loads(row.fields_json) == json.loads(oracle["fields_json"])
        assert row.overall_confidence == pytest.approx(oracle["overall_confidence"])
    assert mismatches == 0


def test_stable_ordering_window(transcripts):
    ordered = with_stable_order(transcripts)
    rows = ordered.filter(F.col("conv_id") == "conv-000000001").orderBy("turn_seq").collect()
    assert [r.turn_seq for r in rows] == list(range(1, len(rows) + 1))
    assert [r.turn_idx for r in rows] == sorted(r.turn_idx for r in rows)


def test_salted_partitioning_splits_mega_thread(spark, transcripts):
    # conv index 0 is the mega-thread; with a small skew block it must
    # span multiple partitions
    parts = (
        transcripts.filter(F.col("conv_id") == "conv-000000000")
        .withColumn("p", part_expr(8, skew_block=16))
        .select("p").distinct().count()
    )
    assert parts > 1
    # and the partition id is a pure function of the key (stable on recompute)
    a = transcripts.withColumn("p", part_expr(8)).groupBy("p").count().collect()
    b = transcripts.withColumn("p", part_expr(8)).groupBy("p").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_native_expressions_match_kernel(results):
    # T7 parity: native greatest(1, floor(len/4)) == kernel estimated_tokens
    bad = results.filter(
        (F.col("cleaned_length") > 0)
        & (F.col("estimated_tokens_native") != F.col("estimated_tokens"))
    ).count()
    assert bad == 0
    # span token sum equals aggregate over kernel spans
    bad2 = results.filter(
        F.col("span_token_sum")
        != F.aggregate("spans", F.lit(0), lambda a, s: a + s["estimated_tokens"])
    ).count()
    assert bad2 == 0


def test_synthesizer_parallelism_invariant(spark):
    """Same table at 1 and 4 partitions — partitioning must not leak
    into content (the property that makes N vs 4N scaling comparable)."""
    a = synthesize_transcripts(spark, 6, 3, parallelism=1)
    b = synthesize_transcripts(spark, 6, 3, parallelism=4)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0


def test_conversation_rollup_counts(transcripts, results):
    roll = {r.conv_id: r for r in conversation_rollup(results).collect()}
    truth = {
        r.conv_id: r["count"]
        for r in transcripts.groupBy("conv_id").count().collect()
    }
    assert {k: v.n_turns for k, v in roll.items()} == truth
    assert all(v.bytes_in > 0 for v in roll.values())


def test_checkpointed_job_survives_static_overwrite_conf(spark, transcripts, tmp_path_factory):
    """Regression: a vanilla spark-submit session defaults to STATIC
    partitionOverwriteMode, which made each slice commit wipe previous
    slices (caught driving jobs/extract_job.py). run_checkpointed must
    force dynamic mode itself."""
    from engine.spark.job import run_checkpointed

    out = str(tmp_path_factory.mktemp("static_conf"))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        res = run_checkpointed(spark, transcripts, out, num_partitions=8)
        assert res.count() == transcripts.count()
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_shuffled_input_same_results_under_stable_order(spark):
    """FIXTURES §1: rows arrive in scattered order — results keyed by
    (conv_id, turn_idx) must be identical to the ordered run."""
    ordered = synthesize_transcripts(spark, 8, 3, parallelism=2)
    shuffled = synthesize_transcripts(spark, 8, 3, parallelism=2, shuffle_rows=True)
    a = {
        (r.conv_id, r.turn_idx): r.cleaned_text
        for r in run_extraction(ordered, num_partitions=4)
        .select("conv_id", "turn_idx", "cleaned_text").collect()
    }
    b = {
        (r.conv_id, r.turn_idx): r.cleaned_text
        for r in run_extraction(shuffled, num_partitions=4)
        .select("conv_id", "turn_idx", "cleaned_text").collect()
    }
    assert a == b


def test_duplicate_ts_ties_broken_by_turn_idx(spark):
    t = synthesize_transcripts(spark, 4, 4, parallelism=2)
    # generator quantizes ts per turn pair → duplicates exist
    dups = (
        t.groupBy("conv_id", "ts").count().filter(F.col("count") > 1).count()
    )
    assert dups > 0
    ordered = with_stable_order(t)
    rows = ordered.filter(F.col("conv_id") == "conv-000000001").orderBy("turn_seq").collect()
    assert [r.turn_idx for r in rows] == sorted(r.turn_idx for r in rows)


def test_checkpoint_resume(spark, transcripts, tmp_path_factory):
    """Kill after 1 committed slice → resume → identical final table."""
    from engine.spark.job import run_checkpointed

    out_a = str(tmp_path_factory.mktemp("ckpt_a"))
    out_b = str(tmp_path_factory.mktemp("ckpt_b"))

    # one-shot reference run
    ref = run_checkpointed(spark, transcripts, out_a, num_partitions=8)
    ref_rows = {
        (r.conv_id, r.turn_idx): r.cleaned_text
        for r in ref.select("conv_id", "turn_idx", "cleaned_text").collect()
    }

    # crashed run: commits 1 of 4 slices then dies
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(
            spark, transcripts, out_b, num_partitions=8, fail_after_batches=1
        )
    done_after_crash = spark.read.parquet(f"{out_b}/checkpoints").count()
    assert 0 < done_after_crash < 8

    # resume: finishes only the remaining partitions
    res = run_checkpointed(spark, transcripts, out_b, num_partitions=8)
    res_rows = {
        (r.conv_id, r.turn_idx): r.cleaned_text
        for r in res.select("conv_id", "turn_idx", "cleaned_text").collect()
    }
    assert res_rows == ref_rows

    # metrics table materialized with per-partition throughput
    metrics = spark.read.parquet(f"{out_b}/metrics")
    assert metrics.filter(F.col("turns_per_sec") > 0).count() > 0
    # lineage manifests exist for completed partitions
    import glob
    assert len(glob.glob(f"{out_b}/manifests/part-*.json")) > 0

    # re-running a completed run is a no-op returning the same table
    again = run_checkpointed(spark, transcripts, out_b, num_partitions=8)
    assert again.count() == len(ref_rows)


def test_narrow_spans_reconstruct_losslessly(spark):
    """span_content=False + with_span_content == span_content=True,
    byte-for-byte, on all payload families."""
    from engine.spark.pipeline import run_extraction, with_span_content
    from engine.spark.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, 40, 4)
    full = run_extraction(t, num_partitions=8)
    narrow = with_span_content(
        run_extraction(t, num_partitions=8, span_content=False)
    )

    def span_map(df):
        return {
            (r.conv_id, r.turn_idx): [
                (s["content"], s["index"], s["start_char"], s["end_char"],
                 s["estimated_tokens"])
                for s in r.spans
            ]
            for r in df.select("conv_id", "turn_idx", "spans").collect()
        }

    a, b = span_map(full), span_map(narrow)
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        assert a[k] == b[k], k


def test_quality_drift_windows(results):
    from engine.spark.monitor import quality_drift

    drift = quality_drift(results, window="1 day").collect()
    assert drift, "no drift windows"
    total = sum(r.n_turns for r in drift)
    assert total == results.count()
    for r in drift:
        assert r.window_start < r.window_end
        assert 0.0 <= r.empty_rate <= 1.0
        assert r.quality_bucket in ("excellent", "good", "acceptable", "poor")


def test_metrics_summary_after_job(spark, transcripts, tmp_path_factory):
    from engine.spark.job import run_checkpointed
    from engine.spark.monitor import metrics_summary

    out = str(tmp_path_factory.mktemp("monitor_job"))
    run_checkpointed(spark, transcripts, out, run_id="mon-1", num_partitions=8)
    row = metrics_summary(spark, out).collect()[0]
    assert row.run_id == "mon-1"
    assert row.total_turns == transcripts.count()
    assert row.n_partitions >= 1
    assert 0.0 <= row.empty_rate <= 1.0
    assert row.partition_skew_ratio >= 1.0


def test_noshuffle_falls_back_on_coarse_layout(spark, tmp_path_factory):
    """repartition=False must not let a fat-file source cap the stage:
    a single-file table (1 scan split < slots) silently falls back to
    the salted shuffle, and results equal the salted path either way."""
    from engine.spark.pipeline import run_extraction
    from engine.spark.transcripts import synthesize_transcripts

    out = str(tmp_path_factory.mktemp("coarse")) + "/t"
    synthesize_transcripts(spark, 40, 2).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out)
    t = spark.read.parquet(out)
    assert t.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    res = run_extraction(t, num_partitions=8, repartition=False)
    # fallback engaged: the stage runs over the salted repartition, so
    # its parallelism is the requested partition count, not 1
    assert res.rdd.getNumPartitions() == 8
    a = {(r.conv_id, r.turn_idx): r.cleaned_text
         for r in res.select("conv_id", "turn_idx", "cleaned_text").collect()}
    b = {(r.conv_id, r.turn_idx): r.cleaned_text
         for r in run_extraction(t, num_partitions=8)
         .select("conv_id", "turn_idx", "cleaned_text").collect()}
    assert a == b and len(a) > 0


def test_bench_layout_feeds_wide_stages(spark):
    """Layout guard: the bench's materialized input must scan as FULL
    task waves at the widest leg (24 slots) under the bench's 4 MB
    split bins — at least 4 waves and an even division. Round 3 found
    the 64-file/16 MB-bin layout silently packed into 32 tasks = 2
    waves, idling 1/3 of the wide leg's slots and deflating the
    measured N->4N efficiency to 0.59 in a clean window; round 4's A/B
    found 192 sub-MB files cost ~15% per-file overhead, hence layout
    v4: 96 files = 4 even waves (BENCH/BASELINE.md §2)."""
    import bench

    path = bench._materialize_inputs(spark, "/root/testdata/sf0.001", 300)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    try:
        parts = spark.read.parquet(path).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert parts >= 4 * 24
    assert parts % 24 == 0  # even waves: no ragged last wave at 24 slots


def test_partitioned_sink_prunes_on_part_id(spark, transcripts, tmp_path_factory):
    """The job's partitionBy('part_id') layout must give partition
    pruning on reads: a part_id filter appears as PartitionFilters in
    the scan (directory-level skip — at 100 TB a single-partition read
    touches 1/N of the files, not a post-scan filter)."""
    from engine.spark.job import run_checkpointed

    out = str(tmp_path_factory.mktemp("prune_job"))
    run_checkpointed(spark, transcripts, out, run_id="prune-1", num_partitions=8)
    res = spark.read.parquet(f"{out}/results")
    one = res.filter(F.col("part_id") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part_id" in plan or \
           "PartitionFilters: [(part_id" in plan or \
           ("PartitionFilters" in plan and "part_id" in plan.split("PartitionFilters")[1][:120]), plan[:800]
    # and the filtered read returns exactly that partition's rows
    assert one.count() == res.filter("part_id = 3").count()
    assert one.select("part_id").distinct().collect()[0][0] == 3


def test_blocked_stable_order_matches_window(spark):
    """with_stable_order_blocked must equal with_stable_order exactly —
    tiny block size forces the multi-block path, shuffled input and
    duplicate ts included."""
    from engine.spark.pipeline import with_stable_order_blocked

    t = synthesize_transcripts(spark, 10, 6, parallelism=3, shuffle_rows=True)
    want = {
        (r.conv_id, r.turn_idx): r.turn_seq
        for r in with_stable_order(t).collect()
    }
    got = {
        (r.conv_id, r.turn_idx): r.turn_seq
        for r in with_stable_order_blocked(t, block=4).collect()
    }
    assert got == want
    # schema parity: same columns, same order
    assert with_stable_order_blocked(t, block=4).columns == \
        with_stable_order(t).columns


def test_ordered_export_global_file_order(spark, tmp_path_factory):
    """ordered_export: part files read in NAME order yield the full
    (conv_id, turn_idx, ts) global order; no rows lost or duplicated;
    a conversation larger than any single partition splits across
    consecutive files (no pinned task)."""
    import glob
    import os

    from engine.spark.pipeline import ordered_export

    out = str(tmp_path_factory.mktemp("ordered_sink") / "t")
    # 6 normal conversations + one 400-turn "mega" thread, 16 ranges →
    # the mega-thread must span multiple partitions
    normal = synthesize_transcripts(spark, 6, 2, parallelism=2)
    mega = synthesize_transcripts(spark, 1, 100, parallelism=2).withColumn(
        "conv_id", F.lit("conv-mega")
    )
    t = normal.unionByName(mega.select(*normal.columns))
    n_in = t.count()
    n_mega = mega.count()
    ordered_export(t, out, num_partitions=16)

    files = sorted(glob.glob(os.path.join(out, "part-*")))
    assert len(files) > 1
    keys = []
    per_file_mega = []
    for f in files:
        rows = spark.read.parquet(f).collect()
        keys += [(r.conv_id, r.turn_idx, r.ts) for r in rows]
        per_file_mega.append(
            sum(1 for r in rows if r.conv_id == "conv-mega")
        )
    assert len(keys) == n_in
    assert keys == sorted(keys)          # global order across file names
    mega_total = sum(per_file_mega)
    assert mega_total == n_mega
    # the mega thread split across >1 file and no file owns it all
    assert sum(1 for c in per_file_mega if c > 0) > 1
    assert max(per_file_mega) < mega_total


def test_blocked_stable_order_keeps_null_turn_idx(spark):
    """Round-4 review fix pinned: a NULL turn_idx row must flow through
    with_stable_order_blocked (the block join is null-unsafe equality,
    so an uncoalesced NULL _blk silently dropped the row) and take the
    same nulls-first turn_seq the window path assigns."""
    import datetime as dt

    from engine.spark.pipeline import with_stable_order_blocked

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("c1", None, "u", "x", None, t0),
        ("c1", 0, "u", "y", None, t0),
        ("c1", 1, "a", "z", None, t0),
        ("c2", 5, "u", "w", None, t0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    want = {
        (r.conv_id, r.turn_idx): r.turn_seq
        for r in with_stable_order(df).collect()
    }
    got = {
        (r.conv_id, r.turn_idx): r.turn_seq
        for r in with_stable_order_blocked(df, block=2).collect()
    }
    assert got == want
    assert got[("c1", None)] == 1  # nulls first, like the window
