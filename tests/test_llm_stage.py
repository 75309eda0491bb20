"""Optional LLM-enrichment stage (T11): pluggable batch inference via
one mapInPandas hop, deterministic fake client, kernel parse/repair
tiers on the reply. Out of the equality gate by design — these tests
cover the plumbing (schema, truncation, batching, repair flag)."""

import json

from engine.spark.llm import MAX_PROMPT_TEXT_CHARS, build_prompt, llm_enrich


def test_prompt_truncation_and_templates():
    long = "x" * (MAX_PROMPT_TEXT_CHARS + 500)
    p = build_prompt(long, "invoice")
    assert len(p) < MAX_PROMPT_TEXT_CHARS + 200  # template overhead only
    assert p.endswith("x" * 10)
    assert "invoice_number" in p
    assert "candidate_name" in build_prompt("t", "resume")
    # unknown type falls back to the generic template
    assert "salient" in build_prompt("t", "unknown")


def test_enrich_with_fake_client(spark):
    from engine.spark.pipeline import run_extraction
    from engine.spark.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, 24, 2)
    res = run_extraction(t, num_partitions=8)
    enriched = llm_enrich(res)
    rows = enriched.select(
        "conv_id", "turn_idx", "doc_type", "fields_json", "llm_json", "llm_was_repaired"
    ).collect()
    assert len(rows) == res.count()
    assert enriched.columns[-2:] == ["llm_json", "llm_was_repaired"]
    # the fake client echoes the rule-based extraction, so for every row
    # with a parseable reply the JSON must round-trip
    parsed = [json.loads(r.llm_json) for r in rows if r.llm_json is not None]
    assert parsed, "fake client produced no parseable replies"
    assert all(isinstance(p, dict) for p in parsed)
    assert not any(r.llm_was_repaired for r in rows)  # fake emits clean JSON


def test_enrich_repair_path(spark):
    """A client that wraps replies in markdown fences + trailing commas
    exercises the kernel repair tiers; the flag must reflect it."""

    def broken_factory():
        def client(prompts):
            return ['```json\n{"a": 1, "b": 2,}\n```' for _ in prompts]

        return client

    df = spark.createDataFrame(
        [("c1", 0, "hello world", "unknown")],
        "conv_id string, turn_idx int, cleaned_text string, doc_type string",
    )
    out = llm_enrich(df, client_factory=broken_factory).collect()
    assert len(out) == 1
    assert json.loads(out[0].llm_json) == {"a": 1, "b": 2}
    assert out[0].llm_was_repaired is True


def test_enrich_unparseable_reply(spark):
    def garbage_factory():
        def client(prompts):
            return ["no json here at all" for _ in prompts]

        return client

    df = spark.createDataFrame(
        [("c1", 0, "text", "invoice")],
        "conv_id string, turn_idx int, cleaned_text string, doc_type string",
    )
    out = llm_enrich(df, client_factory=garbage_factory).collect()
    assert out[0].llm_json is None
    assert out[0].llm_was_repaired is False
