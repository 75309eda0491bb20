"""JSONL transcript source: schema-enforced read with corrupt-record
routing (the source-level twin of split_valid's validate-then-route
contract), plus write→read roundtrip fidelity against the synthesizer.
"""

from pyspark.sql import functions as F

from engine.spark.schemas import TRANSCRIPT_SCHEMA
from engine.spark.transcripts import (
    synthesize_transcripts,
    transcripts_from_jsonl,
)

GOOD = [
    '{"conv_id":"c-1","turn_idx":0,"role":"user","text":"hello","tool":null,'
    '"ts":"2025-01-01T00:00:00.000Z"}',
    '{"conv_id":"c-1","turn_idx":1,"role":"assistant","text":"hi","tool":null,'
    '"ts":"2025-01-01T00:00:30.000Z"}',
    '{"conv_id":"c-2","turn_idx":0,"role":"user","text":"x","tool":"search",'
    '"ts":"2025-01-02T00:00:00.000Z"}',
]
MALFORMED = "{not json at all"
WRONG_TYPE = (
    '{"conv_id":"c-3","turn_idx":"zero","role":"user","text":"bad type",'
    '"tool":null,"ts":"2025-01-01T00:00:00.000Z"}'
)
NULL_KEY = (
    '{"turn_idx":4,"role":"user","text":"missing conv","tool":null,'
    '"ts":"2025-01-01T00:00:00.000Z"}'
)


def test_jsonl_routes_bad_lines_to_errors(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(GOOD + [MALFORMED, WRONG_TYPE, NULL_KEY]) + "\n")

    valid, errors = transcripts_from_jsonl(spark, str(p))

    # valid side: exactly TRANSCRIPT_SCHEMA columns/types, only the 3
    # well-formed lines, values parsed (typed turn_idx, real timestamp)
    assert [(f.name, f.dataType) for f in valid.schema.fields] == [
        (f.name, f.dataType) for f in TRANSCRIPT_SCHEMA.fields
    ]
    rows = {(r.conv_id, r.turn_idx): r for r in valid.collect()}
    assert set(rows) == {("c-1", 0), ("c-1", 1), ("c-2", 0)}
    assert rows[("c-2", 0)].tool == "search"
    assert rows[("c-1", 1)].ts.second == 30

    # errors side: all 3 bad lines; malformed + wrong-typed arrive
    # VERBATIM (PERMISSIVE puts the whole line in the corrupt column),
    # the parse-clean null-key line is a to_json reconstruction
    err_lines = [r.raw_line for r in errors.collect()]
    assert len(err_lines) == 3
    assert MALFORMED in err_lines
    assert WRONG_TYPE in err_lines
    reconstructed = [l for l in err_lines if l not in (MALFORMED, WRONG_TYPE)]
    assert '"text":"missing conv"' in reconstructed[0]
    assert '"conv_id"' not in reconstructed[0]  # null key stays absent


def test_jsonl_roundtrip_matches_synthesizer(spark, tmp_path):
    """write.json of the canonical table → transcripts_from_jsonl reads
    back value-identical rows and routes nothing to errors."""
    src = synthesize_transcripts(spark, 12, scale_turns=4, parallelism=4)
    out = str(tmp_path / "roundtrip")
    src.write.json(out)

    valid, errors = transcripts_from_jsonl(spark, out)
    assert errors.count() == 0

    key = ["conv_id", "turn_idx"]
    diff = src.select(*TRANSCRIPT_SCHEMA.names).exceptAll(
        valid.select(*TRANSCRIPT_SCHEMA.names)
    )
    assert src.count() == valid.count()
    assert diff.count() == 0, diff.limit(5).collect()
    # and the keys really are unique, so exceptAll==0 means identity
    assert valid.groupBy(*key).count().filter(F.col("count") > 1).count() == 0
