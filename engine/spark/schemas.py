"""Spark schemas for the transcript table and extraction output.

The input schema is fixed by BASELINE.json input_hint:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp). The output schema mirrors the reference's result models
(SURVEY.md §1.4): TextChunk spans as array<struct> (processor.py:40-58),
detection scores (detector.py:24-42), quality metrics
(processor.py:15-37), free-form extracted fields as a JSON string
column beside typed scalars (Arrow-friendly hybrid, SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

SPAN_TYPE = T.StructType(
    [
        T.StructField("content", T.StringType(), False),
        T.StructField("index", T.IntegerType(), False),
        T.StructField("start_char", T.LongType(), False),
        T.StructField("end_char", T.LongType(), False),
        T.StructField("estimated_tokens", T.IntegerType(), False),
    ]
)

# columns the extraction stage appends to the transcript key columns
EXTRACTION_FIELDS = [
    T.StructField("payload_kind", T.StringType(), False),
    T.StructField("is_scannedlike", T.BooleanType(), False),
    T.StructField("cleaned_text", T.StringType(), False),
    T.StructField("spans", T.ArrayType(SPAN_TYPE), False),
    T.StructField("doc_type", T.StringType(), False),
    T.StructField("detect_confidence", T.DoubleType(), False),
    T.StructField("score_invoice", T.DoubleType(), False),
    T.StructField("score_resume", T.DoubleType(), False),
    # winner's detection evidence, top 10 / top 5 (detector.py:250-256)
    T.StructField("matched_keywords", T.ArrayType(T.StringType()), False),
    T.StructField("matched_patterns", T.ArrayType(T.StringType()), False),
    T.StructField("original_length", T.LongType(), False),
    T.StructField("cleaned_length", T.LongType(), False),
    T.StructField("reduction_ratio", T.DoubleType(), False),
    T.StructField("line_count", T.IntegerType(), False),
    T.StructField("avg_line_length", T.DoubleType(), False),
    T.StructField("has_structured_data", T.BooleanType(), False),
    T.StructField("noise_ratio", T.DoubleType(), False),
    T.StructField("quality_score", T.DoubleType(), False),
    T.StructField("quality", T.StringType(), False),
    T.StructField("fields_json", T.StringType(), False),
    T.StructField("missing_fields", T.ArrayType(T.StringType()), False),
    T.StructField("warnings", T.ArrayType(T.StringType()), False),
    # T18 corrections log (post_processor.py:428-484 entries verbatim)
    T.StructField("corrections", T.ArrayType(T.StringType()), False),
    T.StructField("overall_confidence", T.DoubleType(), False),
    T.StructField("is_empty", T.BooleanType(), False),
    T.StructField("bytes_in", T.LongType(), False),
    T.StructField("n_chunks", T.IntegerType(), False),
    T.StructField("estimated_tokens", T.IntegerType(), False),
    T.StructField("proc_us", T.LongType(), False),
]

RESULT_SCHEMA = T.StructType(
    list(TRANSCRIPT_SCHEMA.fields)[:3]
    + [TRANSCRIPT_SCHEMA["tool"], TRANSCRIPT_SCHEMA["ts"]]
    + EXTRACTION_FIELDS
)

# narrow span variant: offsets only — span text is reconstructable as
# substring(cleaned_text, start_char+1, end_char-start_char), so jobs
# that don't need materialized span content skip shipping it through
# Arrow + shuffle (it duplicates cleaned_text byte-for-byte)
SPAN_TYPE_NARROW = T.StructType(
    [f for f in SPAN_TYPE.fields if f.name != "content"]
)

RESULT_SCHEMA_NARROW = T.StructType(
    [
        f if f.name != "spans"
        else T.StructField("spans", T.ArrayType(SPAN_TYPE_NARROW), False)
        for f in RESULT_SCHEMA.fields
    ]
)
