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


# ---- real HTTP client factory: retry / backoff / fallback ordering ----
# (canned transport, no network; semantics from reference client.py:560-632)

def _ok_body(content: str) -> str:
    return json.dumps({"choices": [{"message": {"content": content}}]})


class _CannedTransport:
    """Scripted per-URL response sequences + full call/sleep journal."""

    def __init__(self, script):
        # script: {url_substring: [(status, body), ...]} consumed in order
        self.script = {k: list(v) for k, v in script.items()}
        self.calls = []  # (url, model, prompt)

    def __call__(self, url, payload, headers, timeout_s):
        self.calls.append((url, payload["model"], payload["messages"][0]["content"]))
        for key, seq in self.script.items():
            if key in url:
                return seq.pop(0) if seq else (500, "script exhausted")
        raise AssertionError(f"unexpected url {url}")


def _cfgs():
    from engine.spark.llm_client import ProviderConfig

    return (
        ProviderConfig(base_url="http://primary.test/v1", model="m-primary",
                       api_key="k1"),
        ProviderConfig(base_url="http://fallback.test/v1", model="m-fallback"),
    )


def test_retry_429_backoff_then_success():
    from engine.spark.llm_client import generate_with_retry

    primary, _ = _cfgs()
    tr = _CannedTransport({"primary.test": [(429, "slow down"),
                                            (429, "slow down"),
                                            (200, _ok_body("done"))]})
    sleeps = []
    out = generate_with_retry(primary, "p", max_retries=3,
                              transport=tr, sleep=sleeps.append)
    assert out == "done"
    # reference backoff: min(2**attempt, 10) -> 1s after attempt 0, 2s after 1
    assert sleeps == [1.0, 2.0]
    assert len(tr.calls) == 3 and all(c[1] == "m-primary" for c in tr.calls)


def test_backoff_caps_at_10s():
    from engine.spark.llm_client import generate_with_retry, LLMHttpError

    primary, _ = _cfgs()
    tr = _CannedTransport({"primary.test": [(429, "x")] * 7})
    sleeps = []
    try:
        generate_with_retry(primary, "p", max_retries=7,
                            transport=tr, sleep=sleeps.append)
        raise AssertionError("should have raised")
    except LLMHttpError as e:
        assert e.status == 429
    # 1,2,4,8->capped 8? no: min(2**a,10) = 1,2,4,8,10,10 (no sleep after last)
    assert sleeps == [1.0, 2.0, 4.0, 8.0, 10.0, 10.0]


def test_non_retryable_goes_straight_to_fallback():
    from engine.spark.llm_client import generate_with_retry

    primary, fallback = _cfgs()
    tr = _CannedTransport({
        "primary.test": [(401, "bad key"), (200, _ok_body("never reached"))],
        "fallback.test": [(200, _ok_body("via fallback"))],
    })
    sleeps = []
    out = generate_with_retry(primary, "p", fallback=fallback,
                              max_retries=3, transport=tr, sleep=sleeps.append)
    assert out == "via fallback"
    assert sleeps == []  # 401 never backs off
    # ordering: exactly ONE primary attempt, then exactly ONE fallback try
    assert [c[1] for c in tr.calls] == ["m-primary", "m-fallback"]


def test_fallback_single_try_and_primary_error_raised():
    from engine.spark.llm_client import generate_with_retry, LLMHttpError

    primary, fallback = _cfgs()
    tr = _CannedTransport({
        "primary.test": [(500, "boom")] * 3,
        "fallback.test": [(503, "also down"), (200, _ok_body("no second try"))],
    })
    try:
        generate_with_retry(primary, "p", fallback=fallback,
                            max_retries=3, transport=tr, sleep=lambda s: None)
        raise AssertionError("should have raised")
    except LLMHttpError as e:
        assert e.status == 500  # the PRIMARY's last error, not the fallback's
    # 3 primary attempts then a single fallback try (client.py:619-630)
    assert [c[1] for c in tr.calls] == ["m-primary"] * 3 + ["m-fallback"]


def test_http_factory_plugs_into_enrich_stage(spark):
    from engine.spark.llm_client import http_client_factory
    from engine.spark.pipeline import run_extraction
    from engine.spark.transcripts import synthesize_transcripts

    primary, fallback = _cfgs()

    # a LOCAL function (not a test-module class): cloudpickle ships it
    # by value, so the executors never need to import test_llm_stage —
    # proves the factory pickles to workers and the stage consumes it
    def canned_transport(url, payload, headers, timeout_s):
        import json as _json

        if "primary" in url:
            body = _json.dumps(
                {"choices": [{"message": {
                    "content": _json.dumps({"total_amount": 12.5})}}]}
            )
            return 200, body
        raise AssertionError("fallback must not be hit")

    factory = http_client_factory(primary, fallback=fallback,
                                  transport=canned_transport,
                                  sleep=lambda s: None)
    t = synthesize_transcripts(spark, 8, 2)
    res = run_extraction(t, num_partitions=4)
    rows = llm_enrich(res, client_factory=factory).select(
        "llm_json", "llm_was_repaired").collect()
    assert rows and all(r.llm_json == '{"total_amount": 12.5}' for r in rows)
    assert not any(r.llm_was_repaired for r in rows)


def test_urllib_transport_maps_httpexception_to_599(monkeypatch):
    """Round-4 review fix pinned: http.client.HTTPException (malformed
    status line, truncated body) is not an OSError — it must map to the
    retryable 599 like every other transport fault, not escape the
    retry ladder."""
    import http.client
    import urllib.request

    from engine.spark.llm_client import _urllib_transport

    def boom(req, timeout=None):
        raise http.client.BadStatusLine("garbage from flaky proxy")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    status, body = _urllib_transport(
        "http://example.invalid/v1", {}, {}, 1.0
    )
    assert status == 599
    assert "garbage" in body


# ---- ollama wire shape (reference ollama_client.py:111-226) ----

class _JournalTransport:
    """Like _CannedTransport but payload-shape-agnostic (ollama
    payloads carry `prompt`, not `messages`)."""

    def __init__(self, script):
        self.script = {k: list(v) for k, v in script.items()}
        self.calls = []  # (url, payload)

    def __call__(self, url, payload, headers, timeout_s):
        self.calls.append((url, payload))
        for key, seq in self.script.items():
            if key in url:
                return seq.pop(0) if seq else (500, "script exhausted")
        raise AssertionError(f"unexpected url {url}")


def test_ollama_wire_shape_and_parse():
    from engine.spark.llm_client import ProviderConfig, generate_with_retry

    cfg = ProviderConfig(
        base_url="http://local.test", model="llama3", wire="ollama",
        system="be terse", json_mode=True, max_tokens=512,
        temperature=0.1,
    )
    tr = _JournalTransport({
        "local.test": [(200, json.dumps({"response": "  {\"a\": 1} "}))]
    })
    out = generate_with_retry(cfg, "extract this", transport=tr,
                              sleep=lambda s: None)
    assert out == '{"a": 1}'  # stripped, reference ollama_client.py:196
    url, payload = tr.calls[0]
    assert url.endswith("/api/generate")
    assert payload["prompt"] == "extract this"
    assert payload["stream"] is False
    assert payload["options"] == {"temperature": 0.1, "num_predict": 512}
    assert payload["system"] == "be terse"
    assert payload["format"] == "json"
    assert "messages" not in payload


def test_ollama_empty_response_is_error():
    from engine.spark.llm_client import (
        LLMHttpError,
        ProviderConfig,
        generate_with_retry,
    )

    cfg = ProviderConfig(base_url="http://local.test", model="m",
                         wire="ollama")
    tr = _JournalTransport({
        "local.test": [(200, json.dumps({"response": "   "}))] * 3
    })
    try:
        generate_with_retry(cfg, "p", max_retries=3, transport=tr,
                            sleep=lambda s: None)
        raise AssertionError("should have raised")
    except LLMHttpError as e:
        # reference ollama_client.py:198-199: empty content is an error
        assert "empty response" in e.body


def test_remote_primary_falls_back_to_local_ollama():
    """The reference's actual deployment pairing: OpenAI-compatible
    remote primary, local Ollama daemon as the one-try fallback."""
    from engine.spark.llm_client import ProviderConfig, generate_with_retry

    primary = ProviderConfig(base_url="http://remote.test/v1",
                             model="m-remote", api_key="k")
    local = ProviderConfig(base_url="http://localhost:11434",
                           model="llama3", wire="ollama")
    tr = _JournalTransport({
        "remote.test": [(500, "boom")] * 3,
        "localhost:11434": [(200, json.dumps({"response": "ok local"}))],
    })
    out = generate_with_retry(primary, "p", fallback=local, max_retries=3,
                              transport=tr, sleep=lambda s: None)
    assert out == "ok local"
    # 3 primary attempts (openai shape), then exactly one ollama call
    assert len(tr.calls) == 4
    assert all("chat/completions" in u for u, _ in tr.calls[:3])
    assert tr.calls[3][0].endswith("/api/generate")
