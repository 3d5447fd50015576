"""Hermetic pipeline tests: records → (mock) extraction → validity +
defaults → canonicalization → graph construction (SURVEY.md §5.3).

The mock extractor is the deterministic stand-in for the reference's
Groq LLM stage (``Art-Knowledge-Graph-AWS/LLM/pipeline.py:35-103``);
everything downstream is the engine's own deterministic surface.
"""

from __future__ import annotations

import asyncio
import json

import pytest
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.functions.canonical import (
    canonical_map_df,
    canonicalize_relations,
)
from big_data___knowledge_graph_construction_with_llm_spark.llm_client import (
    call_with_retry,
    parse_server_wait,
    scrape_json_objects,
)
from big_data___knowledge_graph_construction_with_llm_spark.operators.graph import (
    edges_from_triplets,
    vertices_from_triplets,
)
from big_data___knowledge_graph_construction_with_llm_spark.pipeline import (
    extract_triplets,
    extract_triplets_async,
    mock_extractor,
    validate_triplets,
)


def test_mock_extractor_pure():
    out = mock_extractor('{"id": "r1", "title": "Ritratto", "year": 1490, "empty": ""}')
    assert out == [
        {
            "subject": "r1",
            "subject_type": "Record",
            "relation": "has_title",
            "object": "Ritratto",
            "object_type": None,
        },
        {
            "subject": "r1",
            "subject_type": "Record",
            "relation": "has_year",
            "object": "1490",
            "object_type": None,
        },
    ]
    assert mock_extractor("not json") == []
    assert mock_extractor("[1, 2]") == []


def test_extract_validate_roundtrip(spark):
    records = spark.range(3).select(
        F.col("id").cast("string").alias("id"),
        F.concat(F.lit("title-"), F.col("id")).alias("title"),
    )
    raw = extract_triplets(records, mock_extractor, fanout_partitions=2)
    triplets = validate_triplets(raw)
    rows = sorted((r["subject"], r["relation"], r["object"]) for r in triplets.collect())
    assert rows == [(str(i), "has_title", f"title-{i}") for i in range(3)]
    # defaults applied where the extractor left None
    assert triplets.filter(F.col("object_type") != "Entity").count() == 0
    assert triplets.filter(F.col("subject_type") == "Record").count() == 3


class _FakeRateLimitError(Exception):
    """Named like the provider SDK's class so duck-typing matches."""


_FakeRateLimitError.__name__ = "RateLimitError"


def test_parse_server_wait():
    assert parse_server_wait("Please try again in 1m22.71s") == pytest.approx(82.71)
    assert parse_server_wait("try again in 0m0.5s.") == pytest.approx(0.5)
    assert parse_server_wait("no wait hint here") is None


def test_call_with_retry_fake_clock():
    """Server-directed waits are honored exactly; messageless rate limits
    follow the 1 → ×5.5-6.0 exponential schedule; success returns."""
    sleeps: list[float] = []

    async def fake_sleep(s):
        sleeps.append(round(s, 4))

    attempts = {"n": 0}

    async def flaky():
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise _FakeRateLimitError("Rate limit. Please try again in 1m22.71s")
        if attempts["n"] <= 3:
            raise _FakeRateLimitError("Rate limit, no hint")
        return "ok"

    out = asyncio.run(
        call_with_retry(
            flaky, sleep=fake_sleep, rng=lambda a, b: a  # deterministic 5.5×
        )
    )
    assert out == "ok"
    # sleep 1: parsed 82.71s; sleeps 2-3: 1.0 then 1.0*5.5
    assert sleeps == [82.71, 1.0, 5.5]


def test_call_with_retry_exhaustion_and_passthrough():
    async def always_limited():
        raise _FakeRateLimitError("nope")

    async def fake_sleep(_):
        pass

    with pytest.raises(RuntimeError, match="after 3 attempts") as ei:
        asyncio.run(
            call_with_retry(
                always_limited, max_retries=3, sleep=fake_sleep, rng=lambda a, b: a
            )
        )
    # the provider's last error (status code / request id) must be chained
    assert isinstance(ei.value.__cause__, _FakeRateLimitError)

    async def broken():
        raise ValueError("not a rate limit")

    # non-rate-limit errors propagate immediately, no retries
    with pytest.raises(ValueError):
        asyncio.run(call_with_retry(broken, sleep=fake_sleep))


def test_scrape_json_objects():
    assert scrape_json_objects('{"a": 1}') == [{"a": 1}]
    assert scrape_json_objects('[{"a": 1}, {"b": 2}]') == [{"a": 1}, {"b": 2}]
    assert scrape_json_objects('note {"a": 1} more {"b": 2} end') == [
        {"a": 1},
        {"b": 2},
    ]
    assert scrape_json_objects("nothing here") == []
    assert scrape_json_objects(None) == []
    assert scrape_json_objects("[1, 2]") == []


def test_extract_triplets_async_with_flaky_fake(spark):
    """End-to-end through mapInPandas with a deterministic fake-HTTP call
    that rate-limits the FIRST attempt for every record (tiny parsed
    wait), then answers with prose-wrapped JSON — retry, fan-out and the
    tolerant parse all engage, and the result equals the mock path."""

    # defined inside the test so cloudpickle ships it BY VALUE — a
    # module-level class would be pickled by reference and executors
    # cannot import the test module
    class RateLimitError(Exception):
        pass

    async def fake_llm(record_json: str) -> str:
        rec = json.loads(record_json)
        # deterministic per-record flakiness: odd ids rate-limit once per
        # event loop (state is loop-local, so task re-runs are idempotent)
        loop = asyncio.get_running_loop()
        seen = getattr(loop, "_seen", None)
        if seen is None:
            seen = loop._seen = set()
        if int(rec["id"]) % 2 == 1 and rec["id"] not in seen:
            seen.add(rec["id"])
            raise RateLimitError("Please try again in 0m0.01s")
        triplet = {
            "subject": rec["id"],
            "subject_type": "Record",
            "relation": "has_title",
            "object": rec["title"],
            "object_type": None,
        }
        return f"The extraction yields: {json.dumps(triplet)} -- done"

    records = spark.range(4).select(
        F.col("id").cast("string").alias("id"),
        F.concat(F.lit("title-"), F.col("id")).alias("title"),
    )
    out = validate_triplets(
        extract_triplets_async(records, fake_llm, batch_size=2, fanout_partitions=2)
    )
    rows = sorted((r["subject"], r["relation"], r["object"]) for r in out.collect())
    assert rows == [(str(i), "has_title", f"title-{i}") for i in range(4)]


def test_canonicalize_and_graph(spark):
    raw = spark.createDataFrame(
        [
            ("Tiziano", "Person", "Painted_By", "Ritratto", "Artwork"),
            ("Tiziano", "Person", "IS_RELATED_TO", "Venezia", "Place"),
            ("Tiziano", "Person", "unknown_rel", "X", "Entity"),
        ],
        "subject string, subject_type string, relation string, "
        "object string, object_type string",
    )
    mapping = canonical_map_df(
        spark, extra={"painted by": "created", "is related to": "isRelatedTo"}
    )
    out = canonicalize_relations(raw, mapping)
    got = {r["object"]: r["relation"] for r in out.collect()}
    # mapped variants take the canonical name; unknowns take the cleaned form
    assert got["Ritratto"] == "created"
    assert got["Venezia"] == "isRelatedTo"
    assert got["X"] == "unknown rel"

    edges = edges_from_triplets(out)
    assert set(edges.columns) == {"src", "dst", "relationship"}
    assert edges.count() == 3
    verts = vertices_from_triplets(out)
    vrows = {r["id"]: r["label"] for r in verts.collect()}
    assert vrows["Tiziano"] == "Person"
    assert vrows["Ritratto"] == "Artwork"


def test_http_chat_extractor_hermetic():
    """The concrete chat-completions extractor, with an injected
    transport: parses triplets from a prose-wrapped reply, retries once
    on a rate-limit error (server-directed wait honored via fake sleep),
    and returns [] on malformed response bodies."""
    import json as _json

    from big_data___knowledge_graph_construction_with_llm_spark.llm_client import http_chat_extractor

    calls = []

    class RateLimitError(Exception):
        pass

    def flaky_transport(payload):
        calls.append(payload)
        if len(calls) == 1:
            raise RateLimitError("Please try again in 0m0.01s")
        content = (
            'Sure! {"subject": "Tiziano", "relation": "created", '
            '"object": "Ritratto"} hope that helps'
        )
        return _json.dumps(
            {"choices": [{"message": {"content": content}}]}
        )

    ex = http_chat_extractor(
        "http://unit.test/v1/chat/completions",
        model="test-model",
        prompt="Extract triplets as JSON:",
        transport=flaky_transport,
    )
    got = ex('{"id": 1, "Autore": "Tiziano"}')
    assert got == [
        {"subject": "Tiziano", "relation": "created", "object": "Ritratto"}
    ]
    assert len(calls) == 2  # one rate-limited attempt + one success
    assert calls[1]["temperature"] == 0
    assert "Autore" in calls[1]["messages"][0]["content"]

    def broken_transport(payload):
        return '{"unexpected": "shape"}'

    ex2 = http_chat_extractor(
        "http://unit.test", model="m", prompt="p", transport=broken_transport
    )
    assert ex2('{"id": 2}') == []


def test_default_is_rate_limit_recognizes_urllib_429():
    """The default transport raises urllib HTTPError on 429 — the retry
    gate must recognize it (it carries `code`/`status`, not
    `status_code`), and must not treat other statuses as rate limits."""
    import urllib.error

    from big_data___knowledge_graph_construction_with_llm_spark.llm_client import default_is_rate_limit

    assert default_is_rate_limit(
        urllib.error.HTTPError("http://x", 429, "Too Many Requests", {}, None)
    )
    assert not default_is_rate_limit(
        urllib.error.HTTPError("http://x", 500, "Server Error", {}, None)
    )


def test_call_with_retry_sync_fake_clock():
    """Sync twin: same wait parsing + backoff discipline, no event loop."""
    from big_data___knowledge_graph_construction_with_llm_spark.llm_client import call_with_retry_sync

    class RateLimitError(Exception):
        pass

    sleeps, calls = [], []

    def flaky(x):
        calls.append(x)
        if len(calls) == 1:
            raise RateLimitError("Please try again in 1m30.5s")
        if len(calls) == 2:
            raise RateLimitError("slow down")  # no server wait -> backoff
        return x * 2

    got = call_with_retry_sync(
        flaky, 21, sleep=sleeps.append, rng=lambda a, b: 2.0
    )
    assert got == 42
    assert sleeps == [90.5, 1.0]  # server-directed wait, then initial delay

    def always(x):
        raise RateLimitError("nope")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="rate limit persisted"):
        call_with_retry_sync(always, 1, max_retries=2, sleep=sleeps.append)


def test_http_chat_extractor_inside_running_loop():
    """The extractor must work from a thread that already runs an asyncio
    loop (async drivers/notebooks) — the old asyncio.run-per-record form
    raised RuntimeError there."""
    import asyncio as _asyncio
    import json as _json

    from big_data___knowledge_graph_construction_with_llm_spark.llm_client import http_chat_extractor

    def transport(payload):
        content = '{"subject": "a", "relation": "r", "object": "b"}'
        return _json.dumps({"choices": [{"message": {"content": content}}]})

    ex = http_chat_extractor("http://unit.test", model="m", prompt="p", transport=transport)

    async def drive():
        return ex('{"id": 1}')

    got = _asyncio.run(drive())
    assert got == [{"subject": "a", "relation": "r", "object": "b"}]
