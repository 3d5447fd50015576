"""Async LLM-call machinery for real extractors (SURVEY §2.10 retry row,
§2.8 wait-time parse row).

Mirrors the reference's retry/backoff and per-partition asyncio fan-out
(``Art-Knowledge-Graph-Local/LLM/pipeline.py:36-68``;
``Art-Knowledge-Graph-AWS/LLM/pipeline.py:35-41``;
``Art-Knowledge-Graph-AWS/LLM/main-llm-triplets-extraction.py:15-31``)
as dependency-free, injectable helpers: no HTTP client is baked in (none
ships in this container); a deployment passes its own async call.

Idempotency under Spark task re-runs: every helper is a pure function of
the record text (no counters, no shared state), so a re-scheduled task
repeats the same calls and emits the same rows — the property the
exactly-once sink contract needs from the extraction stage.
"""

from __future__ import annotations

import asyncio
import json
import random
import re
import time
from collections.abc import Awaitable, Callable

#: Server-directed wait, e.g. "Please try again in 1m22.71s"
#: (reference ``…Local/LLM/pipeline.py:50-54``).
WAIT_RE = re.compile(r"(\d+)m([\d.]+)s")


def parse_server_wait(message: str) -> float | None:
    """Extract a server-directed wait time in seconds from a rate-limit
    message (``(\\d+)m([\\d.]+)s`` → minutes*60 + seconds), or None."""
    m = WAIT_RE.search(message)
    if not m:
        return None
    return int(m.group(1)) * 60 + float(m.group(2))


def default_is_rate_limit(exc: BaseException) -> bool:
    """Duck-typed rate-limit check: the provider SDK's exception class
    name, or an HTTP 429 status attribute — no SDK import required.
    Checks ``status_code`` (most SDKs), ``code`` and ``status`` (stdlib
    ``urllib.error.HTTPError``, as raised by ``http_chat_extractor``'s
    default transport)."""
    if type(exc).__name__ == "RateLimitError":
        return True
    return 429 in (
        getattr(exc, "status_code", None),
        getattr(exc, "code", None),
        getattr(exc, "status", None),
    )


def _next_wait(
    exc: BaseException,
    delay: float,
    rng: Callable[[float, float], float],
    backoff_range: tuple[float, float],
    wait_parser: Callable[[str], float | None] | None,
) -> tuple[float, float]:
    """The ONE retry-schedule rule both the async and sync loops consume:
    ``(sleep_now, next_delay)`` — a server-directed wait when the parser
    finds one (delay unchanged), else the current delay multiplied by
    ``uniform(*backoff_range)`` for next time. Keeping this shared means
    a policy change (capping waits, jitter) can never diverge the twins."""
    wait = wait_parser(str(exc)) if wait_parser else None
    if wait is not None:
        return wait, delay
    return delay, delay * rng(*backoff_range)


async def call_with_retry(
    func: Callable[..., Awaitable],
    *args,
    max_retries: int = 5,
    initial_delay: float = 1.0,
    backoff_range: tuple[float, float] = (5.5, 6.0),
    is_rate_limit: Callable[[BaseException], bool] = default_is_rate_limit,
    sleep: Callable[[float], Awaitable] = asyncio.sleep,
    rng: Callable[[float, float], float] = random.uniform,
    wait_parser: Callable[[str], float | None] | None = parse_server_wait,
    failure_label: str = "rate limit",
    **kwargs,
):
    """Await ``func`` with the reference's rate-limit retry discipline
    (``…Local/LLM/pipeline.py:36-68``): when the error message carries a
    server wait (``1m22.71s``) sleep exactly that long; otherwise sleep
    the current delay and multiply it by uniform(5.5, 6.0). At most
    ``max_retries`` attempts, then ``RuntimeError``. Non-rate-limit
    errors propagate immediately.

    ``sleep`` and ``rng`` are injectable so tests run on a fake clock;
    the defaults are the production behavior. ``wait_parser``/
    ``failure_label`` let non-LLM callers (the bolt sink) opt out of
    LLM-message parsing and name their own failure mode.
    """
    delay = float(initial_delay)
    last_exc: Exception | None = None
    for _ in range(max_retries):
        try:
            return await func(*args, **kwargs)
        except Exception as exc:  # noqa: BLE001 — filtered just below
            if not is_rate_limit(exc):
                raise
            last_exc = exc
            wait, delay = _next_wait(exc, delay, rng, backoff_range, wait_parser)
            await sleep(wait)
    # chain the provider's last error: its status code / request id is
    # what an operator needs to diagnose the exhaustion
    raise RuntimeError(
        f"{failure_label} persisted after {max_retries} attempts"
    ) from last_exc


def call_with_retry_sync(
    func: Callable[..., object],
    *args,
    max_retries: int = 5,
    initial_delay: float = 1.0,
    backoff_range: tuple[float, float] = (5.5, 6.0),
    is_rate_limit: Callable[[BaseException], bool] = default_is_rate_limit,
    sleep: Callable[[float], None] = time.sleep,
    rng: Callable[[float, float], float] = random.uniform,
    wait_parser: Callable[[str], float | None] | None = parse_server_wait,
    failure_label: str = "rate limit",
    **kwargs,
):
    """Synchronous twin of :func:`call_with_retry` — same discipline
    (server-directed wait, ×uniform(5.5, 6.0) backoff, ``max_retries``
    TOTAL attempts then ``RuntimeError`` chaining the provider's last
    error), no event loop. The schedule itself lives in the shared
    :func:`_next_wait`, so the twins cannot diverge; only the loop
    skeleton (await vs not) differs. This is what per-record extractors
    should use: creating and destroying an ``asyncio`` loop per call
    costs ~ms each and raises ``RuntimeError`` when invoked from a
    thread that already runs a loop (async drivers, notebooks). The
    async form remains the right tool where there is real fan-out to
    overlap (``gather_in_batches``)."""
    delay = float(initial_delay)
    last_exc: Exception | None = None
    for _ in range(max_retries):
        try:
            return func(*args, **kwargs)
        except Exception as exc:  # noqa: BLE001 — filtered just below
            if not is_rate_limit(exc):
                raise
            last_exc = exc
            wait, delay = _next_wait(exc, delay, rng, backoff_range, wait_parser)
            sleep(wait)
    raise RuntimeError(
        f"{failure_label} persisted after {max_retries} attempts"
    ) from last_exc


def scrape_json_objects(text: str | None) -> list[dict]:
    """Python twin of the reference's ``extract_json``
    (``…AWS/LLM/pipeline.py:6-33``): strict-parse the whole reply first
    (dict → [dict], list kept), else regex-scrape ``{...}`` objects out
    of surrounding prose, skipping unparseable matches. Returns [] when
    nothing parses (the reference returns None; [] composes better with
    ``extend``). Used Python-side inside ``mapInPandas`` — the column-
    expression twin is ``functions.json_repair``.
    """
    if not text:
        return []
    text = text.strip()
    try:
        data = json.loads(text)
        if isinstance(data, dict):
            return [data]
        if isinstance(data, list):
            return [d for d in data if isinstance(d, dict)]
    except json.JSONDecodeError:
        pass
    out = []
    for m in re.findall(r"\{.*?\}", text, re.DOTALL):
        try:
            obj = json.loads(m)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict):
            out.append(obj)
    return out


async def gather_in_batches(
    texts: list[str],
    call: Callable[[str], Awaitable],
    batch_size: int = 5,
    **retry_kwargs,
) -> list:
    """The reference's bounded fan-out (``…AWS/LLM/pipeline.py:35-41``):
    ``batch_size`` concurrent in-flight calls at a time via
    ``asyncio.gather``, each wrapped in ``call_with_retry``. Returns the
    raw replies in input order."""
    results = []
    for i in range(0, len(texts), batch_size):
        chunk = texts[i : i + batch_size]
        results.extend(
            await asyncio.gather(
                *[call_with_retry(call, t, **retry_kwargs) for t in chunk]
            )
        )
    return results


def http_chat_extractor(
    url: str,
    model: str,
    prompt: str,
    api_key: str | None = None,
    transport: Callable[[dict], str] | None = None,
    timeout: float = 60.0,
    **retry_kwargs,
):
    """Concrete ``pipeline.Extractor`` factory for an OpenAI-style
    chat-completions endpoint (the reference calls Groq's, which speaks
    this protocol, via langchain — ``…AWS/LLM/chains.py:30-34``). Built
    on stdlib ``urllib`` so no SDK/HTTP library is required; the
    ``transport`` hook (``payload dict → reply body str``) lets tests
    run hermetically and deployments swap in a pooled client.

    Each call posts ``prompt + record`` at temperature 0, applies
    :func:`call_with_retry`'s rate-limit discipline, and tolerantly
    scrapes JSON triplet objects from the reply
    (:func:`scrape_json_objects`). Pure function of the record text —
    idempotent under Spark task re-runs. For high-throughput partitions
    prefer batching with :func:`gather_in_batches` inside one
    ``mapInPandas`` block; this per-record form exists to plug straight
    into ``pipeline.extract_triplets``.
    """

    def _default_transport(payload: dict) -> str:
        import urllib.request

        headers = {"Content-Type": "application/json"}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(), headers=headers
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
            return resp.read().decode()

    send = transport or _default_transport

    def extract(record_json: str) -> list[dict]:
        payload = {
            "model": model,
            "temperature": 0,
            "messages": [
                {"role": "user", "content": f"{prompt}\n\n{record_json}"}
            ],
        }

        # synchronous retry around the synchronous transport: no event
        # loop per record (costly, and a hard error from a thread that
        # already runs one — async drivers/notebooks)
        body = call_with_retry_sync(send, payload, **retry_kwargs)
        try:
            content = json.loads(body)["choices"][0]["message"]["content"]
        except (KeyError, IndexError, TypeError, ValueError):
            return []
        return scrape_json_objects(content)

    return extract
