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
    name, or an HTTP 429 status attribute — no SDK import required."""
    if type(exc).__name__ == "RateLimitError":
        return True
    return getattr(exc, "status_code", None) == 429


async def call_with_retry(
    func: Callable[..., Awaitable],
    *args,
    max_retries: int = 5,
    initial_delay: float = 1.0,
    backoff_range: tuple[float, float] = (5.5, 6.0),
    is_rate_limit: Callable[[BaseException], bool] = default_is_rate_limit,
    sleep: Callable[[float], Awaitable] = asyncio.sleep,
    rng: Callable[[float, float], float] = random.uniform,
    **kwargs,
):
    """Await ``func`` with the reference's rate-limit retry discipline
    (``…Local/LLM/pipeline.py:36-68``): when the error message carries a
    server wait (``1m22.71s``) sleep exactly that long; otherwise sleep
    the current delay and multiply it by uniform(5.5, 6.0). At most
    ``max_retries`` attempts, then ``RuntimeError``. Non-rate-limit
    errors propagate immediately.

    ``sleep`` and ``rng`` are injectable so tests run on a fake clock;
    the defaults are the production behavior.
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
            wait = parse_server_wait(str(exc))
            if wait is not None:
                await sleep(wait)
            else:
                await sleep(delay)
                delay *= rng(*backoff_range)
    # chain the provider's last error: its status code / request id is
    # what an operator needs to diagnose the exhaustion
    raise RuntimeError(
        f"rate limit persisted after {max_retries} attempts"
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
