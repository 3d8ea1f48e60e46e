"""Fetch stage (reference S14: ``src/spider/WebSpider.py:61-91`` getHtml +
``src/spider/UserAgent.py`` UA rotation) — re-expressed as a rate-limited
actor-pool ``map_batches`` stage with an INJECTABLE transport.

The reference fetches one URL per thread with ``requests`` (3 connection
retries via HTTPAdapter, 1 s timeout, a random User-Agent per request) and
drops non-200 / errored fetches. Ray-Data-first, a crawl is a Dataset of
frontier URLs flowing through a stateful fetch stage:

- **Actor pool**: each actor holds one transport (connection pool / session
  — the once-per-process setup) built in ``__init__`` from a picklable
  factory; ``__call__`` fetches a batch.
- **Injectable transport**: ``transport_factory`` returns a callable
  ``(url, headers, timeout) -> (status:int, body:str)`` that may raise
  ``TimeoutError`` / ``ConnectionError``. The default factory builds a
  stdlib ``urllib`` opener (env-gated: this sandbox has no network, so the
  live path is untested here; the stage's semantics are pinned against fake
  transports in tests/test_fetch.py).
- **UA rotation**: deterministic — agent index = (url hash + attempt) mod
  len(agents). Recorded deviation from the reference's ``random.choice``:
  determinism makes retries observable and runs reproducible; the
  distribution over a crawl is the same uniform rotation.
- **Bounded retries**: transport EXCEPTIONS retry up to ``max_retries``
  extra attempts (the HTTPAdapter(max_retries=3) analog); an HTTP answer
  with status != 200 quarantines immediately (the reference returns None
  for those — one attempt, no retry).
- **Timeout → quarantine rows**: a failed URL is not dropped silently; it
  emits ``ok=False`` with the error string, so the downstream
  useful/useless partition (D3) and resume manifests see it.
- **Rate limiting**: a per-actor min-interval throttle;
  cluster-wide rate = ``rate_limit_per_sec × concurrency`` (document the
  product when sizing a polite crawl).

At 10^12 docs the frontier is a Dataset partitioned by registered domain
(ops/frontier.py), ``concurrency`` sizes the polite parallelism per node,
and quarantined rows ride the same output parquet as fetched pages — the
resume anti-filter (ST3/D2 analog) skips both on the next run.
"""

from __future__ import annotations

import hashlib
import time

import pyarrow as pa

# Generic public browser User-Agent strings (UA rotation, UserAgent.py
# semantics — the exact strings are irrelevant, rotation is the operator).
USER_AGENTS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
    " (KHTML, like Gecko) Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 13_5) AppleWebKit/605.1.15"
    " (KHTML, like Gecko) Version/16.5 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101"
    " Firefox/121.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:120.0) Gecko/20100101"
    " Firefox/120.0",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36"
    " (KHTML, like Gecko) Chrome/119.0 Safari/537.36",
]


def default_transport_factory():
    """Stdlib live transport (env-gated: needs network). Returns
    ``(url, headers, timeout) -> (status, body)``; raises TimeoutError /
    ConnectionError like the fakes in tests."""
    import urllib.error
    import urllib.request

    def fetch(url: str, headers: dict, timeout: float):
        req = urllib.request.Request(url, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.status, resp.read().decode(
                    "utf-8", errors="replace")
        except urllib.error.HTTPError as e:          # answered, non-2xx
            return e.code, ""
        except TimeoutError:
            raise
        except urllib.error.URLError as e:
            if isinstance(getattr(e, "reason", None), TimeoutError):
                raise TimeoutError(str(e)) from e
            raise ConnectionError(str(e)) from e

    return fetch


def echo_transport_factory():
    """Offline dry-run transport: answers 200 with a deterministic body
    derived from the URL. Lets a crawl pipeline run end-to-end (rate
    limits, dedup, quarantine plumbing) with no network — also the fake
    the Ray-side integration tests pin the stage against."""
    def fetch(url: str, headers: dict, timeout: float):
        return 200, f"<html>{url}</html>"
    return fetch


def timeout_transport_factory():
    """Offline failure-path transport: every attempt times out — exercises
    the bounded-retry → quarantine-row path."""
    def fetch(url: str, headers: dict, timeout: float):
        raise TimeoutError("no route (offline transport)")
    return fetch


def _ua_index(url: str, attempt: int, n: int) -> int:
    h = int.from_bytes(hashlib.md5(url.encode()).digest()[:4], "little")
    return (h + attempt) % n


class FetchStage:
    """Callable-class fetch stage for ``map_batches(FetchStage,
    concurrency=N, ...)`` — transport built ONCE per actor in ``__init__``,
    batches fetched in ``__call__``.

    Output columns: (url, html, status, ok, error, attempts, user_agent).
    ``ok`` is True only for a status-200 answer; everything else is a
    quarantine row carrying the reason."""

    def __init__(self, *, transport_factory=default_transport_factory,
                 url_col: str = "url", timeout: float = 1.0,
                 max_retries: int = 3, rate_limit_per_sec: float | None =
                 None, user_agents: list[str] | None = None):
        self.transport = transport_factory()
        self.url_col = url_col
        self.timeout = timeout
        self.max_retries = max_retries
        self.agents = list(user_agents or USER_AGENTS)
        self.min_interval = (1.0 / rate_limit_per_sec
                             if rate_limit_per_sec else 0.0)
        self._next_ok = 0.0
        # injectable clocks for deterministic rate-limit tests
        self._now = time.monotonic
        self._sleep = time.sleep

    def _throttle(self) -> None:
        if not self.min_interval:
            return
        now = self._now()
        if now < self._next_ok:
            self._sleep(self._next_ok - now)
            now = self._next_ok
        self._next_ok = now + self.min_interval

    def fetch_one(self, url: str) -> dict:
        attempts = 0
        last_err = ""
        ua = ""
        while attempts <= self.max_retries:
            ua = self.agents[_ua_index(url, attempts, len(self.agents))]
            attempts += 1
            self._throttle()
            try:
                status, body = self.transport(
                    url, {"User-Agent": ua, "Connection": "close"},
                    self.timeout)
            except (TimeoutError, ConnectionError) as e:
                last_err = f"{type(e).__name__}: {e}"
                continue                      # bounded retry
            if status == 200:
                return {"url": url, "html": body, "status": status,
                        "ok": True, "error": "", "attempts": attempts,
                        "user_agent": ua}
            # answered but not 200: quarantine immediately, no retry
            # (WebSpider.getHtml returns None for these)
            return {"url": url, "html": "", "status": status, "ok": False,
                    "error": f"http status {status}", "attempts": attempts,
                    "user_agent": ua}
        return {"url": url, "html": "", "status": 0, "ok": False,
                "error": last_err, "attempts": attempts, "user_agent": ua}

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self.fetch_one(u)
                for u in batch.column(self.url_col).to_pylist()]
        return pa.table({
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "html": pa.array([r["html"] for r in rows], pa.string()),
            "status": pa.array([r["status"] for r in rows], pa.int32()),
            "ok": pa.array([r["ok"] for r in rows], pa.bool_()),
            "error": pa.array([r["error"] for r in rows], pa.string()),
            "attempts": pa.array([r["attempts"] for r in rows], pa.int32()),
            "user_agent": pa.array([r["user_agent"] for r in rows],
                                   pa.string()),
        })


def fetch_pages(ds, *, url_col: str = "url",
                transport_factory=default_transport_factory,
                timeout: float = 1.0, max_retries: int = 3,
                rate_limit_per_sec: float | None = None,
                dedup: bool = True, concurrency: int = 4,
                batch_size: int = 32):
    """Frontier URLs → fetched pages + quarantine rows.

    ``dedup=True`` first collapses duplicate URLs (the Bloom-dedup ST2
    analog, exact here) with one url-keyed exchange so each URL fetches
    once; the fetch itself is an ACTOR POOL (transport per actor, batches
    per call). Cluster-wide request rate is
    ``rate_limit_per_sec × concurrency``."""
    if dedup:
        def first(g):
            return g.head(1)
        ds = ds.groupby(url_col).map_groups(first, batch_format="pandas")
    return ds.map_batches(
        FetchStage,
        fn_constructor_kwargs=dict(
            transport_factory=transport_factory, url_col=url_col,
            timeout=timeout, max_retries=max_retries,
            rate_limit_per_sec=rate_limit_per_sec),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
