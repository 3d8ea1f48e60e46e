"""FetchStage (S14, WebSpider.py:61-91 / UserAgent.py re-expression):
semantics pinned against FAKE transports — the sandbox has no network, so
the live default_transport_factory path stays env-gated and untested."""

import pandas as pd
import pyarrow as pa
import pytest

from wtes_ray.ops.fetch import (USER_AGENTS, FetchStage, _ua_index,
                                fetch_pages)


def _batch(urls):
    return pa.table({"url": pa.array(urls, pa.string())})


# --- picklable fake transports (module-level so Ray actors can build them)

def ok_transport_factory():
    def fetch(url, headers, timeout):
        return 200, f"<html>{url}</html>"
    return fetch


def notfound_transport_factory():
    def fetch(url, headers, timeout):
        return 404, "gone"
    return fetch


class FlakyTransport:
    """Raises TimeoutError on the first `fail_n` calls PER URL."""

    def __init__(self, fail_n):
        self.fail_n = fail_n
        self.calls = {}

    def __call__(self, url, headers, timeout):
        c = self.calls[url] = self.calls.get(url, 0) + 1
        if c <= self.fail_n:
            raise TimeoutError(f"try {c}")
        return 200, "late " + url


def always_timeout_factory():
    def fetch(url, headers, timeout):
        raise TimeoutError("no route")
    return fetch


def test_success_single_attempt():
    st = FetchStage(transport_factory=ok_transport_factory)
    out = st(_batch(["http://a/1", "http://a/2"])).to_pandas()
    assert out["ok"].all()
    assert (out["attempts"] == 1).all()
    assert (out["status"] == 200).all()
    assert out["html"].tolist() == ["<html>http://a/1</html>",
                                    "<html>http://a/2</html>"]
    assert (out["error"] == "").all()


def test_retry_then_success():
    st = FetchStage(transport_factory=lambda: FlakyTransport(2),
                    max_retries=3)
    out = st(_batch(["http://a/x"])).to_pandas()
    assert out["ok"].iloc[0]
    assert out["attempts"].iloc[0] == 3        # 2 timeouts + 1 success
    assert out["html"].iloc[0] == "late http://a/x"


def test_timeout_exhausts_to_quarantine_row():
    st = FetchStage(transport_factory=always_timeout_factory, max_retries=3)
    out = st(_batch(["http://a/x"])).to_pandas()
    r = out.iloc[0]
    assert not r["ok"]
    assert r["attempts"] == 4                  # 1 + max_retries
    assert r["status"] == 0 and r["html"] == ""
    assert "TimeoutError" in r["error"]


def test_non200_quarantines_without_retry():
    st = FetchStage(transport_factory=notfound_transport_factory,
                    max_retries=3)
    out = st(_batch(["http://a/x"])).to_pandas()
    r = out.iloc[0]
    assert not r["ok"] and r["attempts"] == 1
    assert r["status"] == 404 and "404" in r["error"]


def test_ua_rotation_deterministic_and_rotates():
    # deterministic per (url, attempt); consecutive attempts rotate
    i0 = _ua_index("http://a/x", 0, len(USER_AGENTS))
    assert _ua_index("http://a/x", 0, len(USER_AGENTS)) == i0
    assert _ua_index("http://a/x", 1, len(USER_AGENTS)) == \
        (i0 + 1) % len(USER_AGENTS)
    # the recorded UA on a retried fetch is the LAST attempt's agent
    st = FetchStage(transport_factory=lambda: FlakyTransport(1),
                    max_retries=2)
    out = st(_batch(["http://a/x"])).to_pandas()
    assert out["user_agent"].iloc[0] == USER_AGENTS[
        _ua_index("http://a/x", 1, len(USER_AGENTS))]


def test_rate_limit_min_interval_enforced():
    st = FetchStage(transport_factory=ok_transport_factory,
                    rate_limit_per_sec=10.0)
    # deterministic clock injection: no real sleeping
    t = {"now": 0.0}
    slept = []
    st._now = lambda: t["now"]

    def fake_sleep(s):
        slept.append(s)
        t["now"] += s
    st._sleep = fake_sleep
    st(_batch([f"http://a/{i}" for i in range(5)]))
    # first request free, the next four each wait out the 0.1s interval
    assert len(slept) == 4
    assert all(abs(s - 0.1) < 1e-9 for s in slept)


def test_fetch_pages_actor_pool_and_dedup(ray_session):
    # NOTE: the transport factory must be importable inside Ray worker
    # processes (actor constructor args unpickle there), so the Ray-side
    # tests use the PACKAGE's offline transports; test-local fakes would
    # make the actor restart forever on an unimportable module.
    import ray.data as rd

    from wtes_ray.ops.fetch import echo_transport_factory
    urls = ["http://a/1", "http://a/2", "http://a/1", "http://a/3",
            "http://a/2"]
    ds = rd.from_pandas(pd.DataFrame({"url": urls}))
    out = fetch_pages(ds, transport_factory=echo_transport_factory,
                      concurrency=2, batch_size=2).to_pandas()
    assert sorted(out["url"]) == ["http://a/1", "http://a/2", "http://a/3"]
    assert out["ok"].all()
    assert out["html"].tolist() == [f"<html>{u}</html>"
                                    for u in sorted(out["url"])]


def test_fetch_pages_quarantine_partition(ray_session):
    import ray.data as rd

    from wtes_ray.ops.fetch import timeout_transport_factory
    ds = rd.from_pandas(pd.DataFrame({"url": ["http://a/1", "http://a/2"]}))
    out = fetch_pages(ds, transport_factory=timeout_transport_factory,
                      max_retries=1, concurrency=1).to_pandas()
    assert (~out["ok"]).all()
    assert (out["attempts"] == 2).all()
    assert out["html"].eq("").all()


def test_live_transport_is_env_gated():
    # constructing the default factory must not require network
    from wtes_ray.ops.fetch import default_transport_factory
    fetch = default_transport_factory()
    assert callable(fetch)
