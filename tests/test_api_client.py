"""Paged API client parity (mds/api.py Client page loop, mds/auth.py
OAuth) with an injected fake transport — no network in this sandbox."""

import pytest

from mds_provider_spark.operators import uniqueness as U
from mds_provider_spark.sources import api_client as AC
from mds_provider_spark.sources import payloads as P
from pyspark.sql import types as T


def _fake_transport(pages: dict):
    calls = []

    def transport(url, params, headers):
        calls.append((url, dict(params), dict(headers)))
        return pages[url]

    transport.calls = calls
    return transport


PAGES = {
    "https://api.example/trips": {
        "version": "0.4.0",
        "data": {"trips": [{"trip_id": "t1"}, {"trip_id": "t2"}]},
        "links": {"next": "https://api.example/trips?page=2"},
    },
    "https://api.example/trips?page=2": {
        "version": "0.4.0",
        "data": {"trips": [{"trip_id": "t3"}]},
        "links": {},
    },
    "https://auth.example/token": {"access_token": "sekrit"},
}


def test_page_loop_follows_next_links():
    tr = _fake_transport(PAGES)
    c = AC.Client("https://api.example", tr)
    recs = c.get_trips(start_time=0, end_time=100)
    assert [r["trip_id"] for r in recs] == ["t1", "t2", "t3"]
    # versioned Accept header on every request; params only on the first
    assert all("0.4.0" in h["Accept"] for _, _, h in tr.calls)
    assert tr.calls[0][1] == {"start_time": 0, "end_time": 100}
    assert tr.calls[1][1] == {}


def test_unknown_record_type():
    c = AC.Client("https://api.example", _fake_transport(PAGES))
    with pytest.raises(ValueError):
        c.get_records("scooters")


def test_oauth_client_credentials():
    tr = _fake_transport(PAGES)
    h = AC.oauth_client_credentials(tr, "https://auth.example/token", "id", "sec")
    assert h == {"Authorization": "Bearer sekrit"}
    assert tr.calls[0][1]["grant_type"] == "client_credentials"


def test_staging_roundtrip_into_spark(spark, tmp_path):
    """fetch -> staging JSON -> load_records: the full ingestion path."""
    c = AC.Client("https://api.example", _fake_transport(PAGES))
    n = c.dump_to_staging("trips", str(tmp_path / "stage"))
    assert n == 2
    schema = T.StructType([T.StructField("trip_id", T.StringType())])
    rec = P.load_records(spark, str(tmp_path / "stage") + "/*.json", "trips", schema)
    assert sorted(r.trip_id for r in rec.collect()) == ["t1", "t2", "t3"]


def test_fetch_many_distributed(spark, tmp_path):
    """Distributed fan-out: independent (provider x window) page loops
    run inside executors, each writing its own staging dir."""
    staging = str(tmp_path / "multi")
    tasks = [
        {"name": "p1", "base_url": "https://api.example", "record_type": "trips"},
        {"name": "p2", "base_url": "https://api.example", "record_type": "trips"},
    ]

    # the factory must be self-contained: it is pickled into executors,
    # where this test module is not importable
    pages_data = {k: v for k, v in PAGES.items() if "trips" in k}

    def factory(data=pages_data):
        return lambda url, params, headers: data[url]

    pages = AC.fetch_many(spark, tasks, factory, staging)
    assert pages == 4  # 2 providers x 2 pages each
    import glob

    assert len(glob.glob(staging + "/p1/*.json")) == 2
    assert len(glob.glob(staging + "/p2/*.json")) == 2


def test_duplicate_exemplars(spark):
    df = spark.createDataFrame(
        [("k1", 5, "a"), ("k1", 3, "b"), ("k2", 1, "c"), ("k1", 9, "d")],
        "key string, ord int, payload string",
    )
    got = U.duplicate_exemplars(df, ["key"], order_by=["ord"]).collect()
    assert sorted((r.key, r.ord, r.dup_rank, r.is_exemplar) for r in got) == [
        ("k1", 3, 1, True), ("k1", 5, 2, False), ("k1", 9, 3, False),
    ]


def test_retrying_transport_backoff_and_retry_after():
    """429s retry with exponential backoff, honoring a larger
    Retry-After; non-retryable statuses raise immediately; gives up
    after the budget."""
    calls, sleeps = [], []

    def flaky(url, params, headers):
        calls.append(url)
        if len(calls) == 1:
            raise AC.TransportError(429, retry_after=3.0)
        if len(calls) == 2:
            raise AC.TransportError(503)
        return {"data": {"trips": [{"ok": True}]}, "links": {}}

    t = AC.retrying(flaky, base_delay_s=0.5, sleep=sleeps.append)
    page = t("u", {}, {})
    assert page["data"]["trips"] == [{"ok": True}] and len(calls) == 3
    # attempt 0: backoff 0.5 vs Retry-After 3.0 -> 3.0; attempt 1: 1.0
    assert sleeps == [3.0, 1.0]

    def always_401(url, params, headers):
        raise AC.TransportError(401)

    with pytest.raises(AC.TransportError) as ei:
        AC.retrying(always_401, sleep=sleeps.append)("u", {}, {})
    assert ei.value.status == 401 and len(sleeps) == 2  # no new sleeps

    n = {"c": 0}

    def always_429(url, params, headers):
        n["c"] += 1
        raise AC.TransportError(429)

    with pytest.raises(AC.TransportError):
        AC.retrying(always_429, retries=3, sleep=lambda s: None)("u", {}, {})
    assert n["c"] == 4  # initial + 3 retries, then give up
