"""HttpFetcher against a local stub HTTP server (no live network).

Exercises the reference's client policies end-to-end: 429
Retry-After honoring with bounded retries (pipeline.py:75-80),
content-type guard (pipeline.py:69-74), 404 pass-through, 5xx
backoff, and the summoner→PUUID lookup (summoner.py:11-28) — then
the full Spark fetch stage through mapInPandas.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from lol_data_pipeline_spark.sources.http import HttpFetcher, lookup_puuid

_HITS: dict[str, int] = {}
_LOCK = threading.Lock()


def _payload(match_id: str) -> bytes:
    doc = {
        "metadata": {"matchId": match_id, "participants": ["p1", "p2"]},
        "info": {"gameCreation": 1_600_000_000_000, "gameDuration": 1800,
                 "gameStartTimestamp": 1_600_000_060_000, "gameId": 1,
                 "gameMode": "CLASSIC", "gameName": "g", "gameType": "MATCHED_GAME",
                 "gameVersion": "13.1", "mapId": 11, "participants": []},
    }
    return json.dumps(doc).encode()


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence test output
        pass

    def _json(self, code: int, body: bytes, extra=None):
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        with _LOCK:
            _HITS[self.path] = _HITS.get(self.path, 0) + 1
            n = _HITS[self.path]
        if self.path.startswith("/matches/"):
            self._json(200, _payload(self.path.rsplit("/", 1)[-1]))
        elif self.path.startswith("/flaky/"):
            if n <= 2:  # two 429s, then success
                self._json(429, b"{}", {"Retry-After": "0"})
            else:
                self._json(200, _payload(self.path.rsplit("/", 1)[-1]))
        elif self.path == "/always429":
            self._json(429, b"{}", {"Retry-After": "0"})
        elif self.path == "/hugewait":
            self._json(429, b"{}", {"Retry-After": "9999"})
        elif self.path == "/flaky500":
            if n == 1:
                self._json(500, b"oops")
            else:
                self._json(200, _payload("m500"))
        elif self.path == "/notjson":
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"<html>rate limit docs</html>")
        elif self.path.startswith("/summoner/by-name/"):
            self._json(200, json.dumps({"puuid": "puuid_live_42"}).encode())
        else:
            self._json(404, b"{}")


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _fetcher(**kw):
    kw.setdefault("sleep", lambda s: None)  # no real waiting in tests
    kw.setdefault("backoff_base", 0.0)
    return HttpFetcher(api_key="k", **kw)


def test_ok_and_404_rows(server):
    out = _fetcher()(pd.Series([f"{server}/matches/NA1_1", f"{server}/missing"]))
    assert list(out.columns) == ["url", "status", "error", "payload_json"]
    ok, missing = out.iloc[0], out.iloc[1]
    assert ok.status == 200 and not ok.error
    assert json.loads(ok.payload_json)["metadata"]["matchId"] == "NA1_1"
    assert missing.status == 404 and not missing.error and missing.payload_json is None


def test_429_retry_after_honored_then_succeeds(server):
    waits = []
    f = HttpFetcher(api_key="k", sleep=waits.append, backoff_base=0.0)
    row = f.fetch_one(f"{server}/flaky/NA1_9")
    assert row["status"] == 200 and not row["error"]
    assert waits == [0.0, 0.0]  # slept exactly the server's Retry-After, twice
    assert _HITS["/flaky/NA1_9"] == 3


def test_429_bounded_retries_returns_error_row(server):
    f = _fetcher(max_retries=2)
    row = f.fetch_one(f"{server}/always429")
    assert row == {"url": f"{server}/always429", "status": 429,
                   "error": True, "payload_json": None}
    assert _HITS["/always429"] == 3  # initial + 2 retries, then gave up


def test_429_wait_above_cap_gives_up_immediately(server):
    f = _fetcher(max_retry_after=130.0)
    row = f.fetch_one(f"{server}/hugewait")
    assert row["status"] == 429 and row["error"]
    assert _HITS["/hugewait"] == 1  # did not sleep 9999s or retry


def test_5xx_backoff_then_success(server):
    row = _fetcher()(pd.Series([f"{server}/flaky500"])).iloc[0]
    assert row.status == 200 and not row.error


def test_content_type_guard(server):
    row = _fetcher()(pd.Series([f"{server}/notjson"])).iloc[0]
    assert row.status == 200 and row.error and row.payload_json is None


def test_connection_error_row():
    f = _fetcher(max_retries=1, timeout=0.2)
    row = f.fetch_one("http://127.0.0.1:1/nope")  # nothing listens on port 1
    assert row["status"] == -1 and row["error"]


def test_lookup_puuid_live(server):
    assert lookup_puuid("bob", "k", base_url=f"{server}/summoner/by-name/") == "puuid_live_42"
    with pytest.raises(LookupError):
        lookup_puuid("bob", "k", base_url=f"{server}/gone/")


def test_spark_fetch_stage_through_http(spark, server):
    """The full mapInPandas fetch stage against live (local) HTTP:
    HttpFetcher pickles into executor workers, error rows drop at the
    status filter, payloads parse under the declared schema."""
    from pyspark.sql import functions as F

    from lol_data_pipeline_spark.sources.riot import fetch_match_details, parse_responses

    ids = spark.range(20).select(
        F.format_string("NA1_%07d", F.col("id")).alias("match_id")
    )
    responses = fetch_match_details(
        ids, fetcher=_fetcher(), n_tasks=4, base_url=f"{server}/matches/"
    )
    parsed = parse_responses(responses)
    got = {r["matchId"] for r in parsed.select("metadata.matchId").collect()}
    assert got == {f"NA1_{i:07d}" for i in range(20)}
