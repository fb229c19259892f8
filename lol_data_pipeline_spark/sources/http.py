"""Real HTTP fetcher for the ingest pipeline (stdlib urllib only).

Implements the fetch side of the reference's client behavior as a
``(urls: pd.Series) -> pd.DataFrame`` kernel pluggable into
``sources.riot.fetch_match_details``:

- 429 handling honors the ``Retry-After`` response header with
  bounded retries (reference src/api/pipeline.py:75-80 re-fetches
  after sleeping Retry-After seconds; src/api/matches.py:37-40
  blocks in a sleep-120 loop — here the wait is the server-declared
  value, capped, with a retry budget so a hostile/looping server
  cannot hang an executor task).
- transient 5xx/connection errors retry with exponential backoff.
- non-JSON content type → ``error=true`` row with null payload
  (reference pipeline.py:69-74 ContentTypeError branch), so the
  downstream status-filter drops it; the row is data, not an
  exception — one bad response cannot kill a 10k-row partition.
- auth headers (``X-Riot-Token``) are per-fetcher constants, sent on
  every request (reference pipeline.py:52-56).

The fetcher is a top-level class holding only plain-value config, so
it pickles cleanly into executor Python workers; per-task rate
limiting stays in ``fetch_match_details``'s token bucket (its
concern, not the fetcher's — SURVEY §4).

A driver-side helper ``lookup_puuid`` reproduces the reference's
summoner→PUUID authentication GET (src/api/summoner.py:11-28): one
tiny request that seeds the plan, so it is a plain call, not a Spark
job.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from email.utils import parsedate_to_datetime

import pandas as pd

RESPONSE_COLUMNS = ["url", "status", "error", "payload_json"]


def _parse_retry_after(value: str | None, default: float) -> float:
    """Seconds to wait from a Retry-After header: integer-seconds or
    HTTP-date form (RFC 9110 §10.2.3); fall back to ``default``."""
    if not value:
        return default
    value = value.strip()
    try:
        return max(0.0, float(value))
    except ValueError:
        pass
    try:
        dt = parsedate_to_datetime(value)
        return max(0.0, dt.timestamp() - time.time())
    except (TypeError, ValueError):
        return default


class HttpFetcher:
    """Callable ``(urls: pd.Series) -> pd.DataFrame`` over live HTTP.

    One row per url with the RESPONSE_DDL shape of sources.riot:
    ``url, status, error, payload_json``. Never raises for per-url
    failures; terminal statuses (404, exhausted retries, network
    errors) come back as rows.
    """

    def __init__(
        self,
        headers: dict[str, str] | None = None,
        api_key: str | None = None,
        timeout: float = 10.0,
        max_retries: int = 3,
        max_retry_after: float = 130.0,
        backoff_base: float = 1.0,
        sleep=time.sleep,
    ) -> None:
        self.headers = {"Accept": "application/json", **(headers or {})}
        if api_key:
            self.headers["X-Riot-Token"] = api_key
        self.timeout = timeout
        self.max_retries = max_retries
        # Cap server-declared waits: the reference waits Retry-After
        # (observed up to ~125 s, BASELINE.md); anything beyond the
        # cap is treated as "give up this url", not "stall the task".
        self.max_retry_after = max_retry_after
        self.backoff_base = backoff_base
        self.sleep = sleep  # injectable for tests

    def _get(self, url: str) -> tuple[int, dict[str, str], bytes]:
        req = urllib.request.Request(url, headers=self.headers, method="GET")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, dict(resp.headers.items()), resp.read()
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers.items()) if e.headers else {}, e.read() or b""

    def fetch_one(self, url: str) -> dict:
        attempts = 0
        while True:
            try:
                status, headers, body = self._get(url)
            except (urllib.error.URLError, OSError, TimeoutError):
                if attempts >= self.max_retries:
                    return {"url": url, "status": -1, "error": True, "payload_json": None}
                self.sleep(self.backoff_base * (2**attempts))
                attempts += 1
                continue
            if status == 429:
                wait = _parse_retry_after(
                    headers.get("Retry-After"), default=self.backoff_base * (2**attempts)
                )
                if attempts >= self.max_retries or wait > self.max_retry_after:
                    return {"url": url, "status": 429, "error": True, "payload_json": None}
                self.sleep(wait)
                attempts += 1
                continue
            if 500 <= status < 600 and attempts < self.max_retries:
                self.sleep(self.backoff_base * (2**attempts))
                attempts += 1
                continue
            content_type = headers.get("Content-Type", "").split(";")[0].strip().lower()
            if status == 200 and content_type != "application/json":
                # reference ContentTypeError branch: status recorded,
                # payload dropped, row marked error
                return {"url": url, "status": status, "error": True, "payload_json": None}
            payload = None
            if status == 200:
                try:
                    payload = json.dumps(json.loads(body.decode("utf-8")))
                except (ValueError, UnicodeDecodeError):
                    return {"url": url, "status": status, "error": True, "payload_json": None}
            return {"url": url, "status": status, "error": False, "payload_json": payload}

    def __call__(self, urls: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [self.fetch_one(u) for u in urls], columns=RESPONSE_COLUMNS
        )


def lookup_puuid(
    summoner_name: str,
    api_key: str,
    base_url: str = "https://na1.api.riotgames.com/lol/summoner/v4/summoners/by-name/",
    fetcher: HttpFetcher | None = None,
) -> str:
    """Live summoner→PUUID lookup (reference summoner.py:11-28,
    SURVEY S2). Raises LookupError on auth/availability failure
    instead of the reference's ``exit()``."""
    f = fetcher or HttpFetcher(api_key=api_key)
    row = f.fetch_one(base_url + urllib.request.quote(summoner_name))
    if row["status"] != 200 or row["error"] or not row["payload_json"]:
        raise LookupError(
            f"summoner lookup failed: status={row['status']} for {summoner_name!r}"
        )
    return json.loads(row["payload_json"])["puuid"]
