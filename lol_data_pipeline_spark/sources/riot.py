"""The reference's ingest pipeline, re-expressed Spark-first.

Reference dataflow (SURVEY §3 E1):
    summoner lookup → paginated match-ID scan → set-dedup →
    rate-limited async bulk fetch → status filter → JSON flatten →
    truncate-and-load sink
(reference src/api/pipeline.py:94-118, matches.py:21-53,
 utils.py:25-150, db.py:15-38).

Spark mapping:
- the per-queue pagination loop (matches.py:27-43) is a UNION ALL of
  parameterized scans; dedup (matches.py:45-50) is ``distinct()``
  placed *before* the expensive fetch — the same work-pruning the
  reference hand-codes;
- the asyncio fan-out under a semaphore (pipeline.py:49-58) becomes
  ``repartition(n).mapInPandas(fetch)`` — concurrency is task
  parallelism, and the per-partition token bucket reproduces the
  client-side rate limit without blocking other executors' work;
- responses carry the payload as a raw JSON string (exactly what
  ``response.json()`` saw) and ``from_json`` with the declared
  MATCH_SCHEMA replaces schema-on-read dict walking;
- flatten is the schema-driven pure projection in functions/flatten;
- the s/ms gameDuration duality (utils.py:109-147) and the
  participant array search (utils.py:93-107) are Column expressions.

No live HTTP here: ``mock_fetcher`` synthesizes deterministic
Riot-shaped payloads (including 404s and empty-participant guards)
so the full pipeline is testable hermetically; a real fetcher has
the same ``(urls: pd.Series) -> pd.DataFrame`` contract.
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Callable, Iterator
from functools import reduce

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lol_data_pipeline_spark.functions.flatten import flatten
from lol_data_pipeline_spark.functions.scalar import duration_units, queue_id

# Declared match schema (FIXTURES.md §1; access paths utils.py:100-150).
MATCH_SCHEMA = T.StructType(
    [
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("matchId", T.StringType()),
                    T.StructField("participants", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        T.StructField(
            "info",
            T.StructType(
                [
                    T.StructField("gameCreation", T.LongType()),
                    T.StructField("gameDuration", T.LongType()),
                    T.StructField("gameStartTimestamp", T.LongType()),
                    T.StructField("gameEndTimestamp", T.LongType()),  # nullable
                    T.StructField("gameId", T.LongType()),
                    T.StructField("gameMode", T.StringType()),
                    T.StructField("gameName", T.StringType()),
                    T.StructField("gameType", T.StringType()),
                    T.StructField("gameVersion", T.StringType()),
                    T.StructField("mapId", T.IntegerType()),
                    T.StructField(
                        "participants",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("puuid", T.StringType()),
                                    T.StructField("championName", T.StringType()),
                                    T.StructField("teamId", T.IntegerType()),
                                    T.StructField("win", T.BooleanType()),
                                    T.StructField("kills", T.IntegerType()),
                                    T.StructField("deaths", T.IntegerType()),
                                    T.StructField("assists", T.IntegerType()),
                                    T.StructField("goldEarned", T.IntegerType()),
                                    T.StructField(
                                        "challenges",
                                        T.StructType(
                                            [
                                                T.StructField("kda", T.DoubleType()),
                                                T.StructField(
                                                    "goldPerMinute", T.DoubleType()
                                                ),
                                            ]
                                        ),
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)

RESPONSE_DDL = "url string, status int, error boolean, payload_json string"


# --- S3: paginated ID scan as a union of parameterized scans --------------


def match_id_scan(
    spark: SparkSession,
    puuid: str,
    queue_types: list[str],
    num_matches: int = 1000,
    page_size: int = 100,
    dup_every: int = 0,
) -> DataFrame:
    """Union of per-(queue, page) scans producing match IDs
    (reference matches.py:21-43). ``dup_every`` injects cross-page
    duplicates like the real API returns, exercising the dedup.

    Built with spark.range per page — each page is an independent
    partition, which is exactly the parallel shape a PySpark 4
    DataSource with one InputPartition per page would produce.
    Synthesized IDs are offset by a per-``puuid`` hash: the real scan
    is keyed by the summoner (matches.py pagination is per-PUUID), so
    mock data varies by summoner the way the live API's would.
    """
    puuid_off = int(hashlib.md5(puuid.encode()).hexdigest()[:6], 16) * 1000
    scans = []
    for qt in queue_types:
        for start in range(0, num_matches, page_size):
            page = (
                spark.range(start, start + page_size)
                .withColumn(
                    "id",
                    F.when(
                        F.lit(dup_every > 0) & (F.col("id") % F.lit(max(dup_every, 1)) == 0),
                        (F.col("id") / 2).cast("long") * 2,  # collide even ids
                    ).otherwise(F.col("id")),
                )
                .select(
                    F.concat(
                        F.lit("NA1_"),
                        F.format_string("%010d", F.col("id") + F.lit(puuid_off)),
                    ).alias("match_id"),
                    F.lit(qt).alias("queue_type"),
                    F.lit(start).alias("page_start"),
                )
            )
            scans.append(page)
    ids = reduce(DataFrame.unionAll, scans)
    return ids.withColumn("queue_id", queue_id("queue_type"))


# --- S4: rate-limited bulk fetch as mapInPandas ---------------------------


def mock_fetcher(urls: pd.Series) -> pd.DataFrame:
    """Deterministic Riot-shaped payload synthesis (stands in for the
    HTTP GET of pipeline.py:64-74). ~4% 404s; ~6% of matches lack
    gameEndTimestamp (pre-2021 s/ms branch, utils.py:130-147) —
    moduli 23 and 17 are coprime so both branches actually occur."""
    rows = []
    for url in urls:
        match_id = url.rsplit("/", 1)[-1]
        h = int(hashlib.md5(match_id.encode()).hexdigest()[:8], 16)
        if h % 23 == 0:
            rows.append({"url": url, "status": 404, "error": False, "payload_json": None})
            continue
        n_parts = 10
        participants = [f"puuid_{(h + i) % 97}" for i in range(n_parts)]
        info_parts = [
            {
                "puuid": participants[i],
                "championName": f"champ_{(h + i) % 160}",
                "teamId": 100 if i < 5 else 200,
                "win": (h + i) % 2 == 0,
                "kills": (h + i) % 20,
                "deaths": (h + 3 * i) % 15,
                "assists": (h + 7 * i) % 30,
                "goldEarned": 8000 + (h + i) % 9000,
                "challenges": {
                    "kda": round(((h + i) % 100) / 10.0, 2),
                    "goldPerMinute": round(300 + ((h + i) % 200), 1),
                },
            }
            for i in range(n_parts)
        ]
        base_ms = 1_600_000_000_000 + (h % 100_000) * 60_000
        info = {
            "gameCreation": base_ms,
            "gameStartTimestamp": base_ms + 60_000,
            "gameId": 4_300_000_000 + h,
            "gameMode": "CLASSIC" if h % 3 else "ARAM",
            "gameName": f"teambuilder-match-{h}",
            "gameType": "MATCHED_GAME",
            "gameVersion": f"13.{h % 24}.{h % 500}.{h % 9000}",
            "mapId": 11 if h % 3 else 12,
            "participants": info_parts,
        }
        if h % 17 == 0:  # legacy match: duration in ms, no end timestamp
            info["gameDuration"] = 1_800_000 + (h % 600) * 1000
        else:
            info["gameDuration"] = 1800 + h % 600
            info["gameEndTimestamp"] = base_ms + 60_000 + info["gameDuration"] * 1000
        payload = {"metadata": {"matchId": match_id, "participants": participants}, "info": info}
        rows.append(
            {"url": url, "status": 200, "error": False, "payload_json": json.dumps(payload)}
        )
    return pd.DataFrame(rows, columns=["url", "status", "error", "payload_json"])


def fetch_match_details(
    match_ids: DataFrame,
    fetcher: Callable[[pd.Series], pd.DataFrame] = mock_fetcher,
    n_tasks: int = 8,
    rate_limit_per_task: float | None = None,
    batch_size: int = 100,
    base_url: str = "https://americas.api.riotgames.com/lol/match/v5/matches/",
) -> DataFrame:
    """Parallel bulk fetch (reference pipeline.py:22-80).

    One Spark task per partition replaces the asyncio event loop; the
    optional per-task token bucket reproduces the client-side rate
    limit (semaphore + 1s sleep, pipeline.py:49-73) without stalling
    the whole executor. 429-retry policy belongs inside ``fetcher``
    (task retries would refetch a whole partition — too coarse,
    SURVEY §4); ``sources.http.HttpFetcher`` is the live
    implementation of that contract, ``mock_fetcher`` the hermetic
    one.
    """
    urls = match_ids.select(
        F.concat(F.lit(base_url), F.col("match_id")).alias("url")
    )

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in range(0, len(pdf), batch_size):
                chunk = pdf["url"].iloc[i : i + batch_size]
                t0 = time.monotonic()
                out = fetcher(chunk)
                if rate_limit_per_task:
                    min_elapsed = len(chunk) / rate_limit_per_task
                    sleep = min_elapsed - (time.monotonic() - t0)
                    if sleep > 0:
                        time.sleep(sleep)
                yield out

    return urls.repartition(n_tasks).mapInPandas(fetch_partition, schema=RESPONSE_DDL)


# --- transform: filter → parse → project → flatten ------------------------


def parse_responses(responses: DataFrame) -> DataFrame:
    """F1 status filter (pipeline.py:44-46) + declared-schema parse
    (replaces schema-on-read dict walking)."""
    return (
        responses.filter((F.col("status") == 200) & (~F.col("error")))
        .withColumn("payload", F.from_json("payload_json", MATCH_SCHEMA))
        .select("payload.*")
    )


def _participant_for(puuid: str) -> Column:
    """P5+P6 fused (utils.py:93-107,149-150): the participant struct
    whose puuid matches — a correlated semi-join against the embedded
    array, as a single filter expression (no explode, no shuffle)."""
    return F.try_element_at(
        F.filter(F.col("info.participants"), lambda p: p["puuid"] == F.lit(puuid)),
        F.lit(1),
    )


def flatten_matches(parsed: DataFrame, puuid: str) -> DataFrame:
    """P2–P8: 14-field projection + rename, epoch-ms dates, s/ms unit
    tagging, participant extraction, recursive flatten — one Project.

    Output column names mirror the reference's flat dict keys
    (utils.py:112-128), with participant leaves prefixed
    ``participant_`` (indexed, non-lossy; see functions/flatten.py on
    the reference's overwrite quirk)."""
    end_ts = F.col("info.gameEndTimestamp")
    flat = parsed.filter(F.size("metadata.participants") > 0).select(
        F.col("metadata.matchId").alias("matchId"),
        F.col("info.gameCreation").alias("gameCreation"),
        F.date_format(F.timestamp_millis(F.col("info.gameCreation")), "yyyy-MM-dd").alias(
            "gameCreationDate"
        ),
        F.col("info.gameDuration").alias("gameDuration"),
        duration_units(end_ts).alias("gameDurationUnits"),
        F.col("info.gameStartTimestamp").alias("gameStartTimestamp"),
        F.date_format(
            F.timestamp_millis(F.col("info.gameStartTimestamp")), "yyyy-MM-dd"
        ).alias("gameStartTimestampDate"),
        end_ts.alias("gameEndTimestamp"),
        F.when(
            end_ts.isNotNull(),
            F.date_format(F.timestamp_millis(end_ts), "yyyy-MM-dd"),
        ).alias("gameEndTimestampDate"),
        F.col("info.gameId").alias("gameId"),
        F.col("info.gameMode").alias("gameMode"),
        F.col("info.gameName").alias("gameName"),
        F.col("info.gameType").alias("gameType"),
        F.col("info.gameVersion").alias("gameVersion"),
        F.col("info.mapId").alias("mapId"),
        _participant_for(puuid).alias("participant"),
    )
    return flatten(flat)


def run_pipeline(
    spark: SparkSession,
    puuid: str,
    out_path: str,
    queue_types: list[str] | None = None,
    num_matches: int = 1000,
    fetcher: Callable[[pd.Series], pd.DataFrame] = mock_fetcher,
    rate_limit_per_task: float | None = None,
) -> DataFrame:
    """The reference's E1 lifecycle as one lazy DataFrame plan:
    scan → distinct (before the fetch — work pruning) → fetch →
    filter/parse → flatten → overwrite sink."""
    from lol_data_pipeline_spark.io import write_overwrite

    ids = match_id_scan(spark, puuid, queue_types or ["draft", "blind", "aram"], num_matches)
    unique_ids = ids.select("match_id").distinct()
    responses = fetch_match_details(
        unique_ids, fetcher=fetcher, rate_limit_per_task=rate_limit_per_task
    )
    result = flatten_matches(parse_responses(responses), puuid)
    write_overwrite(result, out_path)
    return result
