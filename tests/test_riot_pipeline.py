"""End-to-end tests for the reference-shaped ingest pipeline
(sources/riot.py) — the golden test of SURVEY §5.3, hermetic via the
deterministic mock fetcher."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from lol_data_pipeline_spark.sources import riot


@pytest.fixture(scope="module")
def small_ids(spark):
    return riot.match_id_scan(spark, "puuid_1", ["draft", "blind"], num_matches=200)


def test_id_scan_union_shape(spark, small_ids):
    # 2 queues × 2 pages × 100 ids
    assert small_ids.count() == 400
    qids = {r.queue_type: r.queue_id for r in small_ids.select("queue_type", "queue_id").distinct().collect()}
    assert qids == {"draft": 400, "blind": 430}


def test_dedup_before_fetch(spark, small_ids):
    # same ids appear under both queues → distinct halves the fetch work
    assert small_ids.select("match_id").distinct().count() == 200


def test_fetch_and_parse(spark, small_ids):
    ids = small_ids.select("match_id").distinct()
    responses = riot.fetch_match_details(ids, n_tasks=4)
    assert responses.columns == ["url", "status", "error", "payload_json"]
    by_status = {r.status: r.n for r in responses.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert by_status.get(200, 0) > 150 and by_status.get(404, 0) > 0
    parsed = riot.parse_responses(responses)
    assert parsed.columns == ["metadata", "info"]
    assert parsed.count() == by_status[200]


def test_flatten_matches_fields_and_sms_duality(spark, small_ids):
    ids = small_ids.select("match_id").distinct()
    parsed = riot.parse_responses(riot.fetch_match_details(ids, n_tasks=4))
    flat = riot.flatten_matches(parsed, puuid="puuid_1")
    cols = set(flat.columns)
    # the reference's 14 projected top-level fields (utils.py:112-128)
    for c in [
        "matchId", "gameCreation", "gameCreationDate", "gameDuration",
        "gameDurationUnits", "gameStartTimestamp", "gameStartTimestampDate",
        "gameEndTimestamp", "gameEndTimestampDate", "gameId", "gameMode",
        "gameName", "gameType", "gameVersion", "mapId",
    ]:
        assert c in cols, c
    # participant leaves flattened with prefix, incl. depth-2 challenges
    assert "participant_puuid" in cols and "participant_challenges_kda" in cols
    rows = flat.collect()
    units = {r.gameDurationUnits for r in rows}
    assert units == {"s", "ms"}  # both branches must actually occur
    for r in rows:
        if r.gameDurationUnits == "ms":
            assert r.gameEndTimestamp is None and r.gameEndTimestampDate is None
        else:
            assert r.gameEndTimestamp is not None
        # participant extraction: either our puuid or NULL (not in match)
        assert r.participant_puuid in (None, "puuid_1")
    assert any(r.participant_puuid == "puuid_1" for r in rows)


def test_rate_limit_throttles(spark):
    ids = riot.match_id_scan(spark, "p", ["draft"], num_matches=100).select("match_id").distinct()
    import time

    t0 = time.monotonic()
    riot.fetch_match_details(ids, n_tasks=1, rate_limit_per_task=400.0).count()
    assert time.monotonic() - t0 >= 0.25  # 100 reqs @ 400/s on one task


def test_run_pipeline_overwrite_sink(spark, tmp_path):
    out = str(tmp_path / "matches")
    result = riot.run_pipeline(spark, "puuid_1", out, ["draft"], num_matches=100)
    first = spark.read.parquet(out).count()
    assert first == result.count() > 0
    # truncate-and-load semantics (db.py:32-37): second run replaces
    riot.run_pipeline(spark, "puuid_1", out, ["draft"], num_matches=100)
    assert spark.read.parquet(out).count() == first


def test_custom_fetcher_content_type_error_guard(spark):
    # F3 (pipeline.py:71-74): error=true rows with NULL payload dropped
    def flaky(urls: pd.Series) -> pd.DataFrame:
        out = riot.mock_fetcher(urls)
        out.loc[out.index[::3], ["error", "payload_json"]] = [True, None]
        return out

    ids = riot.match_id_scan(spark, "p", ["draft"], num_matches=100).select("match_id").distinct()
    parsed = riot.parse_responses(riot.fetch_match_details(ids, fetcher=flaky, n_tasks=2))
    assert parsed.filter(F.col("metadata").isNull()).count() == 0


def test_cli_end_to_end(spark, tmp_path):
    """The reference's CLI surface (pipeline.py:119-127) end-to-end
    in mock mode: argparse → E1 lifecycle → parquet sink."""
    from lol_data_pipeline_spark.cli import main

    rc = main([
        "--summoner", "bob",
        "--queue_type", "draft",
        "--db", str(tmp_path),
        "--collection", "match_data",
        "--num-matches", "120",
    ])
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "match_data"))
    assert out.count() > 0
    assert "matchId" in out.columns and "gameDurationUnits" in out.columns
