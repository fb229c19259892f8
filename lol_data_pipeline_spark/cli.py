"""CLI entry point mirroring the reference's pipeline surface.

The reference's CLI (reference src/api/pipeline.py:119-127) takes
``--api_key_path --summoner --queue_type --db --collection
--rate_limit`` and runs the E1 lifecycle into MongoDB. This engine
exposes the same parameters over the Spark-native pipeline; the sink
is a parquet table path (``--db/--collection`` become directory
components, overwrite semantics identical to the Mongo
truncate-and-load, db.py:32-37).

Run:
    python -m lol_data_pipeline_spark --summoner bob \
        --queue_type draft blind --db ./out --collection match_data

Without ``--api-key-path`` the deterministic mock fetcher is used
(hermetic; no network) — the PUUID is derived from the summoner name
the way the mock API would.
"""

from __future__ import annotations

import argparse
import hashlib
import os

from lol_data_pipeline_spark.session import get_spark
from lol_data_pipeline_spark.sources.riot import run_pipeline


def _mock_puuid(summoner: str) -> str:
    """Deterministic stand-in for the summoner→PUUID lookup
    (reference summoner.py:11-28) in mock mode."""
    return f"puuid_{int(hashlib.md5(summoner.encode()).hexdigest()[:8], 16) % 97}"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="lol_data_pipeline_spark",
        description="Spark-native match-data pipeline (reference E1 lifecycle)",
    )
    p.add_argument(
        "--api-key-path",
        default=None,
        help="path to a Riot API key file; when given, the live "
        "HttpFetcher + summoner lookup are used instead of mocks",
    )
    p.add_argument("--summoner", required=True)
    p.add_argument(
        "--queue_type",
        nargs="+",
        choices=["draft", "blind", "aram"],
        default=["draft", "blind", "aram"],
    )
    p.add_argument("--db", default="./lol_out")
    p.add_argument("--collection", default="match_data")
    p.add_argument("--rate_limit", type=float, default=None, help="requests/sec per task")
    p.add_argument("--num-matches", type=int, default=1000)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark("lol_pipeline_cli")
    out = os.path.join(args.db, args.collection)
    if args.api_key_path:
        # Live mode (reference pipeline.py:94-118): real PUUID lookup
        # + HTTP fetcher with Retry-After/429 policy.
        from lol_data_pipeline_spark.sources.http import HttpFetcher, lookup_puuid

        with open(args.api_key_path) as fh:
            api_key = fh.read().strip()
        puuid = lookup_puuid(args.summoner, api_key)
        fetcher = HttpFetcher(api_key=api_key)
    else:
        puuid, fetcher = _mock_puuid(args.summoner), None
    kwargs = {"fetcher": fetcher} if fetcher else {}
    result = run_pipeline(
        spark,
        puuid=puuid,
        out_path=out,
        queue_types=args.queue_type,
        num_matches=args.num_matches,
        rate_limit_per_task=args.rate_limit,
        **kwargs,
    )
    n = spark.read.parquet(out).count()
    print(f"wrote {n} rows x {len(result.columns)} cols to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
