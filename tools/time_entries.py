"""Bench-methodology timer for a NAMED SUBSET of registry entries.

Same measurement shape as bench.py (one engine session, noop sink,
warm run then min-of-3) so that A/B numbers taken here are comparable
to the bench of record, without paying for the full 116-entry sweep.
A 32-way calibration probe runs before and after (bench.py's
interference adjudication) so a contended draw is visible in the
output instead of silently poisoning the A/B.

Usage: python tools/time_entries.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _calibrate_mc  # noqa: E402
from lol_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from lol_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    names = args
    mc0 = _calibrate_mc()
    spark = get_spark("time_entries")
    out: dict[str, float] = {}
    for name in names:
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    mc1 = _calibrate_mc()
    print(json.dumps({"queries": out, "total": round(sum(out.values()), 3),
                      "calib_mc": mc0, "calib_mc_after": mc1}))


if __name__ == "__main__":
    main()
