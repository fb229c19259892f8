"""Within-session A/B for the round-11 bench headline swap
(PERF_NOTES discipline: same process, warm run + min of N, recompute
and served twins interleaved so host state cancels).

Usage: python tools/ab_round11.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lol_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from lol_data_pipeline_spark.session import get_spark  # noqa: E402

PAIRS = [
    ("ann_ivfpq_kmeans_topk", "ann_ivfpq_served_topk"),
    ("ann_graph_beam_topk", "ann_graph_beam_served_topk"),
    ("ann_mmr_rerank", "ann_served_mmr_rerank"),
]


def run_once(spark, sf_dir: str, name: str) -> float:
    t0 = time.perf_counter()
    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_round11")
    names = [x for pair in PAIRS for x in pair]
    for name in names:  # warm (also builds/reuses the indexes)
        run_once(spark, sf_dir, name)
    times: dict[str, list[float]] = {x: [] for x in names}
    for _ in range(n):  # interleaved rounds
        for name in names:
            times[name].append(run_once(spark, sf_dir, name))
    for a, b in PAIRS:
        ma, mb = min(times[a]), min(times[b])
        print(
            f"{a:28s} min {ma:6.3f}  vs  {b:28s} min {mb:6.3f}"
            f"  ({mb / ma:.2f}x)"
        )
    for name in names:
        print(f"  {name:30s} runs: {[round(t, 3) for t in times[name]]}")


if __name__ == "__main__":
    main()
