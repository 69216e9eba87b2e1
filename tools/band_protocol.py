"""Isolated 8-run noise-band protocol (BASELINE.md's drift adjudicator).

Cross-round bench drifts on untouched, plan-pinned queries are usually
the measurement context, not the code (BASELINE.md documents ±30-65%
on idle-machine reruns). The standing adjudication protocol, used for
q3 (r6), window_running_total (r7), sim_topk_ivf (r9),
sim_similar_pairs (r12), and pagerank/SCD2 (r13), is:

  1. QUIET BOX — nothing else running (a concurrent pytest sweep
     inflated the first r13 attempt ~10%; rerun after it finished);
  2. fresh session, one untimed warm-up job (absorbs first-plan JIT);
  3. 8 construction-inclusive runs per query, report min/median/max
     (run 1 usually carries a visible JIT premium — that is data, not
     an outlier to discard);
  4. read the verdict: a FIXED floor that brackets both round readings
     = context noise; a floor that moved WITH the fixtures or the code
     = investigate the diff/plan pins.

Also prints the numpy calibration probe (bench.py's host_factor
basis) so host speed is part of the record.

Usage: python tools/band_protocol.py QUERY [QUERY ...] [--sf DIR]
       (QUERY = any registered name, or module:function for
        local-only plans, e.g. plans.graph_queries:graph_pagerank_influence)
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNS = 8


def _probe() -> float:
    import numpy as np

    a = np.arange(20_000_000, dtype=np.float64)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.sqrt(a * 1.000001 + 1.5).sum()
        best = min(best, time.perf_counter() - t0)
    return best


def _resolve(name: str):
    if ":" in name:
        mod, fn = name.split(":", 1)
        m = importlib.import_module(f"erathia_market_etl_spark.{mod}")
        return getattr(m, fn)
    from erathia_market_etl_spark.plans import registry

    registry._load_all()
    return registry.QUERIES[name]


def main() -> None:
    from erathia_market_etl_spark.config import EngineConfig
    from erathia_market_etl_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    if not args:
        raise SystemExit(__doc__)

    probe = _probe()
    spark = get_spark(EngineConfig(app_name="band-protocol"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warm-up
    out: dict[str, dict] = {
        "_probe": {"sec": round(probe, 4),
                   "host_factor": round(probe / 0.13, 3)},
    }
    for name in args:
        fn = _resolve(name)
        runs = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "runs": runs,
            "min": min(runs),
            "median": sorted(runs)[RUNS // 2],
            "max": max(runs),
        }
        print(name, out[name], flush=True)
    print("BAND " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
