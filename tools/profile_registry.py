"""Profile EVERY registered query at a given SF (default sf0.1) and
print a sorted table slowest-first. Perf triage for the non-headline
registry end — bench.py measures the headline set only; this finds the
next shape worth fixing.

Usage: python tools/profile_registry.py [sf_dir] [runs] [only_query1,query2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from erathia_market_etl_spark.config import EngineConfig
from erathia_market_etl_spark.plans import all_queries
from erathia_market_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    spark = get_spark(EngineConfig(app_name="erathia-profile"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from erathia_market_etl_spark.operators.similarity import vectorized_cosine_udf

    scorer = vectorized_cosine_udf([1.0, 1.0])
    spark.range(10_000).selectExpr(
        "array(cast(id as float), cast(1 as float)) AS v"
    ).select(scorer("v")).write.mode("overwrite").format("noop").save()

    registry = all_queries()
    names = only or list(registry)
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                df = registry[name](spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 - triage tool, keep going
            print(f"{name}: ERROR {type(e).__name__}: {e}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}", file=sys.stderr)

    ranked = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"sf_dir": sf_dir, "total": round(sum(timings.values()), 3),
                      "queries": ranked}))
    spark.stop()


if __name__ == "__main__":
    main()
