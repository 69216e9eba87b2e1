"""Dump .explain('formatted') for the bench query set into plans/<round>/.

Usage: python tools/dump_plans.py [--dir rNN] <suffix> [query ...]
  --dir   output round directory under plans/ (default r16)
  suffix  e.g. "before" / "after" — files land at plans/<dir>/<name>_<suffix>.txt
  query   optional subset; default = HEADLINE + TIER2 from bench.py

Construction-eager queries (funnel, components, pagerank) execute jobs
while the plan is built; this tool only needs the FINAL frame's plan, so
it pays that construction once per query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, TIER2, _tier2_queries
from erathia_market_etl_spark.config import EngineConfig
from erathia_market_etl_spark.plans import all_queries
from erathia_market_etl_spark.session import get_spark

_PLANS_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans"
)


def main() -> None:
    argv = list(sys.argv[1:])
    round_dir = "r16"
    if argv and argv[0] == "--dir":
        round_dir = argv[1]
        argv = argv[2:]
    out_dir = os.path.join(_PLANS_ROOT, round_dir)
    suffix = argv[0] if argv else "before"
    names = argv[1:] or (HEADLINE + TIER2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(EngineConfig(app_name="erathia-plan-dump"))
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    tier2_fns = _tier2_queries()
    for name in names:
        if name == "stream_rollup_maintenance":
            continue  # streaming lifecycle closure: no single frame to explain
        fn = registry.get(name) or tier2_fns.get(name)
        if fn is None:
            print(f"SKIP {name}: not found")
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"WROTE {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
