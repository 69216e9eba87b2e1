"""Command-line entry point — the reference's ``main.py`` workflow
(menu choices 1-5: generate bronze / process silver / aggregate gold /
full pipeline / view reports) as subcommands on one Spark engine.

Usage:
    python -m erathia_market_etl_spark.app bronze  --work /tmp/erathia --weeks 104
    python -m erathia_market_etl_spark.app silver  --work /tmp/erathia
    python -m erathia_market_etl_spark.app gold    --work /tmp/erathia
    python -m erathia_market_etl_spark.app full    --work /tmp/erathia --weeks 104
    python -m erathia_market_etl_spark.app report  --work /tmp/erathia [--mart NAME]
"""

from __future__ import annotations

import argparse
import os

from .config import EngineConfig, SimulationConfig
from .generator.bronze import generate_bronze
from .pipeline import MART_SQL, run_gold, run_silver
from .session import get_spark


def _dirs(work: str) -> tuple[str, str, str]:
    return (
        os.path.join(work, "bronze"),
        os.path.join(work, "silver"),
        os.path.join(work, "gold"),
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="erathia-market-etl-spark")
    ap.add_argument("command", choices=["bronze", "silver", "gold", "full", "report"])
    ap.add_argument("--work", required=True, help="pipeline working directory")
    ap.add_argument("--weeks", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--col-rate", type=float, default=None,
                    help="cost-of-living rate (ref main.py:82-89 validation)")
    ap.add_argument("--wealth-tax", type=float, default=None)
    ap.add_argument("--mart", default=None, help="report: mart table to print")
    args = ap.parse_args(argv)

    cfg = SimulationConfig()
    if args.seed is not None:
        cfg.seed = args.seed
    # parameter validation with fallback-to-defaults (ref main.py:82-89)
    if args.col_rate is not None:
        if 0.0 <= args.col_rate <= 1.0:
            cfg.cost_of_living_rate = args.col_rate
        else:
            print(f"invalid --col-rate {args.col_rate}, using default "
                  f"{cfg.cost_of_living_rate}")
    if args.wealth_tax is not None:
        if 0.0 <= args.wealth_tax <= 1.0:
            cfg.wealth_tax_rate = args.wealth_tax
        else:
            print(f"invalid --wealth-tax {args.wealth_tax}, using default "
                  f"{cfg.wealth_tax_rate}")
    if args.weeks is not None and args.weeks <= 0:
        print(f"invalid --weeks {args.weeks}, using default {cfg.default_weeks}")
        args.weeks = None

    bronze, silver, gold = _dirs(args.work)

    if args.command == "bronze":
        stats = generate_bronze(bronze, weeks=args.weeks, cfg=cfg)
        print(f"bronze written: {stats}")
        return 0

    spark = get_spark(EngineConfig(app_name="erathia-market-etl-cli"))
    try:
        if args.command == "silver":
            print(f"silver counts: {run_silver(spark, bronze, silver)}")
        elif args.command == "gold":
            marts = run_gold(spark, silver, gold)
            print(f"gold marts written: {sorted(marts)}")
        elif args.command == "full":
            stats = generate_bronze(bronze, weeks=args.weeks, cfg=cfg)
            counts = run_silver(spark, bronze, silver)
            marts = run_gold(spark, silver, gold)
            print(f"bronze: {stats}\nsilver: {counts}\nmarts: {sorted(marts)}")
        elif args.command == "report":
            marts = run_gold(spark, silver)
            names = sorted(marts)
            if args.mart is None:
                print("available marts (ref main.py:263 dm_%% discovery):")
                for n in names:
                    print(f"  {n}")
            elif args.mart in marts:
                marts[args.mart].show(100, truncate=False)
            else:
                print(f"unknown mart {args.mart}; choose from {names}")
                return 2
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())


# keep the mart list importable for tooling parity checks
MARTS = sorted(MART_SQL)
