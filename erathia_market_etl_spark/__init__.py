"""erathia_market_etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference ETL pipeline (``D-Kniec/erathia-market-etl``), re-expressed
Spark-first: one engine (PySpark DataFrame/SQL + Catalyst + AQE) replaces
the reference's pandas-generation / Spark-cleaning / DuckDB-analytics
trio. See SURVEY.md at the repo root for the full operator inventory this
package implements.

Layout:
    config          paths / seed / rates (ref: src/config.py:1-14)
    session         SparkSession factory with scale-aware defaults
    schemas         enforced StructTypes (ref: src/schemas.py:6-19, there dead code)
    sources/        parquet IO, JSON definitions, calendar dim, catalog
    operators/      cleaning, joins, aggregates, sorts, set ops, windows,
                    dedup, similarity, text analysis, multimodal plumbing
    functions/      scalar column helpers (date keys, money, cross-engine hashes)
    plans/          gold data-mart pipelines + the driver-facing query registry
    generator/      seeded market simulator (bronze producer, driver-side)
    streaming/      structured-streaming analogs of the batch window ops
"""

__version__ = "0.1.0"
