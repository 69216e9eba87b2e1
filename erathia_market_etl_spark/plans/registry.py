"""Driver-facing query registry.

Every operator from SURVEY.md §2 registers here as a named query: a
PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB-runnable ANSI-SQL oracle over the same parquet
tables. ``__spark_entry__.py`` exposes the two dicts verbatim.

Contract (see repo README / driver docs):
  * column names must match between Spark result and oracle result —
    every computed column is aliased identically on both sides;
  * money/double aggregates are rounded to 2dp on both sides before
    comparison (float summation-order noise, SURVEY.md §7.4);
  * any ORDER BY ... LIMIT has a deterministic total order (tiebreaks).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
_T = TypeVar("_T")

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB SQL twin (omit
    only for genuinely non-SQL-expressible operators)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # import for side effect: each module registers its queries
    from . import (  # noqa: F401
        dedup_queries,
        event_windows,
        multimodal_queries,
        relational,
        sampling_queries,
        similarity_queries,
        streaming_queries,
        temporal_queries,
        text_queries,
    )


# The driver's per-round correctness pass is budget-capped (50 queries
# per round), so registration order is evidence allocation.
#
# ROTATION POLICY (standing, re-derive each round): front-load, in order,
#   (a) every query whose implementation OR oracle changed since its most
#       recent green CORRECTNESS row — stale evidence first;
#   (b) queries that were red / rows-only last round and have since been
#       fixed or given an oracle;
#   (c) queries whose newest green row is two files back (the cap makes
#       greens rotate out; no query's evidence should age past 2 rounds);
#   (d) a handful of flagship canaries to soak up leftover budget.
# Unlisted queries follow in registration order.
_ROUND_PRIORITY: list[str] = [
    # -- (a)+(b) changed since last green row / fixed this round --
    "scalar_array_kit",            # red r2 (raw array output) -> array_join fix
    "agg_stats_profile",           # green r1 only; exact_std/round2_det changed r2
    "dedup_simhash_near_pairs",    # green r1 only; bucket cap changed r2
    "sim_near_dup_pairs",          # banded+capped this round
    "sample_stratified_by",        # deterministic hash-bucket sampling + oracle this round
    "media_feature_extract",       # hashable projection + oracle this round
    "agg_approx_sketches",         # exact-vs-approx delta columns this round
    "agg_freq_items",              # exact-vs-approx delta columns this round
    "dedup_minhash_lsh_pairs",     # cap pipeline touched this round (perf)
    "sim_bucket_stats",            # new this round: sim_near_dup overflow twin
    # -- (c) r1-green with no r2 row: re-attest before evidence ages out --
    "agg_cube",
    "agg_distinct_aggregates",
    "agg_exact_percentiles",
    "agg_grouping_sets",
    "agg_rollup",
    "count_probe",
    "dedup_cluster_components",
    "dedup_distinct_rows",
    "dedup_incremental_new_docs",
    "dedup_ngram_jaccard",
    "dedup_simhash_fingerprint",
    "distinct_projection_sorted",
    "filter_conjunctive",
    "filter_parameterized",
    "join_left_outer_counts",
    "join_semi_anti",
    "media_catalog",
    "pivot_event_type_counts",
    "scd2_dimension_merge",
    "session_window_stats",
    "setop_except",
    "setop_except_all_bag",
    "setop_intersect",
    "setop_union_distinct",
    "silver_dedup_by_key",
    "silver_derive_flag",
    "sliding_window_counts",
    "topk_parts_by_revenue",
    "topk_per_group",
    "tumbling_hourly_stats",
    "unpivot_measures",
    "window_distribution_family",
    "window_lag_lead",
    "window_moving_frame",
    "window_rank_user_events",
    "window_running_total",
    # -- (d) flagship canaries --
    "q1_net_revenue_by_nation",
    "q2_monthly_price_history",
    "q3_top_customers",
    "dedup_exact_hash",
]


def _ordered(d: dict[str, _T]) -> dict[str, _T]:
    out = {n: d[n] for n in _ROUND_PRIORITY if n in d}
    out.update({n: v for n, v in d.items() if n not in out})
    return out


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return _ordered(ORACLES)
