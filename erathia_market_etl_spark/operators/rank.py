"""Distributed exact global rank / NTILE via the block decomposition.

The scale problem: ``ROW_NUMBER() / NTILE(k) OVER (ORDER BY ...)`` with
no PARTITION BY plans as ``Exchange SinglePartition + Sort + Window`` —
the whole frame funnels through ONE task. Fine over a bounded grain
(a 50-row distinct-value count table), a scale-killer over a
data-scaling grain (customers, documents, users): at 100 TB that is
billions of rows through a single sort (the r11 VERDICT's
``mart_rfm_segments`` finding).

The decomposition (same family as ``text_length_trim`` /
``histogram_equi_depth``, generalized to near-unique value domains):

  1. quantize the sort value into coarse BLOCKS — ``block = s DIV w``
     with ``s`` the ascending sort key and ``w`` a constant width.
     Truncating division is monotone non-decreasing in ``s`` (for
     positive ``w``), so blocks are contiguous ranges of the total
     order. The block count is ``value_range / w`` — bounded by the
     DOMAIN of the value (price ceilings, date spans), not by the row
     count, which is what keeps the offsets table tiny at any SF.
  2. per-block counts (map-side combinable aggregate), then the
     cumulative ``below`` offset and total ``n`` via a window over the
     TINY block table;
  3. broadcast the offsets back and take ``row_number()`` WITHIN each
     block (``Window.partitionBy(block)`` — parallel across blocks);
     ``rank = below + rn`` is the exact global rank because blocks are
     order-aligned and the within-block order completes the total
     order (callers must pass a tie-breaking key).

NTILE is then pure arithmetic on (rank, n): with ``c = n DIV k`` and
``r = n MOD k``, SQL-standard NTILE gives the first ``r`` buckets
``c+1`` rows and the rest ``c`` (both engines agree on this
uneven-bucket rule) — so
``bucket = (rank-1) DIV (c+1) + 1``            when rank <= r*(c+1)
``bucket = r + (rank - r*(c+1) - 1) DIV c + 1`` otherwise,
and the ``c == 0`` (fewer rows than buckets) edge degenerates to
``bucket = rank`` through the first arm (cutoff = n covers every row).

MULTI-METRIC SCORING (``with_ntiles``): scoring the same frame under
several orderings (RFM's recency/frequency/monetary) must NOT chain
three single-metric passes — each pass re-references its upstream for
the block-count branch, and chained that doubles per level (measured:
2^3 = 8 scans of the orders aggregate in the naive RFM chain; exchange
reuse does not fire because column pruning makes the branch subtrees
non-identical). Instead the metrics are MELTED into rows
(key, metric_id, sort_key), ranked in ONE decomposition partitioned by
(metric, block) with PER-METRIC offset windows (the offsets window is
``partitionBy(metric)`` over block-grain rows — not even a
single-partition exchange), and the bucket scores pivoted back with a
conditional-max aggregate. Upstream cost is a flat 2 references (the
melted frame and its block-count aggregate) for ANY number of metrics —
the same 2-reference shape histogram_equi_depth established.

Reference parity: the reference engine has no window functions at all —
this is beyond-reference engine surface; the RFM mart that consumes it
mirrors classic CRM segmentation semantics (NTILE quartiles under a
deterministic total order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _guard_scratch(df: DataFrame, names: set[str], ctx: str) -> None:
    """Reject input frames whose columns collide with the kernel's
    scratch/output names — these are exported kernels, and a silent
    ``withColumn`` overwrite would destroy a caller column (r12 ADVICE
    on grouped_rank/grouped_prefix_sum)."""
    clash = sorted(names & set(df.columns))
    if clash:
        raise ValueError(
            f"{ctx}: input columns {clash} collide with scratch/output "
            f"column names; rename them before calling"
        )


def ntile_expr(rank_col: str, n_col: str, buckets: int) -> Column:
    """SQL-standard ``NTILE(buckets)`` as exact integer arithmetic over
    the named long columns ``rank_col`` (1-based global rank) and
    ``n_col`` (total rows) — see module docstring for the derivation.
    All-integer (DIV) so the bucket is exact at any n a long can hold;
    the ELSE arm's ``DIV c`` is unreachable when ``c == 0`` (the
    n < buckets edge routes every row through the WHEN arm, and CASE
    short-circuits per row, so ANSI mode never sees the zero
    divisor)."""
    k = buckets
    c = f"({n_col} DIV {k})"
    r = f"({n_col} % {k})"
    cutoff = f"({r} * ({c} + 1))"
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {cutoff} "
        f"THEN ({rank_col} - 1) DIV ({c} + 1) + 1 "
        f"ELSE {r} + ({rank_col} - {cutoff} - 1) DIV {c} + 1 "
        f"END AS INT)"
    )


def with_ntiles(
    df: DataFrame,
    key: str,
    specs: list[tuple[str, Column, int]],
    *,
    buckets: int,
) -> DataFrame:
    """Append one ``NTILE(buckets) OVER (ORDER BY value DESC, key ASC)``
    score column per spec ``(out_col, value, block_width)`` — computed
    scale-safely in ONE melted rank decomposition (module docstring).

    ``key`` must be a unique key column of ``df`` (it is both the
    NTILE tiebreak and the pivot-back join key); each ``value`` must be
    an integral Column over ``df`` (cast dates/cents onto longs) and
    each ``block_width`` a positive constant chosen from the value's
    DOMAIN so ``range(value)/block_width`` stays O(thousands)."""
    if not specs:
        raise ValueError("with_ntiles needs at least one spec")
    for out_col, _, w in specs:
        if w <= 0:
            raise ValueError(f"block_width for {out_col} must be > 0")
    _guard_scratch(
        df,
        {"_t", *(out_col for out_col, _, _ in specs)},
        "with_ntiles",
    )
    entries = [
        F.struct(
            F.lit(i).alias("_m"),
            (-value).cast("long").alias("_s"),
            F.lit(int(w)).cast("long").alias("_w"),
        )
        for i, (_, value, w) in enumerate(specs)
    ]
    melted = (
        df.select(F.col(key).alias("_t"), F.explode(F.array(*entries)).alias("e"))
        .select("_t", "e._m", "e._s", "e._w")
        .select("_t", "_m", "_s", F.expr("_s DIV _w").alias("_blk"))
    )
    counts = melted.groupBy("_m", "_blk").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_below = (
        Window.partitionBy("_m")
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_m",
        "_blk",
        F.coalesce(F.sum("_cnt").over(w_below), F.lit(0)).alias("_below"),
        F.sum("_cnt").over(Window.partitionBy("_m")).alias("_n"),
    )
    w_within = Window.partitionBy("_m", "_blk").orderBy("_s", "_t")
    ranked = (
        melted.withColumn("_rn", F.row_number().over(w_within))
        .join(F.broadcast(offsets), ["_m", "_blk"])
        .select(
            "_t",
            "_m",
            (F.col("_below") + F.col("_rn")).cast("long").alias("_rank"),
            F.col("_n"),
        )
        .withColumn("_q", ntile_expr("_rank", "_n", buckets))
    )
    scores = ranked.groupBy("_t").agg(
        *[
            F.max(F.when(F.col("_m") == i, F.col("_q"))).alias(out_col)
            for i, (out_col, _, _) in enumerate(specs)
        ]
    )
    return df.join(scores, F.col(key) == scores["_t"]).drop("_t")


def with_ntile(
    df: DataFrame,
    value: Column,
    key: str,
    *,
    buckets: int,
    out_col: str,
    block_width: int,
) -> DataFrame:
    """Single-metric convenience wrapper over ``with_ntiles``."""
    return with_ntiles(
        df, key, [(out_col, value, block_width)], buckets=buckets
    )


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    tie_col: str,
    *,
    block_width: int,
    out_rank: str = "rank",
    out_n: str = "n",
) -> DataFrame:
    """Append the exact 1-based ASCENDING rank of ``value`` (ties broken
    by ``tie_col``) WITHIN each ``group_cols`` group, plus the group
    size — without ever planning a per-group global sort.

    This is the same block decomposition as ``with_ntiles`` with the
    melt axis replaced by real grouping columns: a bare
    ``ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v)`` funnels each
    group through ONE task, and when the group grain is data-scaling
    (customers per nation, docs per source) that is the r11 RFM
    scale-killer in per-group form. Here instead:

      1. ``block = v DIV block_width`` (truncating division is monotone
         non-decreasing in ``v`` for positive widths, so blocks are
         contiguous ranges of each group's order; block COUNT is
         bounded by the value DOMAIN / width, not the row count);
      2. per-(group, block) counts fold map-side; the cumulative
         ``below`` offsets and the group total ``n`` ride windows over
         the TINY (group x block) table;
      3. ``row_number()`` runs within (group, block) — parallel across
         blocks even inside one huge group — and
         ``rank = below + rn`` completes the exact total order.

    ``value`` must cast losslessly onto a long; callers pick
    ``block_width`` from the value's DOMAIN so the offsets table stays
    O(groups x thousands)."""
    if block_width <= 0:
        raise ValueError("block_width must be > 0")
    _guard_scratch(
        df, {"_s", "_blk", "_rn", "_below", "_n", out_rank, out_n}, "grouped_rank"
    )
    based = df.withColumn("_s", value.cast("long")).withColumn(
        "_blk", F.expr(f"_s DIV {int(block_width)}")
    )
    counts = based.groupBy(*group_cols, "_blk").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_below = (
        Window.partitionBy(*group_cols)
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *group_cols,
        "_blk",
        F.coalesce(F.sum("_cnt").over(w_below), F.lit(0)).alias("_below"),
        F.sum("_cnt").over(Window.partitionBy(*group_cols)).alias("_n"),
    )
    w_within = Window.partitionBy(*group_cols, "_blk").orderBy("_s", tie_col)
    return (
        based.withColumn("_rn", F.row_number().over(w_within))
        .join(F.broadcast(offsets), [*group_cols, "_blk"])
        .withColumn(out_rank, (F.col("_below") + F.col("_rn")).cast("long"))
        .withColumn(out_n, F.col("_n").cast("long"))
        .drop("_s", "_blk", "_rn", "_below", "_n")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    tie_col: str,
    weight: Column,
    *,
    block_width: int,
    out_col: str = "cum",
) -> DataFrame:
    """Append the exact running ``SUM(weight) OVER (PARTITION BY group
    ORDER BY value, tie_col ROWS UNBOUNDED PRECEDING)`` — current row
    INCLUDED — via the same block decomposition as ``grouped_rank``:
    per-(group, block) weight sums fold map-side, the carry into each
    block rides a window over the tiny (group x block) table, and the
    within-block running sum is a window partitioned by (group, block)
    — parallel across blocks even inside one huge group, never a
    per-group single-task funnel. This is the prefix-sum sibling of
    ``grouped_rank`` (events_peak_concurrency inlines the ungrouped
    time-domain case; mart_pareto_concentration consumes this one).

    ``value`` and ``weight`` must cast losslessly onto longs; pick
    ``block_width`` from the value's DOMAIN."""
    if block_width <= 0:
        raise ValueError("block_width must be > 0")
    _guard_scratch(
        df, {"_s", "_blk", "_w", "_win", "_carry", out_col}, "grouped_prefix_sum"
    )
    based = (
        df.withColumn("_s", value.cast("long"))
        .withColumn("_blk", F.expr(f"_s DIV {int(block_width)}"))
        .withColumn("_w", weight.cast("long"))
    )
    blk = based.groupBy(*group_cols, "_blk").agg(F.sum("_w").alias("_bsum"))
    w_carry = (
        Window.partitionBy(*group_cols)
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = blk.select(
        *group_cols,
        "_blk",
        F.coalesce(F.sum("_bsum").over(w_carry), F.lit(0)).alias("_carry"),
    )
    w_within = (
        Window.partitionBy(*group_cols, "_blk")
        .orderBy("_s", tie_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        based.withColumn("_win", F.sum("_w").over(w_within))
        .join(F.broadcast(carry), [*group_cols, "_blk"])
        .withColumn(out_col, (F.col("_carry") + F.col("_win")).cast("long"))
        .drop("_s", "_blk", "_w", "_win", "_carry")
    )
