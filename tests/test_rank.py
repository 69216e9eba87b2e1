"""operators/rank.py — the melted block rank / arithmetic-NTILE kernel
(r12, the r11 VERDICT's RFM fix).

Semantics pins: the arithmetic NTILE must equal Spark's own
``F.ntile`` under the same deterministic total order for sizes that
exercise the uneven-bucket rule AND the n < buckets edge.
Plan pins: the kernel must contain NO Exchange SinglePartition (the
whole point), and the consuming ``mart_rfm_segments`` plan must be
free of both single-partition exchanges and native ntile windows with
a LINEAR (not exponential) number of scans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from erathia_market_etl_spark.operators.rank import with_ntile, with_ntiles
from erathia_market_etl_spark.plans.relational import mart_rfm_segments

from .conftest import SF_T2


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (150, 4), (151, 4), (153, 4), (97, 7)])
def test_arithmetic_ntile_matches_native(spark, n, k):
    # deterministic scrambled values with ties: v = (i*7) % 13
    base = spark.range(n).select(
        F.col("id").alias("key"), ((F.col("id") * 7) % 13).alias("v")
    )
    got = with_ntile(
        base, F.col("v"), "key", buckets=k, out_col="q", block_width=3
    )
    want = base.withColumn(
        "q_native", F.ntile(k).over(Window.orderBy(F.desc("v"), "key"))
    )
    joined = got.join(want.select("key", "q_native"), "key")
    mismatches = joined.filter(F.col("q") != F.col("q_native")).count()
    assert mismatches == 0


def test_multi_metric_matches_chained_native(spark):
    base = spark.range(200).select(
        F.col("id").alias("key"),
        ((F.col("id") * 7) % 13).alias("a"),
        ((F.col("id") * 11) % 5).alias("b"),
    )
    got = with_ntiles(
        base,
        "key",
        [("qa", F.col("a"), 2), ("qb", F.col("b"), 100)],
        buckets=4,
    )
    want = base.select(
        "key",
        F.ntile(4).over(Window.orderBy(F.desc("a"), "key")).alias("na"),
        F.ntile(4).over(Window.orderBy(F.desc("b"), "key")).alias("nb"),
    )
    joined = got.join(want, "key")
    bad = joined.filter(
        (F.col("qa") != F.col("na")) | (F.col("qb") != F.col("nb"))
    ).count()
    assert bad == 0


def test_kernel_plan_has_no_single_partition_exchange(spark):
    base = spark.range(100).select(
        F.col("id").alias("key"), (F.col("id") % 17).alias("v")
    )
    plan = _plan(
        with_ntile(base, F.col("v"), "key", buckets=4, out_col="q",
                   block_width=4)
    )
    assert "Exchange SinglePartition" not in plan
    assert "ntile(" not in plan  # arithmetic, not a native window


def test_kernel_rejects_bad_inputs(spark):
    base = spark.range(10).select(F.col("id").alias("key"))
    with pytest.raises(ValueError, match="block_width"):
        with_ntile(base, F.col("key"), "key", buckets=4, out_col="q",
                   block_width=0)
    with pytest.raises(ValueError, match="at least one"):
        with_ntiles(base, "key", [], buckets=4)


def test_mart_rfm_plan_is_scale_safe(spark):
    """The r11 VERDICT weak item's fix, pinned: no single-partition
    exchange anywhere, no native ntile window, and the upstream
    aggregate is referenced a LINEAR number of times — the naive
    chained formulation measured 2^k scans (8 for the 3 metrics); the
    melt kernel holds it at 3 (df + melted + counts) regardless of
    metric count."""
    plan = _plan(mart_rfm_segments(spark, SF_T2))
    assert "Exchange SinglePartition" not in plan
    assert "ntile(" not in plan
    assert plan.count("FileScan") <= 3


def test_arithmetic_ntile_formula_exhaustive_small_domain(spark):
    """Exhaustive sweep of the NTILE arithmetic itself: every
    (n, k, rank) with 1 <= rank <= n <= 30, 1 <= k <= 8 (7200 triples,
    ONE job) against the SQL-standard reference computed in Python —
    first n%k buckets get ceil(n/k) rows. Covers every uneven-bucket
    boundary and the n < k degenerate band that the parametrized
    native-window tests sample only pointwise."""
    from erathia_market_etl_spark.operators.rank import ntile_expr

    triples = [
        (n, k, r)
        for n in range(1, 31)
        for k in range(1, 9)
        for r in range(1, n + 1)
    ]

    def ref(n, k, r):
        c, rem = divmod(n, k)
        cut = rem * (c + 1)
        if r <= cut:
            return (r - 1) // (c + 1) + 1
        return rem + (r - cut - 1) // c + 1 if c else r

    # reference sanity vs a direct "sizes" construction
    for n, k in [(5, 3), (7, 4), (3, 8), (8, 8), (9, 4)]:
        sizes = [(n // k) + (1 if i < n % k else 0) for i in range(k)]
        seq = [i + 1 for i, s in enumerate(sizes) for _ in range(s)]
        assert [ref(n, k, r) for r in range(1, n + 1)] == seq

    df = spark.createDataFrame(triples, "n long, k long, r long")
    got = (
        df.withColumn("q4", ntile_expr("r", "n", 4))
        .withColumn("q8", ntile_expr("r", "n", 8))
        .collect()
    )
    for row in got:
        assert row["q4"] == ref(row["n"], 4, row["r"])
        assert row["q8"] == ref(row["n"], 8, row["r"])


def test_skyline_planted_dominance_and_ties(spark, tmp_path):
    """skyline_part_frontier semantic pin on a planted catalog:

      (k1, $10.00, 5)  frontier (cheapest overall)
      (k2, $10.00, 5)  equal duplicate of k1 -> BOTH kept
      (k3, $10.00, 7)  same price, bigger -> dominated by k1
      (k4, $12.00, 3)  dearer but smaller -> frontier
      (k5, $12.00, 5)  dominated by k1 (cheaper, equal size)
      (k6, $15.00, 3)  dominated by k4 (cheaper, equal size)
      (k7, $15.00, 1)  frontier
    k1/k4 sit in different price blocks from k6/k7 (block = $5), so the
    cross-block prior-min path and the within-block range frame are
    BOTH load-bearing in this fixture."""
    import os

    from erathia_market_etl_spark.plans.relational import (
        skyline_part_frontier,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    rows = [
        (1, 10.00, 5), (2, 10.00, 5), (3, 10.00, 7), (4, 12.00, 3),
        (5, 12.00, 5), (6, 15.00, 3), (7, 15.00, 1),
    ]
    spark.createDataFrame(
        [(k, "n", "b", "t", sz, pr) for k, pr, sz in rows],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.parquet(f"{sf}/part.parquet")
    got = [tuple(r) for r in skyline_part_frontier(spark, sf).collect()]
    assert got == [
        (1, 1000, 5),
        (2, 1000, 5),
        (4, 1200, 3),
        (7, 1500, 1),
    ]


def test_skyline_matches_bruteforce_on_random_catalogs(spark, tmp_path):
    """Generative pin (the scd2/funnel precedent): the block-decomposed
    skyline must equal the O(n²) brute-force dominance check on
    seeded-random catalogs with heavy price ties and duplicate
    (price, size) pairs — the regimes where the strict/non-strict
    dominance arms and the block-boundary handoffs actually interact."""
    import os
    import random

    from erathia_market_etl_spark.plans.relational import (
        skyline_part_frontier,
    )

    rng = random.Random(12)
    for trial in range(3):
        n = 120
        rows = [
            (
                k,
                round(rng.choice([9.0, 9.5, 10.0, 11.0, 12.5, 14.0])
                      + rng.randrange(0, 4) * 0.25, 2),
                rng.randrange(1, 9),
            )
            for k in range(1, n + 1)
        ]
        cents = {k: int(round(p * 100)) for k, p, _ in rows}
        frontier = set()
        for k, p, s in rows:
            dominated = any(
                cents[k2] <= cents[k] and s2 <= s
                and (cents[k2] < cents[k] or s2 < s)
                for k2, p2, s2 in rows
                if k2 != k
            )
            if not dominated:
                frontier.add(k)

        sf = str(tmp_path / f"sf{trial}")
        os.makedirs(sf)
        spark.createDataFrame(
            [(k, "n", "b", "t", s, p) for k, p, s in rows],
            "p_partkey long, p_name string, p_brand string,"
            " p_type string, p_size int, p_retailprice double",
        ).write.parquet(f"{sf}/part.parquet")
        got = {r["p_partkey"] for r in skyline_part_frontier(spark, sf).collect()}
        assert got == frontier, (trial, got ^ frontier)


def test_grouped_rank_matches_native_on_scrambled_groups(spark):
    """grouped_rank (r12) must equal the native per-group
    ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, key) for data with
    heavy ties, multiple groups, negative values, and block-boundary
    straddles — and its plan must be SinglePartition-free (the whole
    point of the decomposition)."""
    from erathia_market_etl_spark.operators.rank import grouped_rank

    base = spark.range(211).select(
        F.col("id").alias("key"),
        (F.col("id") % 5).alias("g"),
        (((F.col("id") * 13) % 29) - 7).alias("v"),  # ties + negatives
    )
    got = grouped_rank(
        base, ["g"], F.col("v"), "key", block_width=4,
        out_rank="r", out_n="n",
    )
    w = Window.partitionBy("g").orderBy("v", "key")
    want = base.withColumn("r_native", F.row_number().over(w)).withColumn(
        "n_native", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    joined = got.join(want, ["key", "g"]).select(
        "key", "g", "r", "r_native", "n", "n_native"
    )
    bad = joined.filter(
        (F.col("r") != F.col("r_native")) | (F.col("n") != F.col("n_native"))
    ).count()
    assert bad == 0
    assert joined.count() == 211
    assert "Exchange SinglePartition" not in _plan(got)


def test_grouped_rank_rejects_nonpositive_width(spark):
    from erathia_market_etl_spark.operators.rank import grouped_rank

    base = spark.range(3).select(F.col("id").alias("key"), F.lit(0).alias("g"))
    with pytest.raises(ValueError):
        grouped_rank(base, ["g"], F.col("key"), "key", block_width=0)


def test_grouped_prefix_sum_matches_native_window(spark):
    """grouped_prefix_sum (r12) must equal the native running
    SUM() OVER (PARTITION BY g ORDER BY v, key ROWS UNBOUNDED
    PRECEDING) — ties, negatives, and block straddles included — and
    stay SinglePartition-free."""
    from erathia_market_etl_spark.operators.rank import grouped_prefix_sum

    base = spark.range(197).select(
        F.col("id").alias("key"),
        (F.col("id") % 4).alias("g"),
        (((F.col("id") * 11) % 23) - 6).alias("v"),
        (((F.col("id") * 3) % 17) - 2).alias("wt"),
    )
    got = grouped_prefix_sum(
        base, ["g"], F.col("v"), "key", F.col("wt"),
        block_width=5, out_col="cum",
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v", "key")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = base.withColumn("cum_native", F.sum("wt").over(w))
    joined = got.join(want, ["key", "g"]).select("cum", "cum_native")
    assert joined.filter(F.col("cum") != F.col("cum_native")).count() == 0
    assert joined.count() == 197
    assert "Exchange SinglePartition" not in _plan(got)


def test_concentration_marts_plans_are_singlepartition_free(spark):
    """The two concentration marts (r12) compose the grouped kernels
    end-to-end: their FULL query plans must carry no Exchange
    SinglePartition — the per-group decomposition must survive the
    surrounding joins/aggregates, not just hold in kernel isolation."""
    from erathia_market_etl_spark.plans.relational import (
        mart_pareto_concentration,
        mart_revenue_gini,
    )

    for fn in (mart_revenue_gini, mart_pareto_concentration):
        plan = _plan(fn(spark, SF_T2))
        assert "Exchange SinglePartition" not in plan, fn.__name__


@pytest.mark.parametrize("width", [1, 3, 7, 100, 10**9])
def test_grouped_kernels_are_width_invariant(spark, width):
    """The block width is a PERFORMANCE knob, never a semantics knob:
    grouped_rank and grouped_prefix_sum must return identical results
    at width=1 (every value its own block), mid widths, and a width
    beyond the whole domain (one block — the degenerate plain-window
    case)."""
    from erathia_market_etl_spark.operators.rank import (
        grouped_prefix_sum,
        grouped_rank,
    )

    base = spark.range(151).select(
        F.col("id").alias("key"),
        (F.col("id") % 3).alias("g"),
        (((F.col("id") * 17) % 31) - 9).alias("v"),
        ((F.col("id") % 13) - 3).alias("wt"),
    )
    w = Window.partitionBy("g").orderBy("v", "key")
    want = (
        base.withColumn("r_native", F.row_number().over(w))
        .withColumn(
            "cum_native",
            F.sum("wt").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    got = grouped_prefix_sum(
        grouped_rank(base, ["g"], F.col("v"), "key", block_width=width,
                     out_rank="r", out_n="n"),
        ["g"], F.col("v"), "key", F.col("wt"),
        block_width=width, out_col="cum",
    )
    joined = got.join(want, ["key", "g"])
    bad = joined.filter(
        (F.col("r") != F.col("r_native"))
        | (F.col("cum") != F.col("cum_native"))
    ).count()
    assert bad == 0
    assert joined.count() == 151


def test_kernels_reject_scratch_column_collisions(spark):
    """r12 ADVICE: exported kernels must refuse input frames whose
    columns collide with the internal scratch / output names instead
    of silently overwriting and destroying them."""
    from erathia_market_etl_spark.operators.rank import (
        grouped_prefix_sum,
        grouped_rank,
    )

    base = spark.range(10).select(
        F.col("id").alias("key"),
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 5).alias("v"),
    )
    with pytest.raises(ValueError, match="collide"):
        grouped_rank(base.withColumn("_blk", F.lit(1)), ["g"],
                     F.col("v"), "key", block_width=2)
    # out_n onto an existing column is a collision too
    with pytest.raises(ValueError, match="collide"):
        grouped_rank(base.withColumn("n", F.lit(1)), ["g"],
                     F.col("v"), "key", block_width=2)
    with pytest.raises(ValueError, match="collide"):
        grouped_prefix_sum(base.withColumn("_carry", F.lit(1)), ["g"],
                           F.col("v"), "key", F.col("v"), block_width=2)
    with pytest.raises(ValueError, match="collide"):
        with_ntiles(base.withColumn("_t", F.lit(1)), "key",
                    [("q", F.col("v"), 2)], buckets=4)
    # clean frames still pass
    assert grouped_rank(base, ["g"], F.col("v"), "key",
                        block_width=2).count() == 10
