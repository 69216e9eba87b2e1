"""Column-profile semantics on a planted frame with real nulls and
duplicates (the fixtures are null-free, so the null accounting would
otherwise only ever be exercised at zero)."""

from __future__ import annotations

import datetime as dt

from erathia_market_etl_spark.plans.profile_queries import (
    profile_fact_columns,
)


def test_profile_counts_nulls_distincts_and_renderings(spark, tmp_path):
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, t0, 10, "view", 1.004, '{"a": 1}'),
        (2, t0, 10, "view", 2.345, None),
        (3, None, 11, None, None, None),
        (4, t0 + dt.timedelta(seconds=5), None, "click", 2.345, '{"a": 1}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    p = str(tmp_path / "sf")
    df.write.parquet(p + "/events.parquet")
    got = {r["col_name"]: r.asDict() for r in
           profile_fact_columns(spark, p).collect()}

    assert all(v["n_rows"] == 4 for v in got.values())
    assert got["ts"]["null_count"] == 1
    assert got["ts"]["distinct_count"] == 2          # t0 twice, t0+5 once
    assert got["ts"]["min_repr"] == "2024-03-01 12:00:00"
    assert got["ts"]["max_repr"] == "2024-03-01 12:00:05"
    assert got["user_id"]["null_count"] == 1
    assert got["user_id"]["distinct_count"] == 2
    assert got["event_type"]["null_count"] == 1
    assert got["event_type"]["distinct_count"] == 2
    assert got["value"]["null_count"] == 1
    assert got["value"]["distinct_count"] == 2       # 2.345 deduped
    # cents rendering rounds half up: 1.004 -> 100, 2.345 -> 235
    assert got["value"]["min_repr"] == "100"
    assert got["value"]["max_repr"] == "235"
    assert got["props"]["null_count"] == 2
    assert got["props"]["distinct_count"] == 1
    assert got["event_id"]["null_count"] == 0
    assert got["event_id"]["distinct_count"] == 4


def test_equi_depth_splits_duplicated_values(spark):
    """The case a per-value histogram cannot handle: 10 copies of value
    1 and 5 copies of value 2 into 3 buckets must split INSIDE the
    run of 1s — populations stay maximally equal and the boundary
    buckets overlap in value range."""
    from erathia_market_etl_spark.plans.profile_queries import (
        equi_depth_frame,
    )

    rows = [(1, i, 0) for i in range(10)] + [(2, i, 0) for i in range(5)]
    df = spark.createDataFrame(rows, "v long, k1 long, k2 long")
    got = [tuple(r) for r in equi_depth_frame(df, buckets=3).collect()]
    assert got == [
        (0, 5, 1, 1, 5),
        (1, 5, 1, 1, 5),
        (2, 5, 2, 2, 10),
    ]


def test_equi_depth_population_and_conservation_laws(spark):
    """On a skewed random multiset: bucket populations differ by at
    most one row, buckets are value-ordered, and row/sum totals are
    conserved."""
    import random

    from erathia_market_etl_spark.plans.profile_queries import (
        equi_depth_frame,
    )

    rng = random.Random(41)
    vals = [rng.choice([1, 2, 2, 3, 5, 5, 5, 8, 13]) for _ in range(997)]
    rows = [(v, i, 0) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v long, k1 long, k2 long")
    got = [r.asDict() for r in equi_depth_frame(df, buckets=7).collect()]
    sizes = [r["n_rows"] for r in got]
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == len(vals)
    assert sum(r["sum_v"] for r in got) == sum(vals)
    for a, b in zip(got, got[1:]):
        assert a["hi"] <= b["lo"]   # value-ordered buckets


def test_mad_planted_group_parities(spark):
    """Lower-median convention at every parity: odd group, even group
    (lower of the middle two, never interpolated), and a
    duplicate-heavy group whose MAD collapses to 0."""
    from erathia_market_etl_spark.plans.profile_queries import mad_frame

    rows = (
        [("g_odd", v) for v in (1, 3, 9)]
        + [("g_even", v) for v in (1, 2, 3, 10)]
        + [("g_dup", v) for v in (5, 5, 5, 5, 7)]
    )
    out = {
        r["event_type"]: (r["n"], r["median_cents"], r["mad_cents"])
        for r in mad_frame(
            spark.createDataFrame(rows, "event_type string, c long")
        ).collect()
    }
    assert out == {
        "g_odd": (3, 3, 2),    # devs {2,0,6} -> lower median 2
        "g_even": (4, 2, 1),   # median = lower of (2,3); devs {1,0,1,8} -> 1
        "g_dup": (5, 5, 0),
    }


def test_percentile_bands_planted_nearest_rank(spark):
    """Nearest-rank percentiles by hand: n=4 (P50 at rank 2, P95 at
    rank 4) and a duplicate-heavy n=20 group where the bucket
    boundaries land inside repeated-value runs."""
    import datetime

    from erathia_market_etl_spark.plans.profile_queries import (
        percentile_bands_frame,
    )

    d = datetime.date(2024, 1, 1)
    rows = (
        [("a", d, v) for v in (10, 20, 30, 40)]
        + [("b", d, 5)] * 18
        + [("b", d, 7), ("b", d, 9)]
    )
    out = {
        r["event_type"]: (
            r["n"], r["p50_cents"], r["p95_cents"], r["max_cents"]
        )
        for r in percentile_bands_frame(
            spark.createDataFrame(
                rows, "event_type string, day date, c long"
            )
        ).collect()
    }
    # a: ranks ceil(.5*4)=2 -> 20; ceil(.95*4)=4 -> 40
    assert out["a"] == (4, 20, 40, 40)
    # b: n=20, ceil(10)=10 -> 5 (inside the run); ceil(19)=19 -> 7
    assert out["b"] == (20, 5, 7, 9)


def test_dq_expectations_counts_planted_violations(spark, tmp_path):
    """dq_expectations_suite (r12) on a micro-star with one planted
    violation per check class — the fixtures are violation-free, so
    without this the violation-counting paths only ever attest at
    zero (vacuous green)."""
    import datetime as dt

    from erathia_market_etl_spark.plans.profile_queries import (
        dq_expectations_suite,
    )

    p = str(tmp_path / "sf")
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).write.parquet(
            f"{p}/{name}.parquet"
        )

    w("customer", [(1, "a", 0, 0.0, "m"), (1, "dup", 0, 0.0, "m")],
      "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
      " c_mktsegment string")
    # order 20 -> custkey 99 is an FK orphan; order 21 nonpositive price
    w("orders",
      [(20, 99, "O", 10.0, dt.date(2024, 3, 1), "1-URGENT"),
       (21, 1, "O", -5.0, dt.date(2024, 3, 2), "1-URGENT")],
      "o_orderkey long, o_custkey long, o_orderstatus string,"
      " o_totalprice double, o_orderdate date, o_orderpriority string")
    w("part", [(7, "p")], "p_partkey long, p_name string")
    # line 1: orphan orderkey 999 + orphan partkey 8; line 2: discount 1.5
    w("lineitem",
      [(999, 8, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.date(2024, 3, 1)),
       (20, 7, 1, 1, 1.0, 1.0, 1.5, 0.0, "N", "O", dt.date(2024, 3, 1))],
      "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
      " l_quantity double, l_extendedprice double, l_discount double,"
      " l_tax double, l_returnflag string, l_linestatus string,"
      " l_shipdate date")
    w("events",
      [(1, t0, None, "view", 1.0, "{}"), (2, t0, 5, "weird", 1.0, "{}")],
      "event_id long, ts timestamp, user_id long, event_type string,"
      " value double, props string")
    w("documents", [(1, "", "en", "s", 0), (2, "ok", "en", "s", 2)],
      "doc_id long, text string, lang string, source string, n_chars long")

    got = {r["check_name"]: r.asDict()
           for r in dq_expectations_suite(spark, p).collect()}
    assert got["pk_customer_custkey"]["violations"] == 1
    assert got["fk_orders_custkey"]["violations"] == 1
    assert got["range_orders_totalprice_positive"]["violations"] == 1
    assert got["fk_lineitem_orderkey"]["violations"] == 1
    assert got["fk_lineitem_partkey"]["violations"] == 1
    assert got["range_lineitem_discount_unit_interval"]["violations"] == 1
    assert got["not_null_events_user_id"]["violations"] == 1
    assert got["accepted_values_event_type"]["violations"] == 1
    assert got["nonempty_documents_text"]["violations"] == 1
    assert all(not v["passed"] for k, v in got.items()
               if k != "pk_orders_orderkey")
    assert got["pk_orders_orderkey"]["violations"] == 0
    assert got["pk_orders_orderkey"]["passed"]
    assert got["fk_lineitem_orderkey"]["checked"] == 2


def test_weighted_median_matches_bruteforce_and_uses_weights(spark):
    """agg_weighted_median must equal the pure-Python lower weighted
    median per flag at sf0.001, and on a planted frame where volume
    concentrates on high prices it must differ from the UNWEIGHTED
    median (the weights must actually matter)."""
    from erathia_market_etl_spark.plans.profile_queries import (
        agg_weighted_median,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["flag"]: r["weighted_median_cents"]
           for r in agg_weighted_median(spark, sf).collect()}
    pdf = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    import math

    for flag, grp in pdf.groupby("l_returnflag"):
        rows = sorted(
            (math.floor(p * 100 + 0.5), int(q))
            for p, q in zip(grp["l_extendedprice"], grp["l_quantity"])
        )
        w_total = sum(q for _, q in rows)
        cum = 0
        for cents, q in rows:
            cum += q
            if 2 * cum >= w_total:
                assert got[flag] == cents, flag
                break

    # planted: prices 1..5 cents each qty 1, plus price 5 with qty 95
    # -> unweighted median 4 (of {1,2,3,4,5,5}), weighted median 5
    import datetime as dt

    planted = spark.createDataFrame(
        [(i, i, 1, i, 1.0, float(i) / 100, 0.0, 0.0, "N", "O",
          dt.date(2024, 3, 1)) for i in range(1, 6)]
        + [(6, 6, 1, 1, 95.0, 0.05, 0.0, 0.0, "N", "O",
            dt.date(2024, 3, 1))],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber long, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate date",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        planted.write.parquet(f"{d}/lineitem.parquet")
        row = agg_weighted_median(spark, d).collect()[0]
        assert row["weighted_median_cents"] == 5
        assert row["total_qty"] == 100


def test_k_anonymity_counts_planted_cells(spark, tmp_path):
    """privacy_k_anonymity on a planted table: 3 cells of sizes
    6/2/1 at k=5 -> 2 risky cells, 3 risky rows of 9."""
    from erathia_market_etl_spark.plans.profile_queries import (
        privacy_k_anonymity,
    )

    rows = (
        [(i, f"u{i}", 1, 0.0, "AUTO") for i in range(6)]
        + [(10, "a", 1, 0.0, "BLDG"), (11, "b", 1, 0.0, "BLDG")]
        + [(20, "c", 2, 0.0, "AUTO")]
    )
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    )
    p = str(tmp_path / "sf")
    df.write.parquet(f"{p}/customer.parquet")
    r = privacy_k_anonymity(spark, p).collect()[0]
    assert (r["n_cells"], r["n_rows"], r["min_cell"]) == (3, 9, 1)
    assert (r["risky_cells"], r["risky_rows"]) == (2, 3)
    assert r["risky_share_ppm"] == 3 * 1_000_000 // 9
