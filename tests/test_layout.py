"""Data-layout verification: write_range_clustered must produce parquet
files whose footer min/max statistics on the cluster key are pairwise
disjoint — the property file-skipping readers (Spark, DuckDB, Trino,
Iceberg planning) prune on. Checked from the real parquet metadata via
pyarrow, not from Spark's plan."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from erathia_market_etl_spark.sources.parquet_io import (
    load_table,
    write_range_clustered,
)

from .conftest import SF_SMOKE


def _file_ranges(path, col):
    ranges = []
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    return sorted(ranges)


def test_range_clustered_files_have_disjoint_stats(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    out = str(tmp_path / "clustered")
    write_range_clustered(li, out, ["l_shipdate"], n_files=4)

    ranges = _file_ranges(out, "l_shipdate")
    assert len(ranges) >= 2  # actually split
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        # range partitioning puts equal keys in one partition; successive
        # files may touch at the boundary but never interleave
        assert hi_prev <= lo_next

    # row count preserved
    back = spark.read.parquet(out)
    assert back.count() == li.count()


def test_unclustered_baseline_overlaps(spark, tmp_path):
    """Sanity check that the property is non-trivial: a plain repartition
    (round-robin) write produces overlapping file ranges."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    out = str(tmp_path / "roundrobin")
    li.repartition(4).write.mode("overwrite").parquet(out)
    ranges = _file_ranges(out, "l_shipdate")
    overlaps = sum(
        1 for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]) if hi_prev > lo_next
    )
    assert overlaps > 0


def test_fan_out_rebalances_small_scan(spark):
    """fan_out's contract: a scan with fewer splits than cores is
    round-robin rebalanced to defaultParallelism; an input already at or
    above that parallelism is returned untouched (the production case —
    no shuffle is added at real split counts)."""
    from erathia_market_etl_spark.sources.parquet_io import fan_out

    n = spark.sparkContext.defaultParallelism
    small = spark.range(100).coalesce(1)
    assert fan_out(small).rdd.getNumPartitions() == n

    big = spark.range(100).repartition(n + 3)
    out = fan_out(big)
    assert out is big  # identity, not just same partition count
