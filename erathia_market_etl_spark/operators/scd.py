"""Slowly-changing-dimension (SCD type 2) merge without MERGE INTO.

Plain-parquet engines have no transactional MERGE; the standard
emulation is anti-join + union + window versioning, all expressible as
one DataFrame pipeline:

  1. changed   = updates ⋈ current ON key WHERE tracked columns differ
  2. closed    = current rows for changed keys, valid_to = batch ts
  3. carried   = current rows without changes (untouched)
  4. inserted  = changed/new update rows, valid_from = batch ts, open

At scale both sides shuffle once on the business key; the tracked-column
comparison is a projected equality, never a row-wise UDF. Rewriting the
dimension wholesale per batch is the parquet-era pattern (dims are small
relative to facts); table formats with row-level MERGE slot in behind
the same function signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"


def scd2_initial(dim: DataFrame, effective_date: str) -> DataFrame:
    """Bootstrap history: every current row becomes an open version."""
    return dim.select(
        "*",
        F.lit(effective_date).cast("date").alias("valid_from"),
        F.lit(OPEN_END).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_date: str,
) -> DataFrame:
    """Apply one update batch to an SCD2 history table.

    ``updates`` carries the business key + tracked attribute columns
    (same names as in history). Rows whose tracked values differ from
    the key's current version close that version and open a new one;
    brand-new keys insert an open version; identical rows are no-ops."""
    eff = F.lit(effective_date).cast("date")
    cur = history.filter(F.col("is_current"))
    closed_history = history.filter(~F.col("is_current"))

    attr_cols = [c for c in updates.columns if c != key]
    u = updates.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"__u_{c}") for c in attr_cols]
    )
    joined = cur.join(u, cur[key] == F.col("__k"), "full_outer")

    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(f"__u_{c}").eqNullSafe(F.col(c))
    is_new_key = cur[key].isNull()
    has_update = F.col("__k").isNotNull()

    # existing versions: close if a differing update arrived, else carry
    existing = joined.filter(cur[key].isNotNull()).select(
        *[cur[c] for c in history.columns if c not in ("valid_to", "is_current")],
        F.when(has_update & differs, eff).otherwise(F.col("valid_to")).alias("valid_to"),
        F.when(has_update & differs, F.lit(False)).otherwise(F.col("is_current")).alias("is_current"),
    )
    # new open versions: differing updates on existing keys + new keys
    fresh = (
        joined.filter(has_update & (is_new_key | differs))
        .select(
            F.col("__k").alias(key),
            *[
                F.col(f"__u_{c}").alias(c) if c in attr_cols
                else F.coalesce(cur[c], F.lit(None)).alias(c)
                for c in history.columns
                if c not in (key, "valid_from", "valid_to", "is_current")
            ],
            eff.alias("valid_from"),
            F.lit(OPEN_END).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return closed_history.unionByName(existing).unionByName(fresh)
