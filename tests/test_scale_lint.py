"""Registry-wide scale lint: every registered batch query's physical
plan is checked against the shapes that kill a 100 TB run, not just the
handful individually pinned in test_plan_shapes.py.

Rules (each a named check so failures read like a lint report):

  R1  no CartesianProduct — an all-pairs join over table-sized inputs
      is quadratic at any scale. (BroadcastNestedLoopJoin is allowed:
      the registry uses it only to attach broadcast 1-row/centroid
      tables, and R2 bounds what may feed a broadcast.)
  R2  every Exchange SinglePartition is fed by aggregates on ALL of its
      scan branches — i.e. single-partition data is always a
      pre-aggregated tiny table (distinct-lengths counts, 1-row stats),
      never a raw corpus/fact scan (the r4 text_length_trim failure
      shape, generalized). Subtree-aware since r6 (r5 VERDICT item 2):
      the check walks the exchange's indentation-scoped subtree and
      requires an Aggregate ANCESTOR on the path to every FileScan in
      it, so a multi-branch plan cannot slip a raw-scan branch past the
      lint behind an aggregated sibling (the flattened-text
      false-negative is gone; test_r2_catches_multibranch_raw_scan
      pins the lint itself against that shape).
  R3  no BatchEvalPython — row-at-a-time Python UDFs are banned
      repo-wide (SURVEY.md §2.10 policy); Arrow boundaries
      (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas /
      FlatMapGroupsInPandasWithState) are the sanctioned exceptions.
  R4  no rand()/randn() in the plan — sampling and splits must be
      deterministic hash arithmetic (reproducible under any partition
      layout; r3 VERDICT on sampleBy).
  R5  every WindowGroupLimit is two-phase (Partial before the exchange
      AND Final after) — the map-side phase is what bounds low-
      cardinality partition keys (topk_per_group) and degenerate LSH
      buckets (the 256 cap); a half-fired pushdown would silently
      revert to one task sorting a whole group. Named queries are
      pinned in test_plan_shapes.py; this catches any FUTURE
      rank-limit window added to the registry.

Streaming entries (stream_*) execute during construction
(Trigger.AvailableNow into a memory sink), so the returned DataFrame is
a sink read with no lineage to lint; their plan shapes are covered by
the batch analogs here plus tests/test_streaming.py.

The lint reads the pre-AQE executedPlan at sf0.01 — shape rules only,
nothing statistics-dependent is asserted. Caveat: PLAN CONSTRUCTION is
not free for every query — the eager-construction entries
(dedup_cluster_components / dedup_corpus_representatives run their
checkpointed component iterations; sim_ivf_cell_quality its bounded
k-means collect) execute while the fixture builds, which is the bulk
of this module's runtime.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erathia_market_etl_spark.plans import all_queries

from .conftest import SF_T2

QUERIES = all_queries()


def _with_queued() -> dict:
    """Registered queries plus the local-only queue
    (test_oracle_parity._queued) — the scale-lint rules are policy for
    EVERY query shape the repo ships, driver-registered or not."""
    from .test_oracle_parity import _queued

    out = dict(QUERIES)
    out.update({n: fn for n, (fn, _) in _queued().items()})
    return out


ALL_QUERIES = _with_queued()
BATCH = [n for n in ALL_QUERIES if not n.startswith("stream_")]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark) -> dict[str, str]:
    return {name: _plan(ALL_QUERIES[name](spark, SF_T2)) for name in BATCH}


def test_r1_no_cartesian_product(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"cartesian product in: {bad}"


def _node_depth(line: str) -> int:
    """Tree depth of a plan line = offset where the operator text starts
    (after the ' :+-' box-drawing prefix). Operator text never begins
    with one of those characters ('*(n) ...', letters, '(')."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _unaggregated_scans_below_single_partition(plan: str) -> bool:
    """True iff some Exchange SinglePartition has a FileScan in its
    subtree with NO Aggregate on the exchange→scan ancestor path."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        d0 = _node_depth(ln)
        # ancestor stack within the subtree: (depth, is_aggregate)
        stack: list[tuple[int, bool]] = []
        for sub in lines[i + 1:]:
            d = _node_depth(sub)
            if d <= d0:
                break  # left the exchange's subtree
            while stack and stack[-1][0] >= d:
                stack.pop()
            if "FileScan" in sub and not any(is_agg for _, is_agg in stack):
                return True
            stack.append((d, "Aggregate" in sub))  # Hash/ObjectHash/Sort
    return False


def test_r2_single_partition_only_after_aggregate(plans):
    bad = [n for n, p in plans.items()
           if _unaggregated_scans_below_single_partition(p)]
    assert not bad, f"SinglePartition exchange over unaggregated scan in: {bad}"


def test_r2_catches_multibranch_raw_scan(spark):
    # The lint's own pin (r5 VERDICT item 2): a two-branch plan whose
    # FIRST branch aggregates while the SECOND is a raw corpus scan,
    # under a global-sort window's SinglePartition exchange. The old
    # flattened-text rule false-negatived here (first 'Aggregate' index
    # < first 'FileScan' index); the subtree walk must flag it.
    from pyspark.sql import Window

    raw = (
        spark.read.parquet(f"{SF_T2}/documents.parquet")
        .select(F.col("doc_id").alias("x"))
    )
    aggd = raw.groupBy().agg(F.min("x").alias("x"))
    bad = aggd.unionByName(raw).withColumn(
        "rn", F.row_number().over(Window.orderBy("x"))
    )
    plan = _plan(bad)
    assert "Exchange SinglePartition" in plan  # shape is as constructed
    assert _unaggregated_scans_below_single_partition(plan)
    # and the aggregated-only variant stays clean (no false positive)
    ok = aggd.withColumn("rn", F.row_number().over(Window.orderBy("x")))
    assert not _unaggregated_scans_below_single_partition(_plan(ok))


def test_r3_no_row_at_a_time_python_udf(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python UDF in: {bad}"


def test_r4_no_rand_in_plan(plans):
    bad = [n for n, p in plans.items() if "rand(" in p or "randn(" in p]
    assert not bad, f"nondeterministic rand() in: {bad}"


def test_r5_window_group_limits_are_two_phase(plans):
    import re

    bad: list[str] = []
    for name, plan in plans.items():
        if "WindowGroupLimit" not in plan:
            continue
        n_partial = len(re.findall(r"WindowGroupLimit .*, Partial", plan))
        n_final = len(re.findall(r"WindowGroupLimit .*, Final", plan))
        if n_partial != n_final or n_partial == 0:
            bad.append(f"{name} (partial={n_partial}, final={n_final})")
    assert not bad, f"half-fired WindowGroupLimit pushdown in: {bad}"


def test_no_unbounded_driver_collects_in_package():
    """R4 (source-level, r7): driver materialization in the engine
    package must stay BOUNDED — the scale story's "one sanctioned
    collect" claim, enforced. Allowed: ``.first()`` (one row by
    construction: query vectors, convergence flags) and ``.collect()``
    within three lines after a ``.limit(`` (the bounded k-means/PQ
    sample). ``app.py`` is whitelisted wholesale — it is the
    reference's interactive report viewer, driver-side display by
    design (SURVEY §3.3), and so is ``testing.py`` — it deliberately
    mirrors the round driver's own toPandas comparison at driver SFs.
    Elsewhere ``.toPandas()`` is banned outright (it materializes
    unboundedly AND forgets Arrow batching limits). Any new collect
    site must either be provably bounded in this shape or consciously
    added here with a reason."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "erathia_market_etl_spark"
    offenders = []
    for p in sorted(pkg.rglob("*.py")):
        if p.name in ("app.py", "testing.py"):
            continue
        lines = p.read_text().splitlines()
        for i, ln in enumerate(lines):
            if ".toPandas()" in ln:
                offenders.append(f"{p.name}:{i+1} toPandas")
            if ".collect()" in ln:
                window = "\n".join(lines[max(0, i - 3):i + 1])
                if ".limit(" not in window:
                    offenders.append(f"{p.name}:{i+1} unbounded collect")
    assert not offenders, offenders
