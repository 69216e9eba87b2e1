"""Registry-wide output-schema guard.

The driver canonicalizes every query result through pandas
(``sort_values`` over all columns) before hashing; a top-level
ArrayType/MapType column crashes it with ``unhashable type: 'list'``.
This cost a driver row in round 1 (``media_feature_extract``) and again
in round 2 (``scalar_array_kit``) — this test makes the trap impossible:
any driver-registered query emitting a complex-typed column fails CI
before the driver ever sees it.  Arrays belong INSIDE a query's plan;
the driver-facing projection joins them to strings
(``F.array_join(..., '|')``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as ST

from erathia_market_etl_spark.plans import all_queries

from .conftest import SF_SMOKE

QUERIES = all_queries()

# Queries whose callable *executes* work on invocation (streaming runs an
# availableNow trigger to completion); their schemas are still checked —
# nothing is exempt from the guard — they are just slower to build.
_FORBIDDEN = (ST.ArrayType, ST.MapType, ST.StructType)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_complex_top_level_columns(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, _FORBIDDEN)
    ]
    assert not bad, (
        f"{name} returns driver-unhashable top-level column(s) {bad}; "
        "join arrays to strings (F.array_join) in the driver-facing "
        "projection — see module docstring"
    )
