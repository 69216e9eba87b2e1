"""S1/S2 round-trip: the Spark JSON-flattening source must reproduce the
driver-side definition builders exactly (same surrogate keys, same rows)."""

from __future__ import annotations

import pytest

from erathia_market_etl_spark.generator.definitions import (
    customers,
    factions,
    products,
)
from erathia_market_etl_spark.sources.json_defs import (
    dim_customer_from_json,
    dim_faction_from_json,
    dim_product_from_json,
    read_definitions,
    write_definitions_json,
)


@pytest.fixture(scope="module")
def defs(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("defs") / "game_definitions.json")
    write_definitions_json(path)
    return read_definitions(spark, path)


def test_faction_roundtrip(defs):
    got = {(r["faction_key"], r["faction_name"]) for r in dim_faction_from_json(defs).collect()}
    assert got == set(factions())


def test_product_roundtrip(defs):
    got = sorted(
        (r["product_key"], r["product_name"], r["base_value_gold"], r["category_key"])
        for r in dim_product_from_json(defs).collect()
    )
    want = sorted((p.key, p.name, p.base_value_gold, p.category_key) for p in products())
    assert got == want


def test_customer_roundtrip(defs):
    got = sorted(
        (r["customer_key"], r["customer_name"], r["customer_segment"],
         r["unit_tier"], r["base_income"], r["faction_key"])
        for r in dim_customer_from_json(defs).collect()
    )
    want = sorted(
        (c.key, c.name, c.segment, c.unit_tier, c.base_income, c.faction_key)
        for c in customers()
    )
    assert got == want
