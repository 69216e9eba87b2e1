"""CLI parity tests (VERDICT r1 "Next round" #6): decision-odds flags
with the reference's combined buy+sell <= 1.0 fallback (main.py:65-90)
and the report drill-down (DISTINCT menu + parameterized equality
filter, main.py:296-330)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from erathia_market_etl_spark.app import main


@pytest.fixture(scope="module")
def work(spark, tmp_path_factory):
    w = str(tmp_path_factory.mktemp("cliwork"))
    rc = main(["full", "--work", w, "--weeks", "6", "--seed", "11"], spark=spark)
    assert rc == 0
    return w


def _fact_rows(work_dir: str):
    files = glob.glob(f"{work_dir}/bronze/fact_sales/**/*.parquet", recursive=True)
    assert files
    import pyarrow as pa
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )


# -- decision-odds flags ----------------------------------------------------

def test_invalid_odds_fall_back_to_defaults(tmp_path, capsys):
    w = str(tmp_path / "w1")
    rc = main(["bronze", "--work", w, "--weeks", "1", "--seed", "11",
               "--col-rate", "0.9",
               "--vip-buy", "0.9", "--vip-sell", "0.5"])
    assert rc == 0
    out = capsys.readouterr().out
    # reference wording: combined check, ALL odds revert (main.py:82-89)
    assert "Sum of BUY and SELL chances cannot exceed 1.0" in out
    # the reference's fallback returns the FULL default parameter dict —
    # the valid-but-user-set col-rate reverts too (main.py:84-89): the
    # run must be byte-identical to one with no parameter flags at all
    w2 = str(tmp_path / "w1_defaults")
    rc = main(["bronze", "--work", w2, "--weeks", "1", "--seed", "11"])
    assert rc == 0
    assert _fact_rows(w).equals(_fact_rows(w2))


def test_odds_flags_reach_the_simulator(tmp_path, capsys):
    w = str(tmp_path / "w2")
    rc = main(["bronze", "--work", w, "--weeks", "3", "--seed", "5",
               "--vip-buy", "1.0", "--vip-sell", "0.0",
               "--unit-buy", "1.0", "--unit-sell", "0.0"])
    assert rc == 0
    assert "cannot exceed 1.0" not in capsys.readouterr().out
    table = _fact_rows(w)
    types = set(table.column("transaction_type").to_pylist())
    assert types == {"BUY"}  # buy-only odds -> no SELL rows anywhere


# -- report drill-down ------------------------------------------------------

def test_report_lists_marts(work, spark, capsys):
    rc = main(["report", "--work", work], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    for name in ("dm_faction_economy", "dm_resource_price_history",
                 "dm_top_vip_customers", "dm_artifact_sales_summary"):
        assert name in out


def test_report_distinct_menu(work, spark, capsys):
    rc = main(["report", "--work", work, "--mart", "dm_resource_price_history",
               "--distinct", "Resource Name"], spark=spark)
    assert rc == 0
    values = [v for v in capsys.readouterr().out.splitlines() if v.strip()]
    assert values == sorted(values) and len(values) > 1  # ORDER BY 1
    assert all(v != "Gold" for v in values)  # Gold never trades


def test_report_filter_drilldown(work, spark, capsys):
    # first grab a real resource name from the distinct menu
    main(["report", "--work", work, "--mart", "dm_resource_price_history",
          "--distinct", "Resource Name"], spark=spark)
    name = capsys.readouterr().out.splitlines()[0].strip()

    rc = main(["report", "--work", work, "--mart", "dm_resource_price_history",
               "--filter", f"Resource Name={name}"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert name in out
    # only the selected resource appears in the drill-down
    data_lines = [ln for ln in out.splitlines() if ln.startswith("|")]
    body = [ln for ln in data_lines[1:] if name in ln]
    assert len(body) == len(data_lines) - 1 > 0


def test_report_bad_inputs(work, spark, capsys):
    assert main(["report", "--work", work, "--mart", "nope"], spark=spark) == 2
    assert main(["report", "--work", work, "--mart", "dm_faction_economy",
                 "--filter", "no-equals-sign"], spark=spark) == 2
    assert main(["report", "--work", work, "--mart", "dm_faction_economy",
                 "--filter", "Bad Col=x"], spark=spark) == 2
    assert main(["report", "--work", work, "--mart", "dm_faction_economy",
                 "--distinct", "Bad Col"], spark=spark) == 2
