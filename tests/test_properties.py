"""Property-based checks (hypothesis) for the driver-side generator —
SURVEY.md §5 rebuild strategy #4: the economic invariants must hold for
ANY seed/rate configuration, not just the golden one."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from erathia_market_etl_spark.config import SimulationConfig
from erathia_market_etl_spark.generator.bronze import calendar_rows
from erathia_market_etl_spark.generator.definitions import products, towns
from erathia_market_etl_spark.generator.simulate import (
    ARTIFACT_POOL_SIZE,
    MarketSimulator,
)


def _sim(seed: int, col_rate: float, tax: float) -> MarketSimulator:
    cfg = SimulationConfig()
    cal = calendar_rows(cfg)
    return MarketSimulator(
        [r["date_key"] for r in cal], [k for k, _, _ in towns()],
        seed=seed, col_rate=col_rate, wealth_tax=tax,
    )


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    col_rate=st.floats(0.0, 1.0),
    tax=st.floats(0.0, 0.2),
    weeks=st.integers(1, 6),
)
def test_simulator_invariants_hold_for_any_config(seed, col_rate, tax, weeks):
    sim = _sim(seed, col_rate, tax)
    date_keys = set(sim.date_keys)
    for _, trades in sim.run_weeks(weeks):
        for t in trades:
            assert t.transaction_type in ("BUY", "SELL")
            assert t.quantity > 0
            # normal trades charge round(price*qty, 2); the downgrade
            # path charges the agent's ENTIRE remaining gold with
            # qty = round(gold/price, 2) (ref :294-295), so the total
            # can differ from price*qty by up to price * 0.005
            assert abs(t.gold_total - t.gold_per_unit * t.quantity) \
                <= t.gold_per_unit * 0.005 + 0.005
            assert t.gold_per_unit > 0
            assert t.date_key in date_keys
            assert t.current_gold_balance >= -1e-9
        for a in sim.agents:
            assert a.gold >= 0.0
            for qty in a.inventory.values():
                assert qty > -1e-9
        for k, left in sim.artifact_pool.items():
            assert 0 <= left <= ARTIFACT_POOL_SIZE[sim.products[k].tier_level]
        for p in sim.products.values():
            if p.category_name == "Resources":
                assert 0.1 * p.base_value_gold - 1e-9 <= sim.prices[p.key] \
                    <= 10 * p.base_value_gold + 1e-9


@settings(max_examples=25, deadline=None)
@given(
    start=st.dates(dt.date(1995, 1, 1), dt.date(2005, 12, 31)),
    span=st.integers(0, 400),
)
def test_calendar_properties(start, span):
    end = start + dt.timedelta(days=span)
    cfg = SimulationConfig()
    cfg.start_date, cfg.end_date = start.isoformat(), end.isoformat()
    rows = calendar_rows(cfg)
    assert len(rows) == span + 1
    keys = [r["date_key"] for r in rows]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)
    for r, off in zip(rows, range(span + 1)):
        d = start + dt.timedelta(days=off)
        assert r["day_of_week"] == d.weekday()  # Mon=0 convention (§7.5 #1)
        assert r["is_weekend"] == (d.weekday() >= 5)
        assert r["year"] == d.year + cfg.lore_year_offset
        assert r["date_key"] == (d.year + cfg.lore_year_offset) * 10000 + d.month * 100 + d.day


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_same_seed_same_trades(seed):
    a = [t for _, ts in _sim(seed, 0.5, 0.05).run_weeks(3) for t in ts]
    b = [t for _, ts in _sim(seed, 0.5, 0.05).run_weeks(3) for t in ts]
    assert a == b


def test_product_keys_dense_and_sorted():
    keys = [p.key for p in products()]
    assert keys == list(range(1000, 1046))


# ---------------------------------------------------------------------------
# r10 algebraic rewrites: the risky part of ts_cusum_changepoints and
# sample_quota_allocation is the MATH (a window-free closed form for a
# sequential fold; integer apportionment laws), so the identities are
# property-checked for any input here, driver-side, mirroring the exact
# integer arithmetic both engines run; the Spark plans themselves are
# pinned by the planted tests + the hash-exact oracles.
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(devs=st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=60))
def test_cusum_closed_form_identity_any_series(devs):
    """S+_i = P_i - min(0, min_{j<=i} P_j) and
    S-_i = max(0, max_{j<=i} P_j) - P_i equal the clamped folds for
    ANY integer deviation series — the identity ts_cusum_changepoints'
    window formulation rests on."""
    s_up = s_dn = 0
    pref = 0
    run_min = run_max = 0  # min/max over {0, P_1..P_i}
    for d in devs:
        s_up = max(0, s_up + d)
        s_dn = max(0, s_dn - d)
        pref += d
        run_min = min(run_min, pref)
        run_max = max(run_max, pref)
        assert s_up == pref - run_min
        assert s_dn == run_max - pref


@settings(max_examples=200, deadline=None)
@given(
    weights=st.lists(st.integers(1, 10**12), min_size=1, max_size=40),
    budget=st.integers(0, 10**6),
)
def test_hamilton_laws_any_weights(weights, budget):
    """For any positive weights and budget: quotas sum EXACTLY to the
    budget and each quota is within one unit of its exact fractional
    share — the two laws sample_quota_allocation's outputs promise."""
    total = sum(weights)
    floors = [w * budget // total for w in weights]
    rems = [w * budget % total for w in weights]
    leftover = budget - sum(floors)
    order = sorted(range(len(weights)), key=lambda i: (-rems[i], i))
    quotas = list(floors)
    for i in order[:leftover]:
        quotas[i] += 1
    assert sum(quotas) == budget
    for w, q in zip(weights, quotas):
        assert abs(q - w * budget / total) < 1 + 1e-9
