"""Agent-based market simulator — the bronze fact producer.

Re-implements the reference's weekly market loop (SURVEY.md §2.11
G1-G13; src/bronze_generator.py:144-374) with the same economic
semantics. Deliberately a driver-side, single-process, seeded Python
module: global mutable market state — the shared price vector (G9), the
global artifact pool (G10), supply/demand accumulators — couples every
agent to every other agent within a week and every week to the previous
one, so the loop is inherently sequential (SURVEY.md §7.4). Spark's job
is consuming its partitioned parquet output, not running it.

Semantic parity notes (trap list, SURVEY.md §7.5):
  * decision odds are WEALTH-based (current gold vs 2x base_income and
    inventory emptiness), not segment-based (G3);
  * the 'Base'-tier Gold resource is in dim_product but excluded from
    every purchase pool — it never trades (§7.5 #8);
  * artifact prices never move; only Resources float (G9, §7.5 #7);
  * transaction dates are uniform over the whole calendar, uncorrelated
    with the simulation week (G11, §7.5 #3).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from .definitions import CustomerDef, ProductDef, customers, products

DEFAULT_SEED = 42
DEFAULT_COL_RATE = 0.5
DEFAULT_WEALTH_TAX = 0.05

# G10: global artifact stock by tier_level
ARTIFACT_POOL_SIZE = {"Treasure": 20, "Minor": 20, "Major": 5, "Relic": 1}

# purchase-tier buckets over product (category, tier_level)
_BUCKET_OF_TIER = {
    "Low": "low", "Mid": "mid",
    "Treasure": "mid", "Minor": "mid", "Major": "high", "Relic": "relic",
    # "Base" intentionally absent: Gold never enters a purchase pool
}

# G3: BUY/SELL/HOLD odds; 'unit' odds apply to cash-poor agents holding
# inventory, 'vip' odds to everyone else (wealth-based, not segment)
_DECISION_ODDS = {
    "unit": (("BUY", 0.2), ("SELL", 0.5), ("HOLD", 0.3)),
    "vip": (("BUY", 0.5), ("SELL", 0.2), ("HOLD", 0.3)),
}

# G4: purchase-tier odds by buyer class
_TIER_ODDS = {
    "vip": (("low", 0.1), ("mid", 0.3), ("high", 0.4), ("relic", 0.2)),
    "rich": (("low", 0.2), ("mid", 0.5), ("high", 0.3), ("relic", 0.0)),
    "poor": (("low", 0.7), ("mid", 0.3), ("high", 0.0), ("relic", 0.0)),
}


@dataclass
class AgentState:
    spec: CustomerDef
    gold: float
    inventory: dict[int, float] = field(default_factory=dict)  # product_key -> qty
    artifacts: set[int] = field(default_factory=set)


@dataclass
class Trade:
    trade_key: int
    date_key: int
    transaction_type: str  # BUY | SELL
    customer_key: int
    product_key: int
    town_key: int
    quantity: float
    gold_per_unit: float
    gold_total: float
    current_gold_balance: float


class MarketSimulator:
    """Seeded, stateful weekly market loop. ``run_weeks`` yields per-week
    trade lists so the caller can chunk-flush (G12) without holding the
    whole history in memory."""

    def __init__(
        self,
        date_keys: list[int],
        town_keys_by_faction: dict[int, list[int]],
        seed: int = DEFAULT_SEED,
        col_rate: float = DEFAULT_COL_RATE,
        wealth_tax: float = DEFAULT_WEALTH_TAX,
    ) -> None:
        self.rng = random.Random(seed)
        self.col_rate = col_rate
        self.wealth_tax = wealth_tax
        self.date_keys = date_keys
        self.towns_of = town_keys_by_faction
        self.products: dict[int, ProductDef] = {p.key: p for p in products()}
        self.prices: dict[int, float] = {p.key: p.base_value_gold for p in self.products.values()}
        self.artifact_pool: dict[int, int] = {
            p.key: ARTIFACT_POOL_SIZE[p.tier_level]
            for p in self.products.values()
            if p.category_name == "Artifacts"
        }
        self.supply: dict[int, float] = {k: 0.0 for k in self.products}
        self.demand: dict[int, float] = {k: 0.0 for k in self.products}
        self.agents = [
            AgentState(spec=c, gold=3.0 * c.base_income) for c in customers()
        ]
        self._trade_seq = 0  # G: trade_key space starts at 1
        self._pools = self._build_pools()

    # -- static pools -------------------------------------------------------

    def _build_pools(self) -> dict[str, list[int]]:
        pools: dict[str, list[int]] = {"low": [], "mid": [], "high": [], "relic": []}
        for p in self.products.values():
            bucket = _BUCKET_OF_TIER.get(p.tier_level)
            if bucket:
                pools[bucket].append(p.key)
        return pools

    # -- weekly phases ------------------------------------------------------

    def _upkeep(self, a: AgentState) -> None:
        """G1: gold = max(0, gold - (base_income*col_rate + gold*tax))."""
        cost = a.spec.base_income * self.col_rate + a.gold * self.wealth_tax
        a.gold = max(0.0, a.gold - cost)

    def _income(self, a: AgentState) -> None:
        """G2: weekly stipend."""
        a.gold += a.spec.base_income

    def _weighted(self, odds: tuple[tuple[str, float], ...]) -> str:
        choices, weights = zip(*odds)
        return self.rng.choices(choices, weights=weights, k=1)[0]

    def _decide(self, a: AgentState) -> str:
        """G3: wealth-based odds — 'unit' table when cash-poor with
        inventory to liquidate, else 'vip' table."""
        cash_poor = a.gold < 2.0 * a.spec.base_income and bool(a.inventory)
        return self._weighted(_DECISION_ODDS["unit" if cash_poor else "vip"])

    def _pick_tier(self, a: AgentState) -> str:
        """G4: odds by buyer class; empty pool falls back to 'low'."""
        if a.spec.segment == "VIP":
            cls = "vip"
        elif a.gold > 10.0 * a.spec.base_income:
            cls = "rich"
        else:
            cls = "poor"
        tier = self._weighted(_TIER_ODDS[cls])
        if not self._pools[tier]:
            tier = "low"
        return tier

    def _quantity_for(self, a: AgentState, p: ProductDef) -> float:
        """G5: artifacts 1; VIP or tier>=7 bulk 100-1000; tier>=4
        10-50; else fractional 0.1-5.0 (2dp)."""
        if p.category_name == "Artifacts":
            return 1.0
        if a.spec.segment == "VIP" or a.spec.unit_tier >= 7:
            return float(self.rng.randint(100, 1000))
        if a.spec.unit_tier >= 4:
            return float(self.rng.randint(10, 50))
        return round(self.rng.uniform(0.1, 5.0), 2)

    def _emit(self, a: AgentState, ttype: str, p: ProductDef, qty: float,
              price: float) -> Trade:
        """G11: uniform random date over the whole calendar; G8/G7 row shape."""
        self._trade_seq += 1
        return Trade(
            trade_key=self._trade_seq,
            date_key=self.rng.choice(self.date_keys),
            transaction_type=ttype,
            customer_key=a.spec.key,
            product_key=p.key,
            town_key=self.rng.choice(self.towns_of[a.spec.faction_key]),
            quantity=qty,
            # per-unit price stays full precision (market prices float,
            # only the charged total rounds to money — ref G7/G8:
            # round(price*qty, 2), bronze_generator.py:285,328); rounding
            # the unit price too would make rows internally inconsistent
            # (caught by test_properties: total != round(unit*qty, 2))
            gold_per_unit=price,
            gold_total=round(price * qty, 2),
            current_gold_balance=round(a.gold, 2),
        )

    def _try_buy(self, a: AgentState) -> Trade | None:
        """G7: tier pick -> affordability filter -> 'low' fallback ->
        artifact uniqueness + global pool -> partial-quantity downgrade
        for resources (min 10% of one unit's price) -> mutate state."""
        for tier in (self._pick_tier(a), "low"):
            pool = [
                k for k in self._pools[tier]
                if self.prices[k] * 0.1 <= a.gold
                and (k not in self.artifact_pool
                     or (self.artifact_pool[k] > 0 and k not in a.artifacts))
            ]
            if pool:
                break
        else:
            return None
        if not pool:
            return None
        key = self.rng.choice(pool)
        p = self.products[key]
        price = self.prices[key]
        qty = self._quantity_for(a, p)

        if p.category_name == "Artifacts":
            if price > a.gold:
                return None
        else:
            # partial-quantity downgrade: spend at most the agent's gold
            max_affordable = a.gold / price
            if qty > max_affordable:
                qty = round(max_affordable, 2)
            if qty * price < 0.1 * price:  # refuse dust purchases
                return None

        cost = round(price * qty, 2)
        a.gold = max(0.0, a.gold - cost)
        if p.category_name == "Artifacts":
            self.artifact_pool[key] -= 1
            a.artifacts.add(key)
            a.inventory[key] = a.inventory.get(key, 0.0) + 1.0
        else:
            a.inventory[key] = a.inventory.get(key, 0.0) + qty
            self.demand[key] += qty
        return self._emit(a, "BUY", p, qty, price)

    def _try_sell(self, a: AgentState) -> Trade | None:
        """G6+G8: random owned Resource with qty>0.1; sell 10-50% (2dp,
        min 0.1); credit gold, decrement inventory, accumulate supply."""
        sellable = [
            k for k, q in a.inventory.items()
            if q > 0.1 and self.products[k].category_name == "Resources"
        ]
        if not sellable:
            return None
        key = self.rng.choice(sellable)
        p = self.products[key]
        qty = max(0.1, round(a.inventory[key] * self.rng.uniform(0.1, 0.5), 2))
        qty = min(qty, a.inventory[key])
        price = self.prices[key]
        a.inventory[key] -= qty
        if a.inventory[key] <= 1e-9:
            del a.inventory[key]
        a.gold += round(price * qty, 2)
        self.supply[key] += qty
        return self._emit(a, "SELL", p, qty, price)

    def _update_prices(self) -> None:
        """G9: per non-artifact product price *= 1 + net_demand/10000,
        mean-revert 0.95p + 0.05 base, clamp [0.1 base, 10 base]; reset
        accumulators. Artifacts never reprice (§7.5 #7)."""
        for p in self.products.values():
            if p.category_name == "Artifacts":
                continue
            k = p.key
            net = self.demand[k] - self.supply[k]
            price = self.prices[k] * (1.0 + net / 10000.0)
            price = 0.95 * price + 0.05 * p.base_value_gold
            self.prices[k] = min(max(price, 0.1 * p.base_value_gold),
                                 10.0 * p.base_value_gold)
        self.supply = {k: 0.0 for k in self.products}
        self.demand = {k: 0.0 for k in self.products}

    # -- main loop ----------------------------------------------------------

    def run_week(self) -> list[Trade]:
        trades: list[Trade] = []
        for a in self.agents:
            self._upkeep(a)
            self._income(a)
            action = self._decide(a)
            t = None
            if action == "BUY":
                t = self._try_buy(a)
            elif action == "SELL":
                t = self._try_sell(a)
            if t is not None:
                trades.append(t)
        self._update_prices()
        return trades

    def run_weeks(self, n: int):
        """Yield (week_index, trades) — callers chunk-flush (G12)."""
        for w in range(n):
            yield w, self.run_week()
