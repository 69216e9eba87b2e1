"""Static game definitions for the market simulation (bronze producer).

The reference ships these as a 385-line JSON
(data_definitions/game_definitions.json: 9 factions x (14 units + ~14
heroes), 46 products, 16x16 town name parts). This module generates an
equivalent-SHAPE definition set programmatically and deterministically —
same cardinalities, key spaces, tier structure, and cost bands
(SURVEY.md §1.2) — with original synthetic names, so the simulator and
every downstream table has the reference's exact schema without copying
its data file.

Key spaces mirror bronze_generator.py:18-25: factions from 100, towns
from 10000, customers from 5000, categories from 200, products from
1000, trades from 1.
"""

from __future__ import annotations

from dataclasses import dataclass, field

N_FACTIONS = 9
UNITS_PER_FACTION = 14      # tiers 1..7, two variants per tier
HEROES_TOTAL = 128          # reference data quirk: 128 heroes vs 126 units
HERO_INCOME = 750.0
TOWNS_PER_FACTION = 5
N_NAME_PARTS = 16           # 16 prefixes x 16 suffixes

FACTION_NAMES = [
    "Bastion", "Rampart", "Citadel", "Necropolis", "Inferno",
    "Dungeon", "Stronghold", "Fortress", "Conflux",
]

_PREFIX = [f"P{i:02d}burg" for i in range(N_NAME_PARTS)]
_SUFFIX = [f"S{i:02d}hold" for i in range(N_NAME_PARTS)]

# unit cost band 3..800 by tier (SURVEY §1.2 base_income 3..800)
_TIER_COST = {1: 3.0, 2: 30.0, 3: 90.0, 4: 180.0, 5: 320.0, 6: 550.0, 7: 800.0}


@dataclass(frozen=True)
class CustomerDef:
    key: int
    name: str
    segment: str        # 'Standard' (unit) | 'VIP' (hero)
    unit_tier: int      # 1..7 for units, 0 for heroes
    base_income: float
    faction_key: int


@dataclass(frozen=True)
class ProductDef:
    key: int
    name: str
    base_value_gold: float
    category_name: str  # 'Resources' | 'Artifacts'
    tier_level: str     # Base/Low/Mid | Treasure/Minor/Major/Relic
    category_key: int = field(default=0)


# 46 products (SURVEY §1.2): 12 resources (1 Base + 6 Low + 5 Mid),
# 34 artifacts (10 Treasure + 10 Minor + 9 Major + 5 Relic)
_RESOURCES = (
    [("Gold", "Base", 1.0)]
    + [(f"LowRes{i}", "Low", 15.0 + 5 * i) for i in range(6)]
    + [(f"MidRes{i}", "Mid", 120.0 + 30 * i) for i in range(5)]
)
_ARTIFACTS = (
    [(f"TreasureArt{i}", "Treasure", 2000.0 + 100 * i) for i in range(10)]
    + [(f"MinorArt{i}", "Minor", 5000.0 + 200 * i) for i in range(10)]
    + [(f"MajorArt{i}", "Major", 10000.0 + 500 * i) for i in range(9)]
    + [(f"RelicArt{i}", "Relic", 30000.0 + 2000 * i) for i in range(5)]
)

CATEGORY_TIERS = [
    ("Resources", "Base"), ("Resources", "Low"), ("Resources", "Mid"),
    ("Artifacts", "Treasure"), ("Artifacts", "Minor"),
    ("Artifacts", "Major"), ("Artifacts", "Relic"),
]


def factions() -> list[tuple[int, str]]:
    """[(faction_key, faction_name)] — keys from 100."""
    return [(100 + i, FACTION_NAMES[i]) for i in range(N_FACTIONS)]


def towns() -> list[tuple[int, str, int]]:
    """[(town_key, town_name, faction_key)] — 5 per faction, keys from
    10000, names 'prefix suffix' drawn deterministically from the part
    grids."""
    out = []
    k = 10000
    for fi, (fkey, _) in enumerate(factions()):
        for t in range(TOWNS_PER_FACTION):
            name = f"{_PREFIX[(fi * TOWNS_PER_FACTION + t) % N_NAME_PARTS]} " \
                   f"{_SUFFIX[(fi * 7 + t * 3) % N_NAME_PARTS]}"
            out.append((k, name, fkey))
            k += 1
    return out


def product_categories() -> list[tuple[int, str, str]]:
    """[(category_key, category_name, tier_level)] — 7 rows, keys from 200."""
    return [(200 + i, c, t) for i, (c, t) in enumerate(CATEGORY_TIERS)]


def products() -> list[ProductDef]:
    """46 products, keys from 1000, each linked to its (category, tier)
    category_key."""
    cat_key = {(c, t): k for k, c, t in product_categories()}
    defs = []
    k = 1000
    for name, tier, value in _RESOURCES:
        defs.append(ProductDef(k, name, value, "Resources", tier, cat_key[("Resources", tier)]))
        k += 1
    for name, tier, value in _ARTIFACTS:
        defs.append(ProductDef(k, name, value, "Artifacts", tier, cat_key[("Artifacts", tier)]))
        k += 1
    return defs


def customers() -> list[CustomerDef]:
    """254 agents: 126 units (9 factions x 14, tiers 1..7 twice,
    'Standard') + 128 heroes ('VIP', tier 0, income 750). Keys from 5000."""
    out = []
    k = 5000
    for fkey, fname in factions():
        for u in range(UNITS_PER_FACTION):
            tier = u // 2 + 1
            out.append(CustomerDef(
                k, f"{fname} Unit{u:02d}", "Standard", tier,
                _TIER_COST[tier] * (1.0 if u % 2 == 0 else 1.15), fkey,
            ))
            k += 1
    flist = factions()
    for h in range(HEROES_TOTAL):
        fkey = flist[h % N_FACTIONS][0]
        out.append(CustomerDef(
            k, f"Hero{h:03d}", "VIP", 0, HERO_INCOME, fkey,
        ))
        k += 1
    return out
