"""Measure the scaling DERIVATIVE of the headline bench: run bench.py
at N ascending scale factors and print per-query time ratios for each
adjacent 10× data step. A linear-scan query should come out ≤10× per
step; anything superlinear betrays a hidden quadratic
(cartesian/all-pairs) shape that the plan-shape lint can only catch
structurally. Produces the SCALE.md "Measured scaling" table.

Usage: python tools/scaling_check.py [sf_dir ...]   (ascending; two or
       more dirs — three gives the two-decade trend SCALE.md records;
       defaults: /root/testdata/sf0.01  /root/testdata/sf0.1)
Final JSON line: one summary object for a single pair, a LIST of
per-step objects when more than two dirs are given.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr)
        raise SystemExit(f"bench.py failed at {sf_dir} (see stderr above)")
    # the JSON line is normally last, but scan in reverse for the first
    # parseable RESULT OBJECT so stray post-JSON stdout (py4j/Spark
    # shutdown warnings, a future print — including lines that parse as
    # bare JSON scalars like '0' or 'null') can't break the tool
    # opaquely (r6 ADVICE)
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except ValueError:
            continue
        if isinstance(parsed, dict) and "queries" in parsed:
            return parsed
    raise SystemExit(f"bench.py at {sf_dir} printed no result-JSON line")


def compare(a: dict, b: dict, small: str, big: str) -> dict:
    """Pairwise scaling table between two bench results (small, big)."""
    for side, run in (("small", a), ("big", b)):
        if not (isinstance(run.get("sf"), (int, float)) and run["sf"] > 0):
            raise SystemExit(f"{side} run has no positive sf: {run.get('sf')!r}")
    # the data step between the two SFs IS the superlinearity threshold
    factor = b["sf"] / a["sf"]
    if factor <= 1:
        raise SystemExit(f"big sf ({b['sf']}) must exceed small sf ({a['sf']})")
    rows, dropped = [], []
    for name, t_small in a["queries"].items():
        t_big = b["queries"].get(name)
        if t_big is None or t_small <= 0:
            dropped.append(name)  # a query that only fails at scale must
            continue              # not silently vanish from the report
        rows.append((name, t_small, t_big, t_big / t_small))
    if not rows:
        raise SystemExit("no query appears in both bench runs — nothing to compare")
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':40s} {small.split('/')[-1]:>8s} {big.split('/')[-1]:>8s} ratio")
    for name, ts, tb, r in rows:
        flag = "  <-- SUPERLINEAR" if r > factor else ""
        print(f"{name:40s} {ts:8.3f} {tb:8.3f} {r:5.1f}x{flag}")
    geo = 1.0
    for _, _, _, r in rows:
        geo *= r
    geo **= 1.0 / len(rows)
    print(f"\ngeometric mean ratio: {geo:.2f}x over {len(rows)} queries "
          f"({big} has ~{factor:g}x the rows of {small})")
    if dropped:
        print(f"WARNING: missing from one run (investigate!): {dropped}")
    bad = [n for n, _, _, r in rows if r > factor]
    return {"step": f"{small.split('/')[-1]}->{big.split('/')[-1]}",
            "geo_mean_ratio": round(geo, 3),
            "superlinear": bad, "missing": dropped}


def main() -> None:
    # any number of SF dirs, ascending; each adjacent pair is compared,
    # so three dirs give the two-decade trend (r6 VERDICT item 6)
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    if len(dirs) < 2:
        raise SystemExit("need at least two sf dirs (ascending)")
    results = [run_bench(d) for d in dirs]
    summaries = []
    for (da, a), (db, b) in zip(zip(dirs, results), zip(dirs[1:], results[1:])):
        summaries.append(compare(a, b, da, db))
        print()
    print(json.dumps(summaries if len(summaries) > 1 else summaries[0]))


if __name__ == "__main__":
    main()
