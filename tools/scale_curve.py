"""Scaling-exponent analysis for the r9 scale-series measurement.

Input: the raw output of the x1/x3/x10 remeasure loop (blocks of
`== xN ==` followed by one remeasure JSON line), either from a file
argument or stdin. Output: per query, the median seconds at each
multiplier and the fitted power-law exponent b in t ≈ a·n^b
(least-squares on log t vs log n over every (mult, rep) point) — the
number SCALE.md's 100 TB claims are checked against: ~1.0 for the
linear families (substring / jaccard / semantic / stream state),
sublinear-in-appearance only when a fixed per-session floor dominates.

Usage: python tools/scale_curve.py [raw_file] [--json out.json]
"""
from __future__ import annotations

import json
import math
import re
import sys


def parse(raw: str) -> dict[int, dict[str, list[float]]]:
    out: dict[int, dict[str, list[float]]] = {}
    mult = None
    for line in raw.splitlines():
        m = re.match(r"== x(\d+) ==", line.strip())
        if m:
            mult = int(m.group(1))
            continue
        line = line.strip()
        if line.startswith("{") and mult is not None:
            # MERGE repeated blocks for the same multiplier (the
            # remeasure loop is often run in per-multiplier chunks) —
            # overwriting would silently drop earlier queries
            out.setdefault(mult, {}).update(json.loads(line))
    return out


def fit_exponent(points: list[tuple[float, float]]) -> float | None:
    """Least-squares slope of log t on log n; None when every point
    sits at one multiplier (no curve to fit)."""
    xs = [math.log(n) for n, _ in points]
    ys = [math.log(t) for _, t in points]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return None
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> None:
    # pop --json AND its value before computing positionals — filtering
    # only the flag left its value behind as a phantom raw-input path
    # (`--json out.json raw.txt` read out.json, then overwrote it)
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("--json requires an output path")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    args = [a for a in argv if not a.startswith("--")]
    raw = open(args[0]).read() if args else sys.stdin.read()
    data = parse(raw)
    if len(data) < 2:
        sys.exit("need at least two multipliers to fit a curve")
    mults = sorted(data)
    # union across multipliers: a query missing a scale point (timed
    # out, chunked run) must surface as incomplete, not vanish
    queries = sorted({q for m in mults for q in data[m]})
    rows = {}
    print(f"{'query':32s} " + " ".join(f"x{m:<7d}" for m in mults) + " exponent")
    for q in queries:
        pts = [
            (m, t)
            for m in mults
            for t in data[m].get(q, [])
        ]
        med = {
            m: sorted(data[m][q])[len(data[m][q]) // 2]
            for m in mults
            if q in data[m]
        }
        b = fit_exponent(pts)
        rows[q] = {
            "median_sec": med,
            "exponent": round(b, 3) if b is not None else None,
        }
        if len(med) < len(mults):
            missing = [f"x{m}" for m in mults if m not in med]
            rows[q]["missing"] = missing
        print(
            f"{q:32s} "
            + " ".join(f"{med.get(m, float('nan')):<8.2f}" for m in mults)
            + (f" {b:.3f}" if b is not None else " (single scale point)")
            + (f"  MISSING {','.join(missing)}" if len(med) < len(mults) else "")
        )
    if json_out is not None:
        with open(json_out, "w") as f:
            json.dump({"multipliers": mults, "queries": rows}, f, indent=1)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
