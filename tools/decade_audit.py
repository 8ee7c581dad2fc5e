#!/usr/bin/env python3
"""Full-suite decade audit: join two Bench artifacts (sf0.01 and sf0.1)
and report per-query 10x-data growth factors.

Usage: python3 tools/decade_audit.py <bench_sf001.json> <bench_sf01.json>
       [floor_seconds]

Queries whose sf0.01 time is under the fixed-cost floor (default 0.15 s)
are excluded from the factor distribution — their "growth" is session
overhead, not plan behavior. Prints the median and the tail (worst 10),
the r8 discipline: every factor > 5x deserves a derivation in ENGINE.md.
"""
import json
import statistics
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))["queries"]
    big = json.load(open(sys.argv[2]))["queries"]
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    shared = sorted(k for k in small
                    if k in big and small[k] > 0 and big[k] > 0)
    factors = [(big[k] / small[k], k, small[k], big[k])
               for k in shared if small[k] >= floor]
    excluded = len(shared) - len(factors)
    factors.sort()
    med = statistics.median(f for f, *_ in factors)
    print(f"{len(shared)} shared queries; {len(factors)} above the "
          f"{floor:.2f}s floor ({excluded} excluded)")
    print(f"median 10x-data growth: {med:.2f}x")
    print("worst 10:")
    for f, k, s, b in factors[-10:][::-1]:
        print(f"  {f:5.1f}x  {k}  {s:.2f}s -> {b:.2f}s")
    over5 = [k for f, k, *_ in factors if f > 5]
    print(f"factors > 5x: {len(over5)} {over5}")


if __name__ == "__main__":
    main()
