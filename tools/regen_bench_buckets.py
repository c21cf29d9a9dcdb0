#!/usr/bin/env python
"""Re-derive bench.py's cost-band set literals from BENCH_DETAIL.json.

Bands (see bench.py _BANDS): <1.5s -> _BATCH10, 1.5-4s -> _BATCH4,
4-8s -> _BATCH2, 8-18s -> _BATCH2H; >=18s and unlisted queries stay
isolated. Membership is hard-coded in bench.py so child grouping is
stable and auditable round-over-round — run this against a CLEAN record
(re-measured rows committed, no band-exceedance offenders left — the
r10 record's contaminated shared-child rows would have promoted ~4s
queries into the 8-18s band), eyeball the diff for contention artifacts
(a query should only change band when its PLAN changed), and paste the
result in.

Usage: python tools/regen_bench_buckets.py [BENCH_DETAIL.json]
"""

import json
import os
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BANDS = [
    ("_BATCH10", 0.0, 1.5),
    ("_BATCH4", 1.5, 4.0),
    ("_BATCH2", 4.0, 8.0),
    ("_BATCH2H", 8.0, 18.0),
]


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_DETAIL.json"
    )
    q = json.load(open(path))["queries"]
    buckets = {label: [] for label, _, _ in BANDS}
    iso = []
    for name, t in q.items():
        if t < 0:
            continue
        for label, lo, hi in BANDS:
            if lo <= t < hi:
                buckets[label].append(name)
                break
        else:
            iso.append(name)
    for label, names in buckets.items():
        body = " ".join(f'"{n}",' for n in sorted(names))
        print(
            f"{label} = {{\n"
            + textwrap.fill(
                body, 76, initial_indent="    ", subsequent_indent="    "
            )
            + "\n}"
        )
    print("# isolated (>=18s):", " ".join(sorted(iso)))


if __name__ == "__main__":
    main()
