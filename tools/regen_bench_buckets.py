#!/usr/bin/env python
"""Re-derive bench.py's child-batching bucket sets from BENCH_DETAIL.json.

Prints the _BATCH10/_BATCH4/_BATCH2 set literals (queries recorded <1.5s,
1.5-4s, and 4-8s respectively; >=8s and unlisted queries stay isolated).
Membership is hard-coded in bench.py so child grouping is stable and
auditable round-over-round — run this, eyeball the diff for contention
artifacts (a query should only change band when its PLAN changed), and
paste the result in.

Usage: python tools/regen_bench_buckets.py [BENCH_DETAIL.json]
"""

import json
import os
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_DETAIL.json"
    )
    q = json.load(open(path))["queries"]
    buckets = {"_BATCH10": [], "_BATCH4": [], "_BATCH2": []}
    for name, t in q.items():
        if t < 0:
            continue
        if t < 1.5:
            buckets["_BATCH10"].append(name)
        elif t < 4:
            buckets["_BATCH4"].append(name)
        elif t < 8:
            buckets["_BATCH2"].append(name)
    for label, names in buckets.items():
        body = " ".join(f'"{n}",' for n in sorted(names))
        print(
            f"{label} = {{\n"
            + textwrap.fill(
                body, 76, initial_indent="    ", subsequent_indent="    "
            )
            + "\n}"
        )


if __name__ == "__main__":
    main()
