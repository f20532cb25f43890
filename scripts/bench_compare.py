"""Compare two bench JSON records (e.g. BENCH_r02.json vs a fresh
`python bench.py` line) and flag per-query regressions.

The round-2 post-mortem showed bench evidence is fragile: this makes the
round-over-round delta a one-command check instead of a by-hand diff.

Usage:
  python bench.py | tee /tmp/bench.json
  python scripts/bench_compare.py BENCH_r02.json /tmp/bench.json [ratio]

Accepts either the driver's record shape ({"parsed": {...}} / {"queries"})
or bench.py's raw line. Exits 1 if any shared query slowed by more than
``ratio`` (default 2.0) AND by more than 1 s absolute (small queries
jitter), or newly errors.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, object]:
    with open(path) as f:
        txt = f.read().strip()
    try:
        d = json.loads(txt)               # a proper JSON file (driver record)
    except json.JSONDecodeError:          # bench.py stdout: last JSON line
        line = [ln for ln in txt.splitlines()
                if ln.lstrip().startswith("{")][-1]
        d = json.loads(line)
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d.get("queries", d)


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    shared = sorted(set(old) & set(new))
    bad: list[str] = []
    print(f"{'query':34s} {'old':>8s} {'new':>8s}  delta")
    for q in shared:
        o, n = old[q], new[q]
        o_err, n_err = isinstance(o, dict), isinstance(n, dict)
        if n_err and not o_err:
            bad.append(q)
            print(f"{q:34s} {o:8.2f} {'ERR':>8s}  ** new error: "
                  f"{n.get('err', '?')[:60]}")
        elif o_err or n_err:
            print(f"{q:34s} {'ERR' if o_err else o:>8} "
                  f"{'ERR' if n_err else n:>8}")
        else:
            slow = n > o * ratio and n - o > 1.0
            if slow:
                bad.append(q)
            print(f"{q:34s} {o:8.2f} {n:8.2f}  {n / o:5.2f}x"
                  f"{'  ** regression' if slow else ''}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"\nnew queries: {', '.join(only_new)}")
    gone = sorted(set(old) - set(new))
    if gone:
        print(f"dropped queries: {', '.join(gone)}")
    if bad:
        print(f"\nREGRESSIONS ({ratio}x and >1s): {', '.join(bad)}")
        sys.exit(1)
    print("\nno regressions")


if __name__ == "__main__":
    main()
