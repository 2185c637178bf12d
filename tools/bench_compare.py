"""Compare two BENCH_KEYS.json artifacts key by key.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio_flag]

Prints per-key ratios (new/old) sorted worst-first, plus added/removed
keys and suite totals.  Keys whose ratio exceeds ``ratio_flag``
(default 1.5) are marked — but remember this host's documented ±50%
noise band: a flag is a *re-measure* signal, not a verdict.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    # tolerate `| head` on the long per-key listing
    import signal
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    old_p, new_p = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_p))["queries"]
    new = json.load(open(new_p))["queries"]
    shared = sorted(set(old) & set(new),
                    key=lambda k: new[k] / max(old[k], 1e-9), reverse=True)
    flagged = 0
    for k in shared:
        r = new[k] / max(old[k], 1e-9)
        mark = "  <-- FLAG" if r > flag else ""
        if r > flag:
            flagged += 1
        print(f"{r:6.2f}x  {old[k]:7.2f}s -> {new[k]:7.2f}s  {k}{mark}")
    for k in sorted(set(new) - set(old)):
        print(f"   new             {new[k]:7.2f}s  {k}")
    for k in sorted(set(old) - set(new)):
        print(f"   gone  {old[k]:7.2f}s             {k}")
    ro, rn = (sum(old.values()), sum(new.values()))
    med = sorted(new[k] / max(old[k], 1e-9) for k in shared)[len(shared) // 2]
    print(f"\nshared {len(shared)} keys | median ratio {med:.2f}x | "
          f"flagged(>{flag}x) {flagged} | "
          f"total {ro:.1f}s -> {rn:.1f}s")


if __name__ == "__main__":
    main()
