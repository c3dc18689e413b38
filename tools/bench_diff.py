#!/usr/bin/env python3
"""Per-query bench regression gate (VERDICT r9 #6 — the BASELINE.md
matched-probe methodology, made executable).

Usage: python3 tools/bench_diff.py [bench-log.jsonl] [-n OLD NEW]

Compares two lines of bench-log.jsonl (by default the newest two),
restricted to their shared query keys:

  * median per-query ratio — the HOST-DRIFT normalizer: a uniformly
    throttled window moves every query by the same factor, so the
    median is the throttle ratio and per-query flags are taken
    RELATIVE to it;
  * flags queries whose normalized ratio exceeds 2x (slower or
    faster), skipping rows where both sides are under 0.3 s (pure
    scheduling noise at local[32]);
  * prints probe metadata when the lines carry it, so the reader can
    tell a matched-probe comparison from a cross-window one.

Exit status 1 if any >2x normalized SLOWDOWN is flagged (the gate),
0 otherwise. Local-dev tool; the Scala library does not depend on it.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def main():
    args = sys.argv[1:]
    path = "bench-log.jsonl"
    idx = None
    if "-n" in args:
        i = args.index("-n")
        idx = (int(args[i + 1]), int(args[i + 2]))
        args = args[:i] + args[i + 3:]
    if args:
        path = args[0]
    lines = load(path)
    if len(lines) < 2:
        print("need at least 2 bench lines")
        return 0
    old, new = (lines[idx[0]], lines[idx[1]]) if idx else (lines[-2], lines[-1])

    def meta(d, tag):
        probes = ""
        if "probe_before" in d or "probe_after" in d:
            probes = f" probes={d.get('probe_before','?')}/{d.get('probe_after','?')}"
        note = (d.get("note") or "")[:80]
        print(f"{tag}: total={d['value']:.1f}s n={len(d['queries'])}{probes}"
              f"  {note}")

    meta(old, "OLD")
    meta(new, "NEW")
    if not ("probe_before" in old and "probe_before" in new):
        print("NOTE: one or both lines lack probe metadata — treat as "
              "cross-window; the median normalizer below is the only guard")

    shared = sorted(set(old["queries"]) & set(new["queries"]))
    print(f"shared keys: {len(shared)} "
          f"(old-only {len(set(old['queries']) - set(new['queries']))}, "
          f"new-only {len(set(new['queries']) - set(old['queries']))})")
    if not shared:
        return 0
    ratios = {k: new["queries"][k] / max(old["queries"][k], 1e-9)
              for k in shared}
    med = statistics.median(ratios.values())
    print(f"median per-query ratio (host-drift normalizer): {med:.3f}")

    slow, fast = [], []
    for k in shared:
        o, n = old["queries"][k], new["queries"][k]
        if o < 0.3 and n < 0.3:
            continue
        norm = ratios[k] / med
        if norm > 2.0:
            slow.append((norm, k, o, n))
        elif norm < 0.5:
            fast.append((1 / norm, k, o, n))
    for tag, rows in (("SLOWER", sorted(slow, reverse=True)),
                      ("faster", sorted(fast, reverse=True))):
        for r, k, o, n in rows:
            print(f"  {tag} {r:4.1f}x (normalized)  {k}: {o:.2f}s -> {n:.2f}s")
    if not slow and not fast:
        print("no >2x normalized movers — per-query profile stable")
    return 1 if slow else 0


if __name__ == "__main__":
    sys.exit(main())
