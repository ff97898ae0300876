#!/usr/bin/env python3
"""One-command bench drift triage between two per-query snapshots.

Compares the MIN times (the noise floor — see SOAK.md's bench-noise
methodology; medians carry interleaved-neighbor and host-load noise) of
two BENCH_QUERIES_r{N}.json / target/bench_queries.json files and flags:

  - REGRESSION: new min exceeds max(old*ratio, old+abs) — the same
    threshold the round-close audits use (default 1.5x / +0.3 s);
  - WATCH:     new min exceeds max(old*1.15, old+0.15) but stays under
    the REGRESSION bar — printed, never exit-failing. The loose 1.5x bar
    alone lets ~1.2x/round creep compound invisibly across rounds (the
    r11 q69 +23% / q28c +21% case); WATCH rows surface it for the
    round-close fresh-JVM adjudication without turning host-envelope
    noise into gate failures;
  - IMPROVED:  new min under old*0.7 and at least 0.3 s faster;
  - NEWLY-FAILED: numeric in the old snapshot, null in the new (the
    producer records null for a query that errored) — treated as a
    regression (exit 1), never silently skipped;
  - ADDED / REMOVED queries. An ADDED query whose new value is null
    (brand-new query that errored in its very first bench run) is a
    failure too (exit 1) — it has no old row for NEWLY-FAILED to catch,
    and a new-and-broken query must not pass the round-close gate.

Each input file's resolved metric key (queries_min or the queries
median fallback) is printed; a MIXED-KEYS warning fires when the two
files resolve differently — mins compared against medians flag spurious
regressions (or mask real ones).

A flagged regression is a CANDIDATE, not a verdict: re-measure it in a
fresh JVM (`sbt 'Test/runMain graft.DevScratch <q> <sfdir> 4 noExplain'`)
before treating it as real — registry-order neighbor effects routinely
inflate a single query (the q85/q131 case in SOAK.md round 11).

Usage: tools/diff_bench.py OLD.json NEW.json [ratio] [abs_s]
Exit code 1 iff any regression candidate is flagged.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    abs_s = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    def resolve(snap):
        if snap.get("queries_min"):
            return snap["queries_min"], "queries_min"
        return snap.get("queries") or {}, "queries (median fallback)"

    om, okey = resolve(old)
    nm, nkey = resolve(new)
    print(f"old: {old.get('value')} s over {len(om)} [{okey}] | "
          f"new: {new.get('value')} s over {len(nm)} [{nkey}]")
    if okey != nkey:
        print("  MIXED-KEYS WARNING: the two files resolve to different "
              "metrics — min-vs-median comparison flags spurious "
              "regressions and masks real ones; regenerate the missing "
              "queries_min snapshot before trusting the rows below")
    regs, watch, newly_failed = [], [], []
    for q, v in sorted(nm.items()):
        o = om.get(q)
        if q in om and o is not None and v is None:
            # regressed to outright FAILURE — the worst case; silently
            # skipping it (the old behavior) passed the round-close gate
            newly_failed.append((q, o))
            continue
        if o is None or v is None:
            if q in om and o is None and v is not None:
                print(f"  RECOVERED  {q}: was FAILED/null, now {v:.2f}")
            continue
        if v > max(o * ratio, o + abs_s):
            regs.append((q, o, v))
        elif v > max(o * 1.15, o + 0.15):
            watch.append((q, o, v))
        elif v < o * 0.7 and o - v > abs_s:
            print(f"  IMPROVED   {q}: {o:.2f} -> {v:.2f} ({v/o:.2f}x)")
    def fmt(v):
        # a failed query records null; keep the report alive and visible
        return f"{v:.2f}" if v is not None else "FAILED/null"

    added_failed = []
    for q in sorted(set(nm) - set(om)):
        if nm[q] is None:
            # a brand-new query that errored in its first run — no old
            # row exists for NEWLY-FAILED to catch it, so flag it here
            added_failed.append(q)
        print(f"  ADDED      {q}: {fmt(nm[q])}")
    for q in sorted(set(om) - set(nm)):
        print(f"  REMOVED    {q} (was {fmt(om[q])})")
    for q, o, v in sorted(watch, key=lambda x: -(x[2] / x[1])):
        print(f"  WATCH      {q}: {o:.2f} -> {v:.2f} ({v/o:.2f}x) — "
              "under the regression bar; adjudicate fresh-JVM at "
              "round close so creep can't compound")
    for q, o in newly_failed:
        print(f"  NEWLY-FAILED {q}: was {o:.2f}, now null — the query "
              "errored in the new run; this IS a regression")
    for q in added_failed:
        print(f"  ADDED-FAILED {q}: new query errored in its first bench "
              "run (null) — failing tier, fix before round close")
    for q, o, v in sorted(regs, key=lambda x: -(x[2] / x[1])):
        print(f"  REGRESSION {q}: {o:.2f} -> {v:.2f} ({v/o:.2f}x) — "
              "re-measure fresh-JVM before believing it")
    if not regs and not newly_failed and not added_failed:
        print("zero min-regressions")
    return 1 if (regs or newly_failed or added_failed) else 0


if __name__ == "__main__":
    sys.exit(main())
