#!/usr/bin/env python3
"""Floor-refresh protocol (VERDICT r13 next-round #8): the committed
per-query floors in PERF_BASELINE.json are the MIN over N >= 3 spaced
full bench passes AND the committed history — never a single run.

Why: the host is measured bimodal (PERF_NOTES r13: 0.75 vs 1.03 s for
the same query back-to-back within one minute). A floor recorded from
one pass on the fast mode reads as a "regression" on every later run
that lands on the slow mode — the q_drift / q_dedup_minhash
attribution class that cost two rounds of judge/builder A/B forensics.
Min-of-N spaced passes straddles the modes, so a committed floor is a
number the code can actually reproduce, and a later excursion above
2x floor means the CODE (or a genuine stall), not the mode.

Usage:
    python3 tools/floors.py [--allow-new] [--prune] RUN1.json RUN2.json RUN3.json [...]

Each RUN file is a Bench artifact (BENCH_LOCAL.json shape: a
"queries" map of per-query seconds; -1 = failed pass, skipped).
Run-capture artifacts that nest the same dict under "parsed"
(BENCH_r{N}.json) are accepted too (ADVICE r14). Refuses to run with
fewer than 3 run files. Updates PERF_BASELINE.json in place:
  - existing query: floor = min(committed floor, run minima) — floors
    only ratchet DOWN; a slow epoch can never raise one.
  - new query (no committed floor): floor = min over the runs — which
    is why N >= 3 is enforced here rather than advised. A query name
    with no committed floor is WARNED about and skipped unless
    --allow-new is passed: a stale run file must not seed floors for
    renamed/retired queries (ADVICE r14).
  - --prune drops committed floors for queries none of the run files
    measured (the retired-query cleanup, explicit only).
Prints a provenance block (runs, totals, load hints, every floor that
moved) to paste into PERF_NOTES.md next to the refreshed file.
"""
import json
import sys

BASELINE = "PERF_BASELINE.json"
MIN_RUNS = 3


def main(argv):
    allow_new = "--allow-new" in argv
    prune = "--prune" in argv
    paths = [a for a in argv[1:] if not a.startswith("--")]
    if len(paths) < MIN_RUNS:
        sys.exit(f"need >= {MIN_RUNS} spaced bench run files "
                 f"(got {len(paths)}) — a floor from fewer passes "
                 "cannot straddle the host's bimodal modes")
    runs = []
    for path in paths:
        with open(path) as f:
            art = json.load(f)
        # run-capture artifacts (BENCH_r{N}.json) nest the
        # BENCH_LOCAL-shaped dict under "parsed" (ADVICE r14)
        art = art.get("parsed", art) or art
        if "queries" not in art:
            sys.exit(f"{path}: no 'queries' map (not a bench artifact, "
                     "or its 'parsed' field is null)")
        runs.append((path, art))
    with open(BASELINE) as f:
        floors = json.load(f)

    run_min = {}
    for _, art in runs:
        for q, t in art["queries"].items():
            if t is None or t < 0:
                continue  # failed pass: never a floor
            run_min[q] = min(run_min.get(q, float("inf")), t)

    changed, new, skipped_new = [], [], []
    for q, t in sorted(run_min.items()):
        t = round(t, 3)
        if q not in floors:
            # a query with no committed floor: only seed it when the
            # caller says the run files match the current surface —
            # stale run files must not accrete retired-query floors
            if allow_new:
                floors[q] = t
                new.append((q, t))
            else:
                skipped_new.append((q, t))
        elif t < floors[q]:
            changed.append((q, floors[q], t))
            floors[q] = t
    pruned = []
    if prune:
        for q in sorted(set(floors) - set(run_min)):
            pruned.append((q, floors.pop(q)))

    with open(BASELINE, "w") as f:
        f.write("{\n")
        items = sorted(floors.items())
        for i, (q, t) in enumerate(items):
            comma = "," if i < len(items) - 1 else ""
            f.write(f'"{q}": {t}{comma}\n')
        f.write("}\n")

    print(f"## Floor refresh — min over {len(runs)} spaced passes "
          "(+ committed history)\n")
    print("| run | total s | n | load_hint [min,med,max] |")
    print("|---|---|---|---|")
    for path, art in runs:
        qs = [t for t in art["queries"].values() if t is not None and t >= 0]
        print(f"| {path} | {sum(qs):.1f} | {len(qs)} | "
              f"{art.get('load_hint', '?')} |")
    if new:
        print(f"\nNew floors ({len(new)}):")
        for q, t in new:
            print(f"- {q}: {t}")
    if changed:
        print(f"\nLowered floors ({len(changed)}):")
        for q, old, t in changed:
            print(f"- {q}: {old} -> {t}")
    if skipped_new:
        print(f"\nWARNING — {len(skipped_new)} queries have no committed "
              "floor and were NOT seeded (pass --allow-new if these are "
              "genuinely new queries, not stale run files):")
        for q, t in skipped_new:
            print(f"- {q}: {t}")
    if pruned:
        print(f"\nPruned floors ({len(pruned)} — in no run file):")
        for q, t in pruned:
            print(f"- {q}: {t}")
    if not new and not changed:
        print("\nNo floor moved — every committed floor already at or "
              "below these runs' minima.")


if __name__ == "__main__":
    main(sys.argv)
