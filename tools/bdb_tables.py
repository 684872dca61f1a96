#!/usr/bin/env python3
"""Render BDB_BENCH.md's cross-scale tables from bench/bdb CSVs.

Usage: python3 tools/bdb_tables.py [bench/bdb] [sf1,sf2,...]

Reads <base>/sf{...}/results.csv (every pass; default scales
0.1,1.0,3.0,10.0) and prints the per-query minima table, the
per-class main-phase sums, and the suite totals — so the doc's
numbers are regenerated, never hand-edited. Minima are per-query
across all recorded passes (including isolated re-runs), matching
results_summary.csv. The last two scales feed the top-step ratio
columns.
"""
import csv
import sys

SCALES = ["0.1", "1.0", "3.0", "10.0"]
CLASSES = [
    ("Sessionized clickstream", ["q02", "q03", "q04", "q30"]),
    ("Relational joins/aggs",
     ["q01"] + [f"q{i:02d}" for i in range(6, 10)] +
     [f"q{i:02d}" for i in range(11, 18)] +
     [f"q{i:02d}" for i in range(21, 25)] + ["q29"]),
    ("Text / reviews", ["q10", "q18", "q19", "q27"]),
    ("ML (eager fit in read phase)", ["q05", "q20", "q25", "q26", "q28"]),
]


def load(base, sf):
    best_total = {}
    best_main = {}
    rows_at_best = {}
    with open(f"{base}/sf{sf}/results.csv") as f:
        for r in csv.DictReader(f):
            if r["status"] != "ok":
                continue
            q = r["query"]
            t = float(r["total_secs"])
            if q not in best_total or t < best_total[q]:
                best_total[q] = t
                rows_at_best[q] = int(r["rows"])
            m = float(r["main_secs"])
            if q not in best_main or m < best_main[q]:
                best_main[q] = m
    return best_total, best_main, rows_at_best


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "bench/bdb"
    scales = sys.argv[2].split(",") if len(sys.argv) > 2 else SCALES
    hi, lo = scales[-1], scales[-2]
    step = float(hi) / float(lo)

    def label(sf):
        return "sf" + (sf[:-2] if sf.endswith(".0") else sf)

    total = {}
    mainp = {}
    rows = {}
    for sf in scales:
        total[sf], mainp[sf], rows[sf] = load(base, sf)

    queries = sorted(total[scales[0]])
    print("suite best-pass totals: " + " -> ".join(
        f"{sum(total[sf].values()):.1f} s" for sf in scales))
    print("main-phase only:        " + " -> ".join(
        f"{sum(mainp[sf].values()):.1f} s" for sf in scales))
    print()
    print("| query | " + " | ".join(label(sf) for sf in scales)
          + f" | {label(hi)}/{label(lo)} | {label(hi)}/{label(lo)} (main) "
          f"| rows@{label(hi)} |")
    print("|---|" + "---|" * (len(scales) + 3))
    for q in queries:
        r = total[hi][q] / total[lo][q]
        rm = mainp[hi][q] / mainp[lo][q] if mainp[lo][q] else 0
        cells = " | ".join(f"{total[sf][q]:.2f}" for sf in scales)
        print(f"| {q} | {cells} | {r:.1f} | {rm:.1f} "
              f"| {rows[hi][q]} |")
    print()
    print("| class | queries | main " + "->".join(label(sf) for sf in scales)
          + f" | {label(lo)}->{label(hi)} ratio ({step:.2f}x data) |")
    print("|---|---|---|---|")
    for name, qs in CLASSES:
        sums = [sum(mainp[sf][q] for q in qs) for sf in scales]
        ratio = sums[-1] / sums[-2]
        print(f"| {name} | {' '.join(qs)} | "
              + " -> ".join(f"{s:.1f}" for s in sums)
              + f" | {ratio:.1f} |")


if __name__ == "__main__":
    main()
