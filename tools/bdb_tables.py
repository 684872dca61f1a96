#!/usr/bin/env python3
"""Render BDB_BENCH.md's cross-scale tables from bench/bdb CSVs.

Usage: python3 tools/bdb_tables.py [bench/bdb]

Reads <base>/sf{0.1,1.0,3.0,10.0}/results.csv (every pass) and
prints the per-query minima table, the per-class main-phase sums,
and the suite totals — so the doc's numbers are regenerated, never
hand-edited. Minima are per-query across all recorded passes
(including isolated re-runs), matching results_summary.csv.
"""
import csv
import sys
from collections import defaultdict

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
    total = {}
    mainp = {}
    rows = {}
    for sf in SCALES:
        total[sf], mainp[sf], rows[sf] = load(base, sf)

    queries = sorted(total[SCALES[0]])
    print("suite best-pass totals: " + " -> ".join(
        f"{sum(total[sf].values()):.1f} s" for sf in SCALES))
    print("main-phase only:        " + " -> ".join(
        f"{sum(mainp[sf].values()):.1f} s" for sf in SCALES))
    print()
    print("| query | sf0.1 | sf1 | sf3 | sf10 | sf10/sf3 "
          "| sf10/sf3 (main) | rows@sf10 |")
    print("|---|---|---|---|---|---|---|---|")
    for q in queries:
        r = total["10.0"][q] / total["3.0"][q]
        rm = mainp["10.0"][q] / mainp["3.0"][q] if mainp["3.0"][q] else 0
        cells = " | ".join(f"{total[sf][q]:.2f}" for sf in SCALES)
        print(f"| {q} | {cells} | {r:.1f} | {rm:.1f} "
              f"| {rows['10.0'][q]} |")
    print()
    print("| class | queries | main sf0.1->sf1->sf3->sf10 "
          "| sf3->sf10 ratio (3.33x data) |")
    print("|---|---|---|---|")
    for name, qs in CLASSES:
        sums = [sum(mainp[sf][q] for q in qs) for sf in SCALES]
        ratio = sums[3] / sums[2]
        print(f"| {name} | {' '.join(qs)} | "
              + " -> ".join(f"{s:.1f}" for s in sums)
              + f" | {ratio:.1f} |")


if __name__ == "__main__":
    main()
