#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables, canonicalizes both (columns sorted by name, rows sorted by all
columns), and compares. Exit code 1 if any query mismatches.
"""
import duckdb, glob, json, math, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    # Sort on a key with float columns rounded to 6 decimals: tolerated
    # last-ulp float jitter must not be able to flip row order between
    # the two sides (it would misalign the positional compare).
    key = df.copy()
    for c in key.columns:
        if key[c].dtype.kind == "f":
            key[c] = key[c].round(6)
    order = key.sort_values(by=list(key.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            return True
        # 6-significant-digit tolerance (reference discipline)
        return abs(a - b) <= 1e-6 * max(abs(a), abs(b), 1e-300)
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures, exact_misses = [], []
    for name in sorted(oracle):
        sql = oracle[name]
        resdir = f"{outdir}/{name}"
        if not glob.glob(f"{resdir}/*.parquet"):
            failures.append((name, "no spark result written"))
            continue
        try:
            got = canon(con, f"SELECT * FROM read_parquet('{resdir}/*.parquet')")
            exp = canon(con, sql)
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            continue
        if list(got.columns) != list(exp.columns):
            failures.append(
                (name, f"columns differ: {list(got.columns)} vs {list(exp.columns)}"))
            continue
        if len(got) != len(exp):
            failures.append((name, f"rowcount {len(got)} vs {len(exp)}"))
            continue
        # The driver hashes raw values, so an int column on one side vs
        # a float on the other (e.g. DuckDB HUGEINT from SUM(int) → 1.0
        # vs 1) hash-mismatches even though == passes. Flag dtype-kind
        # drift. (Nullable ints surface as float64 on BOTH sides via
        # fetchdf, so symmetric nulls don't trip this.)
        kind_bad = [
            c for c in got.columns
            if {got[c].dtype.kind, exp[c].dtype.kind} == {"i", "f"}
        ]
        if kind_bad:
            failures.append(
                (name, "int-vs-float dtype (driver hash-mismatch): "
                 + ", ".join(f"{c}({got[c].dtype}/{exp[c].dtype})"
                             for c in kind_bad)))
            continue
        bad = None
        n_inexact = 0
        for i in range(len(got)):
            for c in got.columns:
                a, b = got[c].iloc[i], exp[c].iloc[i]
                try:
                    a = a.item()
                except AttributeError:
                    pass
                try:
                    b = b.item()
                except AttributeError:
                    pass
                if not cell_eq(a, b):
                    bad = (i, c, a, b)
                    break
                if isinstance(a, float) and isinstance(b, float) and a != b \
                        and not (math.isnan(a) and math.isnan(b)):
                    n_inexact += 1
            if bad:
                break
        if bad:
            failures.append((name, f"row {bad[0]} col {bad[1]}: {bad[2]!r} vs {bad[3]!r}"))
        else:
            tag = "OK" if n_inexact == 0 else f"OK~ ({n_inexact} cells inexact)"
            if n_inexact:
                exact_misses.append(name)
            print(f"  {tag:28s} {name}  ({len(got)} rows)")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match"
          + (f"; bitwise-inexact: {exact_misses}" if exact_misses else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
