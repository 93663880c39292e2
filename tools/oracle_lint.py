#!/usr/bin/env python3
"""Registry lint for oracle-type discipline (r16 verdict item 3;
PlanLint's sibling on the TYPE channel, dev-only — not part of the
library).

The driver's correctness hash is TYPE-sensitive: DuckDB widens
SUM(integer) to HUGEINT unless cast, and a raw DECIMAL output violates
the repo's own SURVEY §8.4 emit-DOUBLE convention — both produced r16
hash failures over value-exact answers. This lint makes the discipline
a gate instead of a convention:

  * every DECLARED ORACLE result column must not be HUGEINT, DECIMAL,
    or FLOAT/REAL;
  * every DECLARED SPARK OUTPUT column (the Verify parquet) must not be
    DECIMAL, FLOAT/REAL, or a LIST/STRUCT/MAP (SURVEY §8.4: flatten to
    sorted joined strings or explode — the k9 device).

Usage: python3 tools/oracle_lint.py <verifyOutDir> <sfDir> [key ...]
(run AFTER graft.Verify has produced outDir; wired into the closing
gate next to PlanLint SMELLS=0 and validate.py.)
"""
import json, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLE_BAD = ("HUGEINT", "DECIMAL", "FLOAT", "REAL")
SPARK_BAD = ("DECIMAL", "FLOAT", "REAL", "STRUCT", "MAP")


def flag(types, bad, allow_list=False):
    hits = []
    for col, t in types:
        tu = t.upper()
        if any(b in tu for b in bad) or (not allow_list and "[]" in tu):
            hits.append(f"{col}:{t}")
    return hits


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    # r17 ADVICE: a typo'd key arg used to be silently skipped yet still
    # counted in the denominator — "0 flagged of 1" with nothing checked.
    unknown = only - set(oracle)
    if unknown:
        print(f"ERROR: unknown key(s) not in oracle_sql.json: {sorted(unknown)}")
        sys.exit(2)
    for key in sorted(oracle):
        if only and key not in only:
            continue
        problems = []
        try:
            dd = [(r[0], r[1]) for r in
                  con.execute(f"DESCRIBE {oracle[key]}").fetchall()]
            oh = flag(dd, ORACLE_BAD, allow_list=True)
            if oh:
                problems.append("oracle " + ",".join(oh))
        except Exception as e:
            problems.append(f"oracle describe error: {e}")
        files = sorted(glob.glob(f"{out_dir}/{key}/*.parquet"))
        if files:
            try:
                sd = [(r[0], r[1]) for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet({files!r})"
                ).fetchall()]
                sh = flag(sd, SPARK_BAD)
                if sh:
                    problems.append("spark " + ",".join(sh))
            except Exception as e:
                problems.append(f"spark describe error: {e}")
        if problems:
            print(f"LINT {key}: " + "; ".join(problems))
            n_bad += 1
    print(f"== oracle_lint: {n_bad} flagged of {len(only) if only else len(oracle)} ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
