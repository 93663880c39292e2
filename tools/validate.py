#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT part of the
library): reads Verify's outDir (per-query parquet + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf parquet tables, sorts
columns by name, and compares values row-by-row.

Usage: python3 tools/validate.py <outDir> <sfDir> [key ...]
"""
import json, math, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

def type_mismatches(con, sql, files):
    """Driver-faithful TYPE leg (r16 verdict item 2): the driver hashes
    typed values, so HUGEINT!=BIGINT and DECIMAL!=DOUBLE fail its gate
    even when every value compares equal. DESCRIBE both the oracle query
    and the Spark parquet in DuckDB and report per-column differences.

    Known-benign pairs (collapsed by the driver's hasher per the r16
    driver artifact: keys with these diffs passed hash_match) are
    allowlisted; everything else — notably HUGEINT/BIGINT and
    DECIMAL/DOUBLE, the two classes that produced r16's 6 surprises —
    fails."""
    benign = {frozenset(p) for p in [
        ("INTEGER", "BIGINT"), ("SMALLINT", "BIGINT"), ("TINYINT", "BIGINT"),
        ("SMALLINT", "INTEGER"), ("TINYINT", "INTEGER"),
        ("TIMESTAMP", "TIMESTAMP_NS"), ("TIMESTAMP", "TIMESTAMP WITH TIME ZONE"),
        # UINTEGER: DuckDB's regr_count returns it; d34_regr_native passed
        # the driver's hash_match in CORRECTNESS_r16 with oracle UINTEGER
        # vs spark BIGINT, so the driver's hasher collapses this pair.
        ("UINTEGER", "BIGINT"),
    ]}
    dd = con.execute(f"DESCRIBE {sql}").fetchall()
    sd = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()
    dtypes = {r[0]: r[1] for r in dd}
    stypes = {r[0]: r[1] for r in sd}
    bad = []
    # r17 ADVICE: a column present on only one side must be a TYPE-FAIL
    # too — the intersection-only loop let schema drift slip through when
    # (hypothetically) the value leg's name check also regressed.
    for c in sorted(set(dtypes) ^ set(stypes)):
        side = "oracle-only" if c in dtypes else "spark-only"
        bad.append(f"{c}: {side}")
    for c in sorted(set(dtypes) & set(stypes)):
        a, b = stypes[c], dtypes[c]
        if a != b and frozenset((a, b)) not in benign:
            bad.append(f"{c}: spark={a} oracle={b}")
    return bad

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # r18: a typo'd key arg must not print "0 ok, 0 failed" and exit 0
    # with nothing checked (the oracle_lint r17 fix, mirrored here)
    unknown = only - set(oracle)
    if unknown:
        print(f"ERROR: unknown key(s) not in oracle_sql.json: {sorted(unknown)}")
        sys.exit(2)
    n_ok = n_bad = 0
    for key in sorted(oracle):
        if only and key not in only:
            continue
        sql = oracle[key]
        # sorted: Verify coalesces to one file today, but multi-part output
        # must still compare in deterministic part order
        files = sorted(glob.glob(f"{out_dir}/{key}/*.parquet"))
        if not files:
            print(f"FAIL {key}: no spark output"); n_bad += 1; continue
        try:
            duck = con.execute(sql)
            dcols = [c[0] for c in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {key}: duckdb error: {e}"); n_bad += 1; continue
        sq = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [c[0] for c in sq.description]
        srows = sq.fetchall()
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {key}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            n_bad += 1; continue
        sidx = [scols.index(c) for c in sorted(scols)]
        didx = [dcols.index(c) for c in sorted(dcols)]
        if len(srows) != len(drows):
            print(f"FAIL {key}: rows spark={len(srows)} duck={len(drows)}")
            n_bad += 1; continue
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            a = tuple(norm(sr[j]) for j in sidx)
            b = tuple(norm(dr[j]) for j in didx)
            if a != b:
                bad = (i, a, b); break
        if bad:
            print(f"FAIL {key}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_bad += 1
            continue
        try:
            tbad = type_mismatches(con, sql, files)
        except Exception as e:
            tbad = [f"describe error: {e}"]
        if tbad:
            print(f"TYPE-FAIL {key}: " + "; ".join(tbad))
            n_bad += 1
        else:
            print(f"ok   {key} ({len(srows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
