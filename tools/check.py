#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
sfDir parquet tables, and compares: schema (sorted column names), row
count, and a hash over sorted rows of stringified values.
"""
import json
import re
import sys
import glob
import hashlib

import duckdb

# CTE/alias names that are (or are likely to become) reserved words in
# DuckDB. The local pin may accept them while the driver's newer DuckDB
# rejects them at parse time — exactly how round 3's only red happened
# (`WITH asof AS (...)` parsed under 1.0.0, died under the driver's
# build). Linting here keeps that failure class out of the oracles
# regardless of either side's DuckDB version.
RESERVED_CTE_NAMES = {
    "asof", "pivot", "unpivot", "qualify", "positional", "semi", "anti",
    "window", "offset", "limit", "order", "group", "select", "from",
    "where", "join", "using", "natural", "exclude", "glob", "grouping",
    "lateral", "summarize", "describe", "sample", "values", "table",
}
# the name may carry a parenthesized column list: WITH t(a, b) AS (...)
CTE_RE = re.compile(
    r"(?i)(?:\bwith\b|,)\s*([a-z_][a-z0-9_]*)\s*(?:\([^)]*\))?\s+as\s*\(")


def lint_reserved(name, sql):
    # strip single-quoted string literals first: a comma + word inside a
    # literal (e.g. ', window (') must not false-flag as a CTE name
    stripped = re.sub(r"'(?:[^']|'')*'", "''", sql)
    bad = sorted({m.group(1).lower() for m in CTE_RE.finditer(stripped)}
                 & RESERVED_CTE_NAMES)
    if bad:
        print(f"FAIL {name}: CTE name(s) {bad} are DuckDB reserved words "
              "(or reserved in newer DuckDB) — rename them")
    return not bad

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if not lint_reserved(name, oracle[name]):
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        try:
            rel = con.sql(oracle[name])
            # HUGEINT tripwire: DuckDB widens SUM(BIGINT) to INT128,
            # which the driver's checker stringifies differently than
            # Spark's BIGINT even when values are equal (r2 root cause
            # of all 8 hash-fails). fetchall() converts HUGEINT to a
            # Python int and masks it, so fail on the declared type.
            bad = [c for c, t in zip(rel.columns, rel.types)
                   if str(t) in ("HUGEINT", "INT128", "UHUGEINT", "UINT128")]
            if bad:
                print(f"FAIL {name}: oracle yields HUGEINT column(s) "
                      f"{bad} — CAST the SUM/expression to BIGINT")
                n_fail += 1
                continue
            exp = rel.fetchall()
            exp_cols = rel.columns
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        hg, he = table_fingerprint(got_cols, got), table_fingerprint(exp_cols, exp)
        if hg != he:
            print(f"FAIL {name}: hash {hg} != {he}")
            order = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            gl = sorted("|".join(norm_cell(r[i]) for i in order) for r in got)
            el = sorted("|".join(norm_cell(r[i]) for i in order) for r in exp)
            for a, b in zip(gl, el):
                if a != b:
                    print(f"  spark:  {a[:200]}")
                    print(f"  oracle: {b[:200]}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
