#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 correctness gate.

Loads each <out>/<name> parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf dir, canonicalizes
both sides (columns sorted by name, rows sorted, values at FULL precision
with a native-type tag, NULL token) and diffs.

Canonicalization is deliberately representation-sensitive: the driver's
hash gate preserves value representation, so a DECIMAL column that is
bit-identical in value to a BIGINT one must still FAIL here (round 1
shipped 8 such false-greens when this script rounded decimals to 2dp).
Usage:

    python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import os
import sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def canon_type(t):
    """Collapse DuckDB types to the driver-hash equivalence classes:
    plain integer widths all fetch as Python int (equivalent), but
    HUGEINT fetches as Decimal (distinct); FLOAT/DOUBLE both fetch as
    Python float. Everything else (DECIMAL(p,s), VARCHAR, TIMESTAMP,
    nested types) compares verbatim."""
    s = str(t)
    if s in INT_FAMILY:
        return "INT"
    if s in ("FLOAT", "DOUBLE"):
        return "FLOAT"
    return s


def canon_cell(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return f"bool:{str(v).lower()}"
    if isinstance(v, Decimal):
        return f"dec:{v}"  # native scale, full precision
    if isinstance(v, float):
        return f"f64:{v!r}"
    if isinstance(v, int):
        return f"int:{v}"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip(cols, cols))], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir")
            failures += 1
            continue
        got_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        gcols = list(got_rel.columns)
        gtypes = [str(t) for t in got_rel.types]
        grows = got_rel.fetchall()
        want_rel = con.sql(sql)
        wcols = list(want_rel.columns)
        wtypes = [str(t) for t in want_rel.types]
        wrows = want_rel.fetchall()
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(wcols)}")
            failures += 1
            continue
        # Native-type gate: fetchall() collapses e.g. DuckDB HUGEINT (the
        # default widening of SUM(BIGINT)) and BIGINT both to Python int, so
        # value comparison alone false-greens representation mismatches the
        # driver's hash gate fails on (q18b shipped red twice this way).
        # Normalize to the driver's sensitivity: plain integer widths all
        # fetch as Python int (collapse), but HUGEINT round-trips as a
        # Decimal through Arrow (distinct); float widths both fetch float.
        gt = {c: canon_type(t) for c, t in zip(gcols, gtypes)}
        wt = {c: canon_type(t) for c, t in zip(wcols, wtypes)}
        tdiff = {c: (gt[c], wt[c]) for c in gt if gt[c] != wt[c]}
        if tdiff:
            print(f"FAIL {name}: column types differ (spark, oracle): {tdiff}")
            failures += 1
            continue
        _, g = canon(grows, gcols)
        _, w = canon(wrows, wcols)
        if g == w:
            print(f"OK   {name}: {len(g)} rows")
        else:
            failures += 1
            print(f"FAIL {name}: {len(g)} spark rows vs {len(w)} oracle rows")
            only_g = [r for r in g if r not in set(w)][:3]
            only_w = [r for r in w if r not in set(g)][:3]
            print(f"  spark-only: {only_g}")
            print(f"  oracle-only: {only_w}")
    # queries without oracle: rows-only existence check
    for name in sorted(os.listdir(out_dir)):
        d = f"{out_dir}/{name}"
        if os.path.isdir(d) and name not in oracle:
            n = con.execute(f"SELECT COUNT(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"{'OK  ' if n > 0 else 'FAIL'} {name}: rows-only, {n} rows")
            if n == 0:
                failures += 1
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
