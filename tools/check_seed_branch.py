#!/usr/bin/env python3
"""Cross-engine check for the routed search's two-level seed selection
on its APPROXIMATE branch (dev only; the driver's gate can't reach it:
at every test SF the resolved anchor bank is <= 256 nodes, so the
coarse width cc = 16 equals the probe width tl and the wired pick is
bitwise the exact full-bank scan — the pruning path of
SqlIvf.seedCtes's slqc/sd3 CTEs would otherwise ship undetected until
a >=512-anchor corpus).

SeedWireSpec plants a many-tight-clusters corpus whose entry ladder
resolves deep enough that bank > 256 (cc >= 32 > tl = 16), runs the
UNMODIFIED catalog graph_routed_search on it, and exports (corpus,
result, branch metadata). This tool re-runs the query's own static
oracle SQL (taken verbatim from a Verify dump) over the same corpus in
DuckDB and diffs the full (qid, rnk, bid, dist) rows bitwise.

Usage: python3 tools/check_seed_branch.py <verifyOutDir> [corpusDir]
Run AFTER `sbt test` (the spec writes corpusDir) and a Verify dump
(for oracle_sql.json). corpusDir defaults to /tmp/graft_seed_branch.
"""
import sys, json, glob, math
import duckdb


def main(out_dir, corpus="/tmp/graft_seed_branch"):
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["graph_routed_search"]
    meta = json.load(open(f"{corpus}/meta.json"))
    if not (meta["tl"] < meta["cc"]):
        print(f"FAIL: spec bundle is not on the approximate branch: {meta}")
        sys.exit(1)
    con = duckdb.connect()
    con.sql("CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{corpus}/embeddings.parquet/*.parquet')")
    erows = con.sql(sql).fetchall()
    files = glob.glob(f"{corpus}/result.parquet/*.parquet")
    grows = con.sql(
        f"SELECT qid, rnk, bid, dist FROM read_parquet({files!r}) ORDER BY qid, rnk"
    ).fetchall()
    if len(grows) != len(erows):
        print(f"FAIL: rowcount spark={len(grows)} duck={len(erows)}")
        sys.exit(1)
    if len(grows) == 0:
        print("FAIL: zero rows — the planted corpus should produce results")
        sys.exit(1)
    bad = 0
    first = None
    for rg, re_ in zip(grows, erows):
        for a, b in zip(rg, re_):
            same = (a == b) or (isinstance(a, float) and isinstance(b, float)
                                and math.isnan(a) and math.isnan(b))
            if not same:
                bad += 1
                if first is None:
                    first = (rg, re_)
                break
    if bad:
        print(f"FAIL: {bad}/{len(grows)} rows differ")
        print(f"   spark: {first[0]}\n   duck : {first[1]}")
        sys.exit(1)
    print(f"seed-branch OK (bank={meta['bank']} cc={meta['cc']} tl={meta['tl']}: "
          f"{len(grows)} rows, spark == duckdb bitwise)")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print("usage: python3 tools/check_seed_branch.py <verifyOutDir> "
              "[corpusDir (default /tmp/graft_seed_branch)]\n"
              "run AFTER `sbt test` (writes the corpus) and a Verify dump "
              "(provides oracle_sql.json)", file=sys.stderr)
        sys.exit(2)
    main(sys.argv[1], *sys.argv[2:3])
