#!/usr/bin/env python3
"""Cross-engine check for dedup_embedding's SCALE branch (dev only; the
driver's gate can't reach it: the centered csg/cbands oracle CTEs are
empty at every test SF because the corpus is under Lsh.PairScaleCutover,
so a mirror-arithmetic slip in the centered-key SQL would otherwise ship
undetected until a >=100k-vector run).

Forces the branch in BOTH engines the same way the spec forces Spark:
takes the dedup_embedding oracle SQL from a Verify dump, substitutes the
cutover literal with 0 (the exact analogue of embeddingPairs(cutover=0)),
runs it in DuckDB over the planted-duplicate corpus that
DedupEmbeddingRecallSpec writes, and diffs against the spec's persisted
Spark result (found.parquet) with check.py's equality rules (rows sorted,
floats bitwise).

Usage: python3 tools/check_scale_branch.py <verifyOutDir> [corpusDir]
Run AFTER `sbt test` (the spec writes corpusDir) and a Verify dump (for
oracle_sql.json). corpusDir defaults to /tmp/graft_dedup_scale_spec.
"""
import sys, os, json, glob, math, re
import duckdb


def main(out_dir, corpus="/tmp/graft_dedup_scale_spec"):
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["dedup_embedding"]
    # force the scale branch: the cutover literal appears exactly twice
    # (sg's `n < C` empties, ce's `n >= C` fills) — substitute C -> 0.
    # \b keeps `brn <= cap` and other comparisons out of reach.
    sql2, nsub = re.subn(r"(\bn\s*[<>]=?\s*)\d+", r"\g<1>0", sql)
    if nsub != 2:
        print(f"FAIL: expected exactly 2 cutover comparison sites in the "
              f"oracle SQL, found {nsub} — substitution is unsafe")
        sys.exit(1)
    con = duckdb.connect()
    con.sql("CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{corpus}/embeddings.parquet/*.parquet')")
    erows = con.sql(sql2).fetchall()
    files = glob.glob(f"{corpus}/found.parquet/*.parquet")
    grows = con.sql(
        f"SELECT a, b, cos FROM read_parquet({files!r}) ORDER BY a, b"
    ).fetchall()
    if len(grows) != len(erows):
        print(f"FAIL: rowcount spark={len(grows)} duck={len(erows)}")
        sys.exit(1)
    if len(grows) == 0:
        print("FAIL: zero rows — the planted corpus should produce pairs")
        sys.exit(1)
    bad = 0
    maxerr = 0.0
    first = None
    for rg, re_ in zip(grows, erows):
        for a, b in zip(rg, re_):
            same = (a == b) or (isinstance(a, float) and isinstance(b, float)
                                and math.isnan(a) and math.isnan(b))
            if not same:
                bad += 1
                if isinstance(a, float) and isinstance(b, float):
                    maxerr = max(maxerr, abs(a - b))
                if first is None:
                    first = (rg, re_)
                break
    if bad:
        print(f"FAIL: {bad}/{len(grows)} rows differ, maxfloat-err={maxerr:.3e}")
        print(f"   spark: {first[0]}\n   duck : {first[1]}")
        sys.exit(1)
    print(f"scale-branch OK ({len(grows)} pairs, spark == duckdb bitwise)")


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:3])
