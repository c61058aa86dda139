#!/usr/bin/env python3
"""Cross-engine check for dedup_embedding's SCALE branches (dev only;
the driver's gate can't reach them: the centered csg/cbands and wide
wsg/wbands oracle CTEs are empty at every test SF because the corpus is
under Lsh.PairScaleCutover, so a mirror-arithmetic slip in the
centered-key or wide-key SQL would otherwise ship undetected until a
>=100k-vector run).

Forces each branch in BOTH engines the same way the spec forces Spark:
takes the dedup_embedding oracle SQL from a Verify dump, substitutes the
cutover literals with 0 (the exact analogue of embeddingPairs's cutover
overrides), runs it in DuckDB over the planted-duplicate corpus that
DedupEmbeddingRecallSpec writes, and diffs against the spec's persisted
Spark results with check.py's equality rules (rows sorted, floats
bitwise):

  - mid tier (2x32-bit centered):  PairScaleCutover -> 0, vs found.parquet
  - wide tier (4x48-bit centered): both cutovers -> 0,  vs found_wide.parquet

Usage: python3 tools/check_scale_branch.py <verifyOutDir> [corpusDir]
Run AFTER `sbt test` (the spec writes corpusDir) and a Verify dump (for
oracle_sql.json). corpusDir defaults to /tmp/graft_dedup_scale_spec.
"""
import sys, os, json, glob, math, re
import duckdb

SCALE_CUTOVER = 100000   # Lsh.PairScaleCutover
WIDE_CUTOVER = 2000000   # Lsh.PairWideCutover


def compare(con, sql, corpus, parquet_name, label):
    erows = con.sql(sql).fetchall()
    files = glob.glob(f"{corpus}/{parquet_name}/*.parquet")
    grows = con.sql(
        f"SELECT a, b, cos FROM read_parquet({files!r}) ORDER BY a, b"
    ).fetchall()
    if len(grows) != len(erows):
        print(f"FAIL [{label}]: rowcount spark={len(grows)} duck={len(erows)}")
        sys.exit(1)
    if len(grows) == 0:
        print(f"FAIL [{label}]: zero rows — the planted corpus should produce pairs")
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
        print(f"FAIL [{label}]: {bad}/{len(grows)} rows differ, maxfloat-err={maxerr:.3e}")
        print(f"   spark: {first[0]}\n   duck : {first[1]}")
        sys.exit(1)
    print(f"scale-branch OK [{label}] ({len(grows)} pairs, spark == duckdb bitwise)")


def main(out_dir, corpus="/tmp/graft_dedup_scale_spec"):
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["dedup_embedding"]
    # each cutover literal appears exactly twice (a `<` that empties the
    # smaller tier, a `>=` that fills the larger); substitute by VALUE so
    # the two tiers can be forced independently
    sql_mid, n1 = re.subn(rf"\b{SCALE_CUTOVER}\b", "0", sql)
    if n1 != 2:
        print(f"FAIL: expected exactly 2 PairScaleCutover sites, found {n1}")
        sys.exit(1)
    sql_wide, n2 = re.subn(rf"\b{WIDE_CUTOVER}\b", "0", sql_mid)
    if n2 != 2:
        print(f"FAIL: expected exactly 2 PairWideCutover sites, found {n2}")
        sys.exit(1)
    con = duckdb.connect()
    con.sql("CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{corpus}/embeddings.parquet/*.parquet')")
    compare(con, sql_mid, corpus, "found.parquet", "mid 2x32")
    compare(con, sql_wide, corpus, "found_wide.parquet", "wide 4x44-residual")


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:3])
