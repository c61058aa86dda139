#!/usr/bin/env python3
"""Cross-engine replay of curate_corpus on the PLANTED corpus (dev
only; run `sbt -batch "testOnly graft.CurateCorpusSpec"` first). The
driver's sf0.01 oracle check proves the composed pipeline cross-engine
but cannot reach the `contaminated` branch (the synthetic corpus has
zero 5-shingle overlap between bench and train docs), so the spec
writes a corpus where EVERY verdict fires plus its Spark result and the
exact oracle SQL; this replays the SQL in DuckDB over that corpus and
requires value-identical rows — the same pattern check_scale_branch.py
uses for dedup_embedding's scale tier.
"""
import glob
import sys

import duckdb

DIR = "/tmp/graft_curate_planted"


def main():
    docs = sorted(glob.glob(f"{DIR}/documents.parquet/*.parquet"))
    found = sorted(glob.glob(f"{DIR}/found.parquet/*.parquet"))
    if not docs or not found:
        sys.exit(f"missing spec outputs under {DIR} — run "
                 '`sbt -batch "testOnly graft.CurateCorpusSpec"` first')
    sql = open(f"{DIR}/oracle.sql").read()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet({docs!r})")
    oracle = con.sql(sql).fetchall()
    spark = con.sql(
        f"SELECT doc_id, keep, reason FROM read_parquet({found!r}) "
        "ORDER BY doc_id").fetchall()
    if oracle != spark:
        print("MISMATCH")
        print("  oracle:", oracle)
        print("  spark :", spark)
        sys.exit(1)
    reasons = sorted({r[2] for r in oracle})
    print(f"curate_corpus planted replay OK: {len(oracle)} rows identical, "
          f"verdicts covered: {reasons}")


if __name__ == "__main__":
    main()
