#!/usr/bin/env python3
"""Cross-core bit-equality check for the rows-only trace queries (dev
only). hnsw_insert / hnsw_phase_trace / hnsw_trace_stats dropped their
DuckDB oracles when their artifact builds moved to the iterative approx
substrate (r7 item 2), so the oracles' implicit determinism guarantee is
re-pinned here: run Verify for exactly those queries at two core counts
with SEPARATE index roots (so every artifact — descent graph, layered
substrate, phase trace — is rebuilt under each parallelism, not loaded
from the first run's cache), then require byte-identical result rows.

ann_quality_sweep rides along since its batched-search rework (r9): its
deterministic columns (everything except the measured wall_ms/qps) must
also be bit-identical under either parallelism.

Usage: python3 tools/check_crosscore.py [sfDir]
(defaults to /root/testdata/sf0.01; ~2 Verify runs of 4 queries each)
"""
import sys, os, glob, shutil, subprocess
import duckdb

QUERIES = "hnsw_insert,hnsw_phase_trace,hnsw_trace_stats,ann_quality_sweep"

# ann_quality_sweep's wall_ms/qps are measured latency (the catalog's one
# documented nondeterministic output, VERDICT r1); every OTHER column of
# every query must be bit-identical across core counts.
EXCLUDE_COLS = {"ann_quality_sweep": {"wall_ms", "qps"}}


def run_verify(sf, out, cpus, index_dir):
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_ONLY=QUERIES,
               SPARK_GRAFT_INDEX_DIR=index_dir)
    shutil.rmtree(index_dir, ignore_errors=True)
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf} {out}"],
        check=True, env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))


def rows(con, d, exclude=frozenset()):
    files = sorted(glob.glob(f"{d}/*.parquet"))
    rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
    cols = rel.columns
    idx = sorted((i for i in range(len(cols)) if cols[i] not in exclude),
                 key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rel.fetchall()]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out


def main(sf="/root/testdata/sf0.01"):
    a, b = "/tmp/graft_xcore_8", "/tmp/graft_xcore_3"
    run_verify(sf, a, 8, "/tmp/graft_index_xcore8")
    run_verify(sf, b, 3, "/tmp/graft_index_xcore3")
    con = duckdb.connect()
    n_fail = 0
    for name in QUERIES.split(","):
        excl = EXCLUDE_COLS.get(name, frozenset())
        ca, ra = rows(con, f"{a}/{name}", excl)
        cb, rb = rows(con, f"{b}/{name}", excl)
        if ca != cb:
            print(f"{name:20s} SCHEMA MISMATCH {ca} vs {cb}")
            n_fail += 1
        elif ra != rb:
            diff = sum(1 for x, y in zip(ra, rb) if x != y) + abs(len(ra) - len(rb))
            print(f"{name:20s} {diff} rows differ across core counts "
                  f"({len(ra)} vs {len(rb)} rows)")
            first = next(((x, y) for x, y in zip(ra, rb) if x != y), None)
            if first:
                print(f"   8-core: {first[0]}\n   3-core: {first[1]}")
            n_fail += 1
        else:
            print(f"{name:20s} OK ({len(ra)} rows bit-identical at 8 vs 3 cores)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(*sys.argv[1:2])
