#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Reads a graft.Verify output dir (per-query parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf tables, and compares
values with columns sorted by name (mirroring the driver's hash compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# The deliberate rows-only contract (mirrors EntrySpec): a query dir
# with no oracle entry that is NOT in this set is a missing/typo'd
# oracle, not a pass.
ROWS_ONLY = {
    "q_hash_xxh64", "q_hash_crc32", "q_approx_distinct",
    "q_approx_percentile", "q_dedup_minhash", "q_dedup_simhash",
    "q_sim_ann_lsh", "q_sim_ann_ivf", "q_text_rollhash",
    "q_stream_watermark", "q_stream_stateful", "q_stream_stream_left", "q_stream_stream_full",
    "q_sim_knn_graph", "q_heavy_hitters", "q_stream_gap_timers",
    "q_profile_table_approx", "q_dedup_semantic", "q_sim_ivf_append",
    "q_compact_files", "q_sim_ann_ivf_pq",
    "q_hll_partial_union", "q_decontaminate_fuzzy", "q_bpe_merges",
    "q_bpe_encode", "q_graph_pagerank", "q_media_phash_dedup",
    "q_weighted_sample", "q_join_card_est",
}


def norm(df):
    df = df[sorted(df.columns)]
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracle:
            results[name] = (f"rows_only({len(got)})" if name in ROWS_ONLY
                             else "MISSING_ORACLE (not in rows-only allowlist)")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(g.columns)} exp={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"
            continue
        try:
            import pandas as pd
            bad = []
            def cell(v):
                # list/array cells: tuple-ize so == is scalar, not elementwise
                return tuple(v) if hasattr(v, "__len__") and not isinstance(v, str) else v
            for c in g.columns:
                gc, ec = g[c].map(cell), e[c].map(cell)
                isna = lambda s: s.map(lambda v: not isinstance(v, tuple)) & pd.isna(
                    s.map(lambda v: None if isinstance(v, tuple) else v))
                # timestamps: compare as values; numerics exact
                eq = (gc.astype(object).where(~isna(gc), None) ==
                      ec.astype(object).where(~isna(ec), None)) | (isna(gc) & isna(ec))
                if not eq.all():
                    i = int(eq.idxmin() if hasattr(eq, "idxmin") else 0)
                    n_bad = int((~eq).sum())
                    bad.append(f"{c}[{n_bad} diff, first@{i}: got={gc[i]!r} exp={ec[i]!r}]")
            results[name] = "OK" if not bad else "VALUE_MISMATCH " + "; ".join(bad)
        except Exception as ex:
            results[name] = f"COMPARE_ERROR: {ex}"
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows_only"))
    for k, v in sorted(results.items()):
        flag = "  " if v == "OK" or v.startswith("rows_only") else "XX"
        print(f"{flag} {k}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
