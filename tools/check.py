#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Reads a graft.Verify output dir (per-query parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf tables, and compares
DRIVER-FAITHFULLY:

  * the Spark side is read with pandas/pyarrow (NOT through DuckDB,
    which would silently normalize dtypes the driver hash is
    sensitive to);
  * columns are sorted by name, then rows are sorted with pandas
    ``sort_values`` over ALL columns — the exact step that crashes the
    driver on array cells (unhashable ndarray), so a crash here is a
    red result, not a masked one;
  * dtypes must match exactly after pandas conversion (the driver
    hash is dtype-sensitive: DuckDB HUGEINT -> float64 vs Spark int64
    hash-differs even when every value is equal);
  * a lint pass flags HUGEINT-typed oracle columns and array-typed
    output columns BEFORE compare, naming the class of driver failure
    each causes.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

# --heavy / --light: split a long sweep into the generated-hash oracle
# set (>20k chars of SQL) and everything else, so each half runs in its
# own process with a bounded resident set.
HEAVY_CHARS = 20000

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# The deliberate rows-only contract (mirrors EntrySpec): a query dir
# with no oracle entry that is NOT in this set is a missing/typo'd
# oracle, not a pass.
ROWS_ONLY = {
    "q_approx_distinct", "q_approx_percentile", "q_sim_ann_ivf",
    "q_profile_table_approx",
    "q_dedup_semantic", "q_sim_ivf_append", "q_sim_ann_ivf_pq",
    "q_hll_partial_union", "q_unigram_encode",
    "q_diversity_sample", "q_diversity_sample2", "q_ivf_health",
    "q_ivf_refit", "q_hybrid_rrf_ann", "q_datasheet_partials",
    "q_stream_datasheet", "q_embed_outliers", "q_join_card_est",
    "q_sim_ann_ivf2", "q_quantile_partial_union", "q_hll_intersection",
    "q_embed_pca", "q_embed_pca_eval",
}


def is_arraylike(v):
    return hasattr(v, "__len__") and not isinstance(v, (str, bytes))


def lint(name, oracle_rel, got):
    """Pre-compare lint: the two known driver-killing column classes."""
    issues = []
    if oracle_rel is not None:
        for cname, t in zip(oracle_rel.columns, oracle_rel.types):
            ts = str(t).upper()
            if "HUGEINT" in ts:
                issues.append(
                    f"oracle col '{cname}' is {ts}: pandas renders it float64 "
                    "vs Spark int64 — driver hash poisoned; CAST(... AS BIGINT)")
    for c in got.columns:
        if got[c].dtype == object and got[c].map(is_arraylike).any():
            issues.append(
                f"output col '{c}' holds arrays: driver sort_values dies on "
                "unhashable ndarray — publish a joined string or explode")
    return issues


def driver_sort(df):
    """The driver's row canonicalization: sort_values over all columns.
    Raises on unhashable cells exactly like the driver does."""
    if len(df.columns) == 0 or len(df) == 0:
        return df.reset_index(drop=True)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir, out_dir, only=None):
    # fresh connection per N queries: the generated-hash oracles
    # (XXH64Sql lane chains at sf0.1) leave DuckDB's buffer pool at
    # its high-water mark, and one shared connection OOM'd the whole
    # sweep after ~4 heavy queries — reconnecting bounds the resident
    # set at one query's working set
    def fresh_con():
        import gc
        gc.collect()
        c = duckdb.connect()
        # bound the pool: the generated-hash oracles otherwise grow the
        # process to the machine limit across a 263-query sweep
        c.sql("SET memory_limit='24GB'")
        c.sql("SET threads=16")
        for t in TABLES:
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c
    con = fresh_con()
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    last_printed = [0]
    def flush_progress():
        items = sorted(results.items())
        for k, v in items[last_printed[0]:]:
            print(f"[progress] {k}: {v}", file=sys.stderr, flush=True)
        last_printed[0] = len(items)
    for name in sorted(os.listdir(out_dir)):
        flush_progress()
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir) or (only and name not in only):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        # Driver-faithful read: pandas/pyarrow straight off the Spark
        # parquet, so Spark's physical types survive into the compare.
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                        ignore_index=True)
        if name not in oracle:
            arr = [c for c in got.columns
                   if got[c].dtype == object and got[c].map(is_arraylike).any()]
            if arr:
                # rows-only queries still pass through the driver's
                # parquet->pandas read; arrays are fine there (no
                # sort/hash), but flag if ever oracled later.
                pass
            results[name] = (f"rows_only({len(got)})" if name in ROWS_ONLY
                             else "MISSING_ORACLE (not in rows-only allowlist)")
            continue
        class _RelCols:
            def __init__(self, cols, types):
                self.columns, self.types = cols, types
        try:
            rel = con.sql(oracle[name])
            exp = rel.df()
            rel = _RelCols(list(rel.columns), list(rel.types))
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            con.close()
            con = fresh_con()
            continue
        if len(oracle[name]) > 20000:  # generated-hash oracle: reset buffers
            con.close()
            con = fresh_con()
        issues = lint(name, rel, got)
        if issues:
            results[name] = "LINT " + "; ".join(issues)
            continue
        # pyarrow reads parquet date32 as object datetime.date cells;
        # the driver (and DuckDB) surface datetime64 — normalize so the
        # value compare sees the same thing the driver hashes.
        import datetime as _dt
        for df in (got, exp):
            for c in df.columns:
                if df[c].dtype == object and df[c].map(
                        lambda v: v is None or isinstance(v, _dt.date)).all() \
                        and df[c].notna().any():
                    df[c] = pd.to_datetime(df[c])
        g, e = got[sorted(got.columns)], exp[sorted(exp.columns)]
        if list(g.columns) != list(e.columns):
            results[name] = (f"SCHEMA_MISMATCH got={list(g.columns)} "
                             f"exp={list(e.columns)}")
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"
            continue
        # Driver hash is dtype-KIND-sensitive: int-width (int32 vs
        # int64) and datetime-unit (ns vs us) differences hash equal,
        # but float-vs-int does NOT (the HUGEINT failure class:
        # 27165.0 hashes differently from 27165). Flag only the kind
        # mismatches that poison the driver hash.
        def kind(dt):
            k = getattr(dt, "kind", "O")
            return {"i": "int", "u": "int", "f": "float", "b": "bool",
                    "M": "datetime", "m": "timedelta"}.get(k, "object")
        dt_bad = [f"{c}: got={g[c].dtype} exp={e[c].dtype}"
                  for c in g.columns
                  if {kind(g[c].dtype), kind(e[c].dtype)} == {"int", "float"}]
        if dt_bad:
            results[name] = "DTYPE_KIND_MISMATCH " + "; ".join(dt_bad)
            continue
        try:
            g, e = driver_sort(g), driver_sort(e)
        except Exception as ex:
            results[name] = f"DRIVER_SORT_CRASH: {type(ex).__name__}: {ex}"
            continue
        try:
            bad = []
            for c in g.columns:
                gc, ec = g[c], e[c]
                eq = (gc.astype(object).where(~pd.isna(gc), None) ==
                      ec.astype(object).where(~pd.isna(ec), None)) \
                    | (pd.isna(gc) & pd.isna(ec))
                if not eq.all():
                    i = int(eq.idxmin() if hasattr(eq, "idxmin") else 0)
                    n_bad = int((~eq).sum())
                    bad.append(f"{c}[{n_bad} diff, first@{i}: "
                               f"got={gc[i]!r} exp={ec[i]!r}]")
            results[name] = "OK" if not bad else "VALUE_MISMATCH " + "; ".join(bad)
        except Exception as ex:
            results[name] = f"COMPARE_ERROR: {ex}"
    n_ok = sum(1 for v in results.values()
               if v == "OK" or v.startswith("rows_only"))
    for k, v in sorted(results.items()):
        flag = "  " if v == "OK" or v.startswith("rows_only") else "XX"
        print(f"{flag} {k}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


def split_names(sf_dir, out_dir, heavy):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = [n for n in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, n))]
    return {n for n in names
            if (len(oracle.get(n, "")) > HEAVY_CHARS) == heavy}


if __name__ == "__main__":
    args = sys.argv[3:]
    if args and args[0] in ("--heavy", "--light"):
        only = split_names(sys.argv[1], sys.argv[2], args[0] == "--heavy")
    else:
        only = set(args) or None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
