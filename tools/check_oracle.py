#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [names]

`names` is comma-separated exact query names; a trailing `*` makes a
token a prefix (mirrors graft.NameFilter).

Two gates per query, BOTH must pass (the local gate must be a superset of
the driver's):

1. exact   — fetch both sides as Python values, sort columns by name and
             rows by all columns, compare values exactly (NaN==NaN).
2. pandas  — driver-faithful: fetch both sides as pandas DataFrames
             (`fetchdf()`), sort columns by name and rows by stringified
             values, then hash the per-value STRING RENDERINGS. This is
             dtype-sensitive on purpose: DuckDB widens window/scalar sums
             over BIGINT to HUGEINT, which pandas renders as float64
             ("47935.0") while Spark's parquet int64 renders "47935" —
             numerically equal, hash-divergent. The driver checks this
             class; so must we (round-7 q107 regression).

Each side (the Spark result parquet and the oracle SQL) is materialized
ONCE into a temp table; both gates read the materialization, so the
expensive oracles (recursive CTEs, self-joins) execute once, not twice.

Dev tool only — not part of the shipped library.
"""
import sys, os, json, math, hashlib
import duckdb
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((v is None, str(type(v)), str(v)) for v in t)
    return sorted(out, key=key), [cols[i] for i in order]

def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def exact_check(con):
    sp = con.execute("SELECT * FROM sp_res")
    sp_cols = [d[0] for d in sp.description]
    sp_rows = sp.fetchall()
    du = con.execute("SELECT * FROM du_res")
    du_cols = [d[0] for d in du.description]
    du_rows = du.fetchall()
    a, ac = canon(sp_rows, sp_cols)
    b, bc = canon(du_rows, du_cols)
    if ac != bc:
        return f"columns {ac} vs {bc}", len(a)
    if len(a) != len(b):
        return f"rows {len(a)} vs {len(b)}", len(a)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if not all(eq(x, y) for x, y in zip(ra, rb)):
            return f"row {i}\n  spark={ra}\n  duck ={rb}", len(a)
    return None, len(a)

def render_cell(v):
    # Mirror a str()-rendering harness: dtype differences show up here
    # (int64 47935 -> "47935", float64 -> "47935.0"). np.floating covers
    # float32 (NOT a Python-float subclass: its NaN would render "nan",
    # not "<NULL>") and keeps numpy-2 scalar reprs ("np.float64(...)")
    # out of the hash.
    if v is None:
        return "<NULL>"
    if isinstance(v, (float, np.floating)):
        return "<NULL>" if math.isnan(v) else repr(float(v))
    return str(v)

def pandas_canon_hash(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rendered = [tuple(render_cell(v) for v in row)
                for row in df.itertuples(index=False, name=None)]
    rendered.sort()
    h = hashlib.sha256()
    h.update(("|".join(df.columns) + "\n").encode())
    for row in rendered:
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest(), rendered

def pandas_check(con):
    sp_df = con.execute("SELECT * FROM sp_res").fetchdf()
    du_df = con.execute("SELECT * FROM du_res").fetchdf()
    ha, ra = pandas_canon_hash(sp_df)
    hb, rb = pandas_canon_hash(du_df)
    if ha == hb:
        return None
    # locate first diverging rendered row for the report
    for i, (x, y) in enumerate(zip(ra, rb)):
        if x != y:
            sp_k = {c: str(sp_df[c].dtype) for c in sorted(sp_df.columns)}
            du_k = {c: str(du_df[c].dtype) for c in sorted(du_df.columns)}
            return (f"pandas-hash row {i}\n  spark={x} dtypes={sp_k}"
                    f"\n  duck ={y} dtypes={du_k}")
    return (f"pandas-hash mismatch (rows {len(ra)} vs {len(rb)}; "
            f"spark dtypes={ {c: str(sp_df[c].dtype) for c in sp_df.columns} }, "
            f"duck dtypes={ {c: str(du_df[c].dtype) for c in du_df.columns} })")

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    tokens = None
    if len(sys.argv) > 3:
        tokens = [t.strip() for t in sys.argv[3].split(",") if t.strip()] or None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    def selected(name):
        if tokens is None:
            return True
        return any(name.startswith(t[:-1]) if t.endswith("*") else name == t
                   for t in tokens)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if not selected(name):
            continue
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        try:
            con.execute("CREATE OR REPLACE TEMP TABLE sp_res AS "
                        f"SELECT * FROM '{res_dir}/*.parquet'")
            con.execute(f"CREATE OR REPLACE TEMP TABLE du_res AS {oracle[name]}")
            err, n_rows = exact_check(con)
            if err is None:
                err = pandas_check(con)
        except Exception as e:
            err, n_rows = str(e), 0
        if err:
            print(f"FAIL {name}: {err}"); n_fail += 1
        else:
            print(f"PASS {name} ({n_rows} rows, exact+pandas-hash)"); n_pass += 1
    # rows-only queries (no oracle): just report row counts
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle and selected(d):
            try:
                n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                print(f"ROWS {d}: {n}")
            except Exception as e:
                print(f"ROWS {d}: error {e}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

main()
