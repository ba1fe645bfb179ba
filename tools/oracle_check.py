#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sfDir tables, sorts
columns by name + rows by all values, and compares cell-by-cell (exact for
strings/ints, tiny-epsilon report for floats so we can see near-misses).
"""
import json, math, os, sys
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return a == b or math.isclose(float(a), float(b), rel_tol=0, abs_tol=0)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)

def run_with_timeout(con, sql, seconds):
    """Run `sql`, interrupting the connection if it exceeds `seconds`.

    DuckDB has no statement timeout; a watchdog thread calls interrupt().
    Needed for scale-corpus sweeps (/tmp/sf1): a few ORACLES are
    super-linear in DuckDB (recursive label-propagation CTEs) even though
    the engine side is fine — without a bound one oracle stalls the gate.
    0 = no timeout (the driver's sf0.01 behavior, unchanged).
    """
    if not seconds:
        return con.execute(sql).fetch_arrow_table()
    import threading
    done = threading.Event()
    def watchdog():
        if not done.wait(seconds):
            con.interrupt()
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        return con.execute(sql).fetch_arrow_table()
    finally:
        done.set()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional: 3rd arg = comma-separated query names to SKIP (reported as
    # SKIP, not FAIL); env ORACLE_TIMEOUT_S = per-oracle DuckDB budget
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    timeout_s = float(os.environ.get("ORACLE_TIMEOUT_S", "0"))
    con = duckdb.connect()
    # an in-memory DuckDB connection has NO temp directory, so blocking
    # operators cannot spill and a big intermediate (the sf1 triangle
    # oracle's wedge table) dies on OOM instead of going out-of-core;
    # pointing temp_directory at disk restores the spill path
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # shipped testdata is one file per table; MakeSfN-synthesized scale
        # corpora (/tmp/sf1, /tmp/sf10) are Spark output DIRECTORIES named
        # <t>.parquet — glob their part files so the same gate runs at any SF
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        if name in skip:
            print(f"SKIP {name} (caller exclusion)")
            n_skip += 1
            continue
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            print(f"FAIL {name}: no spark output at {path}")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(path))
            want_tbl = run_with_timeout(con, oracles[name], timeout_s)
            want = canon(want_tbl.to_pandas())
            dd_types = {f.name: str(f.type) for f in want_tbl.schema}
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} duckdb={list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duckdb={len(want)}")
            n_fail += 1
            continue
        tbad = []
        for c in got.columns:
            gk, wk = got[c].dtype.kind, want[c].dtype.kind
            gkind = 'i' if gk in 'iu' else gk
            wkind = 'i' if wk in 'iu' else wk
            if gkind != wkind or dd_types.get(c, '').startswith(('int128', 'decimal')):
                tbad.append((c, str(got[c].dtype), dd_types.get(c, str(want[c].dtype))))
        if tbad:
            print(f"FAIL {name}: dtype mismatch (driver hash is type-sensitive): {tbad}")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            ga, wa = got[c].tolist(), want[c].tolist()
            for i, (a, b) in enumerate(zip(ga, wa)):
                if not cells_equal(a, b):
                    bad.append((c, i, a, b))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: {len(got)} rows, first diffs: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    tail = f" / {n_skip} skip" if n_skip else ""
    print(f"== {n_pass} pass / {n_fail} fail{tail} ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
