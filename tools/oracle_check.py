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

class OracleTimeout(Exception):
    """The oracle exceeded its DuckDB budget (distinct from wrong-answer
    FAIL: the engine result is untested, not refuted)."""

def run_with_timeout(con, sql, seconds):
    """Run `sql`, interrupting the connection if it exceeds `seconds`.

    DuckDB has no statement timeout; a watchdog thread calls interrupt().
    Needed for scale-corpus sweeps (/tmp/sf1): a few ORACLES are
    super-linear in DuckDB (recursive label-propagation CTEs) even though
    the engine side is fine — without a bound one oracle stalls the gate.
    0 = no timeout (the driver's sf0.01 behavior, unchanged).

    The interrupt is guarded by a lock-protected completion flag: without
    it the watchdog can fire in the window between query completion and
    done.set(), poisoning the NEXT oracle on the shared connection with a
    spurious interrupt. If the guard still loses the race (completion →
    flag-store window), the pending interrupt is drained with a throwaway
    statement before the next oracle runs.
    """
    if not seconds:
        return con.execute(sql).fetch_arrow_table()
    import threading
    lock = threading.Lock()
    state = {"done": False, "interrupted": False}
    done = threading.Event()
    def watchdog():
        if not done.wait(seconds):
            with lock:
                if not state["done"]:
                    state["interrupted"] = True
                    con.interrupt()
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        res = con.execute(sql).fetch_arrow_table()
        with lock:
            state["done"] = True
        done.set()
        if state["interrupted"]:
            # completed inside the race window after interrupt() — drain
            # the pending interrupt so it can't poison the next oracle
            try:
                con.execute("SELECT 1")
            except Exception:
                pass
        return res
    except Exception as e:
        with lock:
            state["done"] = True
        done.set()
        if state["interrupted"]:
            raise OracleTimeout(f"oracle exceeded {seconds:g}s DuckDB budget") from e
        raise

# ---------------------------------------------------------------------
# INVARIANT ORACLES for the scale sweep (ORACLE_INVARIANTS=1; r14,
# VERDICT r13 task 4). Five gates are engine-green in seconds at sf1 but
# their full DuckDB oracles are time-bound: the transitive-closure
# recursive CTE (`reach`) is super-linear in DuckDB while the PAIR table
# itself stays feasible. At sweep scale these gates are instead checked
# against INVARIANTS computed from the ENGINE output + the pair table:
#
# - dedup_clusters / dedup_clusters_star: label idempotence under one
#   more propagation round (cluster_id equal across every near-dup pair
#   edge), cluster_id <= node, cluster_id = min(node) of its own label
#   group, and output nodes == pair-graph nodes exactly. The star gate
#   additionally must equal the propagation gate row-for-row (identical
#   semantics by construction).
# - dedup_keeplist / dedup_keeplist_quality / split_leakage_safe: their
#   outputs are PURE FUNCTIONS of the cluster assignment, so the sweep
#   recomputes the exact expected set from eng_dedup_clusters (itself
#   invariant-pinned above) and diffs both directions.
#
# Exactness of the closure itself stays pinned by the full recursive
# oracles at the driver's sf0.01 gate, which this mode never touches.
# Each SQL returns ONE row of violation counters; PASS iff all zero.

# MATERIALIZED on pairs/pnodes ONLY: DuckDB inlines plain CTEs, so each
# scalar-subquery reference to `pairs` would recompute the whole shingle
# cascade (first run blew the 600s sf1 budget exactly that way), and
# pairs/pnodes are narrow two-column tables that materialize for free.
# `sh` stays PLAIN on purpose: materializing 500k wide shingle-list rows
# regressed the cascade itself past the budget (second sf1 run), while
# the inlined pipelined form is the shape every r13-green pair oracle
# already runs at sf1.
_PAIRS_CTE = r"""
tok AS (SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS l
        FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
                   ELSE list_distinct([array_to_string(l[i:i+2], ' ')
                                       FOR i IN range(1, len(l) - 1)])
              END AS ss
       FROM tok),
ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
rare_s AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 20),
rare AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare_s USING (s)),
cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id),
v AS (SELECT doc1, doc2,
             len(list_intersect(s1.ss, s2.ss)) AS common,
             len(s1.ss) AS n1, len(s2.ss) AS n2
      FROM cand
      JOIN sh s1 ON cand.doc1 = s1.doc_id
      JOIN sh s2 ON cand.doc2 = s2.doc_id),
pairs AS MATERIALIZED (SELECT doc1, doc2 FROM v
          WHERE common * 1.0 / (n1 + n2 - common) >= 0.8),
pnodes AS MATERIALIZED (SELECT DISTINCT doc1 AS n FROM pairs
           UNION SELECT DISTINCT doc2 FROM pairs)
"""

def _cluster_invariant(eng):
    # The first five counters are one-sided: they refute UNDER-merge and
    # node-set errors, but an over-merged labeling (two components sharing
    # one label, or every node stamped with the global min) passes all
    # five. `sampled_group_disconnected` closes that side: BFS (recursive
    # CTE over the DuckDB-recomputed pair table, restricted to same-label
    # edges) from each sampled group's label node must reach every node of
    # the group — an over-merged group leaves its second component
    # unreached. 64 groups sampled deterministically by md5(label); full
    # separation for EVERY group stays the sf0.01 exact oracle's job.
    return f"""WITH RECURSIVE {_PAIRS_CTE},
samp AS MATERIALIZED (
  SELECT cluster_id FROM {eng} GROUP BY 1 HAVING count(*) >= 2
  ORDER BY md5(CAST(cluster_id AS VARCHAR)) LIMIT 64),
gnodes AS MATERIALIZED (
  SELECT e.cluster_id, e.node FROM {eng} e JOIN samp USING (cluster_id)),
gedges AS MATERIALIZED (
  SELECT g1.cluster_id, p.doc1 AS a, p.doc2 AS b
  FROM pairs p
  JOIN gnodes g1 ON p.doc1 = g1.node
  JOIN gnodes g2 ON p.doc2 = g2.node AND g2.cluster_id = g1.cluster_id
  UNION ALL
  SELECT g1.cluster_id, p.doc2, p.doc1
  FROM pairs p
  JOIN gnodes g1 ON p.doc2 = g1.node
  JOIN gnodes g2 ON p.doc1 = g2.node AND g2.cluster_id = g1.cluster_id),
reach AS (
  SELECT cluster_id, cluster_id AS node FROM samp
  UNION
  SELECT r.cluster_id, e.b
  FROM reach r JOIN gedges e
    ON e.cluster_id = r.cluster_id AND e.a = r.node)
SELECT
  (SELECT count(*) FROM pairs p
     JOIN {eng} e1 ON p.doc1 = e1.node
     JOIN {eng} e2 ON p.doc2 = e2.node
    WHERE e1.cluster_id != e2.cluster_id) AS edge_label_mismatch,
  (SELECT count(*) FROM pnodes
    WHERE n NOT IN (SELECT node FROM {eng})) AS pair_node_missing,
  (SELECT count(*) FROM {eng}
    WHERE node NOT IN (SELECT n FROM pnodes)) AS extra_node,
  (SELECT count(*) FROM {eng} WHERE cluster_id > node) AS label_above_node,
  (SELECT count(*) FROM (SELECT cluster_id, min(node) AS mn
                         FROM {eng} GROUP BY 1)
    WHERE mn != cluster_id) AS label_not_group_min,
  (SELECT count(*) FROM gnodes g
    WHERE NOT EXISTS (SELECT 1 FROM reach r
                      WHERE r.cluster_id = g.cluster_id
                        AND r.node = g.node)) AS sampled_group_disconnected"""

def _diff_counts(a_sql, b_sql):
    return (f"(SELECT count(*) FROM ({a_sql} EXCEPT {b_sql})) AS extra_row,"
            f" (SELECT count(*) FROM ({b_sql} EXCEPT {a_sql})) AS missing_row")

INVARIANT_ORACLES = {
    "dedup_clusters": _cluster_invariant("eng_dedup_clusters"),
    "dedup_clusters_star":
        _cluster_invariant("eng_dedup_clusters_star") + ",\n  " +
        _diff_counts("SELECT node, cluster_id FROM eng_dedup_clusters_star",
                     "SELECT node, cluster_id FROM eng_dedup_clusters"),
    "dedup_keeplist": """WITH expected AS (
  SELECT d.doc_id, d.lang FROM documents d
  WHERE d.doc_id NOT IN (SELECT node FROM eng_dedup_clusters
                         WHERE node != cluster_id))
SELECT """ + _diff_counts(
        "SELECT doc_id, lang FROM eng_dedup_keeplist",
        "SELECT doc_id, lang FROM expected"),
    "dedup_keeplist_quality": """WITH rankm AS (
  SELECT m.node, row_number() OVER (PARTITION BY m.cluster_id
           ORDER BY dd.n_chars DESC, m.node) AS rn
  FROM eng_dedup_clusters m JOIN documents dd ON dd.doc_id = m.node),
expected AS (
  SELECT d.doc_id, d.lang, d.n_chars FROM documents d
  WHERE d.doc_id NOT IN (SELECT node FROM rankm WHERE rn > 1))
SELECT """ + _diff_counts(
        "SELECT doc_id, lang, n_chars FROM eng_dedup_keeplist_quality",
        "SELECT doc_id, lang, n_chars FROM expected"),
    "split_leakage_safe": """WITH expected AS (
  SELECT d.doc_id,
         coalesce(cc.cluster_id, d.doc_id) AS group_key,
         CASE WHEN substr(md5(CAST(coalesce(cc.cluster_id, d.doc_id)
                                   AS VARCHAR)), 1, 6) < '333333'
              THEN 'holdout' ELSE 'train' END AS split
  FROM documents d
  LEFT JOIN (SELECT node AS doc_id, cluster_id
             FROM eng_dedup_clusters) cc USING (doc_id))
SELECT """ + _diff_counts(
        "SELECT doc_id, group_key, split FROM eng_split_leakage_safe",
        "SELECT doc_id, group_key, split FROM expected"),
}

# engine outputs each invariant reads (registered as eng_<name> views)
INVARIANT_DEPS = {
    "dedup_clusters": ["dedup_clusters"],
    "dedup_clusters_star": ["dedup_clusters_star", "dedup_clusters"],
    "dedup_keeplist": ["dedup_keeplist", "dedup_clusters"],
    "dedup_keeplist_quality": ["dedup_keeplist_quality", "dedup_clusters"],
    "split_leakage_safe": ["split_leakage_safe", "dedup_clusters"],
}

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional: 3rd arg = comma-separated query names to SKIP (reported as
    # SKIP, not FAIL); env ORACLE_TIMEOUT_S = per-oracle DuckDB budget
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    timeout_s = float(os.environ.get("ORACLE_TIMEOUT_S", "0"))
    # scale-sweep mode: swap the five closure-bound oracles for their
    # invariant checks (see INVARIANT_ORACLES above). Off by default —
    # the driver-replica sf0.01 gate always runs the full oracles.
    invariants_on = os.environ.get("ORACLE_INVARIANTS", "0") == "1"
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
    n_pass = n_fail = n_skip = n_timeout = 0
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
        if invariants_on and name in INVARIANT_ORACLES:
            try:
                for dep in INVARIANT_DEPS[name]:
                    dpath = os.path.join(out_dir, dep)
                    if not os.path.isdir(dpath):
                        raise RuntimeError(f"invariant needs engine output {dep}")
                    con.execute(f"CREATE OR REPLACE VIEW eng_{dep} AS "
                                f"SELECT * FROM read_parquet('{dpath}/*.parquet')")
                row = run_with_timeout(con, INVARIANT_ORACLES[name],
                                       timeout_s).to_pandas()
                bad = {c: int(row[c][0]) for c in row.columns
                       if int(row[c][0]) != 0}
            except OracleTimeout as e:
                print(f"TIMEOUT {name}: {e}")
                n_timeout += 1
                continue
            except Exception as e:
                print(f"FAIL {name}: {type(e).__name__}: {e}")
                n_fail += 1
                continue
            if bad:
                print(f"FAIL {name}: invariant violations {bad}")
                n_fail += 1
            else:
                print(f"PASS {name} (invariant basis: "
                      f"{', '.join(row.columns)} all 0)")
                n_pass += 1
            continue
        try:
            got = canon(pd.read_parquet(path))
            want_tbl = run_with_timeout(con, oracles[name], timeout_s)
            want = canon(want_tbl.to_pandas())
            dd_types = {f.name: str(f.type) for f in want_tbl.schema}
        except OracleTimeout as e:
            # the ORACLE ran out of budget — the engine result is
            # untested, not refuted; distinct from wrong-answer FAIL
            print(f"TIMEOUT {name}: {e}")
            n_timeout += 1
            continue
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
    tail = (f" / {n_skip} skip" if n_skip else "") + \
           (f" / {n_timeout} timeout" if n_timeout else "")
    print(f"== {n_pass} pass / {n_fail} fail{tail} ==")
    sys.exit(1 if (n_fail or n_timeout) else 0)

if __name__ == "__main__":
    main()
