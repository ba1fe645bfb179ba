package graft

/** Placement and gating of the materialized oracle sidecar tables (seeded
  * simhash/LSH signatures, IVF seeds, PQ codebooks — see
  * `ExtQueries.materializeForOracle`).
  *
  * Two failure modes of a fixed global path motivated this: (a) two
  * concurrent harnesses on one box (a bench and a verify, or two checkouts)
  * could clobber each other's tables between the write and the DuckDB read,
  * and (b) the timed bench reps were paying the `coalesce(1)` parquet write
  * of a gate artifact that is not part of the algorithm under test. So:
  *
  *  - `Verify` keys `root` under its own output directory (the driver hands
  *    that directory to DuckDB, so the sidecar rides along with the results
  *    it gates) and pins `sf` to the scale factor it is actually verifying —
  *    which is also what lets the full inventory run the oracle gate at
  *    sf0.001/sf0.1 sweeps, not just the driver's sf0.01;
  *  - `Bench` sets `enabled = false`: no oracle is read in a bench run, so
  *    nothing is written and the timed reps measure the query alone.
  *
  * The oracle SQL strings in `ExtQueries` interpolate `sqlPath` when that
  * object initializes (the first `SparkEntry` access) — but `sqlPath`
  * yields a PLACEHOLDER, not a real path, so init order no longer
  * matters: whoever serializes the SQL for DuckDB (`Verify`) calls
  * `resolveSql` at WRITE time, after its `main` has pinned `root`/`sf`.
  * A caller that touches `SparkEntry` before configuring these fields
  * bakes nothing in; the sidecar WRITES (`dir`) also resolve `root` at
  * call time, inside query execution. Defaults preserve the historical
  * behavior for any other caller (tools, specs): enabled, under /tmp,
  * sf0.01.
  */
object OracleSidecar {
  @volatile var enabled: Boolean = true
  @volatile var root: String = "/tmp/graft_oracle"
  @volatile var sf: String = "sf0.01"

  /** Placeholder standing in for `$root/$sf` inside oracle SQL until
    * serialization — never hits a filesystem unresolved.
    */
  val Placeholder = "__GRAFT_ORACLE_MAT__"

  /** Write location for the sidecar of `name` computed from `sfDir`. */
  def dir(sfDir: String, name: String): String =
    s"$root/${new java.io.File(sfDir).getName}/$name"

  /** The glob the oracle SQL reads — placeholder-rooted; resolve with
    * `resolveSql` when the SQL is handed to DuckDB.
    */
  def sqlPath(name: String): String = s"$Placeholder/$name/*.parquet"

  /** Substitute the placeholder with the CURRENT root/sf — called at
    * oracle_sql.json serialization, after the entry point configured both.
    */
  def resolveSql(sql: String): String = sql.replace(Placeholder, s"$root/$sf")
}
