package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated corpus (`TESTDATA.md`): one parquet file
  * per table under `sfDir`. Reads are lazy `LogicalRelation`s so Catalyst
  * pushes filters and column pruning into the parquet scan — at 100 TB the
  * scan cost is dominated by what reaches the reader, so every query below
  * must show `PushedFilters`/pruned `ReadSchema` in `.explain`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.ts has shipped as two parquet physical shapes across testdata
    * generations: INT64 TIMESTAMP(NANOS) (Spark 4 refuses it as a
    * timestamp — read as long via the legacy conf and floor ns → µs) and
    * INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark reads it as
    * TIMESTAMP_NTZ). Both normalize here to session-zone TIMESTAMP: the
    * session timezone is pinned UTC everywhere (Verify/Bench/specs), so the
    * NTZ→LTZ cast reinterprets the stored wall-clock as UTC — exactly how
    * DuckDB's `epoch_ms` treats the same naive value, keeping oracle
    * comparisons agreeing at ms precision. Downstream code always sees
    * plain TimestampType and never branches on the file's vintage.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Memoized table row count — one count job per (dir, table) per JVM.
    * The streaming replays size their shuffle/state partition counts from
    * corpus volume (`StreamScale.parts`); 22 gates × warm-up passes × two
    * timed reps must not each re-pay a count job over the same immutable
    * table. A bare-projection parquet count is metadata-cheap (no column
    * materializes), and the testdata tables never change within a JVM.
    */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  def rowCount(s: SparkSession, d: String, name: String): Long =
    countCache.computeIfAbsent(s"$d/$name", _ => apply(s, d, name).count())
}

/** A named engine query plus (optionally) the ANSI-SQL oracle the driver
  * replays in DuckDB over the same parquet tables. Column names and value
  * rounding MUST agree between the two — the driver hash-compares after
  * sorting columns by name.
  */
final case class NamedQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
