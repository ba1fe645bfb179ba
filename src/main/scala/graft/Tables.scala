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
  /** events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * read as a timestamp. Read it as a long (legacy conf) and floor-convert
    * ns → µs, which matches both the pre-4.x native behavior and DuckDB's
    * `epoch_ms` flooring, so oracle comparisons agree at ms precision.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
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
