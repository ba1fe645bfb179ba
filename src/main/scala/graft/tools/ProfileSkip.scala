package graft.tools

import graft.operators.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bisect the zorderBy cost: zvalue expression vs bounds crossJoin vs
  * repartitionByRange vs local sort.
  */
object ProfileSkip {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = graft.Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_quantity"), col("l_extendedprice"))
    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      t("plain count") { li.count() }
      t("zvalue16 only") {
        li.withColumn("__z",
          Layout.zvalue(pmod(col("l_orderkey"), lit(65536L)),
            pmod(col("l_partkey"), lit(65536L)), 16)).count()
      }
      t("zvalue8 only") {
        li.withColumn("__z",
          Layout.zvalue(pmod(col("l_orderkey"), lit(256L)),
            pmod(col("l_partkey"), lit(256L)), 8)).count()
      }
      val bounds = li.agg(
        min(col("l_orderkey").cast("double")).as("__xlo"),
        max(col("l_orderkey").cast("double")).as("__xhi"),
        min(col("l_partkey").cast("double")).as("__ylo"),
        max(col("l_partkey").cast("double")).as("__yhi"))
      t("crossJoin bounds + zvalue16") {
        val top = (1L << 16) - 1
        def scale(c: org.apache.spark.sql.Column,
            lo: org.apache.spark.sql.Column,
            hi: org.apache.spark.sql.Column) =
          when(hi === lo, lit(0L)).otherwise(
            floor((c.cast("double") - lo) / (hi - lo) * top).cast("long"))
        li.crossJoin(broadcast(bounds))
          .withColumn("__z", Layout.zvalue(
            scale(col("l_orderkey"), col("__xlo"), col("__xhi")),
            scale(col("l_partkey"), col("__ylo"), col("__yhi")), 16))
          .count()
      }
      t("full zorderBy16 count") {
        Layout.zorderBy(li, col("l_orderkey"), col("l_partkey"), 16, 16).count()
      }
      t("full zorderBy8 count") {
        Layout.zorderBy(li, col("l_orderkey"), col("l_partkey"), 16, 8).count()
      }
      t("repartitionByRange on raw col") {
        li.repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions(col("l_orderkey")).count()
      }
    }
    spark.stop()
  }
}
