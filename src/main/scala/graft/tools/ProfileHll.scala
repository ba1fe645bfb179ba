package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the HLL register-build cost: hash projection alone, the
  * one-pass hll_regs aggregate, the old declarative (group, bucket) max,
  * and the kmv_kmin aggregate on the identical hashed input.
  */
object ProfileHll {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.ensure(spark)
    val li = Tables.lineitem(spark, d)
    def time(tag: String)(f: => Long): Unit = {
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[hll] $tag rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }
    }
    val hashed = li.select(col("l_returnflag"),
      graft.functions.TextFunctions.rollingHash(
        md5(col("l_partkey").cast("string"))).as("__h"))
    time("hash-only")(hashed.agg(sum(col("__h"))).head().getLong(0))
    time("hll_regs-agg")(hashed.groupBy(col("l_returnflag"))
      .agg(call_function("hll_regs", col("__h")).as("r")).count())
    time("kmv-agg")(hashed.groupBy(col("l_returnflag"))
      .agg(call_function("kmv_kmin",
        col("__h").cast("double") / lit(1000000007.0), lit(64)).as("r"))
      .count())
    time("declarative")(hashed
      .select(col("l_returnflag"), (col("__h") % 256).as("__bucket"),
        expr("__h DIV 256").as("__rest"))
      .withColumn("__rho", when(col("__rest") === 0L, lit(23))
        .otherwise(lit(23) - length(bin(col("__rest")))))
      .groupBy(col("l_returnflag"), col("__bucket"))
      .agg(max(col("__rho")).as("__m")).count())
    spark.stop()
  }
}
