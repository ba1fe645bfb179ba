package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's flagship smoke: a plain SparkSession (none of
  * our Verify/Bench configs) calling SparkEntry.entry, expecting rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      // data-scaled AQE exchange width (BatchScale.aqeWidthConfs scaladoc);
      // entry runs on sf0.001, far below the engagement threshold — this
      // emits nothing and keeps the driver's plain-session smoke plain
      .config(graft.plans.BatchScale
        .aqeWidthConfs("/root/testdata/sf0.001", 4).toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.printSchema()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
