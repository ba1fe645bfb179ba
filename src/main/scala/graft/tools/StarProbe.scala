package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic (r15): per-round cost decomposition of
  * `Clusters.connectedComponentsStar`'s distributed loop (mirrors the
  * pre-fallback loop body verbatim). Measured at sf0.1: edge materialize
  * 2.7 s (cold), then 0.6-1.1 s PER ROUND of scheduling/planning over a
  * 256-edge set — the evidence behind the counted driver fallback
  * (Clusters scaladoc). Usage: runMain graft.tools.StarProbe [sfDir]
  */
object StarProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.OracleSidecar.enabled = false
    val pairs = graft.operators.Dedup.ngramJaccardPairsCapped(
      graft.Tables.documents(spark, sfDir), n = 3, threshold = 0.8,
      maxShingleDf = 20)
    var t0 = System.nanoTime()
    val raw = pairs.select(col("doc1").cast("long").as("u"),
      col("doc2").cast("long").as("v"))
    val fwd = raw.filter(col("u") =!= col("v"))
    var edges = fwd
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint(eager = false)
    val n = edges.count()
    println(f"[star] edges=$n materialize ${(System.nanoTime()-t0)/1e9}%.3f s")
    def checksum(e: org.apache.spark.sql.DataFrame) =
      e.agg(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head().getDecimal(0)
    t0 = System.nanoTime()
    var prev = checksum(edges)
    println(f"[star] checksum0 ${(System.nanoTime()-t0)/1e9}%.3f s")
    var iter = 0; var converged = false
    while (iter < 25 && !converged) {
      t0 = System.nanoTime()
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val afterLarge = sym.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct().localCheckpoint(eager = false)
      val symS = afterLarge.union(afterLarge.select(col("v").as("u"), col("u").as("v")))
      val lower = symS.filter(col("v") < col("u"))
      val minsS = lower.groupBy("u").agg(min(col("v")).as("m"))
      val afterSmall = lower.join(minsS, "u")
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct().localCheckpoint(eager = false)
      edges = afterSmall
      val cur = checksum(edges)
      converged = cur == prev || (cur == null && prev == null)
      prev = cur
      iter += 1
      println(f"[star] round$iter ${(System.nanoTime()-t0)/1e9}%.3f s converged=$converged")
    }
    spark.stop()
  }
}
