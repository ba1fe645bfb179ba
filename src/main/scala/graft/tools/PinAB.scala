package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the static-side pin currencies (VERDICT r11 task 3 "within noise"
  * gate): time PageRank and connectedComponents over the purchase graph
  * with the localCheckpoint pin vs the bucketed persisted-table pin,
  * same edges, same session, min of `reps`.
  *
  * Usage: `runMain graft.tools.PinAB <sfDir> [reps] [pagerank|cc|all]`
  * (at sf10 run the two ops in separate JVMs — four consecutive
  * sf10-sized iterative runs in one 8 GiB heap is the documented
  * pinned-block pressure shape)
  */
object PinAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val mode = if (args.length > 2) args(2) else "all"
    graft.streaming.Scratch.install()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.hadoop.fs.file.impl",
        "graft.streaming.NioLocalFileSystem")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def edges = {
      val e0 = graft.Tables.lineitem(spark, sfDir)
        .select((col("l_suppkey") * 2).as("src"),
                (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    }
    val nNodes = edges.select(col("src")).distinct().count()
    def timeIt(label: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      try {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          graft.BenchAction.consume(f)
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[pin-ab] $label min=${ts.min}%.3f s all=${ts.map(t => f"$t%.2f").mkString(",")}")
      } catch {
        // an arm that cannot run at this SF is itself a result (the
        // ckpt pin's OOM on the 240M-edge graph is what the bucketed
        // currency exists to fix) — report it and keep A/B-ing
        case e: Throwable =>
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
          println(s"[pin-ab] $label FAILED: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(120))
      }
    if (mode == "all" || mode == "pagerank") {
      timeIt("pagerank ckpt-pin")(
        graft.operators.Graph.pageRankFixedPoint(edges, nNodes))
      timeIt("pagerank bucketed-pin")(
        graft.operators.Graph.pageRankFixedPoint(edges, nNodes,
          bucketedAtEdges = 1L))
    }
    if (mode == "all" || mode == "cc") {
      timeIt("cc ckpt-pin")(
        graft.operators.Clusters.connectedComponents(
          edges.select(col("src").as("doc1"), col("dst").as("doc2")),
          "doc1", "doc2", maxIter = 15, driverFallbackEdges = 0L))
      timeIt("cc bucketed-pin")(
        graft.operators.Clusters.connectedComponents(
          edges.select(col("src").as("doc1"), col("dst").as("doc2")),
          "doc1", "doc2", maxIter = 15, driverFallbackEdges = 0L,
          bucketedAtEdges = 1L, edgeCountHint = Some(Long.MaxValue)))
    }
    spark.stop()
  }
}
