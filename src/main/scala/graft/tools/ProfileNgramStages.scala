package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of `dedup_ngram_capped` — where does the sf10
  * wall-clock go? Times, under the honest BenchAction consumer:
  *   shingles   — tokenize + shingle-hash the corpus (checkpoint build)
  *   rare       — df-capped inverted index on top of warm shingles
  *   candidates — prune self-join + pair dedup, arrays untouched
  *   verify     — the full pipeline (adds the two array joins + kernel)
  * plus the candidate count, so per-pair verify cost is attributable.
  * Usage: `runMain graft.tools.ProfileNgramStages [sfDir]`.
  */
object ProfileNgramStages {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    graft.streaming.Scratch.install()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.hadoop.fs.file.impl",
        "graft.streaming.NioLocalFileSystem")
      .config("spark.ui.enabled", "false")
      // data-scaled AQE exchange width (BatchScale.aqeWidthConfs scaladoc)
      .config(graft.plans.BatchScale.aqeWidthConfs(sfDir, shuffle.toInt).toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.OracleSidecar.enabled = false
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def dropCaches(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val docs = Tables.documents(spark, sfDir)
    // cold warm-up of everything once
    graft.BenchAction.consume(
      Dedup.ngramJaccardPairsCapped(docs, 3, 0.8, 20))
    dropCaches()
    // mirror of the operator's internal stages (same params as the query)
    val shMaker = () => {
      val m = classOf[Dedup.type].getDeclaredMethod("shingleSets",
        classOf[org.apache.spark.sql.DataFrame], classOf[Int],
        classOf[String], classOf[String])
      m.setAccessible(true)
      m.invoke(Dedup, docs, Int.box(3), "doc_id", "text")
        .asInstanceOf[org.apache.spark.sql.DataFrame]
    }
    val sh = time("shingles") {
      val s = shMaker(); graft.BenchAction.consume(s); s
    }
    val ex = sh.select(col("doc_id"), size(col("ss")).as("ns"),
      explode(col("ss")).as("s"))
    val rare = time("rare") {
      val r = ex.join(
        ex.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 20).select("s"),
        "s").localCheckpoint(false)
      graft.BenchAction.consume(r); r
    }
    // nr rides on rare in the operator; mirror it here for the bound
    val rareN = rare.withColumn("nr", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    val candRows = rareN.as("a")
      .join(rareN.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.ns"), col("b.ns")).cast("double") >=
            lit(0.8) * greatest(col("a.ns"), col("b.ns")))
    val candAgg = candRows
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        col("a.ns").as("n1"), col("b.ns").as("n2"),
        col("a.nr").as("nr1"), col("b.nr").as("nr2"))
      .agg(count(lit(1)).as("c_rare"))
    val nCand = candAgg.count()
    println(s"[profile] n_candidates $nCand")
    val survivors = candAgg
      .withColumn("bound",
        col("c_rare") + least(col("n1") - col("nr1"), col("n2") - col("nr2")))
      .filter(col("bound").cast("double") /
        (col("n1") + col("n2") - col("bound")) >= 0.8)
      .select("doc1", "doc2")
    time("cand+prune")(graft.BenchAction.consume(survivors))
    val nSurv = survivors.count()
    println(s"[profile] n_survivors $nSurv (bound pruned ${nCand - nSurv})")
    val verify = survivors
      .join(sh.select(col("doc_id").as("doc1"), col("ss").as("ss1")), "doc1")
      .join(sh.select(col("doc_id").as("doc2"), col("ss").as("ss2")), "doc2")
      .withColumn("common",
        graft.plans.GraftColumns.sortedIntersectSize(col("ss1"), col("ss2")))
      .withColumn("jaccard",
        col("common").cast("double") /
          (size(col("ss1")) + size(col("ss2")) - col("common")))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc1"), col("doc2"), round(col("jaccard"), 4).as("jaccard"))
    time("verify")(graft.BenchAction.consume(verify))
    dropCaches()
    time("full")(graft.BenchAction.consume(
      Dedup.ngramJaccardPairsCapped(docs, 3, 0.8, 20)))
    spark.stop()
  }
}
