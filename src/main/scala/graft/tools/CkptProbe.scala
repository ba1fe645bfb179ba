package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(1000).select((col("id") % 100).as("src"), col("id").as("dst"))
    def probe(tag: String, adj: org.apache.spark.sql.DataFrame): Unit = {
      val ranks = adj.select(col("src").as("node"), lit(1L).as("r"))
      val step = adj.join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"), Seq("src"))
        .select(explode(col("nbrs")).as("node"), col("r").as("c"))
        .groupBy("node").agg(sum("c").as("cs"))
      step.collect()
      val plan = step.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      val n = "Exchange hashpartitioning".r.findAllIn(plan).size
      println(s"== $tag: $n hash exchanges")
    }
    val adjBase = df.groupBy("src").agg(count(lit(1)).as("outdeg"), collect_list("dst").as("nbrs"))
    probe("lazy", adjBase.localCheckpoint(false))
    probe("eager", adjBase.localCheckpoint(true))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val adjNoAqe = df.groupBy("src").agg(count(lit(1)).as("outdeg"), collect_list("dst").as("nbrs")).localCheckpoint(true)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    probe("eager-noaqe-build", adjNoAqe)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    probe("noaqe-both", adjNoAqe)
    spark.stop()
  }
}
