package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Bucketed tables co-locate join keys at WRITE time, so the join itself
  * needs no exchange — at 100 TB this converts every recurring
  * orders⋈lineitem-style join from a full shuffle of both sides into a
  * local zip of pre-sorted buckets. Asserts the physical plan has NO
  * Exchange on either side.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed equi join plans without exchanges") {
    val wh = tmpDir("warehouse")
    val sf = "/root/testdata/sf0.001"
    spark.read.parquet(s"$sf/orders.parquet")
      .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    // at this tiny SF Spark would broadcast (also exchange-free, but that
    // hides the bucketing); force the shuffle-join path the 100 TB case hits
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = try {
      val j = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      j.collect()
      j
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    // the join itself must not shuffle either side (only the final agg may)
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"), plan)
    assert(!joinSection.contains("Exchange"), plan)
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"), plan)
  }
}
