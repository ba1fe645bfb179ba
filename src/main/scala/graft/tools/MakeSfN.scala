package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger driver-shaped corpus by unioning `factor` re-keyed
  * copies of an existing scale factor — the round-4 scaling-slope
  * instrument (the driver corpus stops at sf0.1, where the per-query
  * scheduling floor hides most real costs).
  *
  * Scaling discipline — each table family keeps its SEMANTIC DENSITY so a
  * measured slope reflects the engine, not a synthesis artifact:
  *  - Fact keys shift by copy·10¹⁰ (divisible by 10, so `o_orderkey % 10`
  *    cohort filters keep their exact proportions); all FK pairs
  *    (orders↔customer, lineitem↔orders/part/supplier) shift together, so
  *    join fan-outs stay 10× not 100×. Dims (region, nation) stay fixed,
  *    like TPC-H.
  *  - `documents.text`: copies 1..n-1 get an injective per-copy token map
  *    (every token suffixed `_c`). Within a copy, shingle sets transform
  *    bijectively → every Jaccard/minhash/simhash relationship is EXACTLY
  *    preserved; across copies, shingle overlap drops to ~0 → near-dup
  *    pair counts grow linearly (matching the observed 25→256 per-decade
  *    growth of the driver corpus), not quadratically as raw duplication
  *    would force.
  *  - `embeddings.embedding`: copies get a signed dimension permutation
  *    (rotate by 7·copy, flip sign where hash(dim, copy) is odd) — an
  *    ORTHOGONAL transform, so all within-copy cosines (pair structure,
  *    top-k sets) are exactly preserved while cross-copy cosines collapse
  *    to ≈0, far under every dedup/ANN threshold in the inventory.
  *  - `events`: ids/users shift by copy·10⁹; timestamps keep their range
  *    (10× event density, 10× users, same horizon — the realistic growth
  *    mode for a busier system; sessions per user-copy are identical).
  *
  * Copy 0 is the identity, so literal-key queries (isin(0,1,2) ANN
  * probes, q23's key list) keep their referents.
  *
  * Usage: MakeSfN <srcSfDir> <outDir> [factor=10]
  */
object MakeSfN {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val KEY = 10000000000L // fact-key shift per copy (≡ 0 mod 10)
    val EVT = 1000000000L  // event/user/doc/vec shift per copy

    def copies(df: DataFrame)(mk: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(c => mk(df, c)).reduce(_ unionByName _)

    def shift(c: org.apache.spark.sql.Column, off: Long,
        copy: Int): org.apache.spark.sql.Column = c + lit(off * copy)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[makesf] $name done")
    }

    // fixed dims: straight copies
    write(spark.read.parquet(s"$src/region.parquet"), "region")
    write(spark.read.parquet(s"$src/nation.parquet"), "nation")

    write(copies(spark.read.parquet(s"$src/customer.parquet")) { (df, c) =>
      df.withColumn("c_custkey", shift(col("c_custkey"), KEY, c))
    }, "customer")

    write(copies(spark.read.parquet(s"$src/supplier.parquet")) { (df, c) =>
      df.withColumn("s_suppkey", shift(col("s_suppkey"), KEY, c))
    }, "supplier")

    write(copies(spark.read.parquet(s"$src/part.parquet")) { (df, c) =>
      df.withColumn("p_partkey", shift(col("p_partkey"), KEY, c))
    }, "part")

    write(copies(spark.read.parquet(s"$src/orders.parquet")) { (df, c) =>
      df.withColumn("o_orderkey", shift(col("o_orderkey"), KEY, c))
        .withColumn("o_custkey", shift(col("o_custkey"), KEY, c))
    }, "orders")

    write(copies(spark.read.parquet(s"$src/lineitem.parquet")) { (df, c) =>
      df.withColumn("l_orderkey", shift(col("l_orderkey"), KEY, c))
        .withColumn("l_partkey", shift(col("l_partkey"), KEY, c))
        .withColumn("l_suppkey", shift(col("l_suppkey"), KEY, c))
    }, "lineitem")

    // events: read through Tables (nanos-as-long shim) → µs timestamps out
    write(copies(graft.Tables.events(spark, src)) { (df, c) =>
      df.withColumn("event_id", shift(col("event_id"), EVT, c))
        .withColumn("user_id", shift(col("user_id"), EVT, c))
    }, "events")

    write(copies(spark.read.parquet(s"$src/documents.parquet")) { (df, c) =>
      val txt =
        if (c == 0) col("text")
        else array_join(
          transform(split(col("text"), " "), t => concat(t, lit(s"_$c"))),
          " ")
      df.withColumn("doc_id", shift(col("doc_id"), EVT, c))
        .withColumn("text", txt)
        .withColumn("n_chars", length(txt).cast("long"))
    }, "documents")

    write(copies(spark.read.parquet(s"$src/embeddings.parquet")) { (df, c) =>
      val emb =
        if (c == 0) col("embedding")
        else {
          val dims = 64
          transform(sequence(lit(0), lit(dims - 1)), j => {
            val srcIdx = pmod(j + lit(7 * c), lit(dims)) + 1
            val sign = when(pmod(hash(j, lit(c)), lit(2)) === 0, 1.0f).otherwise(-1.0f)
            (sign * element_at(col("embedding"), srcIdx)).cast("float")
          })
        }
      df.withColumn("vec_id", shift(col("vec_id"), EVT, c))
        .withColumn("embedding", emb)
    }, "embeddings")

    spark.stop()
  }
}
