package graft

import graft.plans.{GraftColumns, GraftFunctions}
import org.apache.spark.sql.functions._

/** The compiled `md5_poly_hash` kernel must be BIT-IDENTICAL to the HOF
  * construction it replaced (`rollingHash(md5(s))`) — the sketch oracles
  * (KMV/CMS/HLL) restate that exact fold in DuckDB SQL, so any
  * divergence here is an oracle-hash break, not a perf detail.
  */
class Md5PolyHashSpec extends SparkSpec {
  import spark.implicits._

  test("kernel equals the HOF rollingHash(md5(s)) fold on varied inputs") {
    GraftFunctions.ensure(spark)
    val inputs = Seq("", "a", "42", "-17", "hello world",
      "ünïcödé ✓ text", "a" * 1000, "123456789", "0.5", "key:77")
    val df = inputs.toDF("s")
      .withColumn("kernel", GraftColumns.md5PolyHash(col("s")))
      .withColumn("hof", graft.functions.TextFunctions.rollingHash(
        md5(col("s").cast("string"))))
    val rows = df.select(col("s"), col("kernel"), col("hof")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"mismatch for '${r.getString(0)}'")
    }
  }

  test("kernel equals the HOF fold over integer keys (the sketch inputs)") {
    GraftFunctions.ensure(spark)
    val df = spark.range(0, 5000)
      .select(col("id"),
        GraftColumns.md5PolyHash(col("id")).as("kernel"),
        graft.functions.TextFunctions.rollingHash(
          md5(col("id").cast("string"))).as("hof"))
      .filter(col("kernel") =!= col("hof"))
    assert(df.count() === 0L)
  }

  test("null input yields null, not a crash") {
    GraftFunctions.ensure(spark)
    val df = Seq(Some("x"), None).toDF("s")
      .select(GraftColumns.md5PolyHash(col("s")).as("h"))
    assert(df.filter(col("h").isNull).count() === 1L)
  }
}
