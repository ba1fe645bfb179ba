package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k${i % 17}", i.toDouble)
  }.toDF("k", "v")

  test("salted aggregation ≡ plain aggregation") {
    val plain = skewed.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .orderBy($"k").collect().toSeq
    val salted = Skew.saltedCountSum(skewed, Seq("k"), "v")
      .orderBy($"k").collect().toSeq
    assert(salted === plain)
  }

  test("salted join ≡ plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k"))
      .orderBy($"k", $"v").collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"))
      .select($"k", $"v", $"label")
      .orderBy($"k", $"v").collect().toSeq
    assert(salted === plain)
  }
}
