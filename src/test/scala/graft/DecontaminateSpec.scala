package graft

import graft.operators.Decontaminate
import org.apache.spark.sql.functions._

/** Benchmark-overlap decontamination: exact flags on a planted corpus, and
  * the Bloom prefilter path must be result-identical to the exact join on
  * real data (one-sided sketch error must be verified away).
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("flags docs sharing >= minHits shingles with the benchmark") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // full copy: 6 hits
      (2L, "totally unrelated content about something else entirely here"),
      (3L, "alpha beta gamma delta unrelated tail of words")  // 2 hits < 5
    ).toDF("doc_id", "text")
    val got = Decontaminate.flagContaminated(corpus, bench, n = 3, minHits = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 6L)))
  }

  test("contained benchmark sentence inside a longer doc is caught") {
    val bench = Seq((100L, "the exact answer is forty two obviously"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "padding before the exact answer is forty two obviously and after"),
      (2L, "the exact answer differs here completely now")
    ).toDF("doc_id", "text")
    val got = Decontaminate.flagContaminated(corpus, bench, n = 3, minHits = 5)
      .collect().map(r => r.getLong(0))
    assert(got.toSeq === Seq(1L))
  }

  test("bloom prefilter path is result-identical to the exact path") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter($"doc_id" % 19 === 0)
    val corpus = docs.filter($"doc_id" % 19 =!= 0)
    val exact = Decontaminate.flagContaminated(corpus, bench, 3, 5)
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val bloomed = Decontaminate.flagContaminatedBloom(corpus, bench, 3, 5)
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bloomed.toSeq === exact.toSeq)
  }

  test("prebuilt shingle table with a different n is refused, not silently empty") {
    val bench = Seq((100L, "the exact answer is forty two obviously"))
      .toDF("doc_id", "text")
    val corpus = Seq((1L, "the exact answer is forty two obviously padded"))
      .toDF("doc_id", "text")
    val prebuilt = Decontaminate.benchmarkShingles(bench, n = 5)
    val e = intercept[IllegalArgumentException] {
      Decontaminate.flagAgainstShingles(corpus, prebuilt, n = 3, minHits = 2)
    }
    assert(e.getMessage.contains("mismatched widths"))
    // same-n prebuilt table works
    val ok = Decontaminate.flagAgainstShingles(corpus,
      Decontaminate.benchmarkShingles(bench, n = 3), n = 3, minHits = 2)
    assert(ok.count() === 1)
  }

  test("bloom_might_contain_long: no false negatives, bounded false positives") {
    graft.plans.GraftFunctions.ensure(spark)
    val members = (1L to 1000L).map(_ * 7919L)
    val bloom = members.toDF("v").stat.bloomFilter("v", 1000L, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos); bos.toByteArray
    }
    val probeHit = members.toDF("v")
      .filter(graft.plans.GraftColumns.bloomMightContainLong(lit(bytes), $"v"))
    assert(probeHit.count() === 1000L) // one-sided: every member hits
    val nonMembers = (1L to 10000L).map(_ * 7919L + 3L)
    val fp = nonMembers.toDF("v")
      .filter(graft.plans.GraftColumns.bloomMightContainLong(lit(bytes), $"v"))
      .count()
    assert(fp <= 300L, s"fp=$fp way above the 1% target") // generous 3% ceiling
  }
}
