package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("normalization + token counts") {
    val r = Seq("  The   QUICK  brown\tfox  ").toDF("t").select(
      normText($"t").as("n"),
      tokenCount($"t").as("tc"),
      distinctTokenCount($"t").as("dtc"),
      charCount($"t").as("cc")).head()
    assert(r.getAs[String]("n") === "the quick brown fox")
    assert(r.getAs[Int]("tc") === 4 && r.getAs[Int]("dtc") === 4)
    assert(r.getAs[Int]("cc") === 19)
  }

  test("bpe-ish segmentation splits alpha/digit/punct runs") {
    val toks = Seq("hello,world42 foo!").toDF("t")
      .select(bpeishTokens($"t").as("x")).head().getSeq[String](0)
    assert(toks === Seq("hello", ",", "world", "42", "foo", "!"))
  }

  test("shingles: n-grams, short docs shingle to full text") {
    val r = Seq("a b c d", "a b").toDF("t")
      .select(shingles($"t", 3).as("s")).collect().map(_.getSeq[String](0))
    assert(r(0) === Seq("a b c", "b c d"))
    assert(r(1) === Seq("a b"))
  }

  test("rolling hash: deterministic, normalization-invariant, content-sensitive") {
    val h = Seq("abc", "  ABC ", "abd").toDF("t")
      .select(rollingHash($"t").as("h")).collect().map(_.getLong(0))
    assert(h(0) === h(1)) // normalized equal
    assert(h(0) !== h(2))
    // manual: ((0*31+97)*31+98)*31+99 = ...
    assert(h(0) === ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("langGuess identifies obvious languages") {
    val got = Seq(
      "the cat is in the house and it is warm",
      "el perro no es un gato y que bien",
      "der hund ist nicht ein katze und das ist gut",
      "le chat est un animal et les chiens sont des animaux")
      .toDF("t").select(langGuess($"t").as("l")).as[String].collect().toSeq
    assert(got === Seq("en", "es", "de", "fr"))
  }

  test("quality score bounded and favors real text") {
    val r = Seq(
      "the cat sat on the mat and then the dog came to the house of the man",
      "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")
      .toDF("t").select(qualityScore($"t").as("q")).as[Double].collect()
    assert(r.forall(q => q >= 0.0 && q <= 1.0))
    assert(r(0) > r(1))
  }

  test("scrubPii redacts emails, urls, long numbers; counts audit each class") {
    val t = "Contact Bob.Smith+x@Example.COM or https://foo.bar/baz?id=12345678 " +
      "call 5551234567 ref 12345 done"
    val row = Seq(t).toDF("t").select(
      scrubPii($"t").as("s"),
      piiCounts($"t")._1.as("ne"), piiCounts($"t")._2.as("nu"),
      piiCounts($"t")._3.as("nn"))
      .as[(String, Int, Int, Int)].head()
    assert(row._1 === "contact <email> or <url> call <num> ref 12345 done")
    assert((row._2, row._3, row._4) === ((1, 1, 1)))
  }

  test("scrubPii is clean-text identity") {
    val t = "the quick brown fox jumps over the lazy dog"
    val s = Seq(t).toDF("t").select(scrubPii($"t")).as[String].head()
    assert(s === t)
  }
}
