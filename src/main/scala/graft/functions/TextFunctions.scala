package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library for large-scale training-data pipelines:
  * tokenization, shingling, fingerprinting, language-ID heuristics and
  * quality scoring. Everything is built from codegen'd built-in expressions
  * (no UDFs) so whole-stage codegen spans the full pipeline and the same
  * semantics are mirror-able in the DuckDB oracle SQL.
  *
  * Capability extensions beyond the reference surface (SURVEY.md §2.9 /
  * BASELINE.json north-star ops).
  */
object TextFunctions {

  /** Canonical normalization: lowercase, collapse runs of whitespace, trim.
    * Collapse-then-trim (not trim-then-collapse): `trim` strips only
    * spaces, so an edge tab would survive as a leftover space and the
    * function would not be idempotent (PropertySpec pins idempotence).
    */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokenization over normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  def tokenCount(c: Column): Column = size(tokens(c))

  def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  def distinctTokenCount(c: Column): Column = size(distinctTokens(c))

  /** BPE-ish sub-word segmentation: alpha runs, digit runs, and single
    * punctuation marks each become a token (a cheap proxy for byte-pair
    * tokenizer counting; deterministic and codegen-friendly).
    */
  def bpeishTokens(c: Column): Column =
    filter(
      split(regexp_replace(lower(c), "([a-z]+|[0-9]+|[^a-z0-9\\s])", " $1 "), "\\s+"),
      t => length(t) > 0)

  def bpeishTokenCount(c: Column): Column = size(bpeishTokens(c))

  /** Word n-gram shingles over the token array (for minhash / near-dup).
    * Docs shorter than n shingle to their full text.
    */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  def distinctShingles(c: Column, n: Int): Column = array_distinct(shingles(c, n))

  /** 64-bit shingle hashes computed straight from the token slots —
    * xxhash64 over the n tokens of each window via O(1) element_at, never
    * materializing shingle strings (no O(n) slice copies, no array_join
    * string building, 8-byte values into every downstream shuffle). The
    * near-dup operators only ever compare shingles for equality, so the
    * hash domain is equivalent up to 2^-64 collisions. Short docs (<n
    * tokens) hash their full text, mirroring `shingles`' short-doc arm.
    *
    * `toks` MUST be a materialized token-array attribute (project
    * `tokens(text)` into a named column first): HOF lambdas re-evaluate
    * inlined expression trees per element, so passing `tokens(c)` directly
    * re-runs the regex/split once per element_at — measured 2.5× slower
    * than string shingling instead of 10× faster.
    */
  def shingleHashesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array(xxhash64(array_join(toks, " "))))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => xxhash64((0 until n).map(j => element_at(toks, i + j + 1)): _*)))

  def distinctShingleHashesFromTokens(toks: Column, n: Int): Column =
    array_distinct(shingleHashesFromTokens(toks, n))

  /** Exact document fingerprint: md5 of the normalized text. */
  def md5Fingerprint(c: Column): Column = md5(normText(c))

  /** PII scrubbing patterns — deliberately RE2-compatible (no lookaround,
    * no backrefs) so the same pattern strings run identically in Spark's
    * Java regex and RE2-based engines. Applied to NORMALIZED (lowercased)
    * text, in email → url → number order: emails first so their digit
    * runs aren't half-eaten by the number rule, urls before numbers for
    * the same reason.
    */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val urlPattern = "https?://[^ ]+"
  val longNumberPattern = "[0-9]{6,}"

  /** Redact emails, URLs, and long digit runs (IDs, phone-ish numbers)
    * from normalized text — the standard pre-training privacy scrub.
    * Narrow per-row transform; no shuffle.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(normText(c), emailPattern, "<email>"),
        urlPattern, "<url>"),
      longNumberPattern, "<num>")

  /** How many of each PII class a document carries (audit signal). */
  def piiCounts(c: Column): (Column, Column, Column) = {
    val n = normText(c)
    (size(regexp_extract_all(n, lit(emailPattern), lit(0))),
     size(regexp_extract_all(regexp_replace(n, emailPattern, "<email>"),
       lit(urlPattern), lit(0))),
     size(regexp_extract_all(
       regexp_replace(regexp_replace(n, emailPattern, "<email>"),
         urlPattern, "<url>"),
       lit(longNumberPattern), lit(0))))
  }

  /** Rolling polynomial (Karp-Rabin-style) content hash, char-by-char:
    * acc = (acc * 31 + ascii(char)) mod 1e9+7. The per-step mod keeps the
    * accumulator < 2^35 so ANSI mode never sees a long overflow.
    */
  def rollingHash(c: Column): Column =
    aggregate(
      // NB: Spark's split(str, "") appends a trailing "" element (Java
      // split with limit -1); DuckDB's string_split does not — filter it
      // out so the oracle's char sequence is identical.
      filter(split(normText(c), ""), ch => length(ch) > 0),
      lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L)

  /** Tiny per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Deliberately small and explicit so the oracle SQL can carry
    * the identical lists.
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "que", "no", "un", "en"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "est"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "you", "wo", "ta"))

  /** Number of DISTINCT profile words present in the document. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, array(words.map(lit): _*)))

  /** Occurrence count (non-distinct) of profile words — for ratio metrics. */
  def stopwordOccurrences(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** Language-ID heuristic: argmax of stopword hits, first-match tie-break
    * in lexicographic language order (same CASE order as the oracle SQL).
    */
  def langGuess(c: Column): Column = {
    val toks = distinctTokens(c)
    val scores = stopwordProfiles.map { case (l, ws) => l -> stopwordHits(toks, ws) }
    val ordered = scores.map(_._1)
    scores.zipWithIndex.foldRight(lit(ordered.last)) {
      case (((lang, score), i), elseCol) =>
        val others = scores.zipWithIndex.collect { case ((_, s), j) if j > i => s }
        if (others.isEmpty) elseCol
        else when(others.map(o => score >= o).reduce(_ && _), lang).otherwise(elseCol)
    }
  }

  /** Quality-score feature family (length / punctuation / stopword ratios),
    * each a pure double expression so the combo stays inside codegen.
    */
  def charCount(c: Column): Column = length(normText(c))

  def alphaRatio(c: Column): Column =
    length(regexp_replace(normText(c), "[^a-z]", "")) / charCount(c)

  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[^.!?,;:]", "")) / length(c)

  def avgTokenLen(c: Column): Column = {
    val n = tokenCount(c)
    (charCount(c) - (n - 1)) / n
  }

  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    val en = stopwordProfiles.toMap.apply("en")
    stopwordOccurrences(toks, en) / size(toks)
  }

  /** Composite quality score in [0,1]-ish: rewards mid-length docs with
    * real words; penalizes pathological token lengths. Same arithmetic is
    * mirrored in the oracle. The final rounding goes THROUGH decimal(20,10)
    * on purpose: the component sum can land exactly on a x.xxxx5 boundary
    * (e.g. n/100·0.4 terms), where engines' double-rounding conventions
    * legitimately disagree at the 4th decimal; rounding the shared double
    * to 10 decimals first (far above representation noise, far below the
    * boundary gap) makes HALF_UP at 4 decimals identical everywhere —
    * this closed the 1-in-5000 sf0.1 diff the r7 sweep documented.
    */
  def qualityScore(c: Column): Column =
    round(
      (least(lit(1.0), tokenCount(c) / lit(100.0)) * lit(0.4)
        + least(lit(1.0), stopwordRatio(c) * lit(5.0)) * lit(0.3)
        + when(avgTokenLen(c).between(3.0, 10.0), lit(0.3)).otherwise(lit(0.0)))
        .cast("decimal(20,10)"),
      4).cast("double")
}
