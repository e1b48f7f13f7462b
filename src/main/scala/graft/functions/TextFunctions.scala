package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for document-pipeline queries: token counting,
  * quality scoring, language-ID heuristics, fingerprinting. All pure
  * built-in expressions (codegen'd, no UDFs).
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: word-piece regex (letters / digits /
    * single punctuation) as a cheap proxy for tokenizer cost. */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))

  def avgTokenLen(c: Column): Column =
    (length(c) - tokenCount(c) + 1).cast("double") / tokenCount(c)

  /** Fraction of characters that are not alphanumeric or space. */
  def punctRatio(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[^a-zA-Z0-9 ]", "")))
      .cast("double") / length(c)

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "on", "for", "with")

  /** Fraction of tokens that are common English stopwords. */
  def stopwordRatio(c: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val sw = stopwords.map(lit(_))
    size(filter(tokens(c), t => t.isin(sw: _*))).cast("double") / tokenCount(c)
  }

  /** Composite quality score in [0,1]: favors mid-length documents with
    * low punctuation density and a natural stopword rate. Deterministic
    * arithmetic only, so an external oracle can reproduce it. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 500.0d, lit(1.0d))
    val punct = punctRatio(c)
    val stop = stopwordRatio(c)
    round(lenScore * (lit(1.0d) - punct) * least(stop * 5.0d, lit(1.0d)), 6)
  }

  /** Number of tokens that are common English stopwords. */
  def stopwordCount(c: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val sw = stopwords.map(lit(_))
    size(filter(tokens(c), t => t.isin(sw: _*))).cast("long")
  }

  /** Gopher-style hard-filter report (Rae et al. 2021, §A1.1 rule
    * family): per document, the word-count band, mean-word-length
    * band, symbol-density cap and minimum-stopword-evidence rules as
    * separate booleans plus the conjunctive keep flag — the report
    * form (rather than a bare filter) is what a curation run audits.
    * Pure codegen'd built-ins; deterministic arithmetic only, so an
    * external engine reproduces every flag bit-for-bit. */
  def gopherReport(
      docs: org.apache.spark.sql.DataFrame,
      idCol: Column,
      textCol: Column,
      minWords: Int = 3, maxWords: Int = 256,
      minAvgLen: Double = 2.0, maxAvgLen: Double = 12.0,
      maxSymbolRatio: Double = 0.2,
      minStopwords: Int = 1): org.apache.spark.sql.DataFrame =
    docs.select(
        idCol.as("doc_id"),
        tokenCount(textCol).cast("long").as("n_words"),
        round(avgTokenLen(textCol), 6).as("avg_word_len"),
        round(punctRatio(textCol), 6).as("symbol_ratio"),
        stopwordCount(textCol).as("n_stop"),
        (avgTokenLen(textCol) >= minAvgLen &&
          avgTokenLen(textCol) <= maxAvgLen).as("ok_wordlen"),
        (punctRatio(textCol) <= maxSymbolRatio).as("ok_symbols"))
      .withColumn("ok_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_stopwords", col("n_stop") >= minStopwords)
      .withColumn("keep",
        col("ok_words") && col("ok_wordlen") &&
          col("ok_symbols") && col("ok_stopwords"))
      .select(col("doc_id"), col("n_words"), col("avg_word_len"),
        col("symbol_ratio"), col("n_stop"), col("ok_words"),
        col("ok_wordlen"), col("ok_symbols"), col("ok_stopwords"),
        col("keep"))

  /** n-gram-heuristic language guess: scores per-language marker-word
    * hit counts and picks the argmax (positive-score ties break to the
    * lexicographically greatest language code — `greatest` over
    * (score, lang) structs; only an all-zero score yields 'und').
    * Cheap and deterministic; a real model would be a broadcast
    * lookup table. The t2 oracle implements this exact tie rule. */
  def langGuess(c: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "is"),
      "de" -> Seq("der", "und", "die", "das", "ist"),
      "fr" -> Seq("le", "la", "et", "les", "est"),
      "es" -> Seq("el", "los", "que", "es", "y"))
    val toks = tokens(c)
    val scores = markers.map { case (lang, ws) =>
      struct(
        size(filter(toks, t => t.isin(ws.map(lit(_)): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best("score") > 0, best("lang")).otherwise(lit("und"))
  }

  /** Normalized-content fingerprint: md5 of lowercased,
    * whitespace-collapsed text (portable). */
  def docFingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** ASCII-conservative PII patterns — the subset of regex syntax that
    * Java regex and RE2-family engines interpret identically, so the
    * match counts and the redacted text oracle-check bit-for-bit.
    * `(?i)` (identical in Java regex and RE2) keeps mixed-case
    * addresses like John.Doe@Example.COM from slipping through the
    * scrub — under-redaction, not just a count error. */
  val EmailPattern: String = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Pattern: String = "(?i)\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  def emailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailPattern), lit(0))).cast("long")

  def ipCount(c: Column): Column =
    size(regexp_extract_all(c, lit(Ipv4Pattern), lit(0))).cast("long")

  /** Redact emails then IPs (emails first: an address can embed
    * digit runs, never vice versa once `<EMAIL>` is in place). */
  def scrubPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailPattern, "<EMAIL>"),
      Ipv4Pattern, "<IP>")

  /** Within-document repetition report (Gopher §A1.1's repetition rule
    * family): duplicate-token fraction, most-common-token fraction and
    * most-common-bigram fraction, plus the conjunctive keep flag.
    *
    * Skew/scale shape: token and bigram counts are per-(doc, gram)
    * groupBys (map-side combinable, keyed by the doc — no hot global
    * token key); the top-token pick is a doc-partitioned window.
    * Bigrams index the materialized token array (O(1) `element_at`
    * per gram — not a re-split per lambda element). */
  def repetitionReport(
      docs: org.apache.spark.sql.DataFrame,
      idCol: Column,
      textCol: Column,
      maxDupFrac: Double = 0.55,
      maxTopTokFrac: Double = 0.10,
      maxTopBigramFrac: Double = 0.08): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = docs.select(idCol.as("doc_id"), tokens(textCol).as("toks"))
    val perTok = t.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val tokAgg = perTok.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"))
    // max count, ties to the lexicographically smallest token
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("cnt").desc, col("tok"))
    val top = perTok.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("doc_id"), col("tok").as("top_tok"),
        col("cnt").as("_top_cnt"))
    val perBg = t.where(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1)))).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("cnt"))
    val bgAgg = perBg.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("_n_bg"), max(col("cnt")).as("_top_bg"))
    tokAgg.join(top, Seq("doc_id"))
      .join(bgAgg, Seq("doc_id"), "left")
      .withColumn("dup_frac",
        round(lit(1.0d) - col("n_distinct").cast("double") / col("n_tokens"), 6))
      .withColumn("top_tok_frac",
        round(col("_top_cnt").cast("double") / col("n_tokens"), 6))
      .withColumn("top_bigram_frac",
        coalesce(round(col("_top_bg").cast("double") / col("_n_bg"), 6),
          lit(0.0d)))
      .withColumn("keep",
        col("dup_frac") <= maxDupFrac &&
          col("top_tok_frac") <= maxTopTokFrac &&
          col("top_bigram_frac") <= maxTopBigramFrac)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("dup_frac"), col("top_tok"), col("top_tok_frac"),
        col("top_bigram_frac"), col("keep"))
  }

  val RollBase: Long = 131L
  val RollPrime: Long = graft.functions.PortableHash.MinhashPrime

  /** Precomputed B^i mod p powers (engine-portable literals). */
  def rollPowers(n: Int): IndexedSeq[Long] =
    (0 until n).scanLeft(1L)((acc, _) => acc * RollBase % RollPrime).toIndexedSeq

  /** Position-sensitive polynomial rolling hash over tokens:
    * Σ h32(tokᵢ)·Bⁱ mod p, with the powers as a literal table so an
    * external engine reproduces it exactly. Tokens beyond `maxTokens`
    * are ignored (document and cap consistently with the oracle).
    * Unlike [[docFingerprint]], token ORDER matters — permuted
    * documents get different fingerprints but equal md5 token-bags
    * would too; this is the streaming-friendly incremental form. */
  def rollingFingerprint(toksCol: Column, maxTokens: Int = 128): Column = {
    import graft.functions.PortableHash.phash32
    val pows = rollPowers(maxTokens)
    // token hash reduced below 2^31 so hash·power stays within int64
    val terms = transform(
      slice(toksCol, 1, maxTokens),
      (t, i) => phash32(t) % lit(2147483647L) *
        element_at(typedlit(pows), i + 1) % RollPrime)
    aggregate(terms, lit(0L), (acc, v) => (acc + v) % RollPrime)
  }
}
