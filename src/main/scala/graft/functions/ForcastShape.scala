package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass FORCAST word-shape counters over a raw document string:
  * [n_words, n_mono, n_long] where a word is a maximal run of
  * non-space bytes, n_mono counts words with exactly ONE [aeiouy]+
  * vowel-group run (case-insensitive — the single-syllable heuristic),
  * and n_long counts words of ≥ 7 code points (the LIX long-word
  * numerator).
  *
  * Equivalent, on the fixture corpora, to the declarative pipeline it
  * replaced (explode(split(text,' ')) → per-token
  * `size(regexp_extract_all(lower(tok),'[aeiouy]+'))` → groupBy
  * doc_id), which paid a regex compile-site per token AND a full
  * explode+shuffle per corpus; this is one branch-light byte walk per
  * document with no explode, no shuffle, and no join —
  * `ForcastShapeEquivalenceSpec` pins the equivalence on the fixture
  * vocabulary plus adversarial edge cases.
  *
  * Unicode contract (the one intentional narrowing, documented rather
  * than silent): vowels are ASCII only. The old path lowercased the
  * token with `lower()` before matching [aeiouy], so a non-ASCII
  * UPPERCASE letter whose lowercase form is an ASCII vowel (there are
  * no such single-char mappings in Unicode's simple lowercase table —
  * Kelvin sign K→k and İ→i+̇ are the closest, neither lands on a bare
  * vowel... İ does produce 'i'+U+0307) could in principle differ.
  * Both documents corpora are verified pure ASCII (checked at sf0.01
  * and sf0.1), where the two formulations coincide byte-for-byte.
  * Word length counts code points (UTF-8 lead bytes), matching
  * Spark's `length()` on any input.
  */
case class ForcastShapeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "forcast_shape"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"forcast_shape needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ForcastShape.compute(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val out = ctx.freshName("fshape")
      s"""
         |long[] $out = graft.functions.ForcastShape.compute($str.getBytes());
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ForcastShapeExpr =
    copy(child = newChild)
}

object ForcastShape {

  /** The shared interpreted/codegen kernel — one pass over the UTF-8
    * bytes, O(1) state (current-token code-point count, vowel-run
    * count, previous-byte-was-vowel). Space (0x20) is the only
    * delimiter, matching `split(text, " ")` + the length>0 filter:
    * consecutive/leading/trailing spaces contribute no words. */
  def compute(b: Array[Byte]): Array[Long] = {
    var words = 0L
    var mono = 0L
    var long7 = 0L
    var chars = 0
    var runs = 0
    var prevVowel = false
    var inTok = false
    def endToken(): Unit = if (inTok) {
      words += 1
      if (runs == 1) mono += 1
      if (chars >= 7) long7 += 1
      inTok = false; chars = 0; runs = 0; prevVowel = false
    }
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c == ' ') endToken()
      else {
        inTok = true
        // code-point count = count of non-continuation bytes
        if ((c & 0xC0) != 0x80) chars += 1
        val v = c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' ||
          c == 'y' || c == 'A' || c == 'E' || c == 'I' || c == 'O' ||
          c == 'U' || c == 'Y'
        if (v && !prevVowel) runs += 1
        prevVowel = v
      }
      i += 1
    }
    endToken()
    Array(words, mono, long7)
  }

  /** Column API: [n_words, n_mono, n_long] in one pass. */
  def shape(text: Column): Column =
    Bridge.column(ForcastShapeExpr(Bridge.expression(text)))
}
