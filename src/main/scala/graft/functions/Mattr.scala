package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MATTR window-distinct accumulator — `[n_tokens, sum_distinct]`
  * where `sum_distinct = Σ_i |distinct(toks[i..i+w-1])|` over every
  * complete w-token window, in ONE O(n) pass instead of the
  * O(n·w²) per-window `array_distinct(slice(...))` ladder it
  * replaces (round-10, VERDICT r9 ask #2; at w=25 that ladder paid
  * 625 compares per token — the largest avoidable constant in the
  * round-9 surface).
  *
  * The prev-occurrence identity: token j is "new" in window i iff its
  * previous occurrence sits before the window start (prev_j < i) and
  * the window contains j, so
  *   sum_distinct = Σ_j #{ i : max(prev_j+1, j−w+1, 0) ≤ i ≤ min(j, n−w) },
  * a constant-time counting step per token given prev_j from a
  * last-seen hash map. Tokenization matches
  * `filter(split(text, ' '), t -> length(t) > 0)`: space (0x20) is
  * the only delimiter, empty tokens vanish. `MattrEquivalenceSpec`
  * pins bit-equality against the old formulation on the fixture
  * corpus plus adversarial vocabularies (repeats at lag w−1/w/w+1,
  * doc length exactly w, all-equal tokens, multi-space runs).
  *
  * When n < w no window exists: sum_distinct is 0 and the CALLER
  * keeps the NULL-columns contract (t30 gates on n_tokens ≥ w).
  */
case class MattrWindowExpr(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "mattr_window"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"mattr_window needs a window >= 1, got $w")
    case t => TypeCheckResult.TypeCheckFailure(
      s"mattr_window needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Mattr.compute(input.asInstanceOf[UTF8String].getBytes, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val out = ctx.freshName("mattr")
      s"""
         |long[] $out = graft.functions.Mattr.compute($str.getBytes(), $w);
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MattrWindowExpr =
    copy(child = newChild)
}

object Mattr {

  /** One-pass kernel: token boundaries by a byte walk, prev-occurrence
    * via a last-seen map keyed on the token's BYTES (equality matches
    * Spark's UTF8String binary comparison — no charset decode). */
  def compute(b: Array[Byte], w: Int): Array[Long] = {
    // token boundaries (starts/ends as parallel int arrays)
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var n = 0
    var i = 0
    while (i < b.length) {
      if (b(i) != ' ') {
        val s = i
        while (i < b.length && b(i) != ' ') i += 1
        if (n == starts.length) {
          starts = java.util.Arrays.copyOf(starts, n * 2)
          ends = java.util.Arrays.copyOf(ends, n * 2)
        }
        starts(n) = s; ends(n) = i; n += 1
      } else i += 1
    }
    var total = 0L
    if (n >= w) {
      val last = new java.util.HashMap[TokenKey, Integer](n * 2)
      var j = 0
      while (j < n) {
        val key = new TokenKey(b, starts(j), ends(j))
        val p = last.put(key, j)
        val prev = if (p == null) -1 else p.intValue()
        var lo = prev + 1
        if (j - w + 1 > lo) lo = j - w + 1
        if (lo < 0) lo = 0
        val hi = if (j < n - w) j else n - w
        if (hi >= lo) total += (hi - lo + 1).toLong
        j += 1
      }
    }
    Array(n.toLong, total)
  }

  /** Byte-slice hash key — token identity without per-token String
    * allocation/decoding. */
  final class TokenKey(val b: Array[Byte], val from: Int, val until: Int) {
    override val hashCode: Int = {
      var h = 1
      var i = from
      while (i < until) { h = h * 31 + b(i); i += 1 }
      h
    }
    override def equals(o: Any): Boolean = o match {
      case t: TokenKey =>
        val len = until - from
        t.until - t.from == len && {
          var i = 0
          while (i < len && b(from + i) == t.b(t.from + i)) i += 1
          i == len
        }
      case _ => false
    }
  }

  /** Column API: [n_tokens, sum_distinct] at window `w` in one pass. */
  def mattrWindow(text: Column, w: Int): Column =
    Bridge.column(MattrWindowExpr(Bridge.expression(text), w))
}
