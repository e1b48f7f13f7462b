package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Vector-vs-codebook primitives for the quantized-ANN family
  * ([[graft.operators.Ivf]], [[graft.operators.Pq]], IvfPq).
  *
  * Why custom expressions (SURVEY §7.3 preference order (b)): the
  * declarative encodings of "score this vector against all k codewords"
  * — `greatest(struct(dot, -code), ...)` argmax chains or
  * `array(dot, dot, ...)` LUT builds over k codeword literals — emit
  * O(k) generated code PER EXPRESSION (k inlined dot loops + struct
  * comparators). At k=16 that already tipped multi-expression
  * projections (m=8 PQ encodes, IVF assigns fused into a scan stage)
  * over janino's 64 KB method limit: codegen FAILED and the whole
  * stage silently ran interpreted — the exact hot loop quantization
  * exists to make cheap (VERDICT r6, "what's wrong" #2). These
  * expressions hold the codebook as a single JVM reference object
  * (`ctx.addReferenceObj`) and loop over it, so generated code is O(1)
  * in k and m·k-expression projections stay comfortably inside
  * whole-stage codegen.
  *
  * The arithmetic is BIT-FOR-BIT the same double sequence the old
  * expression trees produced (same dot accumulation order as
  * [[DotProductF]]; cosine mode divides by (‖v‖·‖c‖) exactly as
  * `dotF(v,c)/(vn*lit(norm))` did), so oracle hashes are unchanged.
  *
  * NULL semantics: NULL input array, or a NULL element inside any
  * scored prefix, nulls the result. (Deliberate tightening for the
  * argmax: the old `greatest(struct(null, -code))` chain compared the
  * all-null scoreboards by code and silently assigned a corrupt vector
  * to the smallest code; a NULL assignment is diagnosable. No data or
  * spec exercises null vector elements — the dots variant is
  * indistinguishable downstream either way, `element_at` picks null
  * from a null array and from an array of nulls alike.)
  */
private[graft] trait CodebookExpression extends UnaryExpression {
  def matrix: Array[Array[Float]]

  override def nullable: Boolean = true

  protected def childIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double>, got ${t.simpleString}")
  }

  /** max codeword length: null elements are checked over the union of
    * scored prefixes, matching the old trees where every candidate dot
    * nulled independently and `greatest`/`array` saw them all. */
  protected val maxLen: Int =
    if (matrix.isEmpty) 0 else matrix.map(_.length).max
}

/** `codebook_argmax(v)`: the code of the best-scoring codeword.
  * Score is `dot(v, m_i) - param(i)` (PQ mode: param = ‖c‖²/2, argmax
  * of the L2-equivalent form) or `dot(v, m_i) / (‖v‖ * param(i))`
  * (cosine mode: param = ‖c‖ — [[graft.operators.Ivf]] assignment).
  * Ordering: NaN counts as greater than any double (as `greatest`
  * orders it); ties and NaN-vs-NaN keep the FIRST (lowest-index)
  * codeword — `matrix` must be sorted by code ascending, which makes
  * this identical to the old max-(score,-code) struct rule. */
case class CodebookArgMax(
    child: Expression,
    matrix: Array[Array[Float]],
    param: Array[Double],
    codes: Array[Int],
    cosine: Boolean) extends CodebookExpression {

  require(matrix.nonEmpty && matrix.length == param.length &&
    matrix.length == codes.length,
    s"codebook arity mismatch: ${matrix.length} codewords, " +
      s"${param.length} params, ${codes.length} codes")
  // ties and NaN resolve to the FIRST index, so "smallest code wins"
  // (the old order-independent greatest(score, -code) rule, and the
  // oracle's row_number(score desc, code asc)) holds ONLY for a
  // code-ascending codebook — an unsorted one would silently diverge
  require(codes.length < 2 ||
    codes.iterator.zip(codes.iterator.drop(1)).forall { case (a, b) => a < b },
    "codebook must be sorted by code ascending (tie/NaN rule)")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "codebook_argmax"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dbl = childIsDouble
    val nv = v.numElements()
    var j = 0
    val lim = math.min(nv, maxLen)
    while (j < lim) { if (v.isNullAt(j)) return null; j += 1 }
    var vn = 0.0d
    if (cosine) {
      var i = 0
      while (i < nv) {
        if (v.isNullAt(i)) return null // full-vector norm, old vn rule
        val x = if (dbl) v.getDouble(i) else v.getFloat(i).toDouble
        vn += x * x
        i += 1
      }
      vn = math.sqrt(vn)
    }
    var best = -1
    var bestScore = 0.0d
    var i = 0
    while (i < matrix.length) {
      val m = matrix(i)
      val n = math.min(nv, m.length)
      var acc = 0.0d
      var k = 0
      while (k < n) {
        acc += (if (dbl) v.getDouble(k) else v.getFloat(k).toDouble) * m(k)
        k += 1
      }
      val s = if (cosine) acc / (vn * param(i)) else acc - param(i)
      if (best < 0 || s > bestScore ||
          (s.isNaN && !bestScore.isNaN)) { best = i; bestScore = s }
      i += 1
    }
    codes(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("mat", matrix, "float[][]")
      val par = ctx.addReferenceObj("par", param, "double[]")
      val cds = ctx.addReferenceObj("cds", codes, "int[]")
      val nv = ctx.freshName("nv")
      val vn = ctx.freshName("vn")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val done = ctx.freshName("done")
      def get(idx: String) =
        if (childIsDouble) s"$v.getDouble($idx)" else s"(double) $v.getFloat($idx)"
      val vnLoop =
        if (cosine)
          s"""
             |for (int $i = 0; $i < $nv && !${ev.isNull}; $i++) {
             |  if ($v.isNullAt($i)) { ${ev.isNull} = true; }
             |  else { double __x = ${get(i)}; $vn += __x * __x; }
             |}
             |$vn = java.lang.Math.sqrt($vn);
           """.stripMargin
        else ""
      s"""
         |int $nv = $v.numElements();
         |double $vn = 0.0;
         |for (int $i = 0; $i < java.lang.Math.min($nv, $maxLen); $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |$vnLoop
         |if (!${ev.isNull}) {
         |  int $best = -1;
         |  double $bestS = 0.0;
         |  for (int $i = 0; $i < $mat.length; $i++) {
         |    float[] __m = $mat[$i];
         |    int __n = java.lang.Math.min($nv, __m.length);
         |    double $acc = 0.0;
         |    for (int $k = 0; $k < __n; $k++) {
         |      $acc += ${get(k)} * __m[$k];
         |    }
         |    double $s = ${if (cosine) s"$acc / ($vn * $par[$i])"
            else s"$acc - $par[$i]"};
         |    if ($best < 0 || $s > $bestS ||
         |        (Double.isNaN($s) && !Double.isNaN($bestS))) {
         |      $best = $i; $bestS = $s;
         |    }
         |  }
         |  ${ev.value} = $cds[$best];
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CodebookArgMax =
    copy(child = newChild)
}

/** `codebook_dots(v)`: array<double> of `dot(v, m_i)` for every
  * codeword — the per-query ADC lookup table built in one loop
  * ([[graft.operators.Pq]] `lutCols`). NULL semantics as the old
  * `array(dotF...)` build: NULL input or a NULL element in a scored
  * prefix nulls the WHOLE array (the old per-element nulls and a null
  * array are indistinguishable downstream — `element_at` picks null
  * either way). */
case class CodebookDots(
    child: Expression,
    matrix: Array[Array[Float]]) extends CodebookExpression {

  require(matrix.nonEmpty, "empty codebook")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "codebook_dots"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dbl = childIsDouble
    val nv = v.numElements()
    var j = 0
    val lim = math.min(nv, maxLen)
    while (j < lim) { if (v.isNullAt(j)) return null; j += 1 }
    val out = new Array[Any](matrix.length)
    var i = 0
    while (i < matrix.length) {
      val m = matrix(i)
      val n = math.min(nv, m.length)
      var acc = 0.0d
      var k = 0
      while (k < n) {
        acc += (if (dbl) v.getDouble(k) else v.getFloat(k).toDouble) * m(k)
        k += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("mat", matrix, "float[][]")
      val nv = ctx.freshName("nv")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      def get(idx: String) =
        if (childIsDouble) s"$v.getDouble($idx)" else s"(double) $v.getFloat($idx)"
      s"""
         |int $nv = $v.numElements();
         |for (int $i = 0; $i < java.lang.Math.min($nv, $maxLen); $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  double[] $out = new double[$mat.length];
         |  for (int $i = 0; $i < $mat.length; $i++) {
         |    float[] __m = $mat[$i];
         |    int __n = java.lang.Math.min($nv, __m.length);
         |    double $acc = 0.0;
         |    for (int $k = 0; $k < __n; $k++) {
         |      $acc += ${get(k)} * __m[$k];
         |    }
         |    $out[$i] = $acc;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CodebookDots =
    copy(child = newChild)
}

object Codebook {
  /** PQ argmin-L2 as argmax(dot − ‖c‖²/2); `codebook` sorted by code. */
  def argMinL2(vec: Column,
      codebook: Array[(Int, Array[Float], Double)]): Column =
    Bridge.column(CodebookArgMax(Bridge.expression(vec),
      codebook.map(_._2), codebook.map(_._3), codebook.map(_._1),
      cosine = false))

  /** IVF cosine argmax: dot(v,c)/(‖v‖·‖c‖); `codebook` sorted by cid. */
  def argMaxCosine(vec: Column,
      codebook: Array[(Int, Array[Float], Double)]): Column =
    Bridge.column(CodebookArgMax(Bridge.expression(vec),
      codebook.map(_._2), codebook.map(_._3), codebook.map(_._1),
      cosine = true))

  /** All-codeword dot products (the per-query ADC LUT). */
  def dots(vec: Column, codewords: Array[Array[Float]]): Column =
    Bridge.column(CodebookDots(Bridge.expression(vec), codewords))
}
