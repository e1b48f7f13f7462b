package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** PCM sample-format canonicalization — `pcm_canonical(payload, bits,
  * channels)` maps a declared-format PCM payload onto the CANONICAL
  * unsigned-8-bit MONO sample stream every audio analysis in this
  * engine runs on (the mm7 fingerprint, the mm11/mm13 energy lattice,
  * the streaming silence gate).
  *
  * Round-13 (VERDICT r12 ask #1): until now the audio family admitted
  * only PCM format 1 at 8-bit mono — fail-closed and correct, but
  * nearly every real-world WAV/AVI is 16-bit PCM, so the whole
  * analysis surface ran on almost no real file. This kernel is the
  * decode step that widens admission to 16-bit and stereo WITHOUT
  * touching any downstream math: consumers keep their exact-integer
  * 8-bit contract, and existing 8-bit-mono blobs canonicalize to
  * themselves (identity — prior hashes unchanged by construction).
  *
  * The documented rule (replayed bit-exactly by the DuckDB oracles):
  *  - sample values move to UNSIGNED space first — an 8-bit sample is
  *    its byte; a 16-bit sample is the signed little-endian value
  *    + 32768 (equivalently `le16 XOR 0x8000`);
  *  - stereo collapses per sample frame to `(L + R) div 2` — floor
  *    division of non-negative operands, so Spark's and DuckDB's
  *    integer division agree by construction;
  *  - 16-bit scales to 8-bit by keeping the top byte (`div 256`);
  *  - a trailing PARTIAL sample frame (payload length not a multiple
  *    of channels · bits/8) is dropped, matching the floor-division
  *    frame counts every consumer derives.
  *
  * Contract: bits ∈ {8, 16} and channels ∈ {1, 2} — the admission
  * gates ([[graft.queries.AdsbQueries]]'s wav leg,
  * [[Riff.withAviAudio]]'s `avi_audio_ok`, the streaming intake)
  * enforce this BEFORE the kernel runs; any other declared format
  * yields an EMPTY stream, never a throw and never a silent mis-read
  * of unknown-format bytes as samples (the failure mode the gates
  * exist to prevent — an empty canonical stream is shorter than one
  * analysis frame and excludes itself downstream).
  */
case class PcmCanonExpr(payload: Expression, bits: Expression,
    channels: Expression)
    extends TernaryExpression {

  override def first: Expression = payload
  override def second: Expression = bits
  override def third: Expression = channels

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pcm_canonical"

  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, bits.dataType, channels.dataType) match {
      case (BinaryType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (p, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary, int, int), got " +
          s"(${p.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def nullSafeEval(p: Any, b: Any, c: Any): Any =
    Pcm.canonical(p.asInstanceOf[Array[Byte]], b.asInstanceOf[Int],
      c.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (p, b, c) =>
      s"${ev.value} = graft.functions.Pcm.canonical($p, $b, $c);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PcmCanonExpr =
    copy(payload = newFirst, bits = newSecond, channels = newThird)
}

object Pcm {

  /** Shared interpreted/codegen kernel — see [[PcmCanonExpr]] for the
    * canonicalization rule. O(bytes), one output array, no throw on
    * any input. 8-bit mono returns the input array ITSELF (identity —
    * no copy; rows are immutable downstream). */
  def canonical(b: Array[Byte], bits: Int, ch: Int): Array[Byte] = {
    if (bits == 8 && ch == 1) return b
    if ((bits != 8 && bits != 16) || (ch != 1 && ch != 2))
      return Array.emptyByteArray
    val bpf = (bits / 8) * ch
    val n = b.length / bpf
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val base = i * bpf
      val v =
        if (bits == 8) ((b(base) & 0xFF) + (b(base + 1) & 0xFF)) / 2
        else {
          val l = ((b(base) & 0xFF) | ((b(base + 1) & 0xFF) << 8)) ^ 0x8000
          val u =
            if (ch == 1) l
            else (l + (((b(base + 2) & 0xFF) |
              ((b(base + 3) & 0xFF) << 8)) ^ 0x8000)) / 2
          u >> 8
        }
      out(i) = v.toByte
      i += 1
    }
    out
  }

  /** `pcm_canonical` as a Column. */
  def pcmCanonical(payload: Column, bits: Column, channels: Column): Column =
    Bridge.column(PcmCanonExpr(Bridge.expression(payload),
      Bridge.expression(bits.cast("int")),
      Bridge.expression(channels.cast("int"))))
}
