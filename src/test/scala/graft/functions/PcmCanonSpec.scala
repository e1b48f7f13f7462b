package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13: the PCM canonicalization kernel (16-bit / stereo →
  * unsigned-8 mono) and the movi walk-cap attestation. The DuckDB
  * oracles replay both; these pin the kernel semantics directly. */
class PcmCanonSpec extends SparkSpec {

  private def le16(s: Int): Array[Byte] =
    Array((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte)

  test("8-bit mono is the identity (prior hashes unchanged)") {
    val b = Array.tabulate[Byte](257)(i => (i % 256).toByte)
    assert(Pcm.canonical(b, 1, 8, 1) eq b)
  }

  test("16-bit mono keeps the top byte of the unsigned-space sample") {
    // s8 ∈ 0..255 round-trips through s16 = s8·256 − 32768 (+ any
    // low byte): the generator identity behind dialog_h_16
    val pay = (0 until 256).flatMap(s8 =>
      le16(((s8 * 256 + 131) - 32768) & 0xFFFF)).toArray.map(_.toByte)
    val canon = Pcm.canonical(pay, 1, 16, 1)
    assert(canon.toSeq === (0 until 256).map(_.toByte))
  }

  test("stereo collapses to the floor channel mean") {
    // 8-bit: (L + R) / 2
    val b8 = Array[Byte](100, 105, 0, 255.toByte, 7, 8)
    assert(Pcm.canonical(b8, 1, 8, 2).toSeq ===
      Seq(102.toByte, 127.toByte, 7.toByte))
    // 16-bit stereo: mean in unsigned space, then the top byte
    val b16 = (le16((60 * 256 + 17 - 32768) & 0xFFFF) ++
      le16((61 * 256 + 91 - 32768) & 0xFFFF)).map(_.toByte)
    assert(Pcm.canonical(b16, 1, 16, 2).toSeq === Seq(60.toByte))
  }

  test("trailing partial sample frames drop; bad formats go empty") {
    val b = Array[Byte](1, 2, 3, 4, 5)
    assert(Pcm.canonical(b, 1, 16, 2).length === 1) // 5 bytes / bpf 4
    assert(Pcm.canonical(b, 1, 24, 1).length === 0) // fail-closed
    assert(Pcm.canonical(b, 1, 8, 3).length === 0)
    assert(Pcm.canonical(Array.emptyByteArray, 1, 16, 1).length === 0)
  }

  test("the Column expression matches the kernel through codegen") {
    import spark.implicits._
    val pay = (0 until 64).flatMap(i =>
      le16(((i * 4 * 256 + i) - 32768) & 0xFFFF)).toArray.map(_.toByte)
    val row = Seq((pay, 1, 16, 1)).toDF("p", "f", "b", "c")
      .select(Pcm.pcmCanonical(col("p"), col("f"), col("b"), col("c"))
        .as("k"))
      .head()
    assert(row.getAs[Array[Byte]]("k").toSeq ===
      Pcm.canonical(pay, 1, 16, 1).toSeq)
  }

  test("G.711 decode matches the published table values") {
    // the ITU formulas pinned against the canonical table entries
    assert(Pcm.ulaw(0x00) === -32124)
    assert(Pcm.ulaw(0xFF) === 0)
    assert(Pcm.ulaw(0x7F) === 0)
    assert(Pcm.ulaw(0x80) === 32124)
    assert(Pcm.alaw(0x55) === -8)
    assert(Pcm.alaw(0xD5) === 8)
    assert(Pcm.alaw(0x2A) === -32256)
    assert(Pcm.alaw(0xAA) === 32256)
    // canonicalization: u-law mono -> (linear + 32768) >> 8
    val mono = Array[Byte](0x00, 0xFF.toByte, 0x80.toByte)
    assert(Pcm.canonical(mono, 7, 8, 1).toSeq ===
      Seq(((-32124 + 32768) >> 8).toByte, (32768 >> 8).toByte,
        ((32124 + 32768) >> 8).toByte))
    // A-law stereo: unsigned-space channel mean then the top byte
    val st = Array[Byte](0x55, 0xD5.toByte) // -8 and +8 -> mean 0
    assert(Pcm.canonical(st, 6, 8, 2).toSeq === Seq((32768 >> 8).toByte))
    // G.711 is 8-bit by definition: 16-bit declarations fail closed
    assert(Pcm.canonical(mono, 7, 16, 1).length === 0)
    assert(Pcm.canonical(mono, 3, 8, 1).length === 0) // float PCM
  }

  test("float PCM decode: the integer rule IS floor(clamp(x)·32767)") {
    import java.lang.Float.floatToIntBits
    // the raw-bits integer kernel must agree with the mathematical
    // definition (double products of ≤ 39 mantissa bits are exact, so
    // floor over doubles is the ground truth here) across the whole
    // value shape: normals, denormals, clamp region, exact ±1, ties
    val probes = Seq(0.0f, -0.0f, 1.0f, -1.0f, 0.5f, -0.5f, 2.0f,
      -3.5f, 0.999999f, -0.999999f, 1e-10f, -1e-10f,
      java.lang.Float.MIN_VALUE, -java.lang.Float.MIN_VALUE,
      java.lang.Float.MAX_VALUE, -java.lang.Float.MAX_VALUE,
      Float.PositiveInfinity, Float.NegativeInfinity) ++
      (-40 to 40).map(k => (k * 817) / 32768.0f)
    probes.foreach { x =>
      val expect =
        math.floor(math.max(-1.0, math.min(1.0, x.toDouble)) * 32767.0).toInt
      assert(Pcm.f32ToV16(floatToIntBits(x)) === expect, s"x=$x")
    }
    assert(Pcm.f32ToV16(floatToIntBits(Float.NaN)) === 0)
    // spot pins (the oracle's CASE arms): exact ±1 clamp, the
    // half-tie floors, denormal sign asymmetry
    assert(Pcm.f32ToV16(0x3F800000) === 32767) //  1.0
    assert(Pcm.f32ToV16(0xBF800000) === -32767) // -1.0
    assert(Pcm.f32ToV16(0x3F000000) === 16383) //  0.5 -> floor(16383.5)
    assert(Pcm.f32ToV16(0xBF000000) === -16384) // -0.5 -> floor(-16383.5)
    assert(Pcm.f32ToV16(0x00000001) === 0) // +denormal
    assert(Pcm.f32ToV16(0x80000001) === -1) // -denormal
  }

  test("float PCM canonicalizes through the shared kernel") {
    def f32le(x: Float): Array[Byte] = {
      val u = java.lang.Float.floatToIntBits(x)
      Array(u, u >> 8, u >> 16, u >> 24).map(v => (v & 0xFF).toByte)
    }
    // k/32768 floats are exact; u16 = (k - (k>0)) + 32768, top byte
    val ks = Seq(100, -100, 60 * 256 + 100, -60 * 256 + 100)
    val pay = ks.flatMap(k => f32le(k / 32768.0f)).toArray
    assert(Pcm.canonical(pay, 3, 32, 1).toSeq === Seq(
      ((32768 + 99) >> 8).toByte, ((32768 - 100) >> 8).toByte,
      ((32768 + 60 * 256 + 99) >> 8).toByte,
      ((32768 - 60 * 256 + 100) >> 8).toByte))
    // stereo: unsigned-space mean of the two decoded channels
    val st = (f32le(0.5f) ++ f32le(-0.5f)).toArray
    assert(Pcm.canonical(st, 3, 32, 2).toSeq ===
      Seq((((16383 + 32768) + (-16384 + 32768)) / 2 >> 8).toByte))
    // float is 32-bit by definition here: anything else fails closed
    assert(Pcm.canonical(pay, 3, 16, 1).length === 0)
    assert(Pcm.canonical(pay, 3, 64, 1).length === 0)
  }

  test("walkComplete: natural end true, 4096-cap false, clamped") {
    def chunk(id: String, n: Int): Array[Byte] =
      id.getBytes("US-ASCII") ++
        Array[Byte]((n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte, 0, 0) ++
        Array.fill[Byte](n + (n & 1))(7)
    val three = chunk("aaaa", 3) ++ chunk("bbbb", 4) ++ chunk("cccc", 1)
    assert(Riff.walkComplete(three, 0, three.length))
    assert(Riff.walkComplete(three, 0, three.length + 50)) // clamped
    assert(Riff.walkComplete(three, three.length, three.length)) // empty
    assert(!Riff.walkComplete(three, -1, three.length)) // no attestation
    val wall = Array.fill(4100)(chunk("wwww", 2)).flatten.toArray
    assert(!Riff.walkComplete(wall, 0, wall.length)) // cap hit
    val exactly = Array.fill(4096)(chunk("xxxx", 2)).flatten.toArray
    assert(Riff.walkComplete(exactly, 0, exactly.length)) // boundary
  }
}
