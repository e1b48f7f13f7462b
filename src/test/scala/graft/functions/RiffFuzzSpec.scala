package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fuzz for the chunk-walk kernel's hostile-input
  * contract (round-11): for ANY bytes and ANY start/end, `Riff.find`
  * must return without throwing, terminate, and — when it claims a
  * match — point inside the blob at bytes that actually spell the
  * target. FrameSums gets the same no-throw sweep (its guards are the
  * other half of the "a malformed header must not throw a task"
  * contract). Seeded PRNG: failures reproduce exactly. */
class RiffFuzzSpec extends AnyFunSuite {

  private val fourccs =
    Seq("fmt ", "data", "movi", "hdrl", "WAVE", "avih")
      .map(Riff.pack4cc)

  test("find never throws, always terminates, matches are in-bounds") {
    val rnd = new scala.util.Random(0x5217)
    val adversarial = Seq[Array[Byte]](
      // huge/negative-ish declared LE sizes
      "RIFF".getBytes ++ Array[Byte](-1, -1, -1, -1) ++
        "WAVEfmt ".getBytes ++ Array[Byte](-1, -1, -1, -1) ++
        Array.fill[Byte](16)(7),
      "RIFF".getBytes ++ Array[Byte](-1, -1, -1, 127) ++
        "WAVEdata".getBytes ++ Array[Byte](0, 0, 0, -128) ++
        Array.fill[Byte](8)(1),
      // zero-size chunks: the walk must still advance (8 + 0 + pad)
      "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes ++
        Array.fill[Byte](64)(0),
      Array.fill[Byte](24)(0),
      Array.emptyByteArray)
    val cases = adversarial ++ (0 until 4000).map { i =>
      val n = rnd.nextInt(300)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      if (i % 3 == 0 && n >= 4) "RIFF".getBytes ++ b.drop(4) else b
    }
    cases.foreach { b =>
      Seq((-64, 64), (0, Int.MaxValue), (12, b.length),
          (rnd.nextInt(400) - 50, rnd.nextInt(400) - 50)).foreach {
        case (start, end) =>
          fourccs.foreach { t =>
            Seq(false, true).foreach { forms =>
              val r = Riff.find(b, start, end, t, forms)
              if (r != -1L) {
                val off = (r >>> 32).toInt
                assert(off >= 0 && off <= b.length,
                  s"off $off len ${b.length}")
                def word(p: Int): Int =
                  if (p >= 0 && p + 4 <= b.length)
                    ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) |
                      ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
                  else -1
                // forms=false: id is 8 bytes before the data offset;
                // forms=true: the form word sits AT the data offset
                assert(if (forms) word(off) == t else word(off - 8) == t,
                  s"match at $off (forms=$forms) spells wrong target")
              }
            }
          }
      }
    }
  }

  test("FrameSums.compute never throws on hostile geometry") {
    val rnd = new scala.util.Random(0xF5A3)
    val edges = Seq(Int.MinValue, -1, 0, 1, 7, Int.MaxValue - 3,
      Int.MaxValue)
    (0 until 2000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(256)); rnd.nextBytes(b)
      def pick() = if (rnd.nextBoolean()) edges(rnd.nextInt(edges.size))
        else rnd.nextInt(600) - 100
      val (off, fs, st) = (pick(), pick(), pick())
      val r = FrameSums.compute(b, off, fs, st, energy = false)
      val e = FrameSums.compute(b, off, fs, st, energy = true)
      assert(r != null && e.length == r.length)
      // every emitted frame must have fit entirely inside the blob
      if (r.nonEmpty)
        assert(off >= 0 && fs > 0 && st > 0 &&
          off.toLong + (r.length - 1).toLong * st + fs <= b.length)
    }
  }
}
