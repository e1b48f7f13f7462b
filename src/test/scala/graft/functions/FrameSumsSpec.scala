package graft.functions

import graft.SparkSpec
import graft.adsb.Meta
import org.apache.spark.sql.functions._

/** FrameSums kernel pins: bit-equality against the round-9 hex/conv
  * declarative formulation it replaced (on the bundled media fixtures
  * AND adversarial shapes), plus the complete-frame/empty contracts
  * the query guards rely on. */
class FrameSumsSpec extends SparkSpec {

  private def oldEnergies(hx: String, nFrames: String) =
    expr(s"""transform(sequence(0, $nFrames - 1), f ->
      |  aggregate(sequence(0, 63), 0L, (acc, i) ->
      |    acc + (cast(conv(substr($hx, (f*64 + i)*2 + 1, 2), 16, 10)
      |             AS bigint) - 128L)
      |        * (cast(conv(substr($hx, (f*64 + i)*2 + 1, 2), 16, 10)
      |             AS bigint) - 128L)))""".stripMargin)

  test("energy lattice ≡ the hex/conv formulation on the PCM fixtures") {
    val bin = Meta.loadMediaFiles(spark, Meta.mediaDir(), "pcm")
    val both = bin.withColumn("hx", hex(col("content")))
      .withColumn("n_frames", floor(col("length") / 64).cast("int"))
      .select(col("model"),
        oldEnergies("hx", "n_frames").as("old"),
        FrameSums.frameEnergies(col("content"), lit(0), lit(64)).as("nw"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), r.getString(0))
    }
  }

  test("byte-sum lattice ≡ the hex/conv formulation on the GVID fixtures") {
    val bin = Meta.loadMediaFiles(spark, Meta.mediaDir(), "gvid")
    val both = bin.withColumn("hx", hex(col("content")))
      .withColumn("frame_size", expr(
        "cast(conv(substr(hx, 11, 2) || substr(hx, 9, 2), 16, 10) AS int)"))
      .withColumn("n_frames", expr(
        "cast(conv(substr(hx, 15, 2) || substr(hx, 13, 2), 16, 10) AS int)"))
      .select(col("model"),
        expr("""transform(sequence(0, n_frames - 1), f ->
          |  aggregate(sequence(0, frame_size - 1), 0L, (acc, i) ->
          |    acc + cast(conv(substr(hx,
          |      (8 + f*frame_size + i)*2 + 1, 2), 16, 10) AS bigint)))"""
          .stripMargin).as("old"),
        FrameSums.frameByteSums(col("content"), lit(8), col("frame_size"))
          .as("nw"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), r.getString(0))
    }
  }

  test("adversarial shapes: offsets, ragged tails, sign, empties") {
    import spark.implicits._
    // bytes 0..255 then a ragged 3-byte tail at frame size 16
    val b = (0 until 256).map(_.toByte).toArray ++ Array[Byte](1, 2, 3)
    val df = Seq((1, b)).toDF("id", "content")
    val r = df.select(
      FrameSums.frameByteSums(col("content"), lit(0), lit(16)).as("s0"),
      FrameSums.frameByteSums(col("content"), lit(5), lit(16)).as("s5"),
      FrameSums.frameEnergies(col("content"), lit(0), lit(16)).as("e0"),
      FrameSums.frameByteSums(col("content"), lit(0), lit(0)).as("z"),
      FrameSums.frameByteSums(col("content"), lit(1000), lit(16)).as("past"))
      .head()
    val bytes = b.map(_ & 0xFF)
    def sums(off: Int, fs: Int, energy: Boolean): Seq[Long] = {
      val n = (bytes.length - off) / fs
      (0 until n).map { f =>
        bytes.slice(off + f * fs, off + (f + 1) * fs)
          .map(v => if (energy) { val d = v - 128; (d * d).toLong }
            else v.toLong).sum
      }
    }
    assert(r.getSeq[Long](0) === sums(0, 16, energy = false)) // 16 frames
    assert(r.getSeq[Long](0).length === 16) // ragged tail dropped
    assert(r.getSeq[Long](1) === sums(5, 16, energy = false))
    assert(r.getSeq[Long](2) === sums(0, 16, energy = true))
    assert(r.getSeq[Long](3) === Seq.empty) // frame_size 0: empty, no throw
    assert(r.getSeq[Long](4) === Seq.empty) // offset past end
    // signedness: byte 0x80.. must read as 128..255, never negative
    assert(r.getSeq[Long](0).forall(_ >= 0))
  }

  test("strided walk: chunked frames, overlap, and tail exclusion") {
    import spark.implicits._
    val b = (0 until 64).map(_.toByte).toArray
    val df = Seq((1, b)).toDF("id", "content")
    val r = df.select(
      // AVI-shaped: 8-byte frames at stride 12 (4-byte headers skipped)
      FrameSums.frameByteSums(col("content"), lit(0), lit(8), lit(12))
        .as("chunked"),
      // overlapping windows: stride < frame size is a legal sliding
      // lattice (stride 4, frame 8)
      FrameSums.frameByteSums(col("content"), lit(0), lit(8), lit(4))
        .as("sliding"),
      // stride = frame: must equal the 3-arg contiguous form
      FrameSums.frameByteSums(col("content"), lit(2), lit(8), lit(8))
        .as("explicit"),
      FrameSums.frameByteSums(col("content"), lit(2), lit(8))
        .as("contiguous"))
      .head()
    def manual(off: Int, fs: Int, st: Int): Seq[Long] = {
      val n = if (off + fs > b.length) 0
        else (b.length - off - fs) / st + 1
      (0 until n).map(f =>
        (0 until fs).map(i => (b(off + f * st + i) & 0xFF).toLong).sum)
    }
    assert(r.getSeq[Long](0) === manual(0, 8, 12))
    assert(r.getSeq[Long](0).length === 5) // frame 5 would need byte 67
    assert(r.getSeq[Long](1) === manual(0, 8, 4))
    assert(r.getSeq[Long](1).length === 15)
    assert(r.getSeq[Long](2) === r.getSeq[Long](3))
  }

  test("null blob propagates null (no task crash)") {
    import spark.implicits._
    val df = Seq((1, Option.empty[Array[Byte]])).toDF("id", "content")
    val r = df.select(FrameSums.frameByteSums(col("content"), lit(0),
      lit(16)).as("s")).head()
    assert(r.isNullAt(0))
  }
}
