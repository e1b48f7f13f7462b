package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Sinks

/** Z-order curve: bit-interleave correctness and the physical payoff —
  * spatially clustered files cover tight lon/lat boxes. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zValue interleaves quantized lon/lat bits") {
    // lon = -180 quantizes to 0, lon = 180 to 2^16-1; same for lat.
    val rows = Seq(
      (-180.0, -90.0), // both 0 → z = 0
      (180.0, 90.0),   // both all-ones → z = 2^32 - 1
      (180.0, -90.0)   // lon ones on even positions only → 0x55555555
    ).toDF("lon", "lat")
    val z = rows.select(ZOrder.zValue(col("lon"), col("lat")).as("z"))
      .collect().map(_.getLong(0))
    assert(z(0) === 0L)
    assert(z(1) === (1L << 32) - 1)
    assert(z(2) === 0x55555555L)
  }

  test("zValue orders nearby points together") {
    // two tight clusters far apart: all intra-cluster z-distances must
    // be smaller than every inter-cluster z-distance
    val pts = Seq(
      ("a1", 1.40, 47.15), ("a2", 1.41, 47.16), ("a3", 1.42, 47.14),
      ("b1", -120.0, -33.0), ("b2", -119.9, -33.1))
      .toDF("id", "lon", "lat")
    val z = pts.select(col("id"), ZOrder.zValue(col("lon"), col("lat")).as("z"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val intraA = for (x <- Seq("a1", "a2", "a3"); y <- Seq("a1", "a2", "a3"))
      yield math.abs(z(x) - z(y))
    val inter = for (x <- Seq("a1", "a2", "a3"); y <- Seq("b1", "b2"))
      yield math.abs(z(x) - z(y))
    assert(intraA.max < inter.min)
  }

  test("spatially clustered files cover tight lon/lat boxes") {
    // grid of points over a wide area, written unclustered vs z-clustered:
    // the per-file lon span must shrink materially
    val pts = (for (i <- 0 until 40; j <- 0 until 40)
      yield (i * 40 + j, -20.0 + i * 0.5, 30.0 + j * 0.5))
      .toDF("id", "lon", "lat")

    val flat = Files.createTempDirectory("graft-flat").toString
    pts.repartition(8).write.mode("overwrite").parquet(flat)
    val clustered = Files.createTempDirectory("graft-zord").toString
    Sinks.writeSpatialClustered(pts, clustered, "lon", "lat", partitions = 8)

    // z-order shrinks the 2-D box, not one axis in isolation: compare
    // mean per-file bbox AREA (lon span × lat span)
    def meanFileBoxArea(path: String): Double = {
      val areas = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max(col("lon")) - min(col("lon"))) *
          (max(col("lat")) - min(col("lat")))).as("area"))
        .collect().map(_.getDouble(1))
      areas.sum / areas.length
    }
    assert(meanFileBoxArea(clustered) < meanFileBoxArea(flat) / 4)
  }
}
