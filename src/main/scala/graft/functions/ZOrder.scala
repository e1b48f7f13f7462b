package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve over WGS-84 lon/lat.
  *
  * The reference spatially indexes positions with a PostGIS GiST index
  * (`database/sql/create_public_schema.sql:783-793`); an index data
  * structure has no Spark analog, but its *effect* — bbox queries that
  * touch only spatially-near data — is reproduced at scale by
  * clustering the table on a space-filling curve: rows near each other
  * on Earth land in the same parquet files, so per-file lon/lat
  * min/max statistics prune bbox scans the way the GiST index prunes
  * heap pages.
  *
  * The z-value is a pure column expression (quantize → interleave bits
  * via shift/or) that stays inside whole-stage codegen — no UDF.
  */
object ZOrder {

  /** Bits per dimension; 2·Bits must fit a long comfortably. */
  val Bits = 16

  private def quantize(c: Column, min: Double, max: Double): Column = {
    val scale = ((1L << Bits) - 1) / (max - min)
    // clamp, then scale to [0, 2^Bits)
    least(greatest(c, lit(min)), lit(max))
      .minus(lit(min)).multiply(lit(scale)).cast("long")
  }

  /** Interleave the low `Bits` bits of lon (even positions) and lat
    * (odd positions) quantized over their WGS-84 ranges. */
  def zValue(lon: Column, lat: Column): Column = {
    val lonQ = quantize(lon, -180.0, 180.0)
    val latQ = quantize(lat, -90.0, 90.0)
    (0 until Bits).foldLeft(lit(0L)) { (acc, b) =>
      val lonBit = shiftleft(shiftright(lonQ, b).bitwiseAND(1L), 2 * b)
      val latBit = shiftleft(shiftright(latQ, b).bitwiseAND(1L), 2 * b + 1)
      acc.bitwiseOR(lonBit).bitwiseOR(latBit)
    }
  }
}
