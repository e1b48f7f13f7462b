package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered path aggregation and GeoJSON emission.
  *
  * Re-expresses `flight_path` / `flight_path_geojson` / `flight_paths`
  * (dump1090-postgis `database/sql/create_public_schema.sql:207-257`):
  * `st_makeline(st_force2d(coordinates) ORDER BY time)` becomes a
  * per-key `collect_list` of (time, x, y) structs made deterministic by
  * `array_sort` (Pg guarantees aggregate ORDER BY; Spark's collect_list
  * does not — sorting the structs restores the guarantee), and
  * `ST_AsGeoJSON` becomes string construction from printf-formatted
  * coordinates.
  *
  * Scale design: one shuffle on the key with partial aggregation;
  * per-key path size is bounded by session length, not table size, so
  * collect_list buffers stay small. The set-returning `flight_paths
  * (ids[])` fan-out is an `explode` + broadcast-joinable semi-filter,
  * not a per-id loop.
  */
object Paths {

  /** (key, pts) with pts = array<struct<t, o, x, y>> sorted by (t, o). */
  def pathPoints(
      df: DataFrame,
      keyCol: Column,
      timeCol: Column,
      orderTieBreak: Column,
      xCol: Column,
      yCol: Column): DataFrame =
    df.groupBy(keyCol.as("key"))
      .agg(array_sort(collect_list(struct(
        timeCol.cast("timestamp").as("t"),
        orderTieBreak.as("o"),
        xCol.cast("double").as("x"),
        yCol.cast("double").as("y")))).as("pts"))

  /** GeoJSON LineString from a sorted pts array, with fixed decimal
    * precision (ST_AsGeoJSON(geom, precision) analog,
    * `create_public_schema.sql:229`). */
  def lineStringGeoJson(pts: Column, precision: Int): Column =
    concat(
      lit("{\"type\":\"LineString\",\"coordinates\":["),
      array_join(
        transform(pts, p => format_string(
          s"[%.${precision}f,%.${precision}f]", p("x"), p("y"))),
        ","),
      lit("]}"))

  /** Per-key GeoJSON path table: (key, path). */
  def pathGeoJson(
      df: DataFrame,
      keyCol: Column,
      timeCol: Column,
      orderTieBreak: Column,
      xCol: Column,
      yCol: Column,
      precision: Int = 6): DataFrame =
    pathPoints(df, keyCol, timeCol, orderTieBreak, xCol, yCol)
      .select(col("key"), lineStringGeoJson(col("pts"), precision).as("path"))

  /** `flight_paths(ids[])` — explode the requested id list and join the
    * (already aggregated) paths; a Generator-shaped op done natively. */
  def fanout(ids: Seq[Long], paths: DataFrame): DataFrame = {
    val spark = paths.sparkSession
    import spark.implicits._
    val idDf = ids.toDF("key")
    idDf.join(paths, Seq("key"), "inner")
  }
}
