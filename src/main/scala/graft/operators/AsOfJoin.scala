package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-preceding) join.
  *
  * For every left row, attach the LATEST right row whose time is ≤ the
  * left row's time within the same key — the time-series enrichment
  * primitive (event→session attribution, price as of trade time,
  * latest metadata snapshot per example). Not in the reference's SQL
  * surface; listed in SURVEY §2.5 as a beyond-parity operator the
  * platform should own.
  *
  * Scale shape: both sides are tagged and unioned, shuffled ONCE by
  * key, and resolved with a single ordered window pass
  * (`last(payload, ignoreNulls)` over rows-unbounded-preceding) — an
  * inequality join would instead build a per-key cross product and
  * filter it. Equal timestamps match (the right row sorts before the
  * left row at the same instant). If several right rows share one
  * (key, time), the survivor among them is tie-broken by the payload
  * struct's field order; give the right side unique times if that
  * matters.
  */
object AsOfJoin {

  /** `left ⟕asof right` on `leftKey = rightKey`,
    * `right[rightTime] <= left[leftTime]`. `payload` names the
    * right-side columns to carry; they arrive in a struct column
    * `asofCol`, NULL when no right row precedes (left-join
    * semantics). The payload struct doubles as the deterministic
    * tie-break among duplicate (key, time) right rows, so every
    * payload column must be ORDERABLE (no map columns — Spark
    * rejects the window's ORDER BY at analysis time; wrap a map as
    * sorted entries or exclude it from the payload). */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      asofCol: String = "asof"): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val payloadStruct = struct(payload.map(col): _*)
    val leftType = left.select(leftStruct).schema.head.dataType
    val payloadType = right.select(payloadStruct).schema.head.dataType

    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      leftStruct.as("__l"), lit(null).cast(payloadType).as("__p"))
    // A NULL rightTime can never satisfy rightTime <= leftTime, but the
    // ascending nulls-first sort would place such a row before every
    // genuine one and let its payload leak into left rows that have no
    // preceding match — drop them up front.
    val r = right.where(col(rightTime).isNotNull).select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(leftType).as("__l"), payloadStruct.as("__p"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__l.*"), col("__match").as(asofCol))
  }
}
