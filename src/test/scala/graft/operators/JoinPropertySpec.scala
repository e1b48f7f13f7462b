package graft.operators

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized cross-checks of the time-series joins against naive
  * in-memory reference implementations — seeded, so deterministic.
  * Integer-second times force plenty of equal-timestamp collisions,
  * the edge the window/bin shapes must get right. */
class JoinPropertySpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new Random(42)
  private def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  // (id, key, time-seconds)
  private val leftRows = (1 to 300).map { i =>
    (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(120))
  }
  // (payload-id, key, time-seconds) — payload-id doubles as tiebreak
  private val rightRows = (1 to 300).map { i =>
    (1000L + i, rnd.nextInt(8).toLong, rnd.nextInt(120))
  }

  test("asOf matches the naive nearest-preceding scan on random data") {
    val l = leftRows.map { case (id, k, s) => (id, k, t(s)) }
      .toDF("lid", "k", "lt")
    val r = rightRows.map { case (id, k, s) => (id, k, t(s)) }
      .toDF("rid", "rk", "rt")
    val got = AsOfJoin.asOf(l, r, "k", "rk", "lt", "rt", Seq("rid", "rt"))
      .select(col("lid"), col("asof.rid"))
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap

    // naive: per left row, the right row of the same key with the
    // greatest time <= left time; ties by greatest payload (the
    // window orders (__t, __side, __p) and takes the last)
    val byKey = rightRows.groupBy(_._2)
    val want = leftRows.map { case (id, k, ls) =>
      val cands = byKey.getOrElse(k, Nil).filter(_._3 <= ls)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(c => (c._3, c._1))._1))
    }.toMap
    assert(got === want)
  }

  test("pointInInterval matches the naive BETWEEN scan on random data") {
    val points = leftRows.map { case (id, k, s) => (id, k, t(s)) }
      .toDF("pid", "pk", "pt")
    // intervals of random (possibly zero) length
    val ivs = rightRows.map { case (id, k, s) =>
      (id, k, t(s), t(s + rnd.nextInt(30)))
    }
    val intervals = ivs.toDF("iid", "ik", "start_t", "end_t")
    for (binSec <- Seq(7L, 60L)) { // bin width must not affect results
      val got = RangeJoin.pointInInterval(points, intervals,
          "pk", "ik", "pt", "start_t", "end_t", binSec)
        .select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pid, pk, ps) <- leftRows
        (iid, ik, st, en) <- ivs
        if ik == pk && t(ps).getTime >= st.getTime &&
          t(ps).getTime <= en.getTime
      } yield (pid, iid)).toSet
      assert(got === want, s"binSec=$binSec")
    }
  }
}
