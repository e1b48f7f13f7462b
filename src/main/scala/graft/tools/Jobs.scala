package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Deterministic cost probe: per query, the number of Spark JOBS,
  * STAGES and TASKS plus summed task run/CPU time — the scheduling-
  * overhead mechanism measurement that survives host noise (wall
  * seconds at this SF swing ±40% run to run; task counts are exact).
  * Reads SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR like Bench. */
object Jobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong; val runMs = new AtomicLong
    val cpuNs = new AtomicLong
    val verbose = sys.env.contains("JOBS_VERBOSE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val names = e.stageInfos.map(_.name.takeWhile(_ != '\n').take(60))
            .mkString(" | ")
          val n = e.stageInfos.map(_.numTasks).sum
          println(s"[job] tasks=$n :: $names")
        }
        ()
      }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          cpuNs.addAndGet(m.executorCpuTime)
        }
        ()
      }
    })
    def drain(): Unit = org.apache.spark.sql.graftbridge.Bridge
      .drainListenerBus(spark.sparkContext)
    val names = args.toSeq
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => names.isEmpty || names.contains(q._1))
      .foreach { case (n, f) =>
        // one unmeasured warm run (memoized indexes/dicts build here)
        try f(spark, sfDir).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
        drain()
        val (j0, s0, t0, r0, c0) = (jobs.get, stages.get, tasks.get,
          runMs.get, cpuNs.get)
        val w0 = System.nanoTime()
        try {
          f(spark, sfDir).queryExecution.toRdd.count()
          val wall = (System.nanoTime() - w0) / 1e9
          drain()
          println(f"[jobs] $n jobs=${jobs.get - j0} " +
            f"stages=${stages.get - s0} tasks=${tasks.get - t0} " +
            f"taskRunSec=${(runMs.get - r0) / 1e3}%.2f " +
            f"taskCpuSec=${(cpuNs.get - c0) / 1e9}%.2f wall=$wall%.2f")
        } catch { case e: Throwable =>
          println(s"[jobs] $n FAILED: ${e.toString.take(300)}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
