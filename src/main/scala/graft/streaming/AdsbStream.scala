package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.adsb.{AdsbMsg, AdsbPipeline, FlightStateMachine, Sbs}
import graft.adsb.FlightStateMachine.{Out, State}

/** Structured Streaming twin of the batch pipeline (SURVEY.md §2.3).
  *
  * Replaces the reference's socket/thread/queue machinery
  * (`adsb_parser.py:94-145`, `adsb_logger.py:25-88`): Spark's
  * micro-batch scheduler owns backpressure; resilience is checkpoint +
  * query restart rather than 5×5 s socket retries. The stateful
  * operator is `flatMapGroupsWithState` over hexident, folding each
  * micro-batch through the SAME [[FlightStateMachine]] the batch path
  * uses, with an event-time timeout standing in for the 300 s
  * wall-clock prune (`flights.py:111-117`; see T2/T12 parity notes).
  *
  * Scale: state is shuffled by hexident (the natural key, ~thousands of
  * live aircraft per receiver — tiny state), and every downstream sink
  * write is an append of the micro-batch only.
  */
object AdsbStream {

  val WatermarkDelay = "10 seconds"

  /** Switch this session's streaming state store to RocksDB (round-5
    * verdict ask #7). The default provider holds every live key's
    * session state on the executor HEAP — fine for one receiver's
    * ~thousands of aircraft, an OOM risk at 100 TB key cardinality
    * (a global multi-receiver feed); RocksDB keeps state on local
    * disk with bounded memory and changelog-checkpoints to the
    * streaming checkpoint. Conf-gated rather than hardwired: the
    * provider is read when a query STARTS, so call this before
    * `start`/`startJdbc`/`sessionize(...).writeStream.start()`;
    * existing checkpoints written by the heap provider are not
    * migrated (start a fresh checkpoint when switching). */
  def useRocksDbStateStore(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")

  private def updateGroup(
      hexident: String,
      msgs: Iterator[AdsbMsg],
      state: GroupState[State]): Iterator[Out] = {
    import scala.collection.mutable.ArrayBuffer
    val outs = ArrayBuffer.empty[Out]
    if (msgs.isEmpty && state.hasTimedOut) {
      // 300 s of event-time silence: close the session (T2)
      state.getOption.foreach(outs += FlightStateMachine.flightRow(_))
      state.remove()
    } else {
      val sorted = msgs.toArray.sortBy(AdsbPipeline.orderKey)
      val st = FlightStateMachine.fold(state.getOption, sorted.iterator, outs)
      st match {
        case Some(s) =>
          state.update(s)
          // never at/behind the current watermark: a re-delivered old
          // capture tail (group event time ≫ MaxAgeSec behind the
          // watermark) would otherwise make setTimeoutTimestamp throw
          // and crash-loop the query through every restart
          state.setTimeoutTimestamp(math.max(
            s.lastSeenUs / 1000 + FlightStateMachine.MaxAgeSec * 1000,
            state.getCurrentWatermarkMs() + 1))
        case None => if (state.exists) state.remove()
      }
    }
    outs.iterator
  }

  /** Stateful sessionization of a (possibly streaming) message set.
    * `watermarked` = the input already carries its event-time
    * watermark (Spark forbids redefining one). */
  def sessionize(msgs: Dataset[AdsbMsg],
      watermarked: Boolean = false): Dataset[Out] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    (if (watermarked) msgs
     else msgs.withWatermark("gen_date_time", WatermarkDelay))
      .groupByKey(_.hexident)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateGroup)
  }

  /** Per-aircraft reorder buffer + session state for
    * [[sessionizeReordered]]: `pending` holds messages still above
    * the watermark (not yet safe to fold), `session` the open flight
    * session if any. */
  final case class ReorderState(pending: Seq[AdsbMsg],
      session: Option[State])

  private def updateGroupReordered(
      hexident: String,
      msgs: Iterator[AdsbMsg],
      state: GroupState[ReorderState]): Iterator[Out] = {
    import scala.collection.mutable.ArrayBuffer
    val prev = state.getOption.getOrElse(ReorderState(Nil, None))
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    // ripe = event time STRICTLY below the watermark instant: late
    // events are only guaranteed absent strictly below it (an event
    // AT the watermark can still legally arrive, and the watermark
    // has ms grain while events carry µs), so finality — folding the
    // ripe set in event order as the batch sessionizer's global sort
    // would — is claimed only where the contract actually gives it.
    // Strictness costs one extra trigger of buffering at the exact
    // boundary, never correctness (round-12 review).
    val (ripe, hold) = (prev.pending ++ msgs).partition(m =>
      FlightStateMachine.micros(m.gen_date_time) < wmUs)
    val outs = ArrayBuffer.empty[Out]
    var st = FlightStateMachine.fold(prev.session,
      ripe.sortBy(AdsbPipeline.orderKey).iterator, outs)
    // event-time expiry once the buffer is drained: close only when
    // the watermark is STRICTLY past last_seen + 300 s — a message
    // landing at exactly the 300 s boundary (gap == MaxAge, which
    // the fold KEEPS: its split rule is gap > MaxAge) can still
    // arrive at the watermark instant, and closing early would split
    // a session the batch fold keeps whole
    if (hold.isEmpty) st match {
      case Some(s)
          if wmUs > s.lastSeenUs +
            FlightStateMachine.MaxAgeSec * 1000000L =>
        outs += FlightStateMachine.flightRow(s)
        st = None
      case _ => ()
    }
    if (hold.isEmpty && st.isEmpty) {
      if (state.exists) state.remove()
    } else {
      state.update(ReorderState(hold, st))
      // wake exactly when something can HAPPEN (second-pass review:
      // wm+1 re-fired every buffered group on every watermark
      // advance — O(groups) state churn per trigger at fleet scale):
      // a buffered group at its OLDEST pending row's ripen point, a
      // bare session at its expiry point (the +1 ms makes the
      // ms-grain timeout STRICTLY past the µs-exact threshold
      // either way). Never at/behind the current watermark (the
      // setTimeoutTimestamp contract)
      val wmMs = wmUs / 1000
      val next =
        if (hold.nonEmpty)
          hold.map(m => FlightStateMachine.micros(m.gen_date_time))
            .min / 1000 + 1
        else st.map(s => (s.lastSeenUs +
          FlightStateMachine.MaxAgeSec * 1000000L) / 1000 + 1)
          .getOrElse(wmMs + 1)
      state.setTimeoutTimestamp(math.max(next, wmMs + 1))
    }
    outs.iterator
  }

  /** [[sessionize]] with a WATERMARK-BUFFERED reorder stage (round-12
    * verdict ask #5): messages are held in per-aircraft state until
    * the event-time watermark passes them, then folded in event
    * order — so input disorder BOUNDED BY THE WATERMARK DELAY
    * (including across micro-batch boundaries, which the per-batch
    * sort of [[sessionize]] cannot repair) yields byte-identical
    * output to the batch sessionizer's global sort. The trade is
    * latency: rows emit one watermark delay late. The in-order path
    * stays the default — the reference processes in arrival order
    * (T12), and this variant is the event-time upgrade for feeds
    * that genuinely interleave (multi-receiver aggregation at
    * scale). Gate: `adsb_stream_parity_ooo` replays the reference
    * capture with a deterministic bounded shuffle and DuckDB-diffs
    * the output against the batch dump. */
  def sessionizeReordered(msgs: Dataset[AdsbMsg],
      watermarked: Boolean = false): Dataset[Out] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    (if (watermarked) msgs
     else msgs.withWatermark("gen_date_time", WatermarkDelay))
      .groupByKey(_.hexident)
      .flatMapGroupsWithState(
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateGroupReordered)
  }

  /** Raw lines from a dump1090 TCP port (S1). */
  def socketLines(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Raw lines from a drop directory (S2 replay, streaming). */
  def fileLines(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)

  /** Wire the full ingest: lines → parse → sessionize → multi-sink.
    *
    * foreachBatch splits the tagged union into the four tables and
    * appends parquet; `positions_live` is the same positions batch
    * written into a date-partitioned copy whose old partitions a
    * retention sweep drops (S7's RULE pair re-expressed). Trigger
    * matches the reference's 1 s commit cadence (T11).
    *
    * `dedupReplays`: a reconnecting socket re-delivers the tail of the
    * previous capture (the reference re-processes it, duplicating
    * rows). Exact re-deliveries carry identical columns — streaming
    * `seq` is a content hash, not an arrival counter — so
    * `dropDuplicatesWithinWatermark` collapses them with state bounded
    * by the watermark delay. Off by default: batch/stream parity specs
    * compare against the reference's duplicate-keeping behavior.
    */
  def start(lines: DataFrame, outDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      dedupReplays: Boolean = false): StreamingQuery = {
    val parsed = Sbs.messages(lines)
    val msgs = if (dedupReplays)
      parsed.withWatermark("gen_date_time", WatermarkDelay)
        .dropDuplicatesWithinWatermark()
    else parsed
    sessionize(msgs, watermarked = dedupReplays).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Out], batchId: Long) =>
        val b = batch.cache()
        try {
          // IDEMPOTENT epoch protocol: every table is partitioned by
          // batch_id and each epoch dynamically OVERWRITES only its
          // own partition — a crash-replayed epoch (foreachBatch is
          // at-least-once) rewrites the same deterministic rows
          // instead of appending duplicates. The parquet analog of
          // startJdbc's delete-then-insert; without it, supervise()'s
          // restarts would be exactly what duplicates the tables.
          val df = b.toDF().withColumn("batch_id", lit(batchId))
          def w(d: org.apache.spark.sql.DataFrame, parts: Seq[String],
              path: String): Unit =
            d.write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy(parts: _*).parquet(path)
          w(df.where(col("kind") === "flight"), Seq("batch_id"),
            s"$outDir/flights")
          val pos = df.where(col("kind") === "position")
          w(pos, Seq("batch_id"), s"$outDir/positions")
          // day stays the FIRST partition level: retention
          // (prunePositionsLive) drops day directories wholesale
          w(pos.withColumn("day", to_date(col("time"))),
            Seq("day", "batch_id"), s"$outDir/positions_live")
          w(df.where(col("kind") === "landing"), Seq("batch_id"),
            s"$outDir/landings")
          w(df.where(col("kind") === "takeoff"), Seq("batch_id"),
            s"$outDir/takeoffs")
        } finally b.unpersist()
        ()
      }
      .start()
  }

  /** S6+T11 together: the reference's LIVE path — sessionized output
    * committed to a relational store once per micro-batch on the 1 s
    * trigger (`flights.py:119-131` commits its session each loop;
    * `db.py:24-38` holds the connection). Each batch appends only its
    * own rows, stamped with the micro-batch id, so the commit cadence
    * is auditable from the store itself: one distinct `batch_id` per
    * trigger that had data. Tables: `flights_live`, `positions_live`,
    * `events_live` (landing ∪ takeoff, tagged by `kind`).
    *
    * Idempotent under replay: `foreachBatch` is at-least-once (a crash
    * between the JDBC commit and the checkpoint commit re-runs the
    * epoch), so each table is first purged of the incoming `batch_id`
    * — the standard delete-before-insert keyed on the epoch. A retry
    * then converges to exactly-once instead of duplicating the
    * batch. */
  def startJdbc(lines: DataFrame, url: String, user: String,
      password: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    sessionize(Sbs.messages(lines)).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Out], batchId: Long) =>
        val b = batch.cache()
        try {
          val df = b.toDF().withColumn("batch_id", lit(batchId))
          val flights = df.where(col("kind") === "flight")
            .select(col("hexident"), col("session_start"),
              col("first_seen"), col("last_seen"), col("callsign"),
              col("n_positions"), col("batch_id"))
          val positions = df.where(col("kind") === "position")
            .select(col("hexident"), col("session_start"), col("time"),
              col("lon"), col("lat"), col("alt_m"), col("onground"),
              col("batch_id"))
          val events = df.where(
              col("kind") === "landing" || col("kind") === "takeoff")
            .select(col("kind"), col("hexident"), col("session_start"),
              col("time"), col("runway"), col("batch_id"))
          Seq("flights_live", "positions_live", "events_live").foreach(t =>
            graft.sources.Sinks.deleteBatch(url, t, user, password, batchId))
          graft.sources.Sinks.writeJdbc(flights, url, "flights_live",
            user, password)
          graft.sources.Sinks.writeJdbc(positions, url, "positions_live",
            user, password)
          graft.sources.Sinks.writeJdbc(events, url, "events_live",
            user, password)
        } finally b.unpersist()
        ()
      }
      .start()

  /** S1 resilience analog (`adsb_parser.py:120-137`): the reference
    * retries its TCP connect 5× with 1 s backoff; the Spark
    * equivalent is restarting the failed streaming query from its
    * checkpoint (exactly-once sinks make the restart transparent).
    * Runs `start` and, on query failure, restarts it up to
    * `attempts − 1` more times with `backoffMs` pause; rethrows once
    * the budget is exhausted. Returns when the query terminates
    * cleanly. */
  def supervise(attempts: Int = 5, backoffMs: Long = 1000)(
      start: () => StreamingQuery): Unit = {
    var remaining = attempts
    var done = false
    while (!done) {
      val q = start()
      try { q.awaitTermination(); done = true }
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          if (remaining <= 1) throw e
          remaining -= 1
          Thread.sleep(backoffMs)
      }
    }
  }

  /** S7 retention: drop `positions_live` day-partitions older than
    * `retentionDays` (partition drop ≫ row deletes at scale). */
  def prunePositionsLive(spark: SparkSession, outDir: String,
      retentionDays: Int = 1): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(s"$outDir/positions_live")
    if (fs.exists(root)) {
      val cutoff = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
        .minusDays(retentionDays.toLong)
      fs.listStatus(root).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("day=")) {
          val d = java.time.LocalDate.parse(name.stripPrefix("day="))
          if (d.isBefore(cutoff)) fs.delete(st.getPath, true)
        }
      }
    }
  }
}
