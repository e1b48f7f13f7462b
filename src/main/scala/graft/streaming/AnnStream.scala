package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Ivf, IvfPq}

/** Online ANN serving: a stream of query vectors searches a PERSISTED
  * index per micro-batch, results land in a checkpointed sink — the
  * path that turns the batch ANN surface (s2p/s6) into a service.
  *
  * Shape: an ANN search needs a per-query top-k window and a
  * driver-side probe-cid collect (the static partition filter), so it
  * is not expressible as an incremental streaming plan. Each
  * micro-batch therefore runs the BATCH search inside `foreachBatch` —
  * the T10/observer pattern the ADS-B sink uses — which is exactly how
  * a serving tier works anyway: take the request batch, prune to its
  * probed clusters, scan only those codes, return the top-k. The
  * streaming layer adds checkpointed source offsets and an idempotent
  * sink on top.
  *
  * Idempotent replay: each epoch writes `outDir/batch_id=N` with
  * OVERWRITE — a replayed epoch (crash between sink write and offset
  * commit) rewrites the same directory with the same deterministic
  * results instead of appending duplicates: the parquet analog of the
  * JDBC sink's delete-then-insert epoch protocol (`Sinks.deleteBatch`).
  * Readers see a table partitioned by batch_id.
  *
  * Probe-side cost per micro-batch: one collect of ≤ nProbe·|batch|
  * cluster ids (index metadata scale) + a partition-pruned scan —
  * at 100 TB the scan reads nProbe/k of the corpus (codes only, for
  * IVF-PQ), never the full table, every batch.
  */
object AnnStream {

  /** Run `search` (a batch query-frame → result-frame function, e.g. a
    * [[Ivf.searchPersisted]] closure) over each micro-batch of
    * `queries` ((qid, qvec) rows). */
  def start(queries: DataFrame, outDir: String, checkpoint: String,
      backfill: Boolean = false)(
      search: DataFrame => DataFrame): StreamingQuery = {
    val w = queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        search(batch).write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$batchId")
        ()
      }
    (if (backfill) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Serve a persisted [[Ivf]] index (float vectors, pruned scan).
    * `corpusFilter` makes the serving tier a FILTERED-ANN service:
    * the predicate (over [[Ivf.persistWithPayload]] payload columns)
    * pre-filters inside every micro-batch's pruned scan. */
  def startIvf(queries: DataFrame, indexPath: String,
      codebook: Array[(Int, Array[Float], Double)],
      outDir: String, checkpoint: String,
      topK: Int = 5, nProbe: Int = 2,
      corpusFilter: org.apache.spark.sql.Column =
        org.apache.spark.sql.functions.lit(true)): StreamingQuery =
    start(queries, outDir, checkpoint) { batch =>
      Ivf.searchPersisted(batch.sparkSession, indexPath, codebook,
        batch, topK, nProbe, corpusFilter = corpusFilter)
    }

  /** Serve a persisted [[IvfPq]] index (compressed codes + pruned
    * scan — the production serving shape). Only `index`'s driver-side
    * quantizer metadata is used. `corpusFilter` as in [[startIvf]]. */
  def startIvfPq(queries: DataFrame, indexPath: String,
      index: IvfPq.Index, outDir: String, checkpoint: String,
      topK: Int = 5, nProbe: Int = 2,
      corpusFilter: org.apache.spark.sql.Column =
        org.apache.spark.sql.functions.lit(true)): StreamingQuery =
    start(queries, outDir, checkpoint) { batch =>
      IvfPq.searchPersisted(batch.sparkSession, indexPath, index,
        batch, topK, nProbe, corpusFilter = corpusFilter)
    }

  /** Serve RADIUS queries against a persisted [[Ivf]] index — s12's
    * range_search as a service: each micro-batch returns every
    * eligible vector with cosine ≥ `minSim` in its probed clusters
    * (the streaming dedup-against-index shape: "is anything in the
    * corpus within τ of this new vector?"). Same epoch-overwrite
    * idempotence; `corpusFilter` as in [[startIvf]]. */
  def startIvfRadius(queries: DataFrame, indexPath: String,
      outDir: String, checkpoint: String,
      minSim: Double, nProbe: Int = 2,
      corpusFilter: org.apache.spark.sql.Column =
        org.apache.spark.sql.functions.lit(true)): StreamingQuery =
    start(queries, outDir, checkpoint) { batch =>
      Ivf.searchRadiusAt(batch.sparkSession, indexPath,
        batch, minSim, nProbe, corpusFilter = corpusFilter)
    }
}
