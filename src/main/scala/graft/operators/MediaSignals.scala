package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest MEDIA SIGNAL tables — the media twin of [[NearDupIndex]]
  * (round-15, VERDICT r14 ask #2): the production shape computes
  * perceptual signals ONCE at ingest and serves every downstream
  * consumer from the persisted tables, instead of re-walking
  * containers and re-decoding frames per query. Two tables, one
  * store:
  *
  *  - `frames`: the per-frame perceptual-hash lattice
  *    (model, frame_idx, ahash_hi, ahash_lo) — the mm19 grain;
  *  - `segs`: the per-VAD-segment audio fingerprints
  *    (model, seg_id, n_frames_seg, fp_lo, fp_hi) — the mm21 grain.
  *
  * The raw derivation pipelines (container walk → decode → hash /
  * energy → segment → contour) stay alive as the BUILD path and as
  * their own oracle-gated queries; the store is what the composite
  * consumers (mm22's container-pair verdicts, a streaming verdict
  * leg) read.
  *
  * Lifecycle discipline (the [[NearDupIndex]] contract, applied to
  * media): pipeline PARAMETERS persist in a `meta` sidecar at build
  * time and are VERIFIED on every append — signals hashed on a
  * different grid or segmented under different VAD constants are
  * incomparable, and mixing them would corrupt every containment
  * readout silently. Appends must also be MODEL-DISJOINT from the
  * store (a container ingests once; re-ingesting would double its
  * signal sets and skew every size-normalized containment) — checked
  * with one pruned column scan + limit(1) short-circuit per append.
  * Append ≡ rebuild bit-for-bit (the d10a oracle discipline): the
  * store-served gate rows replay against blob-derived oracles, so
  * any drift between ingest-time signals and fresh derivation turns
  * the gate red.
  *
  * Scale shape: both tables stride-partition on a model hash
  * (`pb = xxhash64(model) mod strides`), so an append touches only
  * its models' stride directories (bounded files per batch —
  * repartitioned before the partitionBy write, the tiny-file rule),
  * and a per-container lookup prunes to one stride. The serving
  * joins are signature equi-joins that shuffle (model, 2×long) rows
  * — never blob bytes; at 100 TB the tables bucket by signature for
  * co-located containment joins, and
  * [[IndexMaintenance.compactPersisted]] collapses append growth
  * (the layout is first-level `pb=` directories, which is exactly
  * what it compacts). */
object MediaSignals {

  /** The pipeline constants the signals were derived under — ONE
    * declared home; bumping any of them is a schema change that
    * forces a store rebuild (the meta check makes that loud). */
  val SchemaVersion = 1
  val AHashGrid = 8
  val SegMinFrames = 8
  val SilenceCut = 4096L
  val Strides = 8

  private def pb = pmod(xxhash64(col("model")), lit(Strides))

  private val frameCols = Seq("model", "frame_idx", "ahash_hi", "ahash_lo")
  private val segCols =
    Seq("model", "seg_id", "n_frames_seg", "fp_lo", "fp_hi")

  /** Same session-scoped parameter memo as [[NearDupIndex]]:
    * immutable after build, so streaming consumers never pay a
    * per-batch meta read. */
  private val metaMemo =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Int, Int, Int, Long)]()

  private def writeMeta(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    Seq((SchemaVersion, AHashGrid, SegMinFrames, SilenceCut))
      .toDF("schema_version", "ahash_grid", "seg_min_frames",
        "silence_cut")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    metaMemo.put(path, (SchemaVersion, AHashGrid, SegMinFrames,
      SilenceCut))
  }

  private def requireMeta(spark: SparkSession, path: String,
      op: String): Unit = {
    val (v, g, mf, sc) = metaMemo.computeIfAbsent(path, _ => {
      val r =
        try spark.read.parquet(s"$path/meta")
          .select(col("schema_version"), col("ahash_grid"),
            col("seg_min_frames"), col("silence_cut")).head()
        catch { case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalStateException(
            s"media signal store at $path has no meta/ — not built by " +
              s"MediaSignals.build (cannot $op safely)", e)
        }
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3))
    })
    require(v == SchemaVersion && g == AHashGrid && mf == SegMinFrames &&
      sc == SilenceCut,
      s"media signal store parameter mismatch on $op at $path: store " +
        s"has (version=$v, grid=$g, minFrames=$mf, silence=$sc), this " +
        s"engine derives (version=$SchemaVersion, grid=$AHashGrid, " +
        s"minFrames=$SegMinFrames, silence=$SilenceCut) — rebuild the " +
        "store")
  }

  private def writeTable(df: DataFrame, cols: Seq[String], dir: String,
      mode: String): Unit =
    df.select(cols.map(col): _*).withColumn("pb", pb)
      .repartition(col("pb"))
      .write.mode(mode).partitionBy("pb").parquet(dir)

  private val frameSchema = org.apache.spark.sql.types.StructType(
    Seq("model" -> "string", "frame_idx" -> "bigint",
      "ahash_hi" -> "bigint", "ahash_lo" -> "bigint")
      .map { case (n, t) => org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.DataType.fromDDL(t)) })

  private val segSchema = org.apache.spark.sql.types.StructType(
    Seq("model" -> "string", "seg_id" -> "bigint",
      "n_frames_seg" -> "bigint", "fp_lo" -> "bigint",
      "fp_hi" -> "bigint")
      .map { case (n, t) => org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.DataType.fromDDL(t)) })

  /** An EMPTY table (a silent video corpus has no segs; a build may
    * legitimately see zero of one signal kind) leaves no
    * schema-bearing parquet files — read it as a typed empty frame
    * instead of failing schema inference. */
  private def readTable(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)
    def hasData(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(p) && fs.listStatus(p).exists(st =>
        (st.isDirectory && !st.getPath.getName.startsWith("_") &&
          hasData(st.getPath)) ||
        (st.isFile && st.getPath.getName.startsWith("part-")))
    if (!hasData(new org.apache.hadoop.fs.Path(dir)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(dir)
      .select(schema.fieldNames.map(col): _*)
  }

  /** Build the store from freshly derived signal frames. Either
    * table may be empty for a corpus slice (a silent video corpus
    * has no segs); reads and appends handle the fileless table. */
  def build(spark: SparkSession, path: String, frames: DataFrame,
      segs: DataFrame): Unit = {
    writeMeta(spark, path)
    writeTable(frames, frameCols, s"$path/frames", "overwrite")
    writeTable(segs, segCols, s"$path/segs", "overwrite")
  }

  /** Append a new batch of containers' signals: parameters verified,
    * batch models must be disjoint from stored models (both signal
    * kinds count — a container ingests ONCE, with whatever signals
    * it has). Per-append cost scales with the batch, never the
    * store (the model check ships only model strings through a
    * distinct + limit(1)). */
  def append(spark: SparkSession, path: String, frames: DataFrame,
      segs: DataFrame): Unit = {
    requireMeta(spark, path, "append")
    val batchModels = frames.select(col("model"))
      .unionByName(segs.select(col("model"))).distinct()
    val stored = readTable(spark, s"$path/frames", frameSchema)
      .select(col("model"))
      .unionByName(readTable(spark, s"$path/segs", segSchema)
        .select(col("model")))
      .distinct()
    val overlap = stored.join(batchModels, Seq("model")).limit(1).count()
    require(overlap == 0L,
      s"media signal store append at $path: batch models overlap " +
        "models already in the store (a container ingests once; " +
        "re-ingest requires delete + compact first)")
    writeTable(frames, frameCols, s"$path/frames", "append")
    writeTable(segs, segCols, s"$path/segs", "append")
  }

  /** mm22's containment PAIR LEG over a (model, h1, h2) signature
    * frame — ONE home (round-15) shared by the batch verdict table
    * and the streaming matcher, so the hot cap (64) and the ppm cut
    * can never drift between them: hot signatures drop from both
    * intersection and sizes, pairs materialize only through shared
    * signatures (inverted-index equi-join, never all-pairs), and
    * containment = 10⁶·|∩| / min(|A|,|B|). */
  def containmentLeg(sigs0: DataFrame, shared: String,
      cont: String): DataFrame = {
    // share the SIGNATURE frame, not the hot-filtered one: the
    // hot-set aggregation and the anti-join both consume it
    val sigs = Dedup.share(sigs0)
    val hot = sigs.groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("_n")).where(col("_n") > 64)
      .select(col("h1"), col("h2"))
    val kept = sigs.join(hot, Seq("h1", "h2"), "left_anti")
    val sizes = kept.groupBy(col("model"))
      .agg(count(lit(1)).as("_ns"))
    kept.select(col("model").as("model_a"), col("h1"), col("h2"))
      .join(kept.select(col("model").as("model_b"), col("h1"),
        col("h2")), Seq("h1", "h2"))
      .where(col("model_a") < col("model_b"))
      .groupBy(col("model_a"), col("model_b"))
      .agg(count(lit(1)).as(shared))
      .join(sizes.select(col("model").as("model_a"),
        col("_ns").as("_na")), Seq("model_a"))
      .join(sizes.select(col("model").as("model_b"),
        col("_ns").as("_nb")), Seq("model_b"))
      .select(col("model_a"), col("model_b"), col(shared),
        expr(s"(1000000L * $shared) div least(_na, _nb)").as(cont))
  }

  /** The mm22 verdict merge: full-outer the two modality legs and
    * class each pair at the 10⁶ containment cut. Unordered — callers
    * add their presentation sort. */
  def verdictMerge(vleg: DataFrame, aleg: DataFrame): DataFrame =
    vleg.join(aleg, Seq("model_a", "model_b"), "full_outer")
      .select(col("model_a"), col("model_b"),
        coalesce(col("v_shared"), lit(0L)).as("v_shared"),
        coalesce(col("v_cont_ppm"), lit(0L)).as("v_cont_ppm"),
        coalesce(col("a_shared"), lit(0L)).as("a_shared"),
        coalesce(col("a_cont_ppm"), lit(0L)).as("a_cont_ppm"))
      .withColumn("verdict",
        when(col("v_cont_ppm") === 1000000L &&
          col("a_cont_ppm") === 1000000L, "full_dup")
          .when(col("v_cont_ppm") === 1000000L, "video_only_dup")
          .when(col("a_cont_ppm") === 1000000L, "audio_only_dup")
          .otherwise("related"))

  /** Match a NEW batch of containers' signals against the store —
    * the d10 `matchNew` shape at the container grain (round-15,
    * VERDICT r14 stretch #7): verdict rows for every pair involving
    * at least one batch container, computed over store ∪ batch so
    * the hot-signature sets (and therefore every number) equal what
    * the batch mm22 table reports for the same total corpus —
    * batch-replay ≡ at-rest, spec-pinned. Batch models collect to
    * the driver for the pair filter: a micro-batch holds a bounded
    * number of CONTAINERS (not signals), the same size class as the
    * d10 batch-id set. Batch models must be disjoint from stored
    * models (the [[append]] contract — match, then append). */
  def matchVerdicts(spark: SparkSession, path: String,
      newFrames: DataFrame, newSegs: DataFrame): DataFrame = {
    requireMeta(spark, path, "match")
    val vSigs = frames(spark, path)
      .select(col("model"), col("ahash_hi").as("h1"),
        col("ahash_lo").as("h2"))
      .unionByName(newFrames.select(col("model"),
        col("ahash_hi").as("h1"), col("ahash_lo").as("h2")))
      .distinct()
    val aSigs = segs(spark, path)
      .select(col("model"), col("fp_hi").as("h1"),
        col("fp_lo").as("h2"))
      .unionByName(newSegs.select(col("model"),
        col("fp_hi").as("h1"), col("fp_lo").as("h2")))
      .distinct()
    val nm = newFrames.select(col("model"))
      .unionByName(newSegs.select(col("model"))).distinct()
      .collect().map(_.getString(0))
    verdictMerge(
      containmentLeg(vSigs, "v_shared", "v_cont_ppm"),
      containmentLeg(aSigs, "a_shared", "a_cont_ppm"))
      .where(col("model_a").isin(nm: _*) || col("model_b").isin(nm: _*))
      .orderBy(col("model_a"), col("model_b"))
  }

  /** The persisted frame-hash lattice (mm19 grain). */
  def frames(spark: SparkSession, path: String): DataFrame = {
    requireMeta(spark, path, "read")
    readTable(spark, s"$path/frames", frameSchema)
  }

  /** The persisted segment fingerprints (mm21 grain). */
  def segs(spark: SparkSession, path: String): DataFrame = {
    requireMeta(spark, path, "read")
    readTable(spark, s"$path/segs", segSchema)
  }
}
