package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Incremental ANN-index maintenance on the ingest stream — the staleness
  * half of the train-offline/serve-online story ([[StreamAnn]] serves
  * queries; THIS keeps the index absorbing new vectors between retrains):
  *
  *   - [[assign]]: arriving vectors are assigned to the EXISTING trained
  *     centroids per micro-batch — one scan-only
  *     [[graft.functions.NearestCentroidsExpr]] projection (the
  *     StreamMedia fingerprint precedent: stateless, no shuffle), emitting
  *     (vecId, cluster, residual). Assignment arithmetic is the batch
  *     build's own, so appending these rows to the written
  *     cluster-partitioned index keeps probes EXACT over the union corpus
  *     (for fixed centroids the batch rebuild would assign identically —
  *     StreamIndexSpec pins it bit-equal). What accrues is centroid
  *     QUALITY staleness: new data the old Voronoi cells describe poorly.
  *
  *   - [[driftMonitor]]: the retrain trigger for exactly that staleness —
  *     a running (count, Σresidual) fold over the assigned stream,
  *     flagging when the arriving data's mean residual (1 − cosine to its
  *     nearest centroid) exceeds `factor` × the TRAINING corpus's baseline
  *     residual. In-distribution arrivals keep the mean at baseline;
  *     distribution shift raises it — the flag says "the cells no longer
  *     fit, schedule [[graft.operators.Similarity.ivfTrainedAuto]]".
  *     Residual sums accumulate as exact integer micro-units so the flag
  *     is batch-split-invariant (same records ⇒ same cumulative readout).
  *
  * At 100 TB: assignment is embarrassingly parallel on the ingest path
  * (centroids are a broadcast literal, C·dim doubles); the monitor's state
  * is two numbers per index. Retraining stays a batch job — the classical
  * IVF deployment loop (FAISS re-trains offline; serving indexes absorb
  * adds between swaps).
  */
object StreamIndex {

  final case class Assigned(vecId: Long, cluster: Long, residual: Double)
  /** Σresidual carried as exact micro-units (residuals are round(6), so
    * ×10⁶ is integral): a Long survives the transformWithState Avro state
    * converter where BigDecimal would not, and integer addition is
    * batch-split-invariant by construction. */
  final case class DriftState(n: Long, sumMicro: Long)
  final case class DriftSnapshot(indexId: String, n: Long, meanResidual: Double,
      baseline: Double, retrain: Boolean)

  /** Per-micro-batch nearest-centroid assignment of arriving vectors:
    * (vecId, cluster, residual = round(1 − cos(vec, its centroid), 6)).
    * Works on a static frame too (the spec's parity reference).
    */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Long, Seq[Double])]): DataFrame = {
    val cluster = element_at(
      graft.functions.CentroidExpr.nearestCids(col(vecCol), cents, 1), 1)
    val centOf = typedlit(cents.toMap)
    vecs.select(
      col(idCol).cast("long").as("vecId"),
      cluster.as("cluster"),
      round(lit(1.0) - graft.operators.Similarity.cosine(
        col(vecCol), element_at(centOf, cluster)), 6).as("residual"))
  }

  /** Assign one micro-batch to the trained centroids and APPEND it into the
    * WRITTEN cluster-partitioned index
    * ([[graft.operators.Similarity.writeIvfIndex]]'s layout): rows keep the
    * index schema (idCol, vecCol, cluster), are repartitioned by `cluster`
    * (one bounded shuffle per batch — the writeIvfIndex file-count law: at
    * most ONE new file per touched cell per batch, never one per task per
    * cell) and land as a dynamic-partition append. Assignment is the same
    * expression the batch rebuild runs, so the grown table is bit-equal to
    * a rebuild at the same centroids (spec-pinned across ≥2 appends).
    */
  def appendBatch(batch: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Long, Seq[Double])], indexPath: String): Unit =
    batch.select(col(idCol), col(vecCol),
        element_at(graft.functions.CentroidExpr.nearestCids(
          col(vecCol), cents, 1), 1).as("cluster"))
      .repartition(col("cluster"))
      .write.partitionBy("cluster").mode("append").parquet(indexPath)

  /** Batch-id replay guard for the foreachBatch appenders: a marker file
    * per committed batch under `path/_stream_commits/`. foreachBatch
    * re-delivers the last batch after a crash-restart (at-least-once); a
    * blind parquet append would duplicate its rows, silently breaking the
    * probe ≡ rebuild invariant. The marker is written AFTER the appends,
    * so the residual window is a crash between parquet job commit and
    * marker creation — one batch, detectable (marker absent but files
    * present carry the replayed batch's rows twice); full exactly-once
    * needs a transactional manifest, which is [[graft.operators
    * .IndexLifecycle]]'s version layer at the next granularity up.
    */
  private[streaming] def batchCommitted(spark: org.apache.spark.sql.SparkSession,
      path: String, batchId: Long): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_stream_commits/$batchId")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
  private[streaming] def markCommitted(spark: org.apache.spark.sql.SparkSession,
      path: String, batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_stream_commits/$batchId")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(p, true).close()
  }

  /** The streaming face of [[appendBatch]]: a `foreachBatch` writer that
    * grows the written index as vectors arrive — the production ingest
    * path ([[graft.operators.Similarity.ivfServedTopK]] probes the grown
    * table; concurrent probes see each append atomically per batch since
    * parquet readers list files at planning time), replay-guarded by
    * [[batchCommitted]]. Caller starts it with
    * `.option("checkpointLocation", …).start()`.
    */
  def appendToIndex(vecs: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Long, Seq[Double])], indexPath: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batchCommitted(batch.sparkSession, indexPath, batchId)) {
          appendBatch(batch, idCol, vecCol, cents, indexPath)
          markCommitted(batch.sparkSession, indexPath, batchId)
        }
    }

  /** [[appendBatch]] for the WRITTEN IVF-PQ CODE table
    * ([[graft.operators.Similarity.writeIvfPqCodes]] layout): the arriving
    * vectors are assigned to their cells AND PQ-encoded against the FIXED
    * trained codebooks in one scan-only projection, then appended
    * cluster-partitioned — the ingest path keeps BOTH served tables fresh
    * (codes for the ADC scan, the float index for rerank point reads).
    * Codebooks stay fixed between retrains, exactly like centroids, so the
    * grown code table is bit-equal to a rebuild's encode pass at the same
    * artifacts (spec-pinned through a full served probe).
    */
  def appendCodesBatch(batch: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Long, Seq[Double])],
      books: Array[Array[(Long, Seq[Double])]], codesPath: String): Unit = {
    val assigned = batch.select(col(idCol), col(vecCol),
      element_at(graft.functions.CentroidExpr.nearestCids(
        col(vecCol), cents, 1), 1).as("cluster"))
    graft.operators.Similarity
      .pqEncode(assigned, idCol, vecCol, books, carry = Seq("cluster"))
      .repartition(col("cluster"))
      .write.partitionBy("cluster").mode("append").parquet(codesPath)
  }

  /** The streaming face of [[appendCodesBatch]] — one `foreachBatch`
    * writer growing BOTH written tables in step (each batch appends its
    * float rows and its code rows; a probe between batches sees a
    * consistent pair up to the current batch boundary on each side).
    * Caller starts it with `.option("checkpointLocation", …).start()`.
    */
  def appendToIndexAndCodes(vecs: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Long, Seq[Double])],
      books: Array[Array[(Long, Seq[Double])]],
      indexPath: String, codesPath: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        // per-table markers: a crash between the two appends replays the
        // batch and only the missing table re-appends — the pair re-levels
        // instead of the float side doubling
        val b = batch.localCheckpoint()
        if (!batchCommitted(b.sparkSession, indexPath, batchId)) {
          appendBatch(b, idCol, vecCol, cents, indexPath)
          markCommitted(b.sparkSession, indexPath, batchId)
        }
        if (!batchCommitted(b.sparkSession, codesPath, batchId)) {
          appendCodesBatch(b, idCol, vecCol, cents, books, codesPath)
          markCommitted(b.sparkSession, codesPath, batchId)
        }
    }

  /** Mean residual of a STATIC corpus under the trained centroids — the
    * baseline the drift monitor compares arrivals against (compute it once
    * at train time, over the training corpus). */
  def baselineResidual(vecs: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Long, Seq[Double])]): Double =
    assign(vecs, idCol, vecCol, cents)
      .agg((sum(col("residual").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("m"))
      .head().getDouble(0)

  /** Cumulative drift readout per micro-batch: one snapshot per batch that
    * delivered assignments, flagging `retrain` once the running mean
    * residual exceeds `factor` × `baseline`. Keyed by `indexId` so one
    * monitor stream can watch several indexes; state is (count, Σresidual)
    * per index.
    */
  def driftMonitor(assigned: Dataset[Assigned], indexId: String,
      baseline: Double, factor: Double = 1.5): Dataset[DriftSnapshot] = {
    import assigned.sparkSession.implicits._
    assigned
      .groupByKey(_ => indexId)
      .transformWithState(
        new FoldProcessor[String, Assigned, DriftState, DriftSnapshot]("drift",
          (key: String, rows: Seq[Assigned], prev: Option[DriftState]) => {
            val p = prev.getOrElse(DriftState(0L, 0L))
            val next = DriftState(
              p.n + rows.length,
              p.sumMicro + rows.map(r => math.round(r.residual * 1e6)).sum)
            val mean = if (next.n == 0) 0.0 else next.sumMicro / 1e6 / next.n
            (Some(next),
              Seq(DriftSnapshot(key, next.n, mean, baseline,
                retrain = mean > baseline * factor)))
          })(Encoders.product[DriftState]),
        TimeMode.None(), OutputMode.Append())
  }

  /** One arrival-ordinal window's aggregate: rows `[win·windowRows,
    * (win+1)·windowRows)` in arrival order. Longs only — the Avro state
    * converter contract. */
  final case class WinAgg(win: Long, n: Long, sumMicro: Long)
  final case class DriftWinState(n: Long, wins: Seq[WinAgg])

  /** [[driftMonitor]] with BOUNDED trigger latency: the cumulative form's
    * flag compares the all-time mean to baseline, so after N
    * in-distribution arrivals a genuine shift needs O(N) more drifted rows
    * before the running mean crosses `factor` × baseline — latency grows
    * with history. This fold windows the stream by ARRIVAL ORDINAL
    * (`windowRows` rows per window, the stream's own clock — no event-time
    * column needed) and keeps only the trailing `nWindows` aggregates:
    * the readout mean covers at most `nWindows · windowRows` recent rows,
    * so a shift trips the flag within ~one window of drifted arrivals no
    * matter how long the index has been quiet. State per index: ≤ nWindows
    * (win, count, Σmicro) triples — still O(1).
    */
  def driftMonitorWindowed(assigned: Dataset[Assigned], indexId: String,
      baseline: Double, factor: Double = 1.5,
      windowRows: Long = 1000, nWindows: Int = 4): Dataset[DriftSnapshot] = {
    require(windowRows >= 1 && nWindows >= 1)
    import assigned.sparkSession.implicits._
    assigned
      .groupByKey(_ => indexId)
      .transformWithState(
        new FoldProcessor[String, Assigned, DriftWinState, DriftSnapshot]("driftw",
          (key: String, rows: Seq[Assigned], prev: Option[DriftWinState]) => {
            val p = prev.getOrElse(DriftWinState(0L, Seq.empty))
            val acc = scala.collection.mutable.LinkedHashMap[Long, (Long, Long)](
              p.wins.map(w => w.win -> (w.n, w.sumMicro)): _*)
            var n = p.n
            rows.foreach { r =>
              val w = n / windowRows
              val (cn, cs) = acc.getOrElse(w, (0L, 0L))
              acc(w) = (cn + 1, cs + math.round(r.residual * 1e6))
              n += 1
            }
            val kept = acc.toSeq.sortBy(_._1).takeRight(nWindows)
              .map { case (w, (cn, cs)) => WinAgg(w, cn, cs) }
            val totN = kept.map(_.n).sum
            val mean = if (totN == 0) 0.0 else kept.map(_.sumMicro).sum / 1e6 / totN
            (Some(DriftWinState(n, kept)),
              Seq(DriftSnapshot(key, n, mean, baseline,
                retrain = mean > baseline * factor)))
          })(Encoders.product[DriftWinState]),
        TimeMode.None(), OutputMode.Append())
  }
}
