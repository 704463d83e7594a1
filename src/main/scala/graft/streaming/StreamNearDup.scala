package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming NEAR-duplicate detection — the online form of
  * [[graft.operators.Dedup.nearDupPairs]]: as documents arrive, flag each
  * one that is a near-duplicate of ANY earlier arrival, with the earliest
  * such original attached.
  *
  * Decomposition mirrors the batch LSH path, re-expressed as keyed
  * streaming state:
  *
  *   - each doc's MinHash signature and LSH bands are computed as COLUMNS
  *     before any state is touched (the same one-pass
  *     [[graft.functions.MinHashExpr]] expressions batch uses, so
  *     batch/stream signatures agree bit-for-bit);
  *   - the band table is `groupByKey`-ed on (band_idx, band_hash) — each
  *     bucket is an independent state partition, the streaming analogue of
  *     the batch per-bucket self-join (never all-pairs);
  *   - bucket state is the signature list of every doc seen in that bucket;
  *     an arriving doc emits a vote for the EARLIEST co-bucketed doc whose
  *     signature-estimated Jaccard (fraction of equal MinHash components —
  *     the classic unbiased estimator) clears the threshold;
  *   - [[verdicts]] folds the per-band votes into one `dup_of` per doc
  *     (min over bands = earliest matching original across all bands).
  *
  * Estimated-vs-exact trade, explicitly: batch nearDupPairs re-verifies
  * candidates with exact shingle Jaccard; bucket state cannot hold shingle
  * SETS (unbounded per doc), so the streaming filter accepts the k-sample
  * estimate — k·32 hex chars of state per (doc, band). Production adds
  * event-time eviction (as [[Sessionize]] documents) to bound state by the
  * dedup horizon; the horizonless form here keeps the parity spec exact.
  */
object StreamNearDup {

  final case class BandRow(docId: Long, bandIdx: Int, bandHash: String, sig: Seq[String])
  final case class BandVote(docId: Long, bandIdx: Int, dupOf: Long, est: Double)
  // state entries are "id|mh0|mh1|..." packed strings (md5-hex components
  // never contain '|') — flat and compact for the state store. Must be
  // PUBLIC: the generated state serializer news the class up from Janino
  // code, which cannot see an object-private constructor (manifests as
  // "no applicable constructor for zero actual parameters" at runtime).
  final case class BucketState(docs: Seq[String])
  private def pack(id: Long, sig: Seq[String]): String = s"$id|${sig.mkString("|")}"
  private def unpackId(s: String): Long = s.substring(0, s.indexOf('|')).toLong
  private def unpackSig(s: String): Array[String] =
    s.substring(s.indexOf('|') + 1).split('|')

  /** est-Jaccard = fraction of equal signature components. */
  private def estJaccard(a: Seq[String], b: Seq[String]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** The band table for a (docId, text) stream — column-only, no state.
    * Band hashes are md5 over `rowsPerBand` consecutive signature values,
    * the exact [[graft.operators.Dedup.lshBandsFrom]] construction, so
    * stream buckets equal batch buckets.
    */
  def bandRows(df: DataFrame, idCol: String, textCol: String,
      k: Int, rowsPerBand: Int): Dataset[BandRow] = {
    import df.sparkSession.implicits._
    require(k % rowsPerBand == 0, "k must be a multiple of rowsPerBand")
    val bandsOfSig = {
      val sig = col("sig")
      array((0 until k / rowsPerBand).map { b =>
        md5(concat_ws("|",
          (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*))
      }: _*)
    }
    df.select(
        col(idCol).cast("long").as("docId"),
        graft.functions.MinHashExpr.minhashArray(col(textCol), k).as("sig"))
      .select(col("docId"), col("sig"),
        posexplode(bandsOfSig).as(Seq("bandIdx", "bandHash")))
      .select(col("docId"), col("bandIdx"), col("bandHash"), col("sig"))
      .as[BandRow]
  }

  /** The per-bucket fold — shared by the streaming processor and the batch
    * bootstrap: each arriving doc votes for the EARLIEST already-seen
    * co-bucketed doc whose estimated Jaccard clears the threshold, then
    * joins the bucket's signature list. */
  private[streaming] def fold(prev: BucketState, sorted: Seq[BandRow],
      threshold: Double): (BucketState, Seq[BandVote]) = {
    var docs: List[String] = prev.docs.toList
    val out = scala.collection.mutable.ListBuffer[BandVote]()
    sorted.foreach { r =>
      val hits = docs
        .map(e => (unpackId(e), estJaccard(unpackSig(e), r.sig)))
        .filter(_._2 >= threshold)
      if (hits.nonEmpty) {
        val (id, est) = hits.minBy(_._1)
        out += BandVote(r.docId, r.bandIdx, id, est)
      }
      docs = pack(r.docId, r.sig) :: docs
    }
    (BucketState(docs), out.toSeq)
  }

  /** Public for the generated state serializer (the Janino gotcha above). */
  final class Processor(threshold: Double)
      extends StatefulProcessorWithInitialState[(Int, String), BandRow, BandVote, BucketState] {
    @transient private var state: ValueState[BucketState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[BucketState]("bucket",
        Encoders.product[BucketState], TTLConfig.NONE)

    override def handleInitialState(key: (Int, String), initial: BucketState,
        timerValues: TimerValues): Unit =
      state.update(initial)

    override def handleInputRows(key: (Int, String), rows: Iterator[BandRow],
        timerValues: TimerValues): Iterator[BandVote] = {
      val prev = if (state.exists()) state.get() else BucketState(Nil)
      val (next, out) = fold(prev, rows.toSeq.sortBy(_.docId), threshold)
      state.update(next)
      out.iterator
    }
  }

  /** Per-band dup votes for a streaming band table, on `transformWithState`
    * (typed ValueState, RocksDB-backed bucket signatures — migrated from
    * `flatMapGroupsWithState` in round 9). Arrival order within a
    * micro-batch is docId order (deterministic parity with batch, where
    * "earlier" means smaller id).
    */
  def bandVotes(bands: Dataset[BandRow], threshold: Double): Dataset[BandVote] = {
    import bands.sparkSession.implicits._
    bands
      .groupByKey(r => (r.bandIdx, r.bandHash))
      .transformWithState(new Processor(threshold),
        TimeMode.None(), OutputMode.Append())
  }

  /** Every bucket's signature list after replaying a batch band table
    * through the same [[fold]] — the offline recomputation
    * [[bandVotesBootstrapped]] resumes from (the [[StreamKmv.batchState]]
    * handoff applied to dedup state). Bucket membership is bounded by band
    * occupancy, the same bound the streaming state carries.
    */
  def batchState(bands: Dataset[BandRow],
      threshold: Double): Dataset[((Int, String), BucketState)] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(r => (r.bandIdx, r.bandHash)).mapGroups { (k, it) =>
      val (st, _) = fold(BucketState(Nil), it.toSeq.sortBy(_.docId), threshold)
      (k, st)
    }
  }

  /** [[bandVotes]] with bucket state bootstrapped from [[batchState]]. */
  def bandVotesBootstrapped(bands: Dataset[BandRow],
      initial: Dataset[((Int, String), BucketState)],
      threshold: Double): Dataset[BandVote] = {
    import bands.sparkSession.implicits._
    bands
      .groupByKey(r => (r.bandIdx, r.bandHash))
      .transformWithState(new Processor(threshold),
        TimeMode.None(), OutputMode.Append(), initial.groupByKey(_._1).mapValues(_._2))
  }

  /** One verdict per flagged doc: the earliest original across all bands. */
  def verdicts(votes: DataFrame): DataFrame =
    votes
      .groupBy(col("docId").as("doc_id"))
      .agg(min(col("dupOf")).as("dup_of"))
}
