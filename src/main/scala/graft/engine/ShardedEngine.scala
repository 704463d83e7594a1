package graft.engine

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-shard log: one [[Engine]] (log + single writer) per shard, the design
  * the reference's global-mutex storage scales to on a cluster (reference:
  * server/lib/storages/native.go:266-334 — one writer per log is inherent;
  * throughput scales by adding LOGS, not by contending on one).
  *
  * Mapping at 100 TB: shard ↔ Kafka partition / log topic; each shard's
  * writer is a Structured Streaming sink task pinned to that partition, ids
  * are contiguous PER SHARD (`(shard, id)` is the global key, exactly like
  * Kafka's (partition, offset)), and a cross-shard query is a union of
  * per-shard scans — embarrassingly parallel, no coordination. Here the
  * shards share one local SparkSession and the per-shard writers run on a
  * thread pool, which already removes the single-writer bottleneck the
  * round-1 ingest measured (~24k rec/s driver-bound): the Jackson parse +
  * insertion-filter walk + id injection of different shards proceed in
  * parallel.
  *
  * Routing: stable hash of the document bytes (uniform, deterministic), the
  * analog of producing without a key. Routing by a field would give
  * per-entity ordering, like a Kafka record key.
  */
final class ShardedEngine(val spark: SparkSession, baseDir: String, val numShards: Int) {

  val shards: IndexedSeq[Engine] =
    (0 until numShards).map(i => new Engine(spark, f"$baseDir/shard_$i%03d"))

  private def shardOf(doc: String): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(doc), numShards)

  /** Parallel insert: group by shard, then every shard's single writer runs
    * concurrently (per-shard order preserved; cross-shard order is
    * unordered, like any partitioned log). A failed shard writer fails the
    * whole insert — same contract as [[Engine.insert]]; partial writes are
    * reported, never swallowed.
    */
  def insert(docs: Seq[String]): Unit = {
    val byShard = docs.groupBy(shardOf)
    val pool = Executors.newFixedThreadPool(math.min(numShards, byShard.size).max(1))
    try {
      val futures = byShard.toSeq.map { case (s, ds) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = { shards(s).insert(ds); () }
        })
      }
      pool.shutdown()
      if (!pool.awaitTermination(10, TimeUnit.MINUTES))
        throw new java.util.concurrent.TimeoutException("sharded insert timed out")
      futures.foreach(_.get()) // rethrows the first shard-writer failure
    } finally { pool.shutdownNow(); () }
  }

  /** All live records across shards as (shard, id, ts, doc) — a query is a
    * union of per-shard scans; each shard's id-range pruning still applies.
    */
  def records(): DataFrame =
    shards.zipWithIndex
      .map { case (e, i) => e.records().withColumn("shard", lit(i)) }
      .reduce(_ unionByName _)

  /** Cross-shard filtered scan (same BFL tiering as [[Engine.query]]),
    * ordered by the global (shard, id) key. A `limit(N)` in the query caps
    * the GLOBAL result: each shard's own limit(N) is kept as a superset
    * pre-filter (≤N matches per shard can contribute), then the union is
    * re-limited — the standard distributed top-N shape.
    */
  def query(queryStr: String): DataFrame = {
    val union = shards.zipWithIndex
      .map { case (e, i) => e.query("", queryStr).withColumn("shard", lit(i)) }
      .reduce(_ unionByName _)
      .orderBy("shard", "id")
    // limit extraction must see the MACRO-EXPANDED text (a macro can carry
    // the limit); macros are fanned out by addMacro so every shard agrees
    val expanded = shards.headOption.fold(queryStr)(_.expandMacros(queryStr))
    val globalLimit = graft.bfl.Parser.parse(expanded).toOption.flatMap(_.limit)
    globalLimit.fold(union)(n => union.limit(n.toInt))
  }

  /** Register a macro on EVERY shard — queries must expand identically on
    * each, and [[query]]'s global-limit extraction relies on it.
    */
  def addMacro(name: String, expansion: String): Unit =
    shards.foreach(_.addMacro(name, expansion))

  def totalRecords: Long = shards.map(_.totalRecords).sum
}
