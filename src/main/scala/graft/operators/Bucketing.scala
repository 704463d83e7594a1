package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) table layout — the storage-side answer to the
  * repeated big-big join. A table bucketed by its join key is hash-split
  * into a fixed number of files per partition AT WRITE TIME, and every
  * reader that joins or aggregates on that key gets the exchange for free:
  * Spark recognizes both sides' bucketing as a satisfied
  * `HashClusteredDistribution` and plans a sort-merge join with ZERO
  * shuffle. At 100 TB this is the difference between re-shuffling the fact
  * table on every pipeline run and paying the shuffle ONCE at ingest —
  * the same contract as Hive bucketing / Iceberg bucket transforms.
  *
  * Reference analogue: basenine partitions its log by insertion order only
  * (`server/lib/storages/native.go` — sequential batch files); key-clustered
  * layout is a beyond-parity capability its single-node design never needs,
  * but a cluster engine lives or dies by.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and per-bucket sorted) by
    * `key`, registered in the session catalog under `table` with its data
    * at `path`. Overwrites both. Bucket metadata lives in the catalog —
    * `spark.table(table)` scans report the bucket spec and downstream
    * joins/aggs on `key` skip their exchange.
    */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // Cluster by the bucket id before writing (guide §6: sensible output
    // file sizing): a bucketed write splits EVERY task's rows across all
    // buckets, so N input tasks × B buckets = N·B files of crumbs (the
    // pipeline's band stage measured 256 files of ~3 KB at sf0.1).
    // repartition(buckets, key) uses the SAME pmod(murmur3(key), buckets)
    // the writer's bucket-id expression uses, so each task holds exactly
    // one whole bucket and writes exactly one file — B files total, and
    // the write really is "the key shuffle paid once" the bucketing
    // contract promises. Readers see the identical relation.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketed catalog tables on `key`. With both sides
    * bucketed by `key` into the same bucket count, the planned join is
    * exchange-free (pinned in BucketingSpec with broadcast disabled — a
    * broadcast would also skip the shuffle, but only while one side fits
    * in memory; bucketing holds at any scale).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
