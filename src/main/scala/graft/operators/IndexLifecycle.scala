package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned lifecycle for written ANN index tables — the deployment loop
  * around [[Similarity.writeIvfIndex]] / [[Similarity.writeIvfPqCodes]] /
  * [[Similarity.compactIvfCells]] and
  * [[graft.streaming.StreamIndex.driftMonitor]]:
  *
  *   train → write `base/v1` → serve v1
  *   (appends grow v1; drift trips)     → retrain → write `base/v2`
  *   → SWAP the pointer → new probes serve v2; v1 stays intact for
  *   in-flight readers → retire v1 when drained.
  *
  * The pointer (`base/CURRENT`, a one-line version file) is the atomicity
  * layer the bare directories don't have: a probe resolves the pointer
  * ONCE (plan time) and reads a version directory that is never mutated
  * after publish — so retrain AND compaction happen on the NEXT version
  * while probes run, and the swap is one rename, the classical
  * index-segment-swap discipline (FAISS index swaps, search-engine segment
  * commits, Iceberg snapshot pointers). All paths go through Hadoop's
  * FileSystem API — works on HDFS/S3/local alike.
  *
  * Reference analogue: basenine swaps nothing (single writer, one live
  * log — `server/lib/storages/native.go`); versioned publication is what
  * the same contract costs once readers are a fleet instead of a socket.
  */
object IndexLifecycle {

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def pointer(base: String) =
    new org.apache.hadoop.fs.Path(base, "CURRENT")

  /** The published version number, if any. */
  def currentVersion(spark: SparkSession, base: String): Option[Int] = {
    val p = pointer(base)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try Some(src.mkString.trim.stripPrefix("v").toInt)
        finally src.close()
      } finally in.close()
    }
  }

  /** Directory of version `v` under `base`. */
  def versionPath(base: String, v: Int): String = s"$base/v$v"

  /** Directory of the published version — what a probe resolves at plan
    * time. Fails loudly if nothing is published yet. */
  def currentPath(spark: SparkSession, base: String): String = {
    val v = currentVersion(spark, base).getOrElse(
      throw new IllegalStateException(s"no CURRENT index under $base"))
    versionPath(base, v)
  }

  /** Write `index` as the NEXT version (cluster-partitioned, the
    * writeIvfIndex layout + file-count law) and PUBLISH it: the pointer is
    * replaced via write-temp-then-rename — readers see either the old
    * version or the new one, never a torn state. The previous version's
    * directory is left intact for in-flight readers; call [[retire]] once
    * drained. Returns the published version number.
    */
  def publish(spark: SparkSession, index: DataFrame, base: String): Int = {
    val next = currentVersion(spark, base).getOrElse(0) + 1
    Similarity.writeIvfIndex(index, versionPath(base, next))
    val p = pointer(base)
    val tmp = new org.apache.hadoop.fs.Path(base, s".CURRENT_tmp_$next")
    val f = fs(spark, p)
    val out = f.create(tmp, true)
    try out.write(s"v$next\n".getBytes("UTF-8")) finally out.close()
    // OVERWRITE rename — one atomic op on HDFS/local (posix rename
    // semantics), so a concurrent currentPath never observes a missing
    // pointer (a delete-then-rename pair had exactly that window); object
    // stores without atomic rename publish via their own conditional-put —
    // the pointer file is the single thing to adapt
    org.apache.hadoop.fs.FileContext
      .getFileContext(p.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    next
  }

  /** Delete a drained old version's directory. Refuses to retire the
    * published version. */
  def retire(spark: SparkSession, base: String, v: Int): Unit = {
    require(!currentVersion(spark, base).contains(v),
      s"v$v is the published version")
    val p = new org.apache.hadoop.fs.Path(versionPath(base, v))
    val f = fs(spark, p)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Compact the CURRENT version into the next one and publish it — the
    * maintenance path that never mutates a served directory: copy-compact
    * into `v(k+1)` (one file per cell — [[Similarity.writeIvfIndex]]'s
    * repartitioned write IS the compaction), swap the pointer. In-place
    * [[Similarity.compactIvfCells]] remains the cheap form for indexes
    * with a maintenance window; this is the always-on-serving form.
    */
  def compactAndPublish(spark: SparkSession, base: String): Int = {
    val cur = currentPath(spark, base)
    publish(spark, spark.read.parquet(cur), base)
  }
}
