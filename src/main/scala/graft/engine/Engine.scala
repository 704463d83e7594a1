package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.bfl.{Ast, Bfl, Compiler, Interp, JsonTree, Macros, Parser}
import graft.functions.BflExpressions

/** Engine over a Parquet-backed append-only record log — the Spark-native
  * re-expression of the reference's storage + command surface
  * (reference: server/lib/storages/native.go, server/lib/structs.go:90-107).
  *
  * | reference                      | here                                    |
  * |--------------------------------|-----------------------------------------|
  * | length-prefixed JSON log files | Parquet batches `records/batch_%09d`    |
  * | offsets[] + partitionRefs[]    | `id` column + Parquet min/max row-group  |
  * |                                | statistics (pruning replaces the index) |
  * | global RWMutex single writer   | engine-level insert lock (single JVM);  |
  * |                                | cluster: one streaming sink per log     |
  * | fsnotify tail                  | Structured Streaming file source        |
  * | gob core dump                  | meta.json (macros, filter, high-water)  |
  *
  * Records carry (id LONG, ts LONG epoch-millis, doc STRING); the stored doc
  * has the 24-digit zero-padded id injected, exactly like the reference
  * (reference: native.go:302-311, helpers.go:15-17).
  */
final class Engine(
    val spark: SparkSession,
    val dir: String,
    /** Batch-log compaction policy (the reference's periodicPartitioner
      * consolidation role, native.go:1046-1108): bin-pack contiguous runs of
      * small `batch_%09d` dirs into one consolidated batch so a long-running
      * trickle ingest (one dir per 500 ms trigger = ~170k dirs/day) keeps a
      * BOUNDED listing/planning cost. Ids are immutable, so compaction is a
      * rewrite + atomic dir swap; correctness is unchanged by construction.
      */
    val compactMinRun: Int = 16,       // smallest run worth rewriting
    val compactKeepRecent: Int = 4,    // newest dirs are the live tail region — never touched
    val compactTargetBytes: Long = 128L << 20, // consolidated dir size target (~1 HDFS block)
    val compactMinAgeMs: Long = 10000L, // only dirs at least this old (tail grace window)
    val compactInBackground: Boolean = true, // ticker-driven; false = caller ticks (tests)
    /** Replaced/evicted dirs stay ON DISK this long after leaving the
      * manifest, so every scan planned before the swap keeps reading files
      * that still exist (the LSM/Iceberg deferred-GC discipline). 0 = delete
      * immediately (tests that count directories).
      */
    val gcGraceMs: Long = 15000L
) extends Storage {

  import Engine._

  private val recordsDir = Paths.get(dir, "records")
  private val metaPath = Paths.get(dir, "meta.json")
  private val compactManifestPath = Paths.get(dir, "compact_manifest.json")

  Files.createDirectories(recordsDir)

  // ---- durable metadata (the reference's gob core dump analog) ----
  @volatile private var meta: Meta = loadMeta()

  // replay a pre-manifest crash journal, adopt/garbage-collect the on-disk
  // state against the manifest — BEFORE any reader can list the log
  // (constructor runs before first use)
  reconcileLog()

  private def loadMeta(): Meta =
    if (Files.exists(metaPath)) Meta.fromJson(new String(Files.readAllBytes(metaPath), StandardCharsets.UTF_8))
    else Meta()

  /** Atomic: the manifest inside meta.json is the log's commit point, so a
    * torn write must be impossible, not just unlikely.
    */
  private def saveMeta(): Unit = {
    val tmp = metaPath.resolveSibling(".meta.json.tmp")
    Files.write(tmp, meta.toJson.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, metaPath, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private val recordSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("doc", StringType, nullable = false)
  ))

  // ------------------------------------------------------------------
  // commands (reference: server/lib/structs.go:60-72 dispatch surface)
  // ------------------------------------------------------------------

  /** `/insert` — batch insert of JSON lines. Applies the insertion filter
    * (drop + transform), injects the 24-digit id, appends one Parquet batch.
    * Returns the ids assigned. Single-writer per engine instance, like the
    * reference's storage mutex (reference: native.go:266-334).
    */
  def insert(jsonDocs: Seq[String]): Seq[Long] = synchronized {
    val filterInterp = meta.insertionFilter.map(q =>
      new Interp(parseOrThrow(expand(q))))
    val now = System.currentTimeMillis()
    var nextId = meta.highWater
    val rows = jsonDocs.flatMap { json =>
      JsonTree.tryParse(json) match {
        case None => None // non-JSON lines are rejected (server_test.go:30-32)
        case Some(root0) =>
          var root = root0
          val keep = filterInterp.forall { in =>
            val t = in.eval(root)
            t
          }
          if (!keep) None
          else {
            root match {
              case m: JsonTree.Obj =>
                m.put("id", indexToId(nextId))
                val ts = m.get("timestamp") match {
                  case Some(l: Long) => l
                  case _             => now
                }
                val r = Row(nextId, ts, JsonTree.serialize(m))
                nextId += 1
                Some(r)
              case _ => None // non-object records are rejected
            }
          }
      }
    }
    val newBatch =
      if (rows.isEmpty) None
      else {
        val name = f"batch_${meta.batchSeq}%09d"
        spark.createDataFrame(rows.asJava, recordSchema)
          .coalesce(1) // no shuffle — preserves id order inside the batch file
          .write
          .mode(SaveMode.Append)
          .parquet(recordsDir.resolve(name).toString)
        Some(name)
      }
    val assigned = (meta.highWater until nextId).toList
    // manifest commit AFTER the dir is complete: a crash in between leaves
    // an unacked orphan the open-time reconcile deletes
    meta = meta.copy(highWater = nextId, batchSeq = meta.batchSeq + 1,
      batches = meta.batches ++ newBatch)
    saveMeta()
    enforceRetention()
    assigned
  }

  /** `/insert` at scale: the same semantics as [[insert]] — insertion filter
    * (drop + transform), contiguous ids in arrival order, 24-digit id
    * injection, one Parquet batch append — but EXECUTOR-side. The driver
    * path parses and filters every document on one thread (the round-2
    * measured ~24k rec/s ingest ceiling); here the micro-batch is processed
    * as a distributed two-pass pipeline:
    *
    *   1. parse + insertion-filter + transform in parallel on executors
    *      (order-preserving; rejected lines consume no id);
    *   2. contiguous id assignment via `zipWithIndex` (the standard
    *      distributed rank idiom: one count job over the cached survivors,
    *      then per-partition offsets), id injected + serialized executor-side;
    *   3. `writeShards` Parquet part-files written in parallel into ONE
    *      batch directory (each part covers a contiguous id range, so
    *      row-group min/max pruning behaves exactly like the driver path).
    *
    * The engine lock is held throughout: one writer per log, like the
    * reference's storage mutex — parallelism comes from WITHIN the batch.
    * At cluster scale this is the sink of a Structured Streaming ingest:
    * shard ↔ Kafka partition, id reservation ↔ log offset range.
    */
  def insertDistributed(lines: org.apache.spark.sql.Dataset[String],
      writeShards: Int = 4): Seq[Long] = synchronized {
    import org.apache.spark.storage.StorageLevel
    val filterQ: Option[Ast.Query] =
      meta.insertionFilter.map(q => parseOrThrow(expand(q)))
    val prepped = lines.rdd
      .mapPartitions(Engine.prepPartition(filterQ))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val kept = prepped.count()
      val base = meta.highWater
      if (kept > 0) {
        val now = System.currentTimeMillis()
        val rows = prepped
          .zipWithIndex()
          .map { case (doc, i) => Engine.buildRecordRow(doc, base + i, now) }
        // ATOMIC batch publication: the N shard part-files are renamed into
        // the output dir ONE AT A TIME during commitJob, and a live tail's
        // file listing that catches mid-commit state sees only the
        // later-committed shards — it then advances its already-scanned
        // high-water past the not-yet-visible shards and drops them when
        // they appear (observed as a 1-in-3 soak failure: 158/160 tail
        // records). Writing to a dot-prefixed dir (invisible to both the
        // `batch_*` stream glob and listBatches) and renaming the DIRECTORY
        // is atomic on POSIX: a batch becomes visible with all its shards
        // or not at all. The driver path needs none of this — one part
        // file, one rename.
        val tmp = recordsDir.resolve(f".batch_${meta.batchSeq}%09d.tmp")
        spark
          .createDataFrame(rows, recordSchema)
          .coalesce(math.max(1, writeShards))
          .write
          .mode(SaveMode.Overwrite) // clobber a stale tmp from a crashed run
          .parquet(tmp.toString)
        Files.move(tmp, recordsDir.resolve(f"batch_${meta.batchSeq}%09d"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      meta = meta.copy(highWater = base + kept, batchSeq = meta.batchSeq + 1,
        batches =
          if (kept > 0) meta.batches :+ f"batch_${meta.batchSeq}%09d"
          else meta.batches)
      saveMeta()
      enforceRetention()
      (base until base + kept).toList
    } finally { prepped.unpersist(blocking = false); () }
  }

  /** All live records as a DataFrame (id, ts, doc), scan-ordered by id.
    * The id filter replaces the reference's offsets index: Parquet row-group
    * min/max stats prune batches a `leftOff` resume skips.
    */
  def records(): DataFrame = {
    // Retention or compaction may remove a batch dir under a reader — the
    // reference's readers likewise skip removed partitions ("fRef == nil …
    // pass this offset", native.go:745-755). Two distinct race windows:
    //   - files vanishing AFTER planning → FAILED_READ_FILE at execution;
    //     every materialization site replans via retryOnEvictionRace. NOT
    //     ignoreMissingFiles: a silent skip is correct for retention (rows
    //     legitimately evicted) but LOSES rows a compaction merely moved —
    //     throw-and-replan is correct for both.
    //   - a batch dir vanishing BETWEEN listing and path resolution →
    //     PATH_NOT_FOUND at planning, handled by re-listing (bounded).
    // Explicit batch paths, NOT a glob: a data directory containing glob
    // metacharacters ([ ] { } * ?) must not change what the scan matches.
    var attempt = 0
    while (attempt < 6) {
      val batches = listBatches()
      if (batches.isEmpty)
        return spark.createDataFrame(java.util.List.of[Row](), recordSchema)
      try
        return spark.read
          .schema(recordSchema)
          .parquet(batches.map(_.toString): _*)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") =>
          attempt += 1 // eviction won the race; re-list and retry
      }
    }
    throw new IllegalStateException("records(): path listing raced eviction 6 times")
  }

  /** `/query` — filtered scan from `leftOff` (exclusive index semantics match
    * Fetch; "" = beginning, "latest" = last record only). Returns transformed
    * docs in id order, capped by the query's `limit(N)`
    * (reference: native.go:369-523).
    */
  def query(leftOff: String, queryStr: String): DataFrame =
    queryExpanded(leftOff, expand(queryStr))

  /** Like [[query]] but with macros already expanded — callers that expand
    * once up-front (the protocol server) avoid a second, possibly
    * macro-state-racing expansion.
    */
  def queryExpanded(leftOff: String, expanded: String): DataFrame = {
    val q = parseOrThrow(expanded)
    val matched = applyQuery(baseFrom(leftOff), expanded, q).orderBy("id")
    q.limit.fold(matched)(n => matched.limit(n.toInt))
  }

  /** shared QUERY-mode leftOff dispatch: "" = beginning, "latest" = last
    * record only, otherwise exclusive resume (reference:
    * native.go:392,1158-1176 handleSpecialLeftOff).
    */
  private def baseFrom(leftOff: String): DataFrame = leftOff match {
    case "" | null => records()
    case "latest"  => records().where(col("id") === meta.highWater - 1)
    case s         => records().where(col("id") > s.toLong)
  }

  /** `/single` — point lookup by index; only the query's record-altering
    * helpers apply, the predicate itself is not used to reject
    * (reference: native.go:526-601).
    */
  def single(index: Long, queryStr: String): Option[String] = {
    val expanded = expand(queryStr)
    parseOrThrow(expanded) // validate
    val rows = retryOnEvictionRace {
      records()
        .where(col("id") === index)
        .select(BflExpressions.bflTransform(col("doc"), expanded))
        .collect()
    }
    rows.headOption.map(_.getString(0))
  }

  /** Retry a materialized read that lost the race against retention: the
    * parquet FOOTER open wraps its FileNotFoundException in ways
    * `ignoreMissingFiles` cannot intercept (FAILED_READ_FILE.NO_HINT), so
    * the read is re-planned against a fresh batch listing — the exact
    * analog of the reference reader skipping a removed partition and
    * carrying on (native.go:745-755). Bounded: a persistent failure is a
    * real error, not a race.
    */
  private[engine] def retryOnEvictionRace[T](f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Exception if attempt < 5 && Engine.isEvictionRace(e) => attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** `/fetch` scan — every SCANNED record in scan order as (id, doc-or-None):
    * doc is present (transformed) iff the record matches. The reference emits
    * a `/metadata` line per scanned offset (native.go:728-820), so the
    * protocol server needs unmatched ids too. The scan stops at the record
    * where the `limit`-th match lands (found first with a cheap pushdown-
    * friendly matched-ids page); when fewer matches exist the scan runs to
    * the log boundary, like the reference's offset loop. Returned iterator is
    * partition-lazy (`toLocalIterator`) — the driver never holds the scan.
    */
  def fetchScan(leftOff: Long, direction: Int, queryStr: String, limit: Int)
      : (Iterator[(Long, Option[String])], Long, Long) = {
    val expanded = expand(queryStr)
    val q = parseOrThrow(expanded)
    val total = meta.highWater - meta.removedCount
    // limit <= 0: the reference's `numberOfWritten >= _limit` check fires on
    // the first loop iteration — nothing is scanned (native.go:729-731)
    if (limit <= 0) return (Iterator.empty, total, meta.truncatedTimestamp)
    // forward is INCLUSIVE of leftOff (offsets[leftOff:]), backward is
    // exclusive (offsets[:leftOff]) — reference: native.go:700-706, pinned
    // by the server fetch matrix (server_test.go:403-418)
    val base =
      if (direction < 0) records().where(col("id") < leftOff)
      else records().where(col("id") >= leftOff)
    val ordered = if (direction < 0) base.orderBy(col("id").desc) else base.orderBy(col("id"))
    // scan end = id of the limit-th match; the id-only page keeps the BFL
    // predicate + id range pushdown-eligible
    val matchedIds = applyQueryNoLimit(ordered, expanded)
      .select("id").limit(limit).collect().map(_.getLong(0))
    val bounded =
      if (matchedIds.length < limit) ordered // scan to the boundary
      else if (direction < 0) ordered.where(col("id") >= matchedIds.last)
      else ordered.where(col("id") <= matchedIds.last)
    val it = flagsOver(bounded, expanded, q)
      .toLocalIterator().asScala
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getString(1))))
    (it, total, meta.truncatedTimestamp)
  }

  /** `/fetch` — page of up to `limit` matching records scanning forward
    * (direction > 0) or backward from `leftOff`; limit counts MATCHES
    * (reference: native.go:625-827). Returns (matched docs, metadata).
    */
  def fetch(leftOff: Long, direction: Int, queryStr: String, limit: Int): (Seq[String], FetchMeta) = {
    // materialized page: losing the retention race re-plans the whole page
    // (idempotent — evicted rows legitimately vanish between attempts)
    val (rows, total, truncated) = retryOnEvictionRace {
      val (it, t, tr) = fetchScan(leftOff, direction, queryStr, limit)
      (it.toVector, t, tr)
    }
    val docs = rows.flatMap(_._2)
    val lastScanned = rows.lastOption.map(_._1)
    // resume point is one PAST the last scanned record in scan direction
    // (the reference's _leftOff counts beyond each scanned offset,
    // native.go:732-741): forward resume is INCLUSIVE so one past = id+1;
    // backward resume is EXCLUSIVE so one past = the scanned id itself —
    // `last - 1` here would skip a record per backward page. Matches the
    // per-record metadata the protocol server emits (handleFetch nextOff).
    val nextLeftOff = lastScanned
      .map(last => if (direction < 0) last else last + 1)
      .getOrElse(leftOff)
    // the log boundary being scanned also means no more data
    val atBoundary = lastScanned.exists { last =>
      if (direction < 0) last <= meta.removedCount else last >= meta.highWater - 1
    }
    val m = FetchMeta(
      total = total,
      numberOfWritten = docs.length,
      leftOff = nextLeftOff,
      // limit <= 0 pages never advance and never produce more data — flag
      // them done so a noMoreData-keyed pagination loop terminates
      noMoreData = limit <= 0 || docs.length < limit || atBoundary,
      truncatedTimestamp = truncated
    )
    (docs, m)
  }

  /** `/query` history scan — (id, doc-or-null) for EVERY record past
    * `leftOff` in id order; doc non-null iff matched (transformed when the
    * query alters records). Feeds the reference's per-scanned-record
    * `/metadata` cadence (native.go:432-518). No match filter reaches the
    * scan by design — the protocol requires touching every record — but the
    * `leftOff` id range still prunes Parquet row groups.
    */
  def scanWithFlags(leftOff: String, expanded: String): DataFrame = {
    val q = parseOrThrow(expanded)
    flagsOver(baseFrom(leftOff), expanded, q).orderBy("id")
  }

  /** (id, doc-or-null) projection: compiled-tier predicate inside `when`
    * (NULL condition ⇒ no match, so no coalesce wrapper), or ONE fused
    * interpreter eval (bflEval) on the fallback tier.
    */
  private def flagsOver(df: DataFrame, expanded: String, q: Ast.Query): DataFrame =
    try {
      val plan = Compiler.compileQuery(df.schema, q, docCol = Some("doc"))
      val d =
        if (usesAlteringHelpers(q)) BflExpressions.bflTransform(col("doc"), expanded)
        else col("doc")
      df.select(col("id"), when(plan.pred, d).as("doc"))
    } catch {
      case e: IllegalArgumentException => throw e
      case scala.util.control.NonFatal(_) =>
        df.select(col("id"), BflExpressions.bflEval(col("doc"), expanded).as("doc"))
    }

  /** `/validate` — parse-only (reference: native.go:605-622). */
  def validate(queryStr: String): Either[String, Unit] =
    Bfl.validate(queryStr, meta.macros)

  /** `/macro name~expansion` (reference: native.go:830-850, macro.go). */
  def addMacro(name: String, expanded: String): Unit = synchronized {
    meta = meta.copy(macros = Macros.add(meta.macros, name, expanded))
    saveMeta()
  }

  /** `/insert-filter` (reference: native.go:866-885). */
  def setInsertionFilter(queryStr: String): Either[String, Unit] = synchronized {
    validate(queryStr).map { _ =>
      meta = meta.copy(insertionFilter = Some(queryStr))
      saveMeta()
    }
  }

  /** `/limit <bytes>` — retention budget (reference: native.go:852-864). */
  def setLimit(bytes: Long): Unit = synchronized {
    meta = meta.copy(limitBytes = Some(bytes))
    saveMeta()
  }

  /** `/flush` — drop records, keep macros/filters (reference: native.go:888-903).
    * Explicitly destructive: deletes immediately (no GC grace) and drains
    * the deferred queue, so nothing can resurrect or collide with the
    * restarting batchSeq.
    */
  def flush(): Unit = synchronized {
    deleteBatches(listBatches())
    gcTick(force = true)
    // a pending legacy compaction journal would resurrect flushed records —
    // drop it and any hidden (tmp/trash) dirs along with the live batches
    Files.deleteIfExists(compactManifestPath)
    Files.list(recordsDir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(".compact_") ||
        p.getFileName.toString.startsWith(".trash_"))
      .toSeq
      .foreach(p => deleteBatches(Seq(p)))
    meta = meta.copy(highWater = 0L, removedCount = 0L, truncatedTimestamp = 0L,
      batchSeq = 0L, batches = Vector.empty)
    saveMeta()
  }

  /** `/reset` — flush + clear macros/filter/limit (reference: native.go:906-928). */
  def reset(): Unit = synchronized {
    flush()
    meta = Meta()
    saveMeta()
  }

  def totalRecords: Long = meta.highWater - meta.removedCount
  /** next id to be assigned; ids < highWater exist (or were evicted) */
  def highWater: Long = meta.highWater
  def expandMacros(q: String): String = expand(q)
  def truncatedTimestamp: Long = meta.truncatedTimestamp
  def macros: Map[String, String] = meta.macros

  // ------------------------------------------------------------------

  private def expand(q: String): String = Macros.expand(meta.macros, q)

  private def parseOrThrow(expanded: String): Ast.Query =
    Parser.parse(expanded).fold(e => throw new IllegalArgumentException(e), identity)

  /** Filter + transform with the compiled tier when the query allows it
    * (pure predicates run as native Columns over get_json_object residuals),
    * interpreter expression otherwise.
    */
  private def applyQuery(df: DataFrame, expanded: String, q: Ast.Query): DataFrame = {
    val filtered = applyQueryNoLimit(df, expanded)
    if (usesAlteringHelpers(q))
      filtered.withColumn("doc", BflExpressions.bflTransform(col("doc"), expanded))
    else filtered
  }

  /** Compiled tier first: a compilable query runs as native Columns over
    * `get_json_object(doc, …)` — codegen'd, no per-row interpreter, and the
    * id/ts conjuncts remain pushable. Falls back to the exact interpreter
    * expression for redact/json()/xml()/descent shapes.
    */
  private def applyQueryNoLimit(df: DataFrame, expanded: String): DataFrame =
    try {
      val q = parseOrThrow(expanded)
      val plan = Compiler.compileQuery(df.schema, q, docCol = Some("doc"))
      df.where(plan.pred)
    } catch {
      case e: IllegalArgumentException => throw e // bad query text propagates
      case scala.util.control.NonFatal(_) =>
        df.where(coalesce(BflExpressions.bflMatch(col("doc"), expanded), lit(false)))
    }

  private def usesAlteringHelpers(q: Ast.Query): Boolean =
    Ast.usesAlteringHelpers(q)

  /** The live log, from the MANIFEST — never the filesystem. A listing
    * observes the batch set strictly before or strictly after a manifest
    * commit, and every listed dir is guaranteed to exist for at least
    * `gcGraceMs` after leaving the manifest, so a scan planned against this
    * snapshot reads files that still exist even if compaction or retention
    * replaces them mid-flight. (The old fs-listing design made every scan
    * race the compactor's renames — routine FAILED_READ retries under
    * steady ingest, livelock under churn.)
    */
  private def listBatches(): Seq[Path] = synchronized {
    meta.batches.map(recordsDir.resolve(_))
  }

  // ---- deferred GC of replaced/evicted dirs --------------------------------
  // (path, wall-clock deadline); insertion order = deadline order
  private val pendingDeletes =
    new java.util.concurrent.ConcurrentLinkedQueue[(Path, Long)]()

  private def scheduleDelete(ps: Seq[Path]): Unit = {
    val deadline = System.currentTimeMillis() + gcGraceMs
    ps.foreach(p => pendingDeletes.add((p, deadline)))
    if (gcGraceMs <= 0) gcTick() // tests that count directories: synchronous
  }

  /** Delete every queued dir whose grace expired (`force` = all of them). */
  private[engine] def gcTick(force: Boolean = false): Unit = {
    val now = System.currentTimeMillis()
    var done = false
    while (!done) {
      val head = pendingDeletes.peek()
      if (head == null || (!force && head._2 > now)) done = true
      else {
        pendingDeletes.poll()
        if (Files.exists(head._1)) deleteBatches(Seq(head._1))
      }
    }
  }

  private def deleteBatches(batches: Seq[Path]): Unit =
    batches.foreach { p =>
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }

  private def dirBytes(p: Path): Long =
    Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum

  /** Size-bounded retention: delete oldest batches while the log exceeds the
    * byte budget; record the max ts evicted as truncatedTimestamp + advance
    * removedCount (reference: native.go:1046-1108 periodicPartitioner).
    */
  private def enforceRetention(): Unit =
    meta.limitBytes.foreach { budget =>
      var batches = listBatches()
      var total = batches.map(dirBytes).sum
      while (total > budget && batches.length > 1) {
        val oldest = batches.head
        // read evicted ids/ts for the truncation bookkeeping (the dir is
        // still on disk — manifest entries always are)
        val stats = spark.read.schema(recordSchema).parquet(oldest.toString)
          .agg(max("ts").as("maxTs"), count(lit(1)).as("n"), max("id").as("maxId"))
          .collect()(0)
        val evictedN = stats.getLong(1)
        val maxTs = if (stats.isNullAt(0)) 0L else stats.getLong(0)
        // manifest commit is the eviction; the dir lingers through the GC
        // grace so scans planned before this commit finish cleanly
        meta = meta.copy(
          removedCount = meta.removedCount + evictedN,
          truncatedTimestamp = math.max(meta.truncatedTimestamp, maxTs + 1),
          batches = meta.batches.filterNot(_ == oldest.getFileName.toString)
        )
        saveMeta()
        scheduleDelete(Seq(oldest))
        batches = batches.tail
        total = batches.map(dirBytes).sum
      }
    }

  // ---- batch-log compaction ----------------------------------------------
  // Long-running trickle ingest writes one batch dir per micro-batch; left
  // alone, a day at a 500 ms trigger is ~170k dirs and driver-side listing +
  // parquet footer opens dominate every query (the 100 TB scale-killer). The
  // reference's periodicPartitioner keeps ≤2 live partitions by rotation
  // (native.go:1046-1108); here the analog is LSM-style consolidation:
  // contiguous runs of small dirs are rewritten into one id-sorted dir and
  // atomically swapped in. Steady-state listing is O(total/target +
  // minRun + keepRecent) dirs; write amplification is the standard
  // size-tiered ~log(target/batch) per record.

  /** One bounded unit of compaction work per ticker tick: at most one group
    * rewritten + swapped. No-op (a directory listing) when nothing qualifies.
    * Overlap-guarded: the rewrite runs outside the engine lock, so a manual
    * tick racing the ticker must not double-write the same tmp dir.
    */
  private[engine] def compactionTick(): Unit =
    if (compactionInFlight.compareAndSet(false, true))
      try {
        // consume up to 4 runs per tick: one-run-per-second cannot keep up
        // with a bursty wire ingest (each burst = one dir; a 5-burst/s
        // client outruns a 1-group/s compactor and the listing grows
        // without bound). Bounded so a tick never monopolizes the engine.
        var rounds = 0
        var planned = planCompactionGroup()
        while (planned.isDefined && rounds < 4) {
          compactGroup(planned.get)
          rounds += 1
          planned = if (rounds < 4) planCompactionGroup() else None
        }
        gcTick() // manual-tick tests (background off) still age out replaced dirs
      } finally compactionInFlight.set(false)

  private val compactionInFlight = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** First contiguous run of ≥ minRun small dirs that bin-packs under
    * targetBytes — excluding the newest keepRecent dirs (the live tail
    * region) and anything younger than minAge (grace for in-flight tail
    * micro-batches planned against the old paths).
    */
  private def planCompactionGroup(): Option[Seq[Path]] = {
    val now = System.currentTimeMillis()
    val eligible = listBatches()
      .dropRight(compactKeepRecent)
      .filter(p => now - Files.getLastModifiedTime(p).toMillis >= compactMinAgeMs)
    var group = List.empty[Path]
    var bytes = 0L
    for (p <- eligible) {
      val b = dirBytes(p)
      if (b >= compactTargetBytes || (bytes + b > compactTargetBytes && group.nonEmpty)) {
        // run closes: a full-size dir, or the pack is full
        if (group.length >= compactMinRun) return Some(group.reverse)
        group = Nil
        bytes = 0L
      }
      if (b < compactTargetBytes) { group ::= p; bytes += b }
    }
    if (group.length >= compactMinRun) Some(group.reverse) else None
  }

  /** Rewrite `group` into one id-sorted consolidated dir under a FRESH name
    * (head member's number + a bumped `_cN` generation — sorts into exactly
    * the head's position), then commit by patching the manifest. Members are
    * never renamed or touched: in-flight scans planned against the old
    * manifest keep reading them until the GC grace expires. Crash safety is
    * positional, no journal needed:
    *   - before the manifest commit → the consolidated dir is an orphan the
    *     open-time reconcile deletes; members intact;
    *   - after the commit → members are off-manifest garbage the reconcile
    *     deletes.
    * The expensive rewrite runs OUTSIDE the lock — ids are immutable and
    * members are frozen.
    */
  private def compactGroup(group: Seq[Path]): Unit = {
    val names = group.map(_.getFileName.toString)
    val newName = Engine.bumpGeneration(names.head)
    val tmp = recordsDir.resolve(s".compact_$newName.tmp")
    spark.read
      .schema(recordSchema)
      .parquet(group.map(_.toString): _*)
      .coalesce(1)                 // one output file — no shuffle
      .sortWithinPartitions("id")  // id-sorted → row-group min/max pruning intact
      .write
      .mode(SaveMode.Overwrite)    // clobber a stale tmp from a crashed run
      .parquet(tmp.toString)
    synchronized {
      // retention may have evicted members while we rewrote — abort stale
      // swaps (the group must still be one contiguous manifest run)
      val idx = meta.batches.indexOf(names.head)
      val stillLive = idx >= 0 &&
        meta.batches.slice(idx, idx + names.length) == names
      if (!stillLive) { deleteBatches(Seq(tmp)); return }
      Files.move(tmp, recordsDir.resolve(newName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      meta = meta.copy(batches = meta.batches.patch(idx, Seq(newName), names.length))
      saveMeta()
      scheduleDelete(group)
    }
  }

  /** Crash recovery for an interrupted swap. Invariants: the manifest is
    * written only after the consolidated tmp is COMPLETE; the tmp is renamed
    * to the final name only after every member is renamed to trash; trash is
    * deleted only after the final rename. So with a manifest present:
    * tmp still exists → finish the swap; tmp gone → the swap completed, only
    * trash cleanup remains. Hidden dirs without a manifest are incomplete
    * rewrites (data still lives in the original members) — deleted.
    */
  /** Open-time reconcile of disk vs manifest.
    *
    *   1. Replay a PRE-MANIFEST crash journal (compact_manifest.json from an
    *      older engine version) so legacy logs open losslessly.
    *   2. A legacy meta.json (no `batches` key) adopts the filesystem
    *      listing as its first manifest.
    *   3. Every on-disk batch dir NOT in the manifest is garbage by
    *      construction (an unacked crashed insert, or a replaced/evicted
    *      member whose deferred GC never ran) — deleted. This is also what
    *      makes a crashed mid-insert append safe: the unacked dir would
    *      otherwise collide with the next insert's batchSeq name.
    *   4. Manifest entries whose dir vanished (manual deletion) are dropped.
    *   5. Hidden (tmp/trash) dirs are incomplete rewrites — deleted.
    */
  private def reconcileLog(): Unit = synchronized {
    if (Files.exists(compactManifestPath)) {
      // legacy journal: the old swap renamed members away and reused the
      // head's name; finish or roll it back exactly as the old code did
      val m = JsonTree.parse(
        new String(Files.readAllBytes(compactManifestPath), StandardCharsets.UTF_8)
      ).asInstanceOf[JsonTree.Obj]
      val finalName = m.get("final").collect { case s: String => s }.get
      val names = m.get("old").collect { case s: String => s }.get.split(',').toSeq
      val tmp = recordsDir.resolve(s".compact_$finalName.tmp")
      if (Files.exists(tmp)) {
        names.foreach { n =>
          val p = recordsDir.resolve(n)
          if (Files.exists(p))
            Files.move(p, recordsDir.resolve(s".trash_$n"),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        Files.move(tmp, recordsDir.resolve(finalName),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      names.foreach(n => deleteBatches(Seq(recordsDir.resolve(s".trash_$n"))
        .filter(Files.exists(_))))
      Files.deleteIfExists(compactManifestPath)
    }
    def onDisk(): Seq[String] = Files.list(recordsDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("batch_"))
      .toSeq.sorted
    if (!meta.batchesKnown) {
      meta = meta.copy(batches = onDisk().toVector, batchesKnown = true)
      saveMeta()
    } else {
      val live = meta.batches.toSet
      onDisk().filterNot(live).foreach(n => deleteBatches(Seq(recordsDir.resolve(n))))
      val missing = meta.batches.filterNot(n => Files.exists(recordsDir.resolve(n)))
      if (missing.nonEmpty) {
        meta = meta.copy(batches = meta.batches.filterNot(missing.toSet))
        saveMeta()
      }
    }
    // hidden dirs (incomplete rewrites) are safe to drop
    Files.list(recordsDir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(".compact_") ||
        p.getFileName.toString.startsWith(".trash_") ||
        p.getFileName.toString.endsWith(".tmp"))
      .toSeq
      .foreach(p => deleteBatches(Seq(p)))
  }

  // ---- background retention ticker --------------------------------------
  // The reference's periodicPartitioner runs on a 1 s ticker
  // (native.go:149,1049-1057) and evicts even while the log is idle;
  // mutation-time enforcement alone leaves a pending budget breach (e.g. a
  // /limit issued after the last insert) unevicted until the next write.
  // The tick is a no-op without a limit (one volatile read); with one, the
  // steady-state pass is a driver-side directory listing — no Spark job
  // unless the budget is actually exceeded.
  private val tickerStop = new java.util.concurrent.atomic.AtomicBoolean(false)
  locally {
    val t = new Thread(() => {
      var interrupted = false
      while (!tickerStop.get() && !interrupted) {
        try {
          if (meta.limitBytes.isDefined) synchronized { enforceRetention() }
          if (compactInBackground) compactionTick()
          gcTick()
        } catch {
          case _: InterruptedException => interrupted = true
          case _: Exception            => ()
        }
        // Sleep outside the try: a persistently-throwing tick (transient FS
        // error) must not skip the pause, or the daemon busy-spins at 100%.
        try Thread.sleep(1000)
        catch { case _: InterruptedException => interrupted = true }
      }
    }, "graft-retention-ticker")
    t.setDaemon(true)
    t.start()
  }

  /** Stop the background retention ticker (idempotent). The engine stays
    * usable — retention still runs at mutation time. Drains the deferred-GC
    * queue (no reader of THIS engine remains to race; a dir missed here is
    * collected by the next open's reconcile anyway).
    */
  def close(): Unit = {
    tickerStop.set(true)
    gcTick(force = true)
  }
}

object Engine {

  /** 24-digit zero-padded record id (reference: server/lib/helpers.go:15-17). */
  def indexToId(i: Long): String = f"$i%024d"

  /** Fresh consolidated-dir name: the head member's fixed-width number plus
    * a bumped `_cN` generation. `batch_000000007` → `batch_000000007_c1`,
    * `batch_000000007_c1` → `batch_000000007_c2`. Name-sorts into exactly
    * the head's manifest position (`_` > digit never matters: the next
    * batch number differs in the fixed-width digits first).
    */
  private[engine] def bumpGeneration(headName: String): String =
    headName match {
      case Engine.GenRe(base, gen) => s"${base}_c${gen.toInt + 1}"
      case _                       => s"${headName}_c1"
    }
  private val GenRe = "(batch_\\d+)_c(\\d+)".r

  /** Does this failure look like a read that lost the race against
    * retention (deleted batch file/dir mid-plan or mid-read)? Checked
    * recursively — the parquet footer path wraps its FileNotFoundException.
    */
  private[graft] def isEvictionRace(e: Throwable): Boolean =
    e != null && (String.valueOf(e.getMessage).contains("FAILED_READ_FILE") ||
      String.valueOf(e.getMessage).contains("PATH_NOT_FOUND") ||
      e.isInstanceOf[java.io.FileNotFoundException] ||
      isEvictionRace(e.getCause))

  /** Executor-side pass 1 of [[Engine.insertDistributed]]: parse, reject
    * non-JSON / non-object lines, run the insertion filter (its
    * record-altering helpers mutate the tree), serialize the survivor —
    * WITHOUT an id, which only exists after the distributed rank pass. The
    * AST ships in the closure (plain case classes); the Interp is built once
    * per partition. Exactly mirrors the driver path in [[Engine.insert]].
    */
  private[engine] def prepPartition(filterQ: Option[Ast.Query])(
      it: Iterator[String]): Iterator[String] = {
    val interp = filterQ.map(new Interp(_))
    it.flatMap { json =>
      JsonTree.tryParse(json) match {
        case Some(m: JsonTree.Obj) if interp.forall(_.eval(m)) =>
          Some(JsonTree.serialize(m))
        case _ => None // non-JSON / non-object / filtered out — no id consumed
      }
    }
  }

  /** Executor-side pass 2: inject the assigned 24-digit id (replacing an
    * existing `id` key in place, appending otherwise — LinkedHashMap.put,
    * same as the driver path) and lift the record's own `timestamp` over the
    * batch insert time (reference: native.go:302-311).
    */
  private[engine] def buildRecordRow(doc: String, id: Long, now: Long): Row = {
    val m = JsonTree.parse(doc).asInstanceOf[JsonTree.Obj]
    m.put("id", indexToId(id))
    val ts = m.get("timestamp") match {
      case Some(l: Long) => l
      case _             => now
    }
    Row(id, ts, JsonTree.serialize(m))
  }

  final case class FetchMeta(
      total: Long,
      numberOfWritten: Long,
      leftOff: Long,
      noMoreData: Boolean,
      truncatedTimestamp: Long
  )

  /** Engine metadata — macros, insertion filter, retention, id high-water.
    * Hand-rolled JSON (no external deps beyond Jackson, reused from JsonTree).
    */
  final case class Meta(
      highWater: Long = 0L,
      batchSeq: Long = 0L,
      removedCount: Long = 0L,
      truncatedTimestamp: Long = 0L,
      limitBytes: Option[Long] = None,
      insertionFilter: Option[String] = None,
      macros: Map[String, String] = Map.empty,
      /** The LIVE batch manifest, in id (= name-sort) order. Readers list
        * the log from here, never from the filesystem — so a dir leaving
        * the manifest (compaction swap, retention evict) can stay on disk
        * through a GC grace window without any reader ever seeing both the
        * old and new copy. The manifest commit (atomic meta.json rename) IS
        * the swap; on-disk dirs not in the manifest are garbage.
        */
      batches: Vector[String] = Vector.empty,
      /** false only for a meta.json written before the manifest existed —
        * the open-time reconcile then adopts the filesystem listing once.
        * Never serialized.
        */
      batchesKnown: Boolean = true
  ) {
    def toJson: String = {
      val m = new JsonTree.Obj
      m.put("highWater", highWater)
      m.put("batchSeq", batchSeq)
      m.put("removedCount", removedCount)
      m.put("truncatedTimestamp", truncatedTimestamp)
      limitBytes.foreach(m.put("limitBytes", _))
      insertionFilter.foreach(m.put("insertionFilter", _))
      val mm = new JsonTree.Obj
      macros.foreach { case (k, v) => mm.put(k, v) }
      m.put("macros", mm)
      val bb = new JsonTree.Arr
      batches.foreach(bb += _)
      m.put("batches", bb)
      JsonTree.serialize(m)
    }
  }

  object Meta {
    def fromJson(s: String): Meta = {
      val m = JsonTree.parse(s).asInstanceOf[JsonTree.Obj]
      def longOf(k: String): Long = m.get(k) match {
        case Some(l: Long) => l
        case _             => 0L
      }
      Meta(
        highWater = longOf("highWater"),
        batchSeq = longOf("batchSeq"),
        removedCount = longOf("removedCount"),
        truncatedTimestamp = longOf("truncatedTimestamp"),
        limitBytes = m.get("limitBytes").collect { case l: Long => l },
        insertionFilter = m.get("insertionFilter").collect { case s: String => s },
        macros = m.get("macros") match {
          case Some(mm: JsonTree.Obj) =>
            mm.collect { case (k, v: String) => k -> v }.toMap
          case _ => Map.empty
        },
        batches = m.get("batches") match {
          case Some(a: JsonTree.Arr) => a.toList.collect { case s: String => s }.toVector
          case _                     => Vector.empty
        },
        batchesKnown = m.get("batches").isDefined
      )
    }
  }
}
