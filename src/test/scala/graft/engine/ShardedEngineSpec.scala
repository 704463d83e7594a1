package graft.engine

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The sharded-log design the Engine scaladoc promises for cluster scale:
  * per-shard single writers running in parallel, (shard, id) global keys,
  * cross-shard queries as unions of per-shard scans.
  */
class ShardedEngineSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[8]", 8)
    .appName("sharded-spec")
    .getOrCreate()

  test("parallel shard writers keep per-shard ids contiguous; union query matches") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-sharded").toString
    val se = new ShardedEngine(spark, dir, 4)
    val docs = (0 until 2000).map(i => s"""{"n":$i,"even":${i % 2 == 0}}""")
    se.insert(docs)
    assert(se.totalRecords == 2000)
    // every shard got a non-trivial slice (hash routing is uniform)
    se.shards.foreach(e => assert(e.totalRecords > 200, s"skewed shard: ${e.totalRecords}"))
    // per-shard ids are contiguous from 0 (single writer per log)
    se.shards.foreach { e =>
      val ids = e.records().select("id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (0L until e.totalRecords).toSeq)
    }
    // a cross-shard query equals the per-document ground truth
    val matched = se.query("even == true").select("doc").collect().map(_.getString(0))
    assert(matched.length == 1000)
    assert(matched.forall(_.contains("\"even\":true")))
    // limit(N) caps the GLOBAL result, even when the limit arrives through
    // a macro expansion (per-shard limit is only a superset pre-filter)
    assert(se.query("even == true and limit(7)").count() == 7)
    se.addMacro("hotpage", "even == true and limit(5)")
    assert(se.query("hotpage").count() == 5)
    // insert throughput observation (not asserted — timing is environment-
    // bound): round-1 measured ~24k rec/s on ONE writer; four parallel
    // writers pipeline parse/filter/append per shard
  }

  test("sharded ingest outpaces the single writer on the same batch") {
    spark.sparkContext.setLogLevel("WARN")
    val docs = (0 until 40000).map(i => s"""{"n":$i,"s":"payload-$i","t":"${"x" * 200}"}""")
    // warmup both paths once (JIT, parquet committer)
    locally {
      val d1 = Files.createTempDirectory("graft-w1").toString
      new Engine(spark, d1).insert(docs.take(500))
      val d2 = Files.createTempDirectory("graft-w2").toString
      new ShardedEngine(spark, d2, 4).insert(docs.take(500))
    }
    // min-of-3 INTERLEAVED reps, the Bench timing discipline: a single-rep
    // pair is decided by whatever the box was doing in that instant — under
    // a fully loaded suite run the 4 parallel shard writers starve for
    // cores and a one-off 16.9s-vs-1.5s inversion fails the sanity bound on
    // a box state, not the code. Interleaving gives both paths the same
    // load trajectory; min-of-N keeps the number attributable to the path.
    def timeOnce(run: () => Long): Double = {
      val t0 = System.nanoTime()
      val n = run()
      val dt = (System.nanoTime() - t0) / 1e9
      assert(n == 40000L)
      dt
    }
    val (singles, shardeds) = (1 to 3).map { _ =>
      val singleDir = Files.createTempDirectory("graft-single").toString
      val single = new Engine(spark, singleDir)
      val tS = timeOnce(() => { single.insert(docs); single.totalRecords })
      val shardDir = Files.createTempDirectory("graft-shard").toString
      val sharded = new ShardedEngine(spark, shardDir, 4)
      val tH = timeOnce(() => { sharded.insert(docs); sharded.totalRecords })
      (tS, tH)
    }.unzip
    val tSingle = singles.min
    val tSharded = shardeds.min
    info(f"single-writer: $tSingle%.2f s, 4-shard: $tSharded%.2f s " +
      f"(${tSingle / tSharded}%.1fx, min of 3)")
    // only a sanity bound, not a benchmark: sharding must not be slower
    // than ~1.5x single (it should be faster; CI noise tolerated)
    assert(tSharded < tSingle * 1.5,
      f"sharded ingest slower than single writer: $tSharded%.2f vs $tSingle%.2f")
  }
}
