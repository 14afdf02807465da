package graft

import org.scalatest.funsuite.AnyFunSuite

/** Direct-evidence closures for the ADVICE r15 items:
  *  1. the plan audit's warm-q137 block evicts the nofinal-poisoned
  *     pair memo before the clean q136 run, so the memoized pair
  *     table really is a checkpoint leaf (Scan ExistingRDD) — the
  *     shape docs/PLANS.md's WARM section claims;
  *  2. tableRowCount recurses into nested/partitioned parquet layouts
  *     and treats an empty file list under a real directory as a
  *     LOGGED probe failure (uncached), never a silent cached 0;
  *  3. streamFeats' rebuild path frees only the exact stale entry it
  *     observed — a fresh entry installed by a concurrent caller
  *     survives (its lineage-free localCheckpoint could not recover
  *     from an unpersist).
  * (The 4th item — draining the async listener bus before snapshot
  * reads in the stream1 probe and Bench's sched windows — is two call
  * sites of GraftSqlBridge.waitForListeners, the primitive the
  * AdviceR14Spec footer test already exercises around its probes.)
  */
class AdviceR15Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("warm-audit sequence: evicting the nofinal-poisoned memo yields a " +
      "checkpoint-leaf pair table; without the evict the memo is poisoned") {
    import graft.queries.DedupQueries
    def pairLeaf(): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
      DedupQueries.incrementalPairs(spark, sf).queryExecution.analyzed
    def isCkpt(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    // the audit main loop's shape: q136 constructed under nofinal —
    // this memoizes the UN-checkpointed pair plan (fingerprint valid)
    DedupQueries.invalidateIncrementalIndex(sf)
    sys.props("graft.audit.nofinal") = "true"
    try SparkEntry.queries("q136_dedup_incremental")(spark, sf)
    finally sys.props.remove("graft.audit.nofinal")
    // the r15 bug: a "clean" run WITHOUT eviction memo-hits the
    // poisoned entry — the pair table is NOT a checkpoint leaf
    SparkEntry.queries("q136_dedup_incremental")(spark, sf).count()
    assert(!isCkpt(pairLeaf()),
      "expected the nofinal-poisoned memo to survive a clean run " +
        "(the bug this spec pins); did the memo key change?")
    // the fix (PlanAudit's warm block): evict, THEN run clean — the
    // rebuilt memo is the materialized checkpoint leaf the audit's
    // WARM section documents
    DedupQueries.invalidateIncrementalIndex(sf)
    SparkEntry.queries("q136_dedup_incremental")(spark, sf).count()
    assert(isCkpt(pairLeaf()),
      "clean q136 did not memoize a checkpointed pair table — the " +
        "warm q137 audit would show a recomputed pipeline again")
    DedupQueries.invalidateIncrementalIndex(sf)
  }

  test("tableRowCount recurses into nested parquet layouts and does not " +
      "cache a 0 for an empty directory") {
    import graft.streaming.StreamingQueries
    val tmp = java.nio.file.Files.createTempDirectory("graft_rowcount")
    // nested layout: part files live in SUBDIRECTORIES (the
    // hive-partitioned shape Sources.writePartitioned produces) — the
    // old top-level-only listing saw zero files and cached n=0
    spark.read.parquet(s"$sf/events.parquet").limit(500)
      .write.parquet(s"$tmp/events.parquet/sub=a")
    spark.read.parquet(s"$sf/events.parquet").limit(250)
      .write.parquet(s"$tmp/events.parquet/sub=b")
    assert(StreamingQueries.eventsRowCount(spark, tmp.toString) === 750L,
      "nested part files were not counted — a partitioned layout " +
        "would silently fall back to the in-heap provider")
    // empty-directory probe: a real dir with no parquet underneath is
    // a FAILURE (logged, returns 0) and must NOT be cached — once
    // files appear, the next probe sees them
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_rowcount2")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$tmp2/events.parquet"))
    assert(StreamingQueries.eventsRowCount(spark, tmp2.toString) === 0L)
    spark.read.parquet(s"$sf/events.parquet").limit(111)
      .write.mode("append").parquet(s"$tmp2/events.parquet")
    assert(StreamingQueries.eventsRowCount(spark, tmp2.toString) === 111L,
      "the empty-directory 0 was cached — the silent in-heap fallback " +
        "ADVICE r15 flagged")
  }

  test("streamFeats CAS install: a concurrently installed fresh entry " +
      "survives; the loser's table is the one freed") {
    import graft.streaming.StreamingQueries
    def ckpt(n: Long): org.apache.spark.sql.DataFrame =
      spark.range(n).toDF("v").localCheckpoint(true)
    def rddOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd
    def persisted(df: org.apache.spark.sql.DataFrame) =
      rddOf(df).getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
    val dir = s"graft_feats_race_${System.nanoTime()}"
    val fpOld = (1L, 1L); val fpNew = (2L, 2L)
    val stale = ckpt(3)
    StreamingQueries.installStreamFeats(dir, fpOld, stale, None)
    // thread A observes `stale`, then — before A installs — a
    // concurrent caller B invalidates and installs a FRESH entry
    val observed = Some((fpOld, stale))
    StreamingQueries.invalidateStreamFeats(dir) // B: frees stale
    assert(!persisted(stale))
    val fresh = ckpt(5)
    StreamingQueries.installStreamFeats(dir, fpNew, fresh, None) // B installs
    // A's rebuild completes and installs against its stale OBSERVATION:
    // with the old code this unpersisted whatever was cached — B's
    // fresh, lineage-free table, an unrecoverable corruption
    val mine = ckpt(5)
    val won = StreamingQueries.installStreamFeats(dir, fpNew, mine, observed)
    assert(persisted(fresh), "the concurrent caller's fresh entry was " +
      "unpersisted by a loser's stale observation (ADVICE r15)")
    assert(!persisted(mine), "the racing loser's table must be freed " +
      "(nobody has seen it)")
    assert(rddOf(won).id === rddOf(fresh).id,
      "the loser must adopt the winner's table")
    StreamingQueries.invalidateStreamFeats(dir)
    assert(!persisted(fresh))
  }

  test("Bench.concurrentGraftJvms excludes this JVM and its ancestors") {
    // this test runs INSIDE an sbt JVM whose own cmdline mentions no
    // graft main, launched by an sbt launcher that may; the fence must
    // never name its own process chain — and on a quiet box the list
    // is empty, which is exactly the BENCH_r16 assertion shape
    val self = ProcessHandle.current().pid()
    val hits = Bench.concurrentGraftJvms()
    assert(!hits.exists(_.startsWith(s"pid=$self:")),
      s"the fence named its own JVM: $hits")
  }
}
