package graft

import graft.ops.IncrementalMv

/** Pins the three claims q173's oracle can't see from the outside:
  * (1) the refresh's only fact-side read is the CDF slice — no snapshot
  * scan of the fact hides in the plan; (2) the MV-partials + watermark
  * publish is atomic under a crash injected between the two table
  * commits (roll-forward recovery, never a silent double-apply); (3) a
  * no-op refresh publishes nothing — the MV's version history is
  * untouched. Fold ≡ rebuild value-identity is re-checked after every
  * scenario against a full re-aggregation of the live fact. */
class IncrementalMvSpec extends SparkTestBase {

  private val fact = "graft_cat.db.mvspec_f"
  private val mv = "graft_cat.db.mvspec_mv"
  private val meta = "graft_cat.db.mvspec_meta"

  private def reset(): Unit = {
    ops.ensureGraftCatalog(spark)
    Seq(fact, mv, meta).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.sql(
      s"""CREATE TABLE $fact (id BIGINT, v BIGINT)
         |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.sql(s"CREATE TABLE $mv (g BIGINT, cnt BIGINT, sum_v BIGINT)")
    spark.sql(s"CREATE TABLE $meta (k BIGINT, last_v BIGINT)")
    spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "3000").option("parts", "4").load()
      .createOrReplaceTempView("graft_seq_mvspec")
  }

  private def mvEqualsRebuild(): Unit = {
    val rebuilt = spark.sql(
      s"SELECT id % 10 AS g, COUNT(*) AS cnt, CAST(SUM(v) AS BIGINT) AS sum_v " +
        s"FROM $fact GROUP BY id % 10")
    val stored = spark.table(mv)
    assert(stored.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(stored).isEmpty,
      s"MV diverged from rebuild:\nstored=${stored.collect().toSeq.sortBy(_.getLong(0))}" +
        s"\nrebuilt=${rebuilt.collect().toSeq.sortBy(_.getLong(0))}")
  }

  private def mvVersion(): Long =
    spark.sql(s"SELECT MAX(v) FROM $mv.versions").head.getLong(0)

  test("refresh reads the CDF slice, never a fact snapshot; no-op publishes nothing") {
    reset()
    spark.sql(s"INSERT INTO $fact SELECT id, v FROM graft_seq_mvspec WHERE id < 2000")
    IncrementalMv.build(spark, fact, mv, meta, Seq("id % 10" -> "g"), "v")
    mvEqualsRebuild()
    spark.sql(s"INSERT INTO $fact SELECT id, v FROM graft_seq_mvspec WHERE id >= 2000")
    spark.sql(s"DELETE FROM $fact WHERE v < 50")
    val r = IncrementalMv.refresh(spark, fact, mv, meta, Seq("id % 10" -> "g"), "v")
    assert(r.refreshed)
    mvEqualsRebuild()
    // the delta plan scans the fact ONLY through its @cdf: table — a
    // bare snapshot scan of the fact ident must not appear
    assert(r.deltaPlan.contains("@cdf:"), r.deltaPlan)
    assert("db\\.mvspec_f(?!@cdf:)".r.findFirstIn(r.deltaPlan).isEmpty,
      s"refresh plan contains a non-CDF scan of the fact:\n${r.deltaPlan}")
    // churn witness: 1000 inserts + |v<50| pre-images over all 3000
    val del = spark.sql(
      "SELECT COUNT(*) FROM graft_seq_mvspec WHERE v < 50").head.getLong(0)
    assert(r.changesScanned === 1000L + del)
    // no-op: nothing scanned, nothing published, MV history untouched
    val mvV = mvVersion()
    val r2 = IncrementalMv.refresh(spark, fact, mv, meta, Seq("id % 10" -> "g"), "v")
    assert(!r2.refreshed && r2.changesScanned === 0L)
    assert(mvVersion() === mvV, "a no-op refresh must not commit to the MV")
  }

  test("MV + watermark publish survives a crash between the two table commits") {
    reset()
    spark.sql(s"INSERT INTO $fact SELECT id, v FROM graft_seq_mvspec WHERE id < 1000")
    IncrementalMv.build(spark, fact, mv, meta, Seq("id % 10" -> "g"), "v")
    spark.sql(s"INSERT INTO $fact SELECT id, v FROM graft_seq_mvspec WHERE id >= 1000")
    spark.sql(s"UPDATE $fact SET v = v + 777 WHERE id % 10 = 4")
    import graft.sources.SegTxn
    SegTxn.afterTableCommit.set { _ =>
      SegTxn.afterTableCommit.set(_ => ())
      throw new RuntimeException("injected crash between table commits")
    }
    val crashed = try {
      intercept[Exception] {
        IncrementalMv.refresh(spark, fact, mv, meta, Seq("id % 10" -> "g"), "v")
      }
    } finally SegTxn.afterTableCommit.set(_ => ())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(crashed).exists(_.contains("injected crash")),
      msgs(crashed).mkString(" | "))
    // roll-forward recovery completes the torn publish exactly once;
    // fold ≡ rebuild afterwards, and the watermark reflects the head so
    // the next refresh is a no-op (no double-apply of the churn)
    val recovered = spark.sql("CALL graft_cat.system.txn_recover()").head.getLong(0)
    assert(recovered === 1L)
    mvEqualsRebuild()
    val r = IncrementalMv.refresh(spark, fact, mv, meta, Seq("id % 10" -> "g"), "v")
    assert(!r.refreshed, "watermark must be at head after recovery")
  }

  test("whole-group deletion drops the MV row; repeated DML waves keep fold == rebuild") {
    reset()
    spark.sql(s"INSERT INTO $fact SELECT id, v FROM graft_seq_mvspec WHERE id < 1500")
    IncrementalMv.build(spark, fact, mv, meta, Seq("id % 10" -> "g"), "v")
    spark.sql(s"DELETE FROM $fact WHERE id % 10 = 6")
    val r1 = IncrementalMv.refresh(spark, fact, mv, meta, Seq("id % 10" -> "g"), "v")
    assert(r1.refreshed)
    assert(spark.sql(s"SELECT COUNT(*) FROM $mv WHERE g = 6").head.getLong(0) === 0L,
      "a group whose count reaches zero must leave the MV")
    mvEqualsRebuild()
    spark.sql(s"INSERT INTO $fact SELECT id, v FROM graft_seq_mvspec " +
      "WHERE id >= 1500 AND id % 10 IN (6, 7)")
    spark.sql(s"UPDATE $fact SET v = v + 5 WHERE id % 3 = 1")
    spark.sql(s"DELETE FROM $fact WHERE v % 7 = 2")
    IncrementalMv.refresh(spark, fact, mv, meta, Seq("id % 10" -> "g"), "v")
    mvEqualsRebuild()
  }

  test("expire_versions below the watermark: refresh rebuilds, never wedges") {
    // retention vs watermark (the CdcIndex.ensure discipline): expiring
    // commits inside (lastV, head] makes the CDF read refuse the range
    // — without the guard the refresh would fail identically forever.
    // It must degrade to the full re-build and keep serving.
    reset()
    spark.sql(s"INSERT INTO $fact SELECT id, v FROM graft_seq_mvspec WHERE id < 1000")
    IncrementalMv.build(spark, fact, mv, meta, Seq("id % 10" -> "g"), "v")
    spark.sql(s"INSERT INTO $fact SELECT id, v FROM graft_seq_mvspec " +
      "WHERE id >= 1000 AND id < 2000")
    spark.sql(s"DELETE FROM $fact WHERE v < 25")
    spark.sql("CALL graft_cat.system.expire_versions('db.mvspec_f', 1)")
    val r = IncrementalMv.refresh(spark, fact, mv, meta,
      Seq("id % 10" -> "g"), "v")
    assert(r.refreshed, "expired-range refresh must rebuild, not wedge")
    assert(r.deltaPlan.startsWith("rebuild:"), r.deltaPlan)
    mvEqualsRebuild()
    // the re-bound watermark serves the NEXT slice incrementally again
    spark.sql(s"INSERT INTO $fact SELECT id, v FROM graft_seq_mvspec WHERE id >= 2000")
    val r2 = IncrementalMv.refresh(spark, fact, mv, meta,
      Seq("id % 10" -> "g"), "v")
    assert(r2.refreshed && r2.deltaPlan.contains("@cdf:"),
      s"post-rebuild refresh did not take the CDF path: ${r2.deltaPlan}")
    mvEqualsRebuild()
  }

  test("refresh before build refuses loudly") {
    reset()
    spark.sql(s"INSERT INTO $fact SELECT id, v FROM graft_seq_mvspec WHERE id < 100")
    val e = intercept[IllegalArgumentException] {
      IncrementalMv.refresh(spark, fact, mv, meta, Seq("id % 10" -> "g"), "v")
    }
    assert(e.getMessage.contains("build"), e.getMessage)
  }
}
