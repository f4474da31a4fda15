package graft

import graft.ops.IncrementalMv

/** Pins the DECLINE side of routing dashboards at a catalog MV — the
  * cases q174's oracle cannot see because a wrong rewrite would still
  * return rows: a FILTERED aggregate must NOT be served from the MV
  * (the filter predicates per-fact-row; the residual Filter node blocks
  * the Project-only walk), a same-granularity aggregate must not
  * rewrite (the MV's own rebuild shape), and a DISTINCT aggregate must
  * not rewrite (not mergeable from partials). The accept case re-checks
  * value identity after an incremental refresh, so "served from the MV"
  * and "fresh" hold together. */
class MvCatalogRewriteSpec extends SparkTestBase {

  private val fact = "graft_cat.db.mvrw_f"
  private val mv = "graft_cat.db.mvrw_mv"
  private val meta = "graft_cat.db.mvrw_meta"

  private def plan(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.toString

  private def setup(): Unit = {
    ops.ensureGraftCatalog(spark)
    Seq(fact, mv, meta).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.sql(
      s"""CREATE TABLE $fact (id BIGINT, g1 BIGINT, g2 BIGINT, v BIGINT)
         |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.sql(s"CREATE TABLE $mv (g1 BIGINT, g2 BIGINT, cnt BIGINT, sum_v BIGINT)")
    spark.sql(s"CREATE TABLE $meta (k BIGINT, last_v BIGINT)")
    spark.sql(
      s"""INSERT INTO $fact
         |SELECT id, id % 20 AS g1, id % 3 AS g2, id * 7 AS v
         |FROM range(0, 2000) AS t(id)""".stripMargin)
    IncrementalMv.build(spark, fact, mv, meta,
      Seq("g1" -> "g1", "g2" -> "g2"), "v")
    IncrementalMv.registerForRewrite(spark, fact, mv, Seq("g1", "g2"), "v")
  }

  test("coarser aggregate is served from the MV and tracks refreshes") {
    setup()
    val dash = s"SELECT g1, COUNT(*) AS n, SUM(v) AS v_sum FROM $fact GROUP BY g1"
    val p = plan(dash)
    assert(p.contains("mvrw_mv") && !p.contains("mvrw_f"),
      s"dashboard not served from the MV:\n$p")
    // ground truth via a shape the rule declines (residual Filter)
    def truth = spark.sql(
      s"SELECT g1, COUNT(*) AS n, SUM(v) AS v_sum FROM $fact " +
        "WHERE g2 >= -1 GROUP BY g1")
    def served = spark.sql(dash)
    assert(served.exceptAll(truth).isEmpty && truth.exceptAll(served).isEmpty)
    // stays correct across churn + incremental refresh
    spark.sql(s"DELETE FROM $fact WHERE v % 5 = 0")
    spark.sql(s"UPDATE $fact SET v = v + 13 WHERE g2 = 1")
    IncrementalMv.refresh(spark, fact, mv, meta,
      Seq("g1" -> "g1", "g2" -> "g2"), "v")
    assert(served.exceptAll(truth).isEmpty && truth.exceptAll(served).isEmpty,
      "MV-served dashboard diverged after refresh")
  }

  test("filtered, same-granularity, and DISTINCT aggregates are NOT rewritten") {
    setup()
    val filtered = plan(
      s"SELECT g1, SUM(v) AS v_sum FROM $fact WHERE g2 = 1 GROUP BY g1")
    assert(filtered.contains("mvrw_f"),
      s"a filtered aggregate must read the fact:\n$filtered")
    val sameGrain = plan(
      s"SELECT g1, g2, COUNT(*) AS n FROM $fact GROUP BY g1, g2")
    assert(sameGrain.contains("mvrw_f"),
      s"a same-granularity aggregate must read the fact:\n$sameGrain")
    val distinct = plan(
      s"SELECT g1, COUNT(DISTINCT g2) AS n FROM $fact GROUP BY g1")
    assert(distinct.contains("mvrw_f"),
      s"a DISTINCT aggregate must read the fact:\n$distinct")
  }
}
