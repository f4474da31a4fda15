package graft

import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.GraftCatalog

/** CBO statistics for `graft_cat` tables ([[graft.sources.SegScan]]
  * `estimateStatistics`): manifest-only table stats (post-pruning
  * bytes/rows) drive no-hint broadcasts, and per-column stats — zone-map
  * min/max, null-freedom, bloom-fill NDV — feed Catalyst's CBO with zero
  * data reads. q67 pinned this discipline on SeqSource; this pins it on
  * the main catalog. */
class CatalogCboStatsSpec extends SparkTestBase {

  private def cat: GraftCatalog = {
    ops.ensureGraftCatalog(spark)
    spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[GraftCatalog]
  }

  private def scanStats(tbl: String) =
    cat.segTable(tbl)
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
      .asInstanceOf[SupportsReportStatistics].estimateStatistics()

  test("column stats from the manifest: zone-map min/max, nullCount 0, bloom NDV") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cbo_t")
    spark.sql("CREATE TABLE graft_cat.db.cbo_t (id BIGINT, v BIGINT, s STRING)")
    // two segments, disjoint ranges, v deliberately low-cardinality
    spark.sql("INSERT INTO graft_cat.db.cbo_t SELECT id, id % 10, CAST(id AS STRING) FROM range(0, 600)")
    spark.sql("INSERT INTO graft_cat.db.cbo_t SELECT id, id % 10, CAST(id AS STRING) FROM range(600, 1000)")
    val st = scanStats("db.cbo_t")
    assert(st.numRows().getAsLong === 1000L)
    val cs = st.columnStats()
    val idStats = cs.get(Expressions.column("id"))
    assert(idStats != null, "BIGINT column must report stats")
    assert(idStats.min().get() === 0L)
    assert(idStats.max().get() === 999L)
    assert(idStats.nullCount().getAsLong === 0L)
    // bloom-fill NDV: 1000 distinct over the 16384-bit union — tight
    val ndv = idStats.distinctCount().getAsLong
    assert(ndv > 850 && ndv < 1150, s"id NDV estimate $ndv")
    // low-cardinality column: the estimate must see ~10, not ~1000
    val vNdv = cs.get(Expressions.column("v")).distinctCount().getAsLong
    assert(vNdv >= 8 && vNdv <= 13, s"v NDV estimate $vNdv")
    // string columns: prefix-encoded zone maps/blooms are approximations
    // an optimizer could mistake for exact — deliberately NOT reported
    assert(cs.get(Expressions.column("s")) == null)
  }

  test("column stats follow pruning: a pruned scan reports the surviving range") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cbo_p")
    spark.sql("CREATE TABLE graft_cat.db.cbo_p (id BIGINT, v BIGINT)")
    (0 until 4).foreach(i => spark.sql(
      s"INSERT INTO graft_cat.db.cbo_p SELECT id, id FROM range(${i * 100}, ${i * 100 + 100})"))
    // filter pushed to the scan prunes segments; stats must shrink with it
    val df = spark.sql("SELECT * FROM graft_cat.db.cbo_p WHERE id >= 300")
    df.collect()
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan }
    assert(scans.nonEmpty)
    val st = scans.head.asInstanceOf[SupportsReportStatistics].estimateStatistics()
    assert(st.numRows().getAsLong === 100L, "only the surviving segment's rows")
    val idStats = st.columnStats().get(Expressions.column("id"))
    assert(idStats.min().get() === 300L)
    assert(idStats.max().get() === 399L)
  }

  test("no-hint broadcast: a small catalog table auto-broadcasts against a big fact") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cbo_dim")
    spark.sql("CREATE TABLE graft_cat.db.cbo_dim (id BIGINT, name STRING)")
    spark.sql("INSERT INTO graft_cat.db.cbo_dim SELECT id, concat('n', id) FROM range(0, 500)")
    val fact = spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "200000").option("parts", "4").load()
    val dim = spark.table("graft_cat.db.cbo_dim")
    // NO broadcast() hint anywhere — the scan-reported sizeInBytes must
    // put the dim under the auto-broadcast threshold by itself
    val joined = fact.join(dim, fact("id") % 500 === dim("id"))
      .groupBy(dim("name")).count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("v2 column stats surface into catalyst attributeStats under CBO") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cbo_c")
    spark.sql("CREATE TABLE graft_cat.db.cbo_c (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft_cat.db.cbo_c SELECT id, id % 7 FROM range(0, 900)")
    val saved = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val df = spark.table("graft_cat.db.cbo_c")
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == 900L), stats)
      val attr = stats.attributeStats.find(_._1.name == "id").map(_._2)
      assert(attr.isDefined, s"attributeStats missing id: ${stats.attributeStats}")
      assert(attr.get.min.contains(0L) && attr.get.max.contains(899L), attr)
    } finally spark.conf.set("spark.sql.cbo.enabled", saved)
  }
}
