package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental materialized-view maintenance driven by the change feed.
  *
  * The reference serves dashboards from pre-aggregated summary tables it
  * rebuilds wholesale on every pipeline run (`transformation.py`'s
  * aggregate dims) — fine when the fact fits one DuckDB file, fatal at
  * 100 TB where a rebuild re-scans the world for a day of churn. This
  * module closes the loop the engine already has both halves of:
  * [[graft.plans.MvRewrite]] routes readers AT summary tables, and the
  * catalog's change feed (`VERSION AS OF 'cdf:a..b'`,
  * [[graft.sources.SegTable.cdfTable]]) reads EXACTLY a range's changed
  * rows from manifest arithmetic. Refresh therefore costs the churn, not
  * the table:
  *
  *   - the MV stores mergeable partials (COUNT(*), SUM(v)) keyed by the
  *     grouping — the same partial-merge discipline as ext81/ext99;
  *   - refresh folds the feed's signed deltas (+1/+v per insert image,
  *     -1/-v per delete pre-image; an UPDATE is its delete+insert pair)
  *     into per-group adjustments, FULL OUTER-merges them onto the
  *     stored partials, and drops groups whose count reaches zero —
  *     algebraically identical to a full re-aggregation of the head
  *     snapshot, which is what the q173 oracle pins;
  *   - the MV partials and the refresh watermark (the last folded fact
  *     version, a one-row catalog table) publish in ONE cross-table
  *     transaction ([[graft.sources.SegTxn]]): a crash between the two
  *     commits leaves an intent record that `initialize()`/`txn_recover`
  *     rolls forward, so "partials applied" and "watermark advanced" can
  *     never diverge durably — the failure mode that silently
  *     double-applies a day of churn on the next refresh.
  *
  * Refreshes are single-maintainer by design (Delta's OPTIMIZE
  * discipline): concurrent refreshers are not merged, they are expected
  * to be serialized by whatever schedules maintenance. A racing WRITER
  * is safe — the delta scan is pinned to the head version the watermark
  * will record, so commits landing mid-refresh are simply next
  * refresh's churn.
  *
  * The helper keys the MV on one BIGINT grouping expression with
  * COUNT/SUM partials — the shape MvRewrite rewrites today. Wider MVs
  * (multi-column keys, more partials) are the same fold with more
  * columns.
  */
object IncrementalMv {

  /** One refresh's outcome: `changesScanned` = change-feed rows the
    * delta aggregation read (the churn — the cost witness), `refreshed`
    * = whether anything was published, `headVersion` = the fact version
    * the MV now reflects, `deltaPlan` = the delta scan's executed plan
    * (spec hook: proves the read is the CDF slice, not a snapshot). */
  case class RefreshResult(changesScanned: Long, refreshed: Boolean,
      headVersion: Long, deltaPlan: String)

  private def factTable(s: SparkSession, fact: String) = {
    ensureGraftCatalog(s)
    s.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.GraftCatalog]
      .segTable(fact.stripPrefix("graft_cat."))
  }

  /** Full build: aggregate the fact AT a pinned head version and publish
    * MV + watermark atomically. `mv` must have schema
    * (g BIGINT, cnt BIGINT, sum_v BIGINT), `meta` (k BIGINT, last_v
    * BIGINT); `groupSql`/`valSql` are expressions over the fact's
    * columns. Returns the watermark version. */
  def build(s: SparkSession, fact: String, mv: String, meta: String,
      groupSql: String, valSql: String): Long = {
    val headV = factTable(s, fact).currentVersion
    inTxn(s) {
      s.sql(
        s"""INSERT OVERWRITE $mv
           |SELECT $groupSql AS g, COUNT(*) AS cnt,
           |  CAST(SUM($valSql) AS BIGINT) AS sum_v
           |FROM $fact VERSION AS OF $headV
           |GROUP BY $groupSql""".stripMargin)
      s.sql(s"INSERT OVERWRITE $meta SELECT CAST(0 AS BIGINT) AS k, " +
        s"CAST($headV AS BIGINT) AS last_v")
    }
    headV
  }

  /** Incremental refresh: fold the change feed `(watermark, head]` into
    * the stored partials. No-op (nothing scanned, nothing published)
    * when the watermark is already at head. */
  def refresh(s: SparkSession, fact: String, mv: String, meta: String,
      groupSql: String, valSql: String): RefreshResult = {
    val t = factTable(s, fact)
    val headV = t.currentVersion
    val lastV = {
      val r = s.sql(s"SELECT MAX(last_v) AS v FROM $meta").head
      require(!r.isNullAt(0), s"$mv has no watermark in $meta — run build() first")
      r.getLong(0)
    }
    if (headV == lastV)
      return RefreshResult(0L, refreshed = false, headV, deltaPlan = "")

    // Signed per-group deltas from the feed — the ONLY fact-side read,
    // and it reads the range's churn (insert slices from new segments,
    // delete pre-images from surviving files, DV-growth diffs), never a
    // snapshot. localCheckpoint: the delta is at most one row per
    // touched group; checkpointing lets the witness count and the merge
    // share one CDF pass.
    val deltaQ = s.sql(
      s"""SELECT $groupSql AS g, COUNT(*) AS n_changes,
         |  CAST(SUM(CASE WHEN _change_type = 'insert' THEN 1 ELSE -1 END)
         |    AS BIGINT) AS d_cnt,
         |  CAST(SUM(CASE WHEN _change_type = 'insert' THEN ($valSql)
         |    ELSE -($valSql) END) AS BIGINT) AS d_sum
         |FROM $fact VERSION AS OF 'cdf:$lastV..$headV'
         |GROUP BY $groupSql""".stripMargin)
    val plan = deltaQ.queryExecution.executedPlan.toString
    val delta = deltaQ.localCheckpoint()
    val scanned = {
      import org.apache.spark.sql.functions.{coalesce, lit, sum}
      delta.agg(coalesce(sum("n_changes"), lit(0L))).head.getLong(0)
    }

    val view = s"graft_mv_delta_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    delta.createOrReplaceTempView(view)
    try inTxn(s) {
      // Self-read overwrite is safe here twice over: segments are
      // immutable files the manifest swap never mutates, and inside an
      // open txn the overwrite STAGES — the read plans against the
      // committed manifest.
      s.sql(
        s"""INSERT OVERWRITE $mv
           |SELECT COALESCE(m.g, d.g) AS g,
           |  COALESCE(m.cnt, 0L) + COALESCE(d.d_cnt, 0L) AS cnt,
           |  COALESCE(m.sum_v, 0L) + COALESCE(d.d_sum, 0L) AS sum_v
           |FROM $mv m FULL OUTER JOIN $view d ON m.g = d.g
           |WHERE COALESCE(m.cnt, 0L) + COALESCE(d.d_cnt, 0L) > 0""".stripMargin)
      s.sql(s"INSERT OVERWRITE $meta SELECT CAST(0 AS BIGINT) AS k, " +
        s"CAST($headV AS BIGINT) AS last_v")
    } finally s.catalog.dropTempView(view)
    RefreshResult(scanned, refreshed = true, headV, plan)
  }

  private def inTxn(s: SparkSession)(body: => Unit): Unit = {
    s.sql("CALL graft_cat.system.txn_begin()").collect()
    try { body; s.sql("CALL graft_cat.system.txn_commit()").collect() }
    catch {
      case t: Throwable =>
        try s.sql("CALL graft_cat.system.txn_abort()").collect()
        catch { case s2: Throwable => t.addSuppressed(s2) }
        throw t
    }
  }

  type Q = (SparkSession, String) => DataFrame

  /** q173 — the end-to-end claim: build at v1, four DML waves (append,
    * MoR delete, MoR update, whole-group delete), ONE incremental
    * refresh folds them, a second refresh no-ops. Witness legs pin the
    * refresh's scan cost AT the churn (w1) and the no-op (w2); the
    * group legs hash-match a full DuckDB re-aggregation of the final
    * fact state — fold ≡ rebuild. */
  val q173IncrementalMv: Q = (s, _) => {
    ensureGraftCatalog(s)
    Seq("mvf", "mv_s", "mv_meta").foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS graft_cat.db.$t"))
    s.sql(
      """CREATE TABLE graft_cat.db.mvf (id BIGINT, v BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    s.sql("CREATE TABLE graft_cat.db.mv_s (g BIGINT, cnt BIGINT, sum_v BIGINT)")
    s.sql("CREATE TABLE graft_cat.db.mv_meta (k BIGINT, last_v BIGINT)")
    s.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "2000").option("parts", "4").load()
      .createOrReplaceTempView("graft_seq_mv")
    s.sql("INSERT INTO graft_cat.db.mvf SELECT id, v FROM graft_seq_mv WHERE id < 1500") // v1
    build(s, "graft_cat.db.mvf", "graft_cat.db.mv_s", "graft_cat.db.mv_meta",
      "id % 10", "v")
    s.sql("INSERT INTO graft_cat.db.mvf SELECT id, v FROM graft_seq_mv WHERE id >= 1500") // v2
    s.sql("DELETE FROM graft_cat.db.mvf WHERE v < 100")                                   // v3
    s.sql("UPDATE graft_cat.db.mvf SET v = v + 10000 WHERE id % 10 = 3")                  // v4
    s.sql("DELETE FROM graft_cat.db.mvf WHERE id % 10 = 7")                               // v5
    val r1 = refresh(s, "graft_cat.db.mvf", "graft_cat.db.mv_s",
      "graft_cat.db.mv_meta", "id % 10", "v")
    val r2 = refresh(s, "graft_cat.db.mvf", "graft_cat.db.mv_s",
      "graft_cat.db.mv_meta", "id % 10", "v")
    s.sql(
      s"""SELECT leg, n, v_sum FROM (
         |  SELECT concat('g_', CAST(g AS STRING)) AS leg, cnt AS n,
         |    sum_v AS v_sum
         |  FROM graft_cat.db.mv_s
         |  UNION ALL
         |  SELECT 'w1_scanned', CAST(${r1.changesScanned} AS BIGINT),
         |    CAST(${if (r1.refreshed) 1L else 0L} AS BIGINT)
         |  UNION ALL
         |  SELECT 'w2_noop', CAST(${r2.changesScanned} AS BIGINT),
         |    CAST(${if (r2.refreshed) 1L else 0L} AS BIGINT))
         |ORDER BY leg""".stripMargin)
  }

  def queries: Map[String, Q] = Map(
    "q173_incremental_mv" -> q173IncrementalMv)

  def oracleSql: Map[String, String] = Map(
    // final fact state: all 2000 seq rows, minus v<100 (v3), minus group
    // 7 (v5), with group 3 survivors shifted +10000 (v4). Churn w1 =
    // 500 v2 inserts + |v<100| delete pre-images + 2·|g3 survivors|
    // update pairs + |g7 survivors| delete pre-images; w2 pins the
    // no-op. Group legs are a FULL re-aggregation — fold ≡ rebuild.
    "q173_incremental_mv" ->
      """WITH seq AS (
        |  SELECT r.range AS id, (r.range * 2654435761) % 1000 AS v
        |  FROM range(2000) r),
        |final AS (
        |  SELECT id, CASE WHEN id % 10 = 3 THEN v + 10000 ELSE v END AS v
        |  FROM seq WHERE v >= 100 AND id % 10 <> 7),
        |churn AS (
        |  SELECT (SELECT COUNT(*) FROM seq WHERE id >= 1500)
        |       + (SELECT COUNT(*) FROM seq WHERE v < 100)
        |       + 2 * (SELECT COUNT(*) FROM seq WHERE id % 10 = 3 AND v >= 100)
        |       + (SELECT COUNT(*) FROM seq WHERE id % 10 = 7 AND v >= 100) AS n)
        |SELECT leg, n, v_sum FROM (
        |  SELECT concat('g_', CAST(id % 10 AS VARCHAR)) AS leg,
        |    COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS v_sum
        |  FROM final GROUP BY id % 10
        |  UNION ALL
        |  SELECT 'w1_scanned', (SELECT n FROM churn), CAST(1 AS BIGINT)
        |  UNION ALL
        |  SELECT 'w2_noop', CAST(0 AS BIGINT), CAST(0 AS BIGINT))
        |ORDER BY leg""".stripMargin)
}
