package graft.ext

import graft.ops.{table, Q}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-test /
  * Great-Expectations surface: a suite of named checks (not-null,
  * unique, accepted-values, range, referential integrity) evaluated
  * against live tables, reporting a per-expectation violation census
  * rather than failing fast. This is the READ-side complement to the
  * catalog's write-side CHECK constraints (q123): CHECKs gate what
  * enters a table the engine owns; expectations audit what is already
  * in any table, owned or not.
  *
  * Scale: every single-table expectation folds into ONE conditional
  * aggregation pass per table (a map-side-combining scan — adding an
  * expectation adds a column, not a pass); uniqueness is the same
  * pass's `COUNT(*) − COUNT(DISTINCT key)`; the referential check is a
  * LEFT ANTI join on the key — the standard shapes, no row ever leaves
  * the executor. At 100 TB the suite costs two scans and one keyed
  * join, independent of how many expectations are declared.
  */
object Expectations {

  /** ext112 — the expectation suite over orders/lineitem, with the
    * per-expectation violation census and pass/fail verdicts. One
    * expectation (the discount policy) genuinely fails on the fixture —
    * the census must COUNT, not just flag, which is what
    * distinguishes an audit report from a constraint abort. */
  val expectationSuite: Q = (s, d) => {
    val ord = table(s, d, "orders")
    val li = table(s, d, "lineitem")
    val ordPass = ord.agg(
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
        .as("nn_violations"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("uq_violations"),
      sum(when(col("o_orderstatus").isin("F", "O", "P"), 0L).otherwise(1L))
        .as("av_violations"),
      sum(when(col("o_totalprice") >= 0, 0L).otherwise(1L))
        .as("pos_violations"))
    val liPass = li.agg(
      sum(when(col("l_quantity").between(1, 50), 0L).otherwise(1L))
        .as("rng_violations"),
      sum(when(col("l_discount") <= 0.08, 0L).otherwise(1L))
        .as("disc_violations"))
    val orphans = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("rel_violations"))
    val wide = ordPass.crossJoin(liPass).crossJoin(orphans).head()
    import s.implicits._
    Seq(
      ("orders.o_orderkey.not_null", wide.getLong(0)),
      ("orders.o_orderkey.unique", wide.getLong(1)),
      ("orders.o_orderstatus.accepted_values", wide.getLong(2)),
      ("orders.o_totalprice.non_negative", wide.getLong(3)),
      ("lineitem.l_quantity.range_1_50", wide.getLong(4)),
      ("lineitem.l_discount.max_8pct", wide.getLong(5)),
      ("lineitem.l_orderkey.references_orders", wide.getLong(6)))
      .toDF("expectation", "n_violations")
      .withColumn("status",
        when(col("n_violations") === 0, "pass").otherwise("fail"))
      .orderBy("expectation")
  }

  val queries: Map[String, Q] = Map(
    "ext112_expectation_suite" -> expectationSuite)

  val oracleSql: Map[String, String] = Map(
    "ext112_expectation_suite" ->
      """WITH o AS (
        |  SELECT CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS nn,
        |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS uq,
        |    CAST(SUM(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0
        |             ELSE 1 END) AS BIGINT) AS av,
        |    CAST(SUM(CASE WHEN o_totalprice >= 0 THEN 0 ELSE 1 END)
        |           AS BIGINT) AS pos
        |  FROM orders),
        |l AS (
        |  SELECT CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0
        |             ELSE 1 END) AS BIGINT) AS rng,
        |    CAST(SUM(CASE WHEN l_discount <= 0.08 THEN 0 ELSE 1 END)
        |           AS BIGINT) AS disc
        |  FROM lineitem),
        |r AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS rel FROM lineitem
        |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
        |c AS (
        |  SELECT 'orders.o_orderkey.not_null' AS expectation, nn AS n
        |    FROM o
        |  UNION ALL SELECT 'orders.o_orderkey.unique', uq FROM o
        |  UNION ALL SELECT 'orders.o_orderstatus.accepted_values', av FROM o
        |  UNION ALL SELECT 'orders.o_totalprice.non_negative', pos FROM o
        |  UNION ALL SELECT 'lineitem.l_quantity.range_1_50', rng FROM l
        |  UNION ALL SELECT 'lineitem.l_discount.max_8pct', disc FROM l
        |  UNION ALL SELECT 'lineitem.l_orderkey.references_orders', rel
        |    FROM r)
        |SELECT expectation, n AS n_violations,
        |  CASE WHEN n = 0 THEN 'pass' ELSE 'fail' END AS status
        |FROM c ORDER BY expectation""".stripMargin)
}
