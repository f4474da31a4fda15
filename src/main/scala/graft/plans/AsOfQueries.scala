package graft.plans

import graft.ops.{events, Q}
import org.apache.spark.sql.functions._

/** Catalog queries for the as-of join custom operator ([[AsOf]]).
  *
  * The oracle is DuckDB's native `ASOF LEFT JOIN` — an independent
  * implementation of the same point-in-time semantics, which makes this a
  * genuine cross-engine differential test of the custom SparkPlan.
  */
object AsOfQueries {

  /** Every click event picks up the same user's latest signup event at or
    * before it (classic point-in-time attribution). Right side is deduped
    * to one row per (user, instant) so ties are impossible on either
    * engine; clicks before any signup keep a null match (LEFT semantics).
    */
  val asofClickSignup: Q = (s, d) => {
    val e = events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"))
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "tsu")
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("tsu").as("s_tsu"),
        col("event_id"))
      .groupBy("s_user_id", "s_tsu")
      .agg(min(col("event_id")).as("signup_id"))
    AsOf.join(clicks, signups, Seq("user_id"), Seq("s_user_id"), "tsu", "s_tsu")
      .select(col("event_id"), col("user_id"), col("signup_id"),
        (col("tsu") - col("s_tsu")).as("gap_us"))
      .orderBy("event_id")
  }

  /** FORWARD as-of with a tolerance: every click attributes to the same
    * user's NEXT purchase at or after it, but only within a 48-hour
    * attribution window — the standard conversion-attribution query.
    * Clicks whose nearest following purchase is farther than 48 h (or
    * absent) keep the null match. The oracle is DuckDB's forward ASOF
    * (`l.t <= r.t`) with the window restated as a post-join CASE — valid
    * because the nearest candidate being out of window implies all are.
    */
  val asofClickNextPurchase: Q = (s, d) => {
    val winUs = 48L * 3600 * 1000000
    val e = events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"))
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "tsu")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("tsu").as("p_tsu"),
        col("event_id"))
      .groupBy("p_user_id", "p_tsu")
      .agg(min(col("event_id")).as("purchase_id"))
    AsOf.join(clicks, purchases, Seq("user_id"), Seq("p_user_id"),
        "tsu", "p_tsu", direction = "forward", tolerance = Some(winUs))
      .select(col("event_id"), col("user_id"), col("purchase_id"),
        (col("p_tsu") - col("tsu")).as("gap_us"))
      .orderBy("event_id")
  }

  /** The SAME point-in-time attribution as ext23, but written as SQL
    * text with the `graft_asof` marker predicate and rewritten into the
    * custom plan by [[AsOfJoinRewrite]] — proving the Rule tier end to
    * end under the oracle (identical answer to the DataFrame-API path).
    */
  val asofSqlSurface: Q = (s, d) => {
    val e = events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"))
    e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "tsu")
      .createOrReplaceTempView("graft_asof_clicks")
    e.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("tsu").as("s_tsu"),
        col("event_id"))
      .groupBy("s_user_id", "s_tsu")
      .agg(min(col("event_id")).as("signup_id"))
      .createOrReplaceTempView("graft_asof_signups")
    AsOfSql.sql(s,
      """SELECT l.event_id, l.user_id, r.signup_id, l.tsu - r.s_tsu AS gap_us
        |FROM graft_asof_clicks l
        |LEFT JOIN graft_asof_signups r
        |  ON l.user_id = r.s_user_id AND graft_asof(l.tsu, r.s_tsu)
        |ORDER BY l.event_id""".stripMargin)
  }

  /** ext34's forward-within-window attribution written as SQL: the
    * marker carries direction and tolerance as literals —
    * `graft_asof(t1, t2, 'forward', <us>)` — and the rewrite maps them
    * onto the same custom plan. Shares ext34's oracle (DuckDB forward
    * ASOF + window CASE). */
  val asofSqlForward: Q = (s, d) => {
    val e = events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"))
    e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "tsu")
      .createOrReplaceTempView("graft_asof_clicks_f")
    e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("tsu").as("p_tsu"),
        col("event_id"))
      .groupBy("p_user_id", "p_tsu")
      .agg(min(col("event_id")).as("purchase_id"))
      .createOrReplaceTempView("graft_asof_purch_f")
    AsOfSql.sql(s,
      """SELECT l.event_id, l.user_id, r.purchase_id,
        |  r.p_tsu - l.tsu AS gap_us
        |FROM graft_asof_clicks_f l
        |LEFT JOIN graft_asof_purch_f r
        |  ON l.user_id = r.p_user_id
        |  AND graft_asof(l.tsu, r.p_tsu, 'forward', 172800000000)
        |ORDER BY l.event_id""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "ext23_asof_join" -> asofClickSignup,
    "ext34_asof_forward_window" -> asofClickNextPurchase,
    "ext39_asof_sql_rewrite" -> asofSqlSurface,
    "ext45_asof_sql_forward" -> asofSqlForward)

  val oracleSql: Map[String, String] = Map(
    "ext34_asof_forward_window" -> clickPurchaseForwardOracle,
    // same answer through the SQL marker path with direction + tolerance
    "ext45_asof_sql_forward" -> clickPurchaseForwardOracle,
    "ext23_asof_join" -> clickSignupOracle,
    // same answer through the SQL marker + analyzer-rule path
    "ext39_asof_sql_rewrite" -> clickSignupOracle)

  private lazy val clickPurchaseForwardOracle =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
      |  FROM events),
      |l AS (SELECT event_id, user_id, tsu FROM e WHERE event_type = 'click'),
      |r AS (
      |  SELECT user_id AS p_user_id, tsu AS p_tsu, MIN(event_id) AS purchase_id
      |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, tsu)
      |SELECT l.event_id, l.user_id,
      |  CASE WHEN r.p_tsu - l.tsu <= 172800000000 THEN r.purchase_id END AS purchase_id,
      |  CASE WHEN r.p_tsu - l.tsu <= 172800000000 THEN r.p_tsu - l.tsu END AS gap_us
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.p_user_id AND l.tsu <= r.p_tsu
      |ORDER BY l.event_id""".stripMargin

  private lazy val clickSignupOracle =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
      |  FROM events),
      |l AS (SELECT event_id, user_id, tsu FROM e WHERE event_type = 'click'),
      |r AS (
      |  SELECT user_id AS s_user_id, tsu AS s_tsu, MIN(event_id) AS signup_id
      |  FROM e WHERE event_type = 'signup' GROUP BY user_id, tsu)
      |SELECT l.event_id, l.user_id, r.signup_id, l.tsu - r.s_tsu AS gap_us
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.s_user_id AND l.tsu >= r.s_tsu
      |ORDER BY l.event_id""".stripMargin
}
