package graft.ops

import graft.dw.{DateDims, Transforms, Warehouse}
import org.apache.spark.sql.functions._

/** Puts the warehouse pipeline code (graft.dw.Transforms) under the
  * driver's DuckDB differential gate, not just ScalaTest: Yelp-shaped
  * inputs are constructed deterministically from the fixture tables, run
  * through the REAL transform functions, and the oracle states the
  * equivalent relational semantics over the same fixtures.
  *
  * datetime_id equivalence used by the oracles: for in-spine dates the
  * positional id IS days-since-1948-09-06 (DateDims generates one row per
  * day), so DuckDB can state it as datediff.
  */
object WarehouseDemo {

  /** dim_category + bridge over business rows built from `part`
    * (categories = p_type words joined with the two-char ", " separator —
    * exercising transform_business's explode/dedup/surrogate/join path). */
  val whCategories: Q = (s, d) => {
    val business = table(s, d, "part")
      .select(col("p_partkey").cast("string").as("business_id"),
        regexp_replace(col("p_type"), " ", ", ").as("categories"))
    val tables = Transforms.business(
      business
        .withColumn("name", lit(null).cast("string"))
        .withColumn("address", lit(null).cast("string"))
        .withColumn("city", lit(null).cast("string"))
        .withColumn("state", lit(null).cast("string"))
        .withColumn("postal_code", lit(null).cast("string"))
        .withColumn("latitude", lit(null).cast("double"))
        .withColumn("longitude", lit(null).cast("double"))
        .withColumn("is_open", lit(null).cast("int"))
        .withColumn("stars", lit(null).cast("double"))
        .withColumn("review_count", lit(null).cast("int"))
        .withColumn("attributes", lit(null).cast("map<string,string>"))
        .withColumn("hours", lit(null).cast("map<string,string>")))
    val dim = tables("dim_category")
    val bridge = tables("fact_business_categories")
    bridge.join(dim, Seq("category_id"))
      .groupBy("category_id", "category_name")
      .agg(count(lit(1)).as("n_businesses"))
      .orderBy("category_id")
  }

  /** fact_checkins over checkin rows built from `orders` (two timestamps
    * joined with ", " plus one unparseable token — exercising
    * transform_checkin's explode/coerce/inner-datetime-join path). */
  val whCheckins: Q = (s, d) => {
    val checkins = table(s, d, "orders")
      .filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey").cast("string").as("business_id"),
        concat(
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"), lit(", "),
          date_format(date_add(col("o_orderdate").cast("date"), 7), "yyyy-MM-dd"),
          lit(" 12:00:00, not-a-date")).as("date"))
    Transforms.checkin(checkins, DateDims.dimDatetime(s))
      .orderBy("checkin_id")
  }

  /** fact_business_hours over hours maps built from `events` (open/close
    * strings with un-wrapped close hours — exercising the map-explode +
    * split + pmod parse path, E6/F5). */
  val whHours: Q = (s, d) => {
    val businesses = events(s, d)
      .filter(col("event_id") <= 300)
      .select(col("event_id").cast("string").as("business_id"),
        map(
          lit("Monday"),
          concat(hour(col("ts")).cast("string"), lit(":"),
            minute(col("ts")).cast("string"), lit("-"),
            (hour(col("ts")) + 15).cast("string"), lit(":00")),
          lit("Tuesday"), lit("closed")).as("hours"))
      .withColumn("name", lit(null).cast("string"))
      .withColumn("address", lit(null).cast("string"))
      .withColumn("city", lit(null).cast("string"))
      .withColumn("state", lit(null).cast("string"))
      .withColumn("postal_code", lit(null).cast("string"))
      .withColumn("latitude", lit(null).cast("double"))
      .withColumn("longitude", lit(null).cast("double"))
      .withColumn("is_open", lit(null).cast("int"))
      .withColumn("stars", lit(null).cast("double"))
      .withColumn("review_count", lit(null).cast("int"))
      .withColumn("categories", lit(null).cast("string"))
      .withColumn("attributes", lit(null).cast("map<string,string>"))
    Transforms.business(businesses)("fact_business_hours")
      .orderBy(col("business_id").cast("int"))
  }

  /** fact_reviews over review rows built from `orders` — exercising
    * transform_review's 9-col projection + calendar-date LEFT lookup with
    * misses kept as null (transformation.py:326-364; every 10th date is
    * unparseable, the pandas-coerce → null path). */
  val whReviews: Q = (s, d) => {
    val k = col("o_orderkey")
    val reviews = table(s, d, "orders")
      .filter(k <= 2000)
      .select(
        concat(lit("R"), k).as("review_id"),
        col("o_custkey").cast("string").as("business_id"),
        concat(lit("U"), col("o_custkey") % 50).as("user_id"),
        (k % 5 + 1).cast("double").as("stars"),
        (k % 7).cast("int").as("useful"),
        (k % 3).cast("int").as("funny"),
        (k % 2).cast("int").as("cool"),
        concat(lit("review of order "), k).as("text"),
        when(k % 10 === 0, lit("not-a-date"))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")).as("date"))
    Transforms.review(reviews, DateDims.dimDatetime(s))
      .orderBy("review_id")
  }

  /** dim_user + dim_elite/dim_friend + both bridge facts from user rows
    * built from `customer` — exercising transform_user's no-trim "," splits
    * (leading spaces KEPT in friend tokens, transformation.py:399-403),
    * empty-token filters, surrogate ids and left bridge joins (:366-414). */
  val whUserEliteFriends: Q = (s, d) => {
    val k = col("c_custkey")
    val users = table(s, d, "customer")
      .filter(k <= 600)
      .select(
        concat(lit("U"), k).as("user_id"),
        col("c_name").as("name"),
        lit(null).cast("int").as("review_count"),
        concat(lit("2010-01-"), lpad((k % 28 + 1).cast("string"), 2, "0"),
          lit(" 08:30:00")).as("yelping_since"),
        lit(null).cast("int").as("useful"),
        lit(null).cast("int").as("funny"),
        lit(null).cast("int").as("cool"),
        lit(null).cast("int").as("fans"),
        lit(null).cast("double").as("average_stars"),
        lit(null).cast("int").as("compliment_hot"),
        lit(null).cast("int").as("compliment_more"),
        lit(null).cast("int").as("compliment_profile"),
        lit(null).cast("int").as("compliment_cute"),
        lit(null).cast("int").as("compliment_list"),
        lit(null).cast("int").as("compliment_note"),
        lit(null).cast("int").as("compliment_plain"),
        lit(null).cast("int").as("compliment_cool"),
        lit(null).cast("int").as("compliment_funny"),
        lit(null).cast("int").as("compliment_writer"),
        lit(null).cast("int").as("compliment_photos"),
        when(k % 4 === 0, lit(""))
          .otherwise(concat(lit("20"), lpad((k % 10).cast("string"), 2, "0"), lit(","),
            lit("20"), lpad(((k + 3) % 10).cast("string"), 2, "0"))).as("elite"),
        when(k % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("F"), k % 7, lit(", F"), k % 11)).as("friends"))
    val t = Transforms.user(users)
    val dimUser = t("dim_user").select(col("user_id"), col("name"),
      date_format(col("yelping_since"), "yyyy-MM-dd").as("since"))
    val elitePart = t("fact_user_elite")
      .join(t("dim_elite"), Seq("elite_id"))
      .select(col("user_id"), lit("elite").as("kind"),
        col("elite_year").as("token"), col("elite_id").as("token_id"))
    val friendPart = t("fact_user_friend")
      .join(t("dim_friend"), Seq("friend_id"))
      .select(col("user_id"), lit("friend").as("kind"),
        col("friends_name").as("token"), col("friend_id").as("token_id"))
    elitePart.unionAll(friendPart)
      .join(dimUser, Seq("user_id"))
      .orderBy("user_id", "kind", "token")
  }

  /** fact_tips from tip rows built from `orders` — left datetime join with
    * misses KEPT (vs checkin's inner, J5 distinction) and a distributed
    * range-sorted tip_id over (business, user, datetime, text)
    * (transformation.py:416-444). */
  val whTips: Q = (s, d) => {
    val k = col("o_orderkey")
    val tips = table(s, d, "orders")
      .filter(k <= 2000)
      .select(
        concat(lit("tip for order "), k).as("text"),
        (k % 4).cast("int").as("compliment_count"),
        col("o_custkey").cast("string").as("business_id"),
        concat(lit("U"), col("o_custkey") % 50).as("user_id"),
        when(k % 7 === 0, lit("bad-date"))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")).as("date"))
    Transforms.tip(tips, DateDims.dimDatetime(s))
      .orderBy("tip_id")
  }

  /** fact_covid_features + dim_highlights from covid rows built from
    * `customer` — exercising the array-of-struct JSON parse where invalid
    * JSON and null both yield zero highlight rows (json.JSONDecodeError →
    * [], transformation.py:304-322). */
  val whCovidHighlights: Q = (s, d) => {
    val k = col("c_custkey")
    val covid = table(s, d, "customer")
      .filter(k <= 800)
      .select(
        concat(lit("B"), k).as("business_id"),
        (k % 2 === 0).as("Grubhub enabled"),
        (k % 3 === 0).as("Request a Quote Enabled"),
        col("c_mktsegment").as("Covid Banner"),
        lit(null).cast("string").as("Temporary Closed Until"),
        (k % 5 === 0).cast("string").as("Virtual Services Offered"),
        when(k % 6 === 0, lit("not json"))
          .when(k % 6 === 1, lit(null).cast("string"))
          .otherwise(concat(lit("""[{"identifier":"h"""), k % 4,
            lit("\",\"params\":\"p"), k % 3,
            lit("\",\"type\":\"t\"}]"))).as("highlights"))
    val t = Transforms.covid(covid)
    t("dim_highlights")
      .join(t("fact_covid_features"), Seq("business_id"))
      .select(col("business_id"), col("identifier"), col("params"), col("type"),
        col("grubhub_enabled"), col("covid_banner"))
      .orderBy("business_id")
  }

  /** dim_temperature + dim_precipitation from climate rows built from the
    * distinct order dates — yyyymmdd-int date keys, left datetime join
    * with out-of-spine dates kept as null, and the "T" (trace)
    * precipitation string (transformation.py:446-514). */
  val whClimate: Q = (s, d) => {
    val dates = table(s, d, "orders")
      .filter(col("o_orderkey") <= 3000)
      .select(col("o_orderdate").cast("date").as("dt")).distinct()
      .select(col("dt"),
        (month(col("dt")) * 100 + dayofmonth(col("dt"))).cast("double").as("base"),
        dayofmonth(col("dt")).as("dom"))
      // every 9th day-of-month maps to a pre-spine date -> null datetime_id
      .withColumn("date",
        when(col("dom") % 9 === 0, lit(19470101))
          .otherwise(date_format(col("dt"), "yyyyMMdd").cast("int")))
    val tempDf = dates.select(col("date"),
      col("base").as("min"), (col("base") + 50).as("max"),
      (col("base") - 5).as("normal_min"), (col("base") + 55).as("normal_max"))
    val precipDf = dates.select(col("date"),
      when(col("dom") % 7 === 0, lit("T"))
        .otherwise(col("base").cast("int").cast("string")).as("precipitation"),
      col("base").as("precipitation_normal"))
    val dim = DateDims.dimDatetime(s)
    val t = Transforms.temperature(tempDf, dim)
      .select(col("datetime_id"), lit("temperature").as("measure"),
        col("min_temperature").as("v1"), col("max_temperature").as("v2"))
    val p = Transforms.precipitation(precipDf, dim)
      .select(col("datetime_id"), lit("precipitation").as("measure"),
        col("precipitation").cast("double").as("v1"),
        col("normal_precipitation").as("v2"))
    t.unionAll(p).orderBy(col("measure"), col("datetime_id"), col("v2"))
  }

  /** The full `Warehouse.build` end to end: fixture-derived business and
    * checkin NDJSON written to disk, read back through the schema-enforced
    * sources (S1), all 21 tables assembled (X2; the six missing inputs take
    * the typed empty-fallback path X3), non-empty tables registered as the
    * SQL serving surface (S6/S7 skip-empty semantics), and an analytical
    * star join answered across SIX of them — fact_checkins, dim_business,
    * fact_business_categories, dim_category, dim_datetime and dim_date —
    * the `test_sql.py:13` serving role over the assembled schema. */
  val whEndToEnd: Q = (s, d) => {
    val tmp = scratchDir(s, "wh_e2e")
    val k = col("p_partkey")
    val base = table(s, d, "part").filter(k <= 300)
    base.select(
        concat(lit("B"), k).as("business_id"),
        col("p_name").as("name"),
        lit(null).cast("string").as("address"),
        lit("Las Vegas").as("city"),
        lit("NV").as("state"),
        lit(null).cast("string").as("postal_code"),
        lit(null).cast("double").as("latitude"),
        lit(null).cast("double").as("longitude"),
        (k % 2).cast("int").as("is_open"),
        (k % 5 + 1).cast("double").as("stars"),
        (k % 100).cast("int").as("review_count"),
        regexp_replace(col("p_type"), " ", ", ").as("categories"),
        lit(null).cast("map<string,string>").as("attributes"),
        lit(null).cast("map<string,string>").as("hours"))
      .coalesce(1).write.mode("overwrite").json(s"$tmp/business.json")
    base.select(
        concat(lit("B"), k).as("business_id"),
        concat(
          date_format(date_add(lit("1995-01-01").cast("date"), (k % 365).cast("int")),
            "yyyy-MM-dd HH:mm:ss"),
          lit(", "),
          date_format(date_add(lit("1996-01-01").cast("date"), ((k * 7) % 365).cast("int")),
            "yyyy-MM-dd HH:mm:ss")).as("date"))
      .coalesce(1).write.mode("overwrite").json(s"$tmp/checkin.json")
    val tables = Warehouse.build(s, Warehouse.Inputs(
      business = s"$tmp/business.json", checkin = s"$tmp/checkin.json"))
    Warehouse.register(tables)
    s.sql(
      """SELECT c.category_name, dd.year AS year,
        |  COUNT(*) AS n_checkins,
        |  CAST(CAST(SUM(CAST(b.stars AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE)
        |    / COUNT(b.stars) AS avg_stars
        |FROM fact_checkins f
        |JOIN dim_business b USING (business_id)
        |JOIN fact_business_categories bc USING (business_id)
        |JOIN dim_category c USING (category_id)
        |JOIN dim_datetime dt ON f.datetime_id = dt.datetime_id
        |JOIN dim_date dd ON dt.date_id = dd.date_id
        |GROUP BY c.category_name, dd.year
        |ORDER BY c.category_name, year""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q33_wh_categories" -> whCategories,
    "q34_wh_checkins" -> whCheckins,
    "q35_wh_hours" -> whHours,
    "q44_wh_reviews" -> whReviews,
    "q45_wh_user_elite_friends" -> whUserEliteFriends,
    "q46_wh_tips" -> whTips,
    "q47_wh_covid_highlights" -> whCovidHighlights,
    "q48_wh_climate" -> whClimate,
    "q49_wh_end_to_end" -> whEndToEnd)

  val oracleSql: Map[String, String] = Map(
    "q33_wh_categories" ->
      """WITH cats AS (
        |  SELECT CAST(p_partkey AS VARCHAR) AS business_id,
        |         unnest(string_split(regexp_replace(p_type, ' ', ', ', 'g'), ', ')) AS category_name
        |  FROM part),
        |dim AS (
        |  SELECT category_name,
        |         CAST(row_number() OVER (ORDER BY category_name) AS INT) AS category_id
        |  FROM (SELECT DISTINCT category_name FROM cats WHERE category_name IS NOT NULL))
        |SELECT d.category_id, d.category_name, COUNT(*) AS n_businesses
        |FROM cats c JOIN dim d USING (category_name)
        |GROUP BY d.category_id, d.category_name
        |ORDER BY d.category_id""".stripMargin,
    "q34_wh_checkins" ->
      """WITH exploded AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS business_id,
        |    unnest([strftime(o_orderdate, '%Y-%m-%d'),
        |            strftime(CAST(o_orderdate AS DATE) + 7, '%Y-%m-%d')]) AS d
        |  FROM orders WHERE o_orderkey <= 500),
        |mapped AS (
        |  SELECT business_id,
        |    CAST(datediff('day', DATE '1948-09-06', CAST(d AS DATE)) AS INT) AS datetime_id
        |  FROM exploded
        |  WHERE CAST(d AS DATE) BETWEEN DATE '1948-09-06' AND DATE '2025-12-31')
        |SELECT row_number() OVER (ORDER BY business_id, datetime_id) AS checkin_id,
        |  business_id, datetime_id
        |FROM mapped ORDER BY checkin_id""".stripMargin,
    "q35_wh_hours" ->
      """SELECT CAST(event_id AS VARCHAR) AS business_id,
        |  'Monday' AS day_of_week,
        |  CAST(hour(ts) AS VARCHAR) || ':' || CAST(minute(ts) AS VARCHAR) AS open_time,
        |  CAST(hour(ts) + 15 AS VARCHAR) || ':00' AS close_time,
        |  CAST(hour(ts) AS INT) AS open_hour_id,
        |  CAST((hour(ts) + 15) % 24 AS INT) AS close_hour_id
        |FROM events WHERE event_id <= 300
        |ORDER BY event_id""".stripMargin,
    "q44_wh_reviews" ->
      """SELECT 'R' || CAST(o_orderkey AS VARCHAR) AS review_id,
        |  CAST(o_custkey AS VARCHAR) AS business_id,
        |  'U' || CAST(o_custkey % 50 AS VARCHAR) AS user_id,
        |  CAST(o_orderkey % 5 + 1 AS DOUBLE) AS stars,
        |  CAST(o_orderkey % 7 AS INT) AS useful,
        |  CAST(o_orderkey % 3 AS INT) AS funny,
        |  CAST(o_orderkey % 2 AS INT) AS cool,
        |  'review of order ' || CAST(o_orderkey AS VARCHAR) AS text,
        |  CASE WHEN o_orderkey % 10 = 0 THEN NULL
        |       ELSE CAST(datediff('day', DATE '1948-09-06', CAST(o_orderdate AS DATE)) AS INT)
        |  END AS datetime_id
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY review_id""".stripMargin,
    "q45_wh_user_elite_friends" ->
      """WITH u AS (
        |  SELECT c_custkey AS k,
        |    'U' || CAST(c_custkey AS VARCHAR) AS user_id,
        |    c_name AS name,
        |    '2010-01-' || lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0') AS since,
        |    CASE WHEN c_custkey % 4 = 0 THEN ''
        |         ELSE '20' || lpad(CAST(c_custkey % 10 AS VARCHAR), 2, '0') || ',' ||
        |              '20' || lpad(CAST((c_custkey + 3) % 10 AS VARCHAR), 2, '0') END AS elite,
        |    CASE WHEN c_custkey % 5 = 0 THEN NULL
        |         ELSE 'F' || CAST(c_custkey % 7 AS VARCHAR) || ', F' || CAST(c_custkey % 11 AS VARCHAR)
        |    END AS friends
        |  FROM customer WHERE c_custkey <= 600),
        |e AS (
        |  SELECT user_id, name, since, unnest(string_split(elite, ',')) AS token FROM u),
        |e2 AS (SELECT * FROM e WHERE token IS NOT NULL AND token <> ''),
        |de AS (
        |  SELECT token, CAST(row_number() OVER (ORDER BY token) AS INT) AS token_id
        |  FROM (SELECT DISTINCT token FROM e2)),
        |f AS (
        |  SELECT user_id, name, since, unnest(string_split(friends, ',')) AS token FROM u),
        |f2 AS (SELECT * FROM f WHERE token IS NOT NULL AND token <> ''),
        |df AS (
        |  SELECT token, CAST(row_number() OVER (ORDER BY token) AS INT) AS token_id
        |  FROM (SELECT DISTINCT token FROM f2))
        |SELECT user_id, 'elite' AS kind, token, token_id, name, since
        |FROM e2 JOIN de USING (token)
        |UNION ALL
        |SELECT user_id, 'friend' AS kind, token, token_id, name, since
        |FROM f2 JOIN df USING (token)
        |ORDER BY user_id, kind, token""".stripMargin,
    "q46_wh_tips" ->
      """WITH tips AS (
        |  SELECT 'tip for order ' || CAST(o_orderkey AS VARCHAR) AS text,
        |    CAST(o_orderkey % 4 AS INT) AS compliment_count,
        |    CAST(o_custkey AS VARCHAR) AS business_id,
        |    'U' || CAST(o_custkey % 50 AS VARCHAR) AS user_id,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |         ELSE CAST(datediff('day', DATE '1948-09-06', CAST(o_orderdate AS DATE)) AS INT)
        |    END AS datetime_id
        |  FROM orders WHERE o_orderkey <= 2000)
        |SELECT row_number() OVER (ORDER BY business_id, user_id, datetime_id NULLS FIRST, text) AS tip_id,
        |  text, compliment_count, business_id, user_id, datetime_id
        |FROM tips ORDER BY tip_id""".stripMargin,
    "q47_wh_covid_highlights" ->
      """SELECT 'B' || CAST(c_custkey AS VARCHAR) AS business_id,
        |  'h' || CAST(c_custkey % 4 AS VARCHAR) AS identifier,
        |  'p' || CAST(c_custkey % 3 AS VARCHAR) AS params,
        |  't' AS "type",
        |  (c_custkey % 2 = 0) AS grubhub_enabled,
        |  c_mktsegment AS covid_banner
        |FROM customer
        |WHERE c_custkey <= 800 AND c_custkey % 6 >= 2
        |ORDER BY business_id""".stripMargin,
    "q48_wh_climate" ->
      """WITH dates AS (
        |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt
        |  FROM orders WHERE o_orderkey <= 3000),
        |m AS (
        |  SELECT CAST(month(dt) * 100 + dayofmonth(dt) AS DOUBLE) AS base,
        |    dayofmonth(dt) AS dom,
        |    CASE WHEN dayofmonth(dt) % 9 = 0 THEN NULL
        |         ELSE CAST(datediff('day', DATE '1948-09-06', dt) AS INT) END AS datetime_id
        |  FROM dates)
        |SELECT datetime_id, 'temperature' AS measure, base AS v1, base + 50 AS v2 FROM m
        |UNION ALL
        |SELECT datetime_id, 'precipitation' AS measure,
        |  CASE WHEN dom % 7 = 0 THEN NULL ELSE base END AS v1, base AS v2 FROM m
        |ORDER BY measure, datetime_id NULLS FIRST, v2""".stripMargin,
    "q49_wh_end_to_end" ->
      """WITH biz AS (
        |  SELECT 'B' || CAST(p_partkey AS VARCHAR) AS business_id,
        |         regexp_replace(p_type, ' ', ', ', 'g') AS categories,
        |         CAST(p_partkey % 5 + 1 AS DOUBLE) AS stars,
        |         p_partkey AS k
        |  FROM part WHERE p_partkey <= 300),
        |cats AS (
        |  SELECT business_id, unnest(string_split(categories, ', ')) AS category_name
        |  FROM biz),
        |chk AS (
        |  SELECT business_id, unnest([
        |      DATE '1995-01-01' + CAST(k % 365 AS INT),
        |      DATE '1996-01-01' + CAST((k * 7) % 365 AS INT)]) AS d
        |  FROM biz)
        |SELECT ct.category_name, CAST(year(ch.d) AS INT) AS year,
        |  COUNT(*) AS n_checkins,
        |  CAST(CAST(SUM(CAST(b.stars AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE)
        |    / COUNT(b.stars) AS avg_stars
        |FROM chk ch
        |JOIN biz b USING (business_id)
        |JOIN cats ct USING (business_id)
        |GROUP BY ct.category_name, year(ch.d)
        |ORDER BY ct.category_name, year""".stripMargin)
}
