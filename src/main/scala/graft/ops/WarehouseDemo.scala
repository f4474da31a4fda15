package graft.ops

import graft.dw.{DateDims, Transforms}
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

  val queries: Map[String, Q] = Map(
    "q33_wh_categories" -> whCategories,
    "q34_wh_checkins" -> whCheckins,
    "q35_wh_hours" -> whHours)

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
        |SELECT CAST(row_number() OVER (ORDER BY business_id, datetime_id) AS INT) AS checkin_id,
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
        |ORDER BY event_id""".stripMargin)
}
