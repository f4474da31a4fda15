package graft.dw

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generated date/hour dimensions (SURVEY.md §2.6).
  *
  * Mirrors the reference's generators:
  *   - dim_datetime: daily spine 1948-09-06..2025-12-31, 28,241 rows, with a
  *     positional surrogate `datetime_id` and a yyyyMMdd `date_id`
  *     (`/root/reference/transformation.py:89-116`);
  *   - dim_date: per-row derivations day/day_name/month/quarter/year
  *     (`transformation.py:128-137`);
  *   - dim_hour: 24 rows, zero-padded label (`transformation.py:118-125`).
  *
  * Scale: the spine is generated with `sequence` + `explode` from a single
  * literal row, then `row_number` over the date — a one-partition sort of
  * 28k rows, negligible; at larger spine sizes switch to
  * `spark.range(nDays)` + `date_add(start, id)`, which is already ordered
  * and needs no sort at all (the datetime_id IS the range id).
  */
object DateDims {

  val SpineStart = "1948-09-06"
  val SpineEnd = "2025-12-31"

  /** Daily date spine with positional id (datetime_id = 0..n-1 in date
    * order, matching the reference's RangeIndex at transformation.py:99).
    * Implemented with spark.range so no global sort is required.
    */
  def dimDatetime(spark: SparkSession): DataFrame = {
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(SpineStart), java.time.LocalDate.parse(SpineEnd)) + 1
    spark.range(nDays)
      .select(
        col("id").cast("int").as("datetime_id"),
        date_add(lit(SpineStart).cast("date"), col("id").cast("int")).as("full_timestamp"))
      .select(
        col("datetime_id"),
        col("full_timestamp"),
        date_format(col("full_timestamp"), "yyyyMMdd").cast("int").as("date_id"),
        date_format(col("full_timestamp"), "EEEE").as("day_of_week"),
        dayofmonth(col("full_timestamp")).as("day_of_month"),
        month(col("full_timestamp")).as("month"),
        year(col("full_timestamp")).as("year"),
        quarter(col("full_timestamp")).as("quarter"),
        lit(0).as("hour_id")) // constant default, transformation.py:114 (D11)
  }

  /** dim_date (transformation.py:128-137): keyed by date_id, dedup'd. */
  def dimDate(spark: SparkSession): DataFrame =
    dimDatetime(spark)
      .dropDuplicates("date_id")
      .select(col("date_id"), col("full_timestamp").as("full_date"),
        col("year"), col("month"), col("day_of_month").as("day"),
        col("day_of_week"), col("quarter"))

  /** dim_hour (transformation.py:118-125): 0-23 with "00".."23" labels. */
  def dimHour(spark: SparkSession): DataFrame =
    spark.range(24)
      .select(col("id").cast("int").as("hour_id"),
        lpad(col("id").cast("string"), 2, "0").as("hour_of_day")) // transformation.py:123
}

/** Oracle-checked queries over the generated dims (no fixture input). */
object DateDimQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_date_spine" -> ((s, _) => {
      s.conf.set("spark.sql.ansi.enabled", "false")
      DateDims.dimDatetime(s)
        .select(col("datetime_id"),
          date_format(col("full_timestamp"), "yyyy-MM-dd").as("full_date"),
          col("date_id"), col("day_of_week").as("day_name"), col("day_of_month"),
          col("month"), col("year"), col("quarter"))
        .orderBy("datetime_id")
    }),
    "q23_hour_dim" -> ((s, _) => {
      s.conf.set("spark.sql.ansi.enabled", "false")
      DateDims.dimHour(s).orderBy("hour_id")
    }))

  val oracleSql: Map[String, String] = Map(
    "q22_date_spine" ->
      """SELECT CAST(row_number() OVER (ORDER BY d) - 1 AS INT) AS datetime_id,
        | strftime(d, '%Y-%m-%d') AS full_date,
        | CAST(strftime(d, '%Y%m%d') AS INT) AS date_id,
        | dayname(d) AS day_name,
        | CAST(dayofmonth(d) AS INT) AS day_of_month,
        | CAST(month(d) AS INT) AS month,
        | CAST(year(d) AS INT) AS year,
        | CAST(quarter(d) AS INT) AS quarter
        |FROM (SELECT CAST(unnest(generate_series(DATE '1948-09-06', DATE '2025-12-31', INTERVAL 1 DAY)) AS DATE) AS d)
        |ORDER BY datetime_id""".stripMargin,
    "q23_hour_dim" ->
      """SELECT CAST(range AS INT) AS hour_id,
        | lpad(CAST(range AS VARCHAR), 2, '0') AS hour_of_day
        |FROM range(24) ORDER BY hour_id""".stripMargin)
}
