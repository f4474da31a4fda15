package graft

import graft.dw.DateDims
import org.apache.spark.sql.functions._

class DateDimsSpec extends SparkTestBase {

  test("dim_datetime has exactly the reference's 28,241-day spine") {
    // transformation.py:95 — pd.date_range('1948-09-06','2025-12-31') rows
    val dim = DateDims.dimDatetime(spark)
    assert(dim.count() === 28241L)
    val first = dim.orderBy("datetime_id").limit(1).collect()(0)
    assert(first.getInt(0) === 0)
    assert(first.getAs[java.sql.Date]("full_timestamp").toString === "1948-09-06")
    val last = dim.orderBy(col("datetime_id").desc).limit(1).collect()(0)
    assert(last.getAs[java.sql.Date]("full_timestamp").toString === "2025-12-31")
  }

  test("datetime_id is positional: one per day, no gaps") {
    val dim = DateDims.dimDatetime(spark)
    assert(dim.select("datetime_id").distinct().count() === 28241L)
    assert(dim.agg(max("datetime_id")).collect()(0).getInt(0) === 28240)
  }

  test("date_id is yyyyMMdd int and strictly increasing with the date") {
    val bad = DateDims.dimDatetime(spark)
      .filter(col("date_id") =!= date_format(col("full_timestamp"), "yyyyMMdd").cast("int"))
    assert(bad.count() === 0)
  }

  test("dim_hour: 24 rows, zero-padded labels (transformation.py:118-125)") {
    val rows = DateDims.dimHour(spark).orderBy("hour_id").collect()
    assert(rows.length === 24)
    assert(rows(0).getString(1) === "00" && rows(23).getString(1) === "23")
  }

  test("day_name matches java semantics for a known date") {
    // 1948-09-06 was a Monday
    val r = DateDims.dimDatetime(spark).filter(col("datetime_id") === 0).collect()(0)
    assert(r.getAs[String]("day_of_week") === "Monday")
  }
}
