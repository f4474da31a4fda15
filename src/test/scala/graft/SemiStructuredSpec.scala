package graft

import graft.ops.SemiStructured
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SemiStructuredSpec extends SparkTestBase {

  test("q24: exploded word rows = token occurrences (E1-E4 round trip)") {
    import spark.implicits._
    val docs = ops.table(spark, sf, "documents")
    val tokenCount = docs
      .select(size(filter(split(col("text"), " "), w => w =!= "")).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val explodedCount = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter($"w" =!= "").count()
    assert(explodedCount === tokenCount)
  }

  test("q25: from_json null-on-invalid (E7 json.loads try/except parity)") {
    import spark.implicits._
    val df = Seq("""{"k": 7}""", "not json", """{"k": null}""").toDF("props")
      .select(from_json(col("props"), StructType(Seq(StructField("k", LongType))))
        .getField("k").as("k"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === Seq(Some(7L), None, None))
  }

  test("q26: map explode yields one row per entry (E5)") {
    import spark.implicits._
    val df = Seq("""{"a":1,"b":2}""", """{"c":3}""").toDF("props")
      .select(explode(from_json(col("props"), MapType(StringType, LongType))))
    assert(df.count() === 3)
    assert(df.select("key").orderBy("key").collect().map(_.getString(0)).toSeq
      === Seq("a", "b", "c"))
  }

  test("q28: close-hour pmod wraps past midnight (E6, '24:0' -> 0)") {
    import spark.implicits._
    val parsed = Seq("11:0-24:0", "9:0-33:15").toDF("time_range")
      .select(
        element_at(split(element_at(split(col("time_range"), "-"), 2), ":"), 1)
          .cast("int").as("raw"),
        pmod(element_at(split(element_at(split(col("time_range"), "-"), 2), ":"), 1)
          .cast("int"), lit(24)).as("close_hour"))
      .collect()
    assert(parsed.map(_.getInt(1)).toSeq === Seq(0, 9))
  }

  test("q28: malformed hour strings null out instead of throwing (X4)") {
    import spark.implicits._
    val parsed = Seq("11:0-21:0", "garbage", "::", "").toDF("tr")
      .select(element_at(split(element_at(split(col("tr"), "-"), 1), ":"), 1)
        .cast("int").as("open_hour"))
      .collect()
    assert(parsed.count(_.isNullAt(0)) === 3)
  }

  test("q31/q32: ndjson and csv round-trips preserve rows") {
    val region = ops.table(spark, sf, "region")
    val viaJson = SemiStructured.q31NdjsonSource(spark, sf)
    assert(viaJson.count() === region.count())
    val nation = ops.table(spark, sf, "nation")
    val viaCsv = SemiStructured.q32CsvSource(spark, sf)
    assert(viaCsv.count() === nation.count())
    assert(viaCsv.except(nation.select("n_nationkey", "n_name", "n_regionkey")).count() === 0)
  }

  test("q126/q127: SQL UDFs inline into the plan — no opaque call sites") {
    val scalar = SemiStructured.q126SqlUdf(spark, sf)
    assert(scalar.collect().length === 3) // low/mid/high
    val plan = scalar.queryExecution.executedPlan.toString
    // the SQL UDF body is inlined; a Scala UDF would show ScalaUDF and
    // break whole-stage codegen
    assert(!plan.contains("ScalaUDF"), plan)
    // "*(n)" is the WholeStageCodegen marker in the plan string — the
    // inlined UDF body stays inside codegen stages
    assert(plan.contains("*("), plan)
    val tvf = SemiStructured.q127SqlTableFunction(spark, sf)
    val rows = tvf.collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 5))
    assert(rows.map(_.getLong(1)).sum ===
      spark.read.parquet(s"$sf/orders.parquet").count())
  }
}
