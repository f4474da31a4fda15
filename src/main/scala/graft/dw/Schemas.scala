package graft.dw

import org.apache.spark.sql.types._

/** Explicit source schemas for the warehouse pipelines (SURVEY.md §1,
  * FIXTURES.md §B).
  *
  * The reference relies on pandas inference (`/root/reference/
  * transformation.py:63,84`); we declare schemas because (a) inference is
  * non-deterministic across data samples, and (b) Spark's JSON inference
  * would turn the `attributes`/`hours` dicts into giant sparse structs —
  * MapType is the faithful model (SURVEY.md §7.4.2). At 100 TB explicit
  * schemas also skip the extra inference pass over the input.
  *
  * Attribute values arrive as strings in the Yelp dump (`"True"`,
  * `"{'touch': True}"`); `str(value)` at transformation.py:181 flattens
  * non-strings. MapType(String,String) + JSON-string values reproduces
  * that; native-JSON booleans would read as "true" (divergence documented
  * in WarehouseSpec).
  */
object Schemas {

  val business: StructType = StructType(Seq(
    StructField("business_id", StringType),
    StructField("name", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("postal_code", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("is_open", IntegerType),
    StructField("stars", DoubleType),
    StructField("review_count", IntegerType),
    StructField("categories", StringType),
    StructField("attributes", MapType(StringType, StringType)),
    StructField("hours", MapType(StringType, StringType))))

  val review: StructType = StructType(Seq(
    StructField("review_id", StringType),
    StructField("business_id", StringType),
    StructField("user_id", StringType),
    StructField("stars", DoubleType),
    StructField("useful", IntegerType),
    StructField("funny", IntegerType),
    StructField("cool", IntegerType),
    StructField("text", StringType),
    StructField("date", StringType)))

  val user: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("name", StringType),
    StructField("review_count", IntegerType),
    StructField("yelping_since", StringType),
    StructField("useful", IntegerType),
    StructField("funny", IntegerType),
    StructField("cool", IntegerType),
    StructField("fans", IntegerType),
    StructField("average_stars", DoubleType),
    StructField("compliment_hot", IntegerType),
    StructField("compliment_more", IntegerType),
    StructField("compliment_profile", IntegerType),
    StructField("compliment_cute", IntegerType),
    StructField("compliment_list", IntegerType),
    StructField("compliment_note", IntegerType),
    StructField("compliment_plain", IntegerType),
    StructField("compliment_cool", IntegerType),
    StructField("compliment_funny", IntegerType),
    StructField("compliment_writer", IntegerType),
    StructField("compliment_photos", IntegerType),
    StructField("elite", StringType),
    StructField("friends", StringType)))

  val checkin: StructType = StructType(Seq(
    StructField("business_id", StringType),
    StructField("date", StringType)))

  val tip: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("business_id", StringType),
    StructField("text", StringType),
    StructField("date", StringType),
    StructField("compliment_count", IntegerType)))

  /** Source column names contain spaces (transformation.py:291-293). */
  val covid: StructType = StructType(Seq(
    StructField("business_id", StringType),
    StructField("Grubhub enabled", BooleanType),
    StructField("Request a Quote Enabled", BooleanType),
    StructField("Covid Banner", StringType),
    StructField("Temporary Closed Until", StringType),
    StructField("Virtual Services Offered", StringType),
    StructField("highlights", StringType)))

  /** Climate CSVs: date is a yyyymmdd int (transformation.py:453,489). */
  val temperature: StructType = StructType(Seq(
    StructField("date", IntegerType),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("normal_min", DoubleType),
    StructField("normal_max", DoubleType)))

  /** precipitation may hold "T" (trace) — kept string-safe like pandas'
    * object dtype does (FIXTURES.md). */
  val precipitation: StructType = StructType(Seq(
    StructField("date", IntegerType),
    StructField("precipitation", StringType),
    StructField("precipitation_normal", DoubleType)))

  /** highlights JSON payload: array of {identifier, params, type}
    * (transformation.py:304-322). */
  val highlightsArray: ArrayType = ArrayType(StructType(Seq(
    StructField("identifier", StringType),
    StructField("params", StringType),
    StructField("type", StringType))))
}
