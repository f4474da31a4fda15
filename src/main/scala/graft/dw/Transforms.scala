package graft.dw

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The eight dataset pipelines producing the 21-table star schema
  * (SURVEY.md §1, §2; `/root/reference/transformation.py:140-514`).
  *
  * Each reference transform is a sequence of eager pandas steps with
  * row-wise Python loops; here each is ONE lazy plan per output table —
  * explode/join/dedup compose declaratively and Catalyst prunes columns
  * and pushes filters into the scans.
  *
  * Scale decisions:
  *   - dim_datetime is ~28k rows — every datetime lookup join is a
  *     broadcast (the reference's dict `.map` probe is exactly a
  *     build-side-broadcast hash join, transformation.py:249,266).
  *   - dimension surrogate ids use Keys.denseIds (global sort of the
  *     DISTINCT key set — small by construction); fact ids (checkin_id,
  *     tip_id) use Keys.rangeIds — distributed range-sorted assignment,
  *     same ids, no single-task stage.
  *   - dedup/distinct are the only full-width shuffles; they shuffle the
  *     projected columns only.
  *
  * Divergences from the literal reference, all documented in WarehouseSpec:
  *   - surrogate ids are ordered by natural key, not file position
  *     (SURVEY.md §7.4.1 — ids are opaque).
  *   - fact_reviews.datetime_id uses the intended calendar-date join; the
  *     reference's lookup builds keys as '%Y%m%d' but probes '%Y-%m-%d'
  *     (transformation.py:336 vs :348), so its output is all-NaN.
  *   - unparseable review/tip dates become null datetime_id instead of
  *     raising (pandas strict to_datetime, transformation.py:348,433).
  */
object Transforms {

  private val IsoDate = "yyyy-MM-dd"
  private val CompactDate = "yyyyMMdd"

  /** dim_datetime keyed for lookups: (datetime_id, date string). */
  private def datetimeLookup(dimDatetime: DataFrame, fmt: String): DataFrame =
    dimDatetime.select(col("datetime_id"),
      date_format(col("full_timestamp"), fmt).as("__date_str"))

  // -------------------------------------------------------------- business

  /** transformation.py:140-238 → 6 tables. */
  def business(df: DataFrame): Map[String, DataFrame] = {
    val dimBusiness = df.select("business_id", "name", "address", "city", "state",
      "postal_code", "latitude", "longitude", "is_open", "stars", "review_count")
      .dropDuplicates()

    // categories: "A, B, C" split on the two-char ", " separator (E4,
    // transformation.py:152) after the notna-and-nonempty guard (:151)
    val categories = df
      .filter(col("categories").isNotNull && col("categories") =!= "")
      .select(col("business_id"),
        explode(split(col("categories"), ", ")).as("category_name"))
    val dimCategory = Keys.denseIds(
      categories.select("category_name").distinct().na.drop(),
      "category_id", Seq(col("category_name")))
    val factBusinessCategories = categories
      .join(broadcast(dimCategory), Seq("category_name"))
      .select("business_id", "category_id")

    // attributes: MapType explode; values are already strings per schema
    // (str(value) parity, transformation.py:181)
    val attributes = df
      .filter(col("attributes").isNotNull)
      .select(col("business_id"),
        explode(col("attributes")).as(Seq("attribute_name", "attribute_value")))
    val dimAttribute = Keys.denseIds(
      attributes.select("attribute_name", "attribute_value").distinct(),
      "attribute_id", Seq(col("attribute_name"), col("attribute_value")))
    val factBusinessAttributes = attributes
      .join(broadcast(dimAttribute), Seq("attribute_name", "attribute_value"))
      .select("business_id", "attribute_id")

    // hours: "H:M-H:M" per day; the reference skips rows without '-',
    // with more than one '-' (unpack ValueError), or non-integer hours
    // (int() ValueError) — null-safe casts + filters replace try/except
    // (X4, transformation.py:201-229)
    val hoursRaw = df
      .filter(col("hours").isNotNull)
      .select(col("business_id"),
        explode(col("hours")).as(Seq("day_of_week", "time_range")))
      .filter(size(split(col("time_range"), "-")) === 2)
      .withColumn("open_time", element_at(split(col("time_range"), "-"), 1))
      .withColumn("close_time", element_at(split(col("time_range"), "-"), 2))
      .withColumn("open_hour_id",
        element_at(split(col("open_time"), ":"), 1).cast("int"))
      .withColumn("close_hour_id",
        pmod(element_at(split(col("close_time"), ":"), 1).cast("int"), lit(24)))
    val factBusinessHours = hoursRaw
      .filter(col("open_hour_id").isNotNull && col("close_hour_id").isNotNull)
      .select("business_id", "day_of_week", "open_time", "close_time",
        "open_hour_id", "close_hour_id")

    Map(
      "dim_business" -> dimBusiness,
      "dim_category" -> dimCategory.select("category_name", "category_id"),
      "fact_business_categories" -> factBusinessCategories,
      "dim_attribute" -> dimAttribute.select("attribute_name", "attribute_value", "attribute_id"),
      "fact_business_attributes" -> factBusinessAttributes,
      "fact_business_hours" -> factBusinessHours)
  }

  // --------------------------------------------------------------- checkin

  /** The id-free checkin rows: split, explode, trim, lenient parse, inner
    * datetime join (misses DROPPED — J5 distinction vs review/tip).
    * Factored out so the incremental (foreachBatch) build can run the same
    * transform per micro-batch; ids are a batch-level concern. */
  def checkinRows(df: DataFrame, dimDatetime: DataFrame): DataFrame =
    df.select(col("business_id"), explode(split(col("date"), ",")).as("raw_ts"))
      .withColumn("ts", to_timestamp(trim(col("raw_ts")))) // errors='coerce' → null (D8)
      .filter(col("ts").isNotNull)
      .withColumn("__date_str", date_format(col("ts"), IsoDate))
      .join(broadcast(datetimeLookup(dimDatetime, IsoDate)), Seq("__date_str"))
      .select("business_id", "datetime_id")

  /** transformation.py:240-280. */
  def checkin(df: DataFrame, dimDatetime: DataFrame): DataFrame =
    // fact-sized output: distributed range-sorted ids, not a global Window
    Keys.rangeIds(checkinRows(df, dimDatetime), "checkin_id",
      Seq(col("business_id"), col("datetime_id")))
      .select("checkin_id", "business_id", "datetime_id")

  // ---------------------------------------------------------------- review

  /** transformation.py:326-364: 9-col projection + calendar-date lookup,
    * misses kept as null (left). Implements the evident intent — the
    * reference's mismatched lookup formats (:336 vs :348) yield all-NaN. */
  def review(df: DataFrame, dimDatetime: DataFrame): DataFrame =
    df.select("review_id", "business_id", "user_id", "stars", "useful",
      "funny", "cool", "text", "date")
      .withColumn("__date_str", date_format(to_timestamp(col("date")), IsoDate))
      .join(broadcast(datetimeLookup(dimDatetime, IsoDate)), Seq("__date_str"), "left")
      .drop("date", "__date_str")

  // ------------------------------------------------------------------ user

  /** transformation.py:366-414 → 5 tables. elite/friends split on "," with
    * NO trim — the reference keeps leading spaces in friend tokens
    * (SURVEY.md §7.4.5). */
  def user(df: DataFrame): Map[String, DataFrame] = {
    val dimUser = df.select("user_id", "name", "review_count", "yelping_since",
      "useful", "funny", "cool", "fans", "average_stars",
      "compliment_hot", "compliment_more", "compliment_profile",
      "compliment_cute", "compliment_list", "compliment_note",
      "compliment_plain", "compliment_cool", "compliment_funny",
      "compliment_writer", "compliment_photos")
      .withColumn("yelping_since", to_timestamp(col("yelping_since")))

    def exploded(srcCol: String, outCol: String): DataFrame = df
      .select(col("user_id"), explode(split(col(srcCol), ",")).as(outCol))
      .filter(col(outCol).isNotNull && col(outCol) =!= "")

    val elite = exploded("elite", "elite_year")
    val dimElite = Keys.denseIds(
      elite.select("elite_year").distinct(), "elite_id", Seq(col("elite_year")))
    val factUserElite = elite.join(broadcast(dimElite), Seq("elite_year"), "left")
      .select("user_id", "elite_id")

    val friends = exploded("friends", "friends_name")
    val dimFriend = Keys.denseIds(
      friends.select("friends_name").distinct(), "friend_id", Seq(col("friends_name")))
    val factUserFriend = friends.join(broadcast(dimFriend), Seq("friends_name"), "left")
      .select("user_id", "friend_id")

    Map(
      "dim_user" -> dimUser,
      "dim_elite" -> dimElite.select("elite_year", "elite_id"),
      "dim_friend" -> dimFriend.select("friends_name", "friend_id"),
      "fact_user_elite" -> factUserElite,
      "fact_user_friend" -> factUserFriend)
  }

  // ------------------------------------------------------------------- tip

  /** transformation.py:416-444: left datetime join (misses kept). */
  def tip(df: DataFrame, dimDatetime: DataFrame): DataFrame = {
    val joined = df
      .select("text", "compliment_count", "business_id", "user_id", "date")
      .withColumn("__date_str", date_format(to_timestamp(col("date")), IsoDate))
      .join(broadcast(datetimeLookup(dimDatetime, IsoDate)), Seq("__date_str"), "left")
      .drop("date", "__date_str")
    // fact-sized output: distributed range-sorted ids, not a global Window
    Keys.rangeIds(joined, "tip_id",
      Seq(col("business_id"), col("user_id"), col("datetime_id"), col("text")))
      .select("tip_id", "text", "compliment_count", "business_id", "user_id", "datetime_id")
  }

  // ----------------------------------------------------------------- covid

  /** transformation.py:282-324 → fact_covid_features + dim_highlights. */
  def covid(df: DataFrame): Map[String, DataFrame] = {
    val fact = df.select(
      col("business_id"),
      col("Grubhub enabled").as("grubhub_enabled"),
      col("Request a Quote Enabled").as("request_a_quote_enabled"),
      col("Covid Banner").as("covid_banner"),
      col("Temporary Closed Until").as("temporary_closed_until"),
      col("Virtual Services Offered").as("virtual_services_offered"))
      .dropDuplicates()

    // invalid JSON → from_json null → no rows, matching the reference's
    // json.JSONDecodeError → [] (E7, transformation.py:308-314)
    val highlights = df
      .select(col("business_id"),
        explode(from_json(col("highlights"), Schemas.highlightsArray)).as("h"))
      .select(col("business_id"), col("h.identifier").as("identifier"),
        col("h.params").as("params"), col("h.type").as("type"))

    Map("fact_covid_features" -> fact, "dim_highlights" -> highlights)
  }

  // --------------------------------------------------------------- climate

  /** transformation.py:446-481: yyyymmdd-int date → left datetime join. */
  def temperature(df: DataFrame, dimDatetime: DataFrame): DataFrame =
    df.withColumn("__date_str", col("date").cast("string"))
      .select(col("__date_str"),
        col("min").as("min_temperature"),
        col("max").as("max_temperature"),
        col("normal_min").as("normal_min_temperature"),
        col("normal_max").as("normal_max_temperature"))
      .join(broadcast(datetimeLookup(dimDatetime, CompactDate)), Seq("__date_str"), "left")
      .select("datetime_id", "min_temperature", "max_temperature",
        "normal_min_temperature", "normal_max_temperature")

  /** transformation.py:483-514. */
  def precipitation(df: DataFrame, dimDatetime: DataFrame): DataFrame =
    df.withColumn("__date_str", col("date").cast("string"))
      .select(col("__date_str"), col("precipitation"),
        col("precipitation_normal").as("normal_precipitation"))
      .join(broadcast(datetimeLookup(dimDatetime, CompactDate)), Seq("__date_str"), "left")
      .select("datetime_id", "precipitation", "normal_precipitation")
}
