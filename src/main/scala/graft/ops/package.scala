package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the query catalog (`SparkEntry.queries`).
  *
  * Determinism rules (driver hash-compares our parquet output against a
  * DuckDB run of `SparkEntry.oracleSql` at sf0.01 — see SURVEY.md §5):
  *   - every query ends in a total-order `orderBy` (unique tiebreak);
  *   - double aggregates go through exact DECIMAL arithmetic and are cast
  *     back to double at the very end, so Spark's parallel partial
  *     aggregation and DuckDB's sequential scan produce bit-identical
  *     values regardless of summation order;
  *   - column names are aliased identically on both sides.
  */
package object ops {

  /** Signature of every catalog query: (session, sf-dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Exact-arithmetic staging type for double columns (values in the
    * fixtures are 2-decimal money-like / small reals — 18,6 is lossless
    * for them and sums stay far from overflow).
    */
  val Dec: DecimalType = DecimalType(18, 6)

  /** Final exact→double staging: scale 4 keeps every money-like value exact
    * while its unscaled integer stays < 2^53, so DECIMAL→DOUBLE conversion
    * is correctly rounded (hence identical) in both Spark and DuckDB.
    * (At scale 12 the int128 representation exceeds 2^53 and DuckDB's
    * conversion double-rounds — observed 1-ulp mismatches.)
    */
  val DecOut: DecimalType = DecimalType(38, 4)

  /** Sum of a double column with deterministic (order-independent) result. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DecOut).cast("double")

  /** Deterministic average = exact sum / count (DuckDB's avg(decimal)
    * returns double directly, so spell out the same division on both sides).
    */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast(DecOut).cast("double") / count(c)

  /** Revenue-style exact product sum: sum(price * (1 - discount)). */
  def drevenue(price: Column, discount: Column): Column =
    sum(price.cast(Dec) * (lit(1).cast(Dec) - discount.cast(Dec))).cast(DecOut).cast("double")

  /** The events fixture stores ts as parquet TIMESTAMP(NANOS), which Spark
    * has no native type for — read it as long and convert to microsecond
    * TimestampType (integer division; ns-epoch exceeds 2^53 so float math
    * would corrupt it).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  /** Read a driver fixture table (TESTDATA.md) from the round's sf dir. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Spark 4 defaults ANSI on; the reference's semantics (pandas: bad
    // parse -> NaN/NaT, transformation.py:260) need null-on-failure casts.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // events.parquet stores TIMESTAMP(NANOS); schema inference rejects it
    // outright (even under pruning) unless nanos map to long.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
