package graft

import graft.dw.{DateDims, Keys}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5.4): explode/split round trips, surrogate
  * key density, date-spine invariants — over generated inputs, not just
  * the fixtures. Raw ScalaCheck generators with a fixed seed (the
  * scalatest-scalacheck bridge isn't in the offline dependency set).
  */
class PropertySpec extends SparkTestBase {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  test("split+explode row count equals token count for any token lists") {
    import spark.implicits._
    samples(Gen.listOfN(20, Gen.listOf(token)), 10).foreach { docs =>
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(",")) }
        .toDF("id", "csv")
      val exploded = df
        .filter(col("csv") =!= "")
        .select(col("id"), explode(split(col("csv"), ",")).as("tok"))
        .filter(col("tok") =!= "")
      val expected = docs.map(_.count(_.nonEmpty)).sum
      assert(exploded.count() === expected)
    }
  }

  test("denseIds are always a permutation of 1..n with no gaps or dupes") {
    import spark.implicits._
    samples(Gen.nonEmptyListOf(token), 10).foreach { words =>
      val distinctDf = words.toDF("w").distinct()
      val ids = Keys.denseIds(distinctDf, "id", Seq(col("w")))
        .select("id").collect().map(_.getInt(0)).sorted
      assert(ids.toSeq === (1 to ids.length))
    }
  }

  test("partitionOffsetIds are dense 1..n regardless of partitioning") {
    import spark.implicits._
    samples(Gen.zip(Gen.chooseNum(1, 200), Gen.chooseNum(1, 8)), 10)
      .foreach { case (n, parts) =>
        val df = (1 to n).toDF("x").repartition(parts)
        val ids = Keys.partitionOffsetIds(df, "id")
          .select("id").collect().map(_.getLong(0)).sorted
        assert(ids.toSeq === (1L to n.toLong))
      }
  }

  test("date spine: date_id strictly increases with datetime_id, one row per day") {
    val dim = DateDims.dimDatetime(spark)
      .select("datetime_id", "date_id").orderBy("datetime_id").collect()
    dim.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getInt(0) + 1 === b.getInt(0))
        assert(a.getInt(1) < b.getInt(1))
      case _ =>
    }
  }

  test("hour parse: pmod(h, 24) lands in [0, 24) for any int hour") {
    import spark.implicits._
    samples(Gen.listOfN(50, Gen.chooseNum(-100, 100)), 5).foreach { hours =>
      val got = hours.toDF("h")
        .select(pmod(col("h"), lit(24)).as("m"))
        .collect().map(_.getInt(0))
      assert(got.forall(m => m >= 0 && m < 24))
    }
  }
}
