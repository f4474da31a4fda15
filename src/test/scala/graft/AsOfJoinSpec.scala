package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The as-of join custom operator: semantics against the compositional
  * encoding (theta join + row_number), edge cases, and the physical plan
  * shape (co-partitioned merge, no pair materialization).
  */
class AsOfJoinSpec extends SparkTestBase {

  import org.apache.spark.sql.DataFrame

  /** Reference implementation: all (left, right-at-or-before) pairs, keep
    * the latest per left row — O(n·m) but obviously correct. */
  private def reference(l: DataFrame, r: DataFrame): DataFrame = {
    val pairs = l.join(r,
      col("k") === col("rk") && col("rts") <= col("ts"), "left")
    pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("rts").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select("id", "k", "ts", "rv")
  }

  private def leftDf(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("id", "k", "ts")
  }

  private def rightDf(rows: Seq[(String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("rk", "rts", "rv")
  }

  test("as-of picks the latest right row at or before each left row") {
    val l = leftDf(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L), (4L, "b", 50L)))
    val r = rightDf(Seq(("a", 7L, "a7"), ("a", 10L, "a10"), ("a", 15L, "a15"), ("b", 60L, "b60")))
    val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "ts", "rts")
      .select("id", "k", "ts", "rv").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(3)) null else row.getString(3))).toMap
    // ties included (ts=10 matches rts=10); before-any-right -> null
    assert(got === Map(1L -> "a10", 2L -> "a15", 3L -> null, 4L -> null))
  }

  test("as-of equals the compositional reference on random data") {
    val rnd = new scala.util.Random(7)
    val l = leftDf(Seq.tabulate(500)(i =>
      (i.toLong, s"k${rnd.nextInt(20)}", rnd.nextInt(1000).toLong)))
    val r = rightDf(
      Seq.tabulate(300)(i => (s"k${rnd.nextInt(25)}", rnd.nextInt(1000).toLong, s"v$i"))
        .distinct
        .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq) // unique (key, ts)
    val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "ts", "rts")
      .select("id", "k", "ts", "rv")
    val want = reference(l, r)
    assert(got.collect().toSet === want.collect().toSet)
    assert(got.count() === l.count()) // exactly one output row per left row
  }

  test("forward as-of picks the earliest right row at or after each left row") {
    val l = leftDf(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L), (4L, "b", 50L)))
    val r = rightDf(Seq(("a", 7L, "a7"), ("a", 10L, "a10"), ("a", 15L, "a15"), ("b", 40L, "b40")))
    val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "ts", "rts", direction = "forward")
      .select("id", "rv").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) null else row.getString(1))).toMap
    // ties included (ts=10 matches rts=10); after-all-rights -> null
    assert(got === Map(1L -> "a10", 2L -> null, 3L -> "a7", 4L -> null))
  }

  test("forward as-of equals the compositional reference on random data") {
    val rnd = new scala.util.Random(11)
    val l = leftDf(Seq.tabulate(500)(i =>
      (i.toLong, s"k${rnd.nextInt(20)}", rnd.nextInt(1000).toLong)))
    val r = rightDf(
      Seq.tabulate(300)(i => (s"k${rnd.nextInt(25)}", rnd.nextInt(1000).toLong, s"v$i"))
        .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq)
    val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "ts", "rts", direction = "forward")
      .select("id", "k", "ts", "rv")
    val pairs = l.join(r, col("k") === col("rk") && col("rts") >= col("ts"), "left")
    val want = pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("rts").asc_nulls_last)))
      .filter(col("rn") === 1)
      .select("id", "k", "ts", "rv")
    assert(got.collect().toSet === want.collect().toSet)
    assert(got.count() === l.count())
  }

  test("tolerance nulls out matches farther than the bound, both directions") {
    val l = leftDf(Seq((1L, "a", 10L), (2L, "a", 20L)))
    val r = rightDf(Seq(("a", 7L, "a7"), ("a", 26L, "a26")))
    val back = AsOf.join(l, r, Seq("k"), Seq("rk"), "ts", "rts",
        tolerance = Some(3L))
      .select("id", "rv").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) null else row.getString(1))).toMap
    // id1: a7 at gap 3 (kept); id2: nearest-before a7 at gap 13 (dropped)
    assert(back === Map(1L -> "a7", 2L -> null))
    val fwd = AsOf.join(l, r, Seq("k"), Seq("rk"), "ts", "rts",
        direction = "forward", tolerance = Some(6L))
      .select("id", "rv").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) null else row.getString(1))).toMap
    // id1: nearest-after a26 at gap 16 (dropped); id2: a26 at gap 6 (kept)
    assert(fwd === Map(1L -> null, 2L -> "a26"))
  }

  test("null join keys never match — not even a null right key") {
    import spark.implicits._
    // DuckDB ASOF LEFT JOIN ON l.k = r.k semantics: SQL equality, so a
    // null key matches nothing (null = null is not true).
    val l = Seq((1L, Option("a"), 10L), (2L, Option.empty[String], 10L))
      .toDF("id", "k", "ts")
    val r = Seq((Option("a"), 5L, "a5"), (Option.empty[String], 5L, "n5"))
      .toDF("rk", "rts", "rv")
    val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "ts", "rts")
      .select("id", "rv").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) null else row.getString(1))).toMap
    assert(got === Map(1L -> "a5", 2L -> null))
  }

  test("empty right side yields all-null matches, not errors") {
    val l = leftDf(Seq((1L, "a", 10L)))
    val r = rightDf(Seq.empty)
    val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "ts", "rts").collect()
    assert(got.length === 1 && got(0).isNullAt(4))
  }

  test("as-of plans through GraftExtensions injection alone (no runtime register)") {
    // newSession(): fresh SessionState (so no experimental.extraStrategies
    // left over from other tests) but the same spark.sql.extensions —
    // planning must succeed on the injected strategy alone
    val s2 = spark.newSession()
    import s2.implicits._
    val l = Seq((1L, "a", 10L)).toDF("id", "k", "ts")
    val r = Seq(("a", 7L, "a7")).toDF("rk", "rts", "rv")
    val df = AsOf.viaExtensions(l, r, Seq("k"), Seq("rk"), "ts", "rts")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val row = df.collect().head
    assert(row.getString(5) === "a7")
  }

  test("graft_asof SQL marker rewrites through the injected analyzer rule alone") {
    // pure spark.sql on an extensions-built session: no AsOfSql.sql, no
    // manual rewrite — the injected post-hoc resolution rule must fire
    val s2 = spark.newSession()
    import s2.implicits._
    Seq((1L, "a", 10L), (2L, "a", 4L)).toDF("id", "k", "ts")
      .createOrReplaceTempView("asof_sql_l")
    Seq(("a", 7L, "a7")).toDF("rk", "rts", "rv")
      .createOrReplaceTempView("asof_sql_r")
    val df = s2.sql(
      """SELECT id, rv FROM asof_sql_l l
        |LEFT JOIN asof_sql_r r ON l.k = r.rk AND graft_asof(l.ts, r.rts)
        |ORDER BY id""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val got = df.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got === Map(1L -> "a7", 2L -> null))
  }

  test("unsupported marker joins are left untouched and fail loudly at eval") {
    // extra non-equi predicate -> the rewrite must NOT fire (it can't
    // express the residual), and the surviving marker must explain itself
    val s2 = spark.newSession()
    import s2.implicits._
    Seq((1L, "a", 10L, 5L)).toDF("id", "k", "ts", "w")
      .createOrReplaceTempView("asof_bad_l")
    Seq(("a", 7L, "a7", 3L)).toDF("rk", "rts", "rv", "rw")
      .createOrReplaceTempView("asof_bad_r")
    val err = intercept[Exception] {
      s2.sql(
        """SELECT id, rv FROM asof_bad_l l
          |LEFT JOIN asof_bad_r r
          |  ON l.k = r.rk AND graft_asof(l.ts, r.rts) AND l.w > r.rw
          |ORDER BY id""".stripMargin).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(err).exists(m => m != null && m.contains("graft_asof")),
      s"unexpected error: $err")
  }

  test("physical plan: AsOfJoinExec with co-partitioned exchanges, no pair join") {
    val l = leftDf(Seq((1L, "a", 10L), (2L, "b", 20L)))
    val r = rightDf(Seq(("a", 7L, "a7")))
    val plan = AsOf.join(l, r, Seq("k"), Seq("rk"), "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
