package graft

import graft.ops.Advanced
import org.apache.spark.sql.functions._

/** Plan-shape and equivalence tests for the advanced serving operators. */
class AdvancedSpec extends SparkTestBase {

  test("q110 multi-distinct: planned as Expand + two-phase agg, no self-join") {
    val df = Advanced.multiDistinct(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Join"), plan)
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
  }

  test("q109 table checksum: detects a one-row perturbation, only in its group") {
    val base = Advanced.tableChecksum(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // perturb exactly one row's content (not its group key) and recompute
    val perturbed = graft.ops.table(spark, sf, "customer")
      .withColumn("c_name",
        when(col("c_custkey") === 1L, concat(col("c_name"), lit("~")))
          .otherwise(col("c_name")))
    perturbed.createOrReplaceTempView("q109_perturbed")
    val hit = graft.ops.table(spark, sf, "customer")
      .filter(col("c_custkey") === 1L).select("c_nationkey")
      .head().getInt(0).toLong
    val after = spark.sql(
      """SELECT CAST(c_nationkey AS BIGINT) AS nk, COUNT(*) AS n_rows,
        |  SUM(CAST(conv(substring(md5(concat_ws('|',
        |    CAST(c_custkey AS STRING), c_name,
        |    CAST(c_nationkey AS STRING), c_mktsegment)), 1, 15), 16, 10)
        |  AS BIGINT) % 1000000007) AS checksum
        |FROM q109_perturbed GROUP BY 1""".stripMargin).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after(hit)._2 != base(hit)._2, "perturbed group checksum unchanged")
    assert(after(hit)._1 == base(hit)._1, "row count must not change")
    (base.keySet - hit).foreach { nk =>
      assert(after(nk) == base(nk), s"untouched group $nk changed")
    }
  }

  test("q108 sole-late supplier: explicit semi+anti equals Catalyst-decorrelated EXISTS") {
    val df = Advanced.soleLateSupplier(spark, sf)
    val rows = df.collect()
    // the same query spelled with correlated EXISTS / NOT EXISTS, run
    // through Spark's own decorrelation (RewritePredicateSubquery)
    graft.ops.table(spark, sf, "lineitem").createOrReplaceTempView("q108_l")
    graft.ops.table(spark, sf, "orders").createOrReplaceTempView("q108_o")
    val sql = spark.sql(
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM q108_l l JOIN q108_o o ON l.l_orderkey = o.o_orderkey
        |  WHERE datediff(CAST(l_shipdate AS DATE),
        |                 CAST(o_orderdate AS DATE)) > 90)
        |SELECT l1.l_suppkey AS suppkey, COUNT(*) AS numwait
        |FROM late l1
        |WHERE EXISTS (
        |    SELECT 1 FROM q108_l l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY 1 ORDER BY numwait DESC, suppkey LIMIT 25""".stripMargin)
      .collect()
    assert(rows.toSeq === sql.toSeq)
    assert(rows.nonEmpty)
    // plan: one semi, one anti, no cartesian/nested-loop, top-k served
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("binned range join plans as an equi join — no nested loop, no cartesian") {
    val plan = Advanced.rangeJoinBinned(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan) // a real (hash/merge) equi join on the bin
  }

  test("bucketed join: sort-merge with zero exchange beneath it") {
    val q = Advanced.bucketedJoin(spark, sf)
    // execute first — AQE finalizes the physical plan lazily
    val rows = q.collect()
    // cross-check against the plain (unbucketed) join
    val plain = graft.ops.table(spark, sf, "orders")
      .join(graft.ops.table(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        graft.ops.dsum(col("o_totalprice")).as("total"))
      .orderBy("c_mktsegment").collect()
    assert(rows.toSeq === plain.toSeq)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => n }.flatMap {
        case qs: QueryStageExec => qs +: allNodes(qs.plan)
        case n => Seq(n)
      }
    val plan = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val smj = allNodes(plan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.nonEmpty, s"no sort-merge join in bucketed plan:\n$plan")
    smj.foreach { j =>
      val shuffles = allNodes(j).collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty, s"bucketed join still shuffled:\n$j")
    }
  }

  test("the naive BETWEEN join DOES nested-loop — the bin rewrite is the fix") {
    import spark.implicits._
    val ivals = Seq((1L, 10, 20)).toDF("ival_id", "start_d", "end_d")
    val pts = Seq(15, 25).toDF("p_d")
    val naive = pts.join(ivals, col("p_d") >= col("start_d") && col("p_d") <= col("end_d"))
    val plan = naive.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"), plan)
  }

  test("salted join equals the unsalted join") {
    val salted = Advanced.saltedJoin(spark, sf).collect()
    val plain = graft.ops.table(spark, sf, "orders")
      .select((col("o_custkey") % 3).as("hot_key"), col("o_totalprice"))
      .join(graft.ops.table(spark, sf, "region")
        .filter(col("r_regionkey") < 3)
        .select(col("r_regionkey").cast("long").as("hot_key"), col("r_name")), Seq("hot_key"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"), graft.ops.dsum(col("o_totalprice")).as("total"))
      .orderBy("r_name").collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("exact percentiles interpolate linearly") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = df.agg(
      expr("percentile(x, 0.25)"), expr("percentile(x, 0.5)"), expr("percentile(x, 0.75)"))
      .head()
    assert(r.getDouble(0) === 1.75 && r.getDouble(1) === 2.5 && r.getDouble(2) === 3.25)
  }

  test("GROUP BY ALL equals explicit grouping keys") {
    val all = Advanced.groupByAll(spark, sf).collect()
    val explicit = graft.ops.table(spark, sf, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), graft.ops.dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus", "o_orderpriority").collect()
    assert(all.toSeq === explicit.toSeq)
  }

  test("profit rollup broadcasts the three small dims; only one big shuffle join") {
    val plan = Advanced.profitByNationYear(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val rows = Advanced.profitByNationYear(spark, sf).collect()
    assert(rows.nonEmpty)
    // (nation, year) keys are unique and sorted
    val keys = rows.map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(keys === keys.distinct.sorted)
  }

  test("returned-items top-N caps without a global sort (TakeOrdered)") {
    val q = Advanced.returnedTopCustomers(spark, sf)
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val rows = q.collect()
    assert(rows.length <= 20)
    val revs = rows.map(_.getDouble(3)).toSeq
    assert(revs === revs.sortBy(-_), "not revenue-descending")
  }

  test("HOF array stats match a hand computation") {
    val r = Advanced.hofArrays(spark, sf).filter(col("doc_id") === 0).head()
    val text = graft.ops.table(spark, sf, "documents")
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    val toks = text.split(" ").filter(_.nonEmpty)
    assert(r.getInt(1) === toks.length)
    assert(r.getLong(2) === toks.map(_.length.toLong).sum)
    assert(r.getInt(3) === toks.map(_.length).max)
    assert(r.getInt(4) === toks.count(_.length >= 6))
  }

  test("SQL pipe chain equals the classic formulation") {
    val pipe = Advanced.sqlPipe(spark, sf).collect()
    val classic = graft.ops.table(spark, sf, "orders")
      .filter(col("o_orderstatus") === "O")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), graft.ops.dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderpriority").collect()
    assert(pipe.map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("n"),
      r.getAs[Double]("total"))).toSeq ===
      classic.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("pagerank: ranks are a probability-ish distribution, hubs rank higher") {
    val rows = graft.ext.GraphRank.pageRank(spark, sf).collect()
    assert(rows.nonEmpty)
    val ranks = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks.values.foreach(p => assert(p > 0.0 && p < 1.0))
    // teleport contributes exactly 0.15; dangling nodes (common in the
    // sparse sf0.001 graph) lose their mass in this defined variant, so
    // the bound is [teleport, 1]
    val total = ranks.values.sum
    assert(total >= 0.15 - 1e-9 && total < 1.0 + 1e-9, s"mass $total")
    // a node with no in-edges gets exactly the teleport floor
    val edges = graft.ops.table(spark, sf, "events")
      .select((col("user_id") % 50).as("src"), (col("event_id") % 50).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = (edges.map(_._1) ++ edges.map(_._2)).distinct.length
    val noIn = ranks.keySet -- edges.map(_._2).toSet
    noIn.foreach(v => assert(math.abs(ranks(v) - 0.15 / n) < 1e-6))
  }

  test("arg extremes pick the row the window formulation picks") {
    val viaAgg = Advanced.argExtremes(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rows = graft.ops.table(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val viaSort = rows.groupBy(_._1).map { case (f, xs) =>
      val sorted = xs.sortBy(x => (x._4, x._2, x._3.toLong))
      f -> ((sorted.last._2, sorted.head._2))
    }
    assert(viaAgg === viaSort)
  }

  test("union of evolved schemas null-fills missing columns by name") {
    val rows = Advanced.unionEvolved(spark, sf).collect()
    assert(rows.map(_.schema.fieldNames.toSeq).head ===
      Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment"))
    rows.foreach { r =>
      if (r.getLong(0) <= 200) assert(!r.isNullAt(2) && r.isNullAt(3))
      else assert(r.isNullAt(2) && !r.isNullAt(3))
    }
  }

  test("null-safe join matches null keys to each other, still a hash join") {
    val q = Advanced.nullSafeJoin(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"null-safe equality fell back to a nested loop:\n$plan")
    val rows = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the null bucket (k = -1): odd-multiples-of-7 x even-multiples-of-7
    val custs = graft.ops.table(spark, sf, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val leftNulls = custs.count(k => k % 2 == 1 && k % 7 == 0).toLong
    val rightNulls = custs.count(k => k % 2 == 0 && k % 7 == 0).toLong
    assert(rows(-1L) === leftNulls * rightNulls)
  }

  test("join hints force the declared physical strategies") {
    val broadcastPlan = Advanced.joinHints(spark, sf)
      .queryExecution.executedPlan.toString
    assert(broadcastPlan.contains("BroadcastHashJoin"), broadcastPlan)
    // MERGE hint on the same join forces sort-merge despite tiny stats
    graft.ops.table(spark, sf, "orders").createOrReplaceTempView("graft_ord_hint2")
    graft.ops.table(spark, sf, "nation").createOrReplaceTempView("graft_nat_hint2")
    val merged = spark.sql(
      """SELECT /*+ MERGE(d) */ d.n_name, COUNT(*) AS n
        |FROM graft_ord_hint2 o JOIN graft_nat_hint2 d
        |  ON o.o_custkey % 25 = d.n_nationkey
        |GROUP BY d.n_name""".stripMargin)
    assert(merged.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
  }

  test("gap fill: every (cust, day) cell present; fill carries last observation") {
    val rows = Advanced.gapFill(spark, sf).collect()
    val custs = rows.map(_.getLong(0)).distinct
    val days = rows.map(_.getString(1)).distinct
    assert(rows.length === custs.length * days.length) // dense grid
    custs.foreach { c =>
      var lastSeen: Option[Double] = None
      rows.filter(_.getLong(0) == c).sortBy(_.getString(1)).foreach { r =>
        if (r.getInt(3) == 1) lastSeen = Some(r.getDouble(2))
        else if (lastSeen.isEmpty) assert(r.isNullAt(2), s"fill before first obs: $r")
        else assert(r.getDouble(2) === lastSeen.get, s"fill mismatch: $r")
      }
    }
  }
}
