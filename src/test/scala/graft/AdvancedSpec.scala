package graft

import graft.ops.Advanced
import org.apache.spark.sql.functions._

/** Plan-shape and equivalence tests for the advanced serving operators. */
class AdvancedSpec extends SparkTestBase {

  test("binned range join plans as an equi join — no nested loop, no cartesian") {
    val plan = Advanced.rangeJoinBinned(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan) // a real (hash/merge) equi join on the bin
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
}
