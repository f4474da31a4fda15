package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkTestBase {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and most oracle keys exist") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    // every oracleSql key must have a queries entry (driver contract)
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"orphan oracle $k"))
  }

  test("q01 pricing summary: group count and exact sums") {
    val df = Relational.q01PricingSummary(spark, sf).collect()
    assert(df.length === 6) // 3 returnflags x 2 linestatus in fixture
    assert(df.forall(r => r.getDouble(r.fieldIndex("sum_qty")) > 0))
  }

  test("q02 pushes filter and projection to the parquet scan") {
    val df = Relational.q02FilterProject(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThan(l_quantity") || plan.contains("l_quantity")),
      s"filter not pushed:\n$plan")
    val scanSchema = "l_orderkey,l_linenumber,l_quantity,l_shipdate".split(",").toSet
    // ReadSchema must not include unprojected columns like l_comment/l_tax
    assert(!plan.contains("l_tax"), "column pruning failed — scan reads l_tax")
  }

  test("q04 star join broadcasts all three dims") {
    val plan = Relational.q04StarJoin(spark, sf).queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3, s"expected 3 broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "dim join fell back to sort-merge")
  }

  test("q54/q55 broadcast every dimension; only the fact join shuffles") {
    for (q <- Seq(Relational.q54LocalSupplier, Relational.q55NationVolume)) {
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(plan).length >= 4,
        s"expected 4 broadcast dim joins:\n$plan")
      // the only non-broadcast join allowed is orders⋈lineitem on orderkey
      assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).length <= 1,
        s"more than one shuffled join:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("q58 SCD2 merge: broadcast semi/anti passes, dimension never shuffle-joins") {
    val plan = ops.Advanced.scd2Merge(spark, sf).queryExecution.executedPlan.toString
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(plan).isDefined, plan)
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("SortMergeJoin"), s"dim side shuffle-joined:\n$plan")
    // every updated key contributes exactly 2 rows (closed + new), others 1
    val out = ops.Advanced.scd2Merge(spark, sf)
    val perKey = out.groupBy("c_custkey").count()
    import org.apache.spark.sql.functions.col
    assert(perKey.filter(col("count") === 2).count() ===
      ops.table(spark, sf, "customer").filter(col("c_custkey") % 7 === 0).count())
  }

  test("q07 anti join: no customer both has and lacks orders") {
    val anti = Relational.q07AntiJoin(spark, sf).select("c_custkey")
    val semi = ops.table(spark, sf, "customer")
      .join(ops.table(spark, sf, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey")
    assert(anti.intersect(semi).count() === 0)
  }

  test("q09 subset-dedup keeps exactly one row per key") {
    val df = Relational.q09DedupSubsetFirst(spark, sf)
    assert(df.count() === df.select("o_custkey").distinct().count())
  }

  test("q11 surrogate keys are dense 1..n") {
    val ids = Relational.q11SurrogateKeys(spark, sf)
      .select("type_id").collect().map(_.getInt(0)).sorted
    assert(ids.toSeq === (1 to ids.length))
  }

  test("q12 running sum is monotone within partitions") {
    val rows = Relational.q12WindowRunning(spark, sf)
      .select("l_suppkey", "rn", "running_qty").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => b >= a })
    }
  }

  test("q13/q14 rollup and cube include grand totals") {
    val roll = Relational.q13Rollup(spark, sf).collect()
    assert(roll.count(r => r.isNullAt(0) && r.isNullAt(1)) === 1)
    val cube = Relational.q14Cube(spark, sf).collect()
    val n = cube.find(r => r.isNullAt(0) && r.isNullAt(1)).get.getLong(2)
    assert(n === ops.table(spark, sf, "lineitem").count())
  }

  test("q38b KMV estimate lands within its statistical error bound") {
    val rows = Relational.q38bKmvDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact, err) =
        (r.getDouble(1), r.getLong(2), r.getDouble(3))
      // k = 64 -> ~12.5% std err; 30% is > 2 sigma on every flag
      assert(err < 0.30, s"flag ${r.getString(0)}: est $est vs exact $exact")
      assert(math.abs(est - exact) / exact === err)
    }
  }

  test("q19 union all preserves duplicates, q20/q21 are distinct set ops") {
    val u = Relational.q19UnionAll(spark, sf)
    assert(u.count() === ops.table(spark, sf, "customer").count() +
      ops.table(spark, sf, "supplier").count())
    val i = Relational.q20Intersect(spark, sf)
    assert(i.count() === i.distinct().count())
  }
}
