package graft

import graft.ops.DecisionSupport

/** q112–q115: the four TPC-H decorrelation shapes, checked for result
  * sanity and — more importantly — for the physical plans the explicit
  * rewrites were chosen to produce (broadcast dims, anti join for NOT
  * EXISTS, no cartesian anywhere).
  */
class DecisionSupportSpec extends SparkTestBase {

  test("q175 multi-band counts: eight scalar counts collapse to ONE fact pass") {
    val df = DecisionSupport.multiBandCounts(spark, sf)
    val rows = df.collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((0 to 7).map(r.getLong).forall(_ >= 0L))
    // the whole point: one lineitem scan, not eight — and no join at all
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "lineitem".r.findAllIn(plan).length
    assert(scans >= 1 && plan.split("Scan ").count(_.contains("lineitem")) <= 1,
      s"expected a single fact scan:\n$plan")
    assert(!plan.contains("Join"), plan)
  }

  test("q177 moving-avg outliers: three windows, one window sort, dims broadcast") {
    val df = DecisionSupport.movingAvgOutliers(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // both dims broadcast into the fact scan
    assert(plan.split("BroadcastHashJoin").length - 1 >= 2, plan)
    // the yearly-avg window and the lag/lead window share the nation
    // partitioning prefix: Spark plans ONE Window sort chain, not a
    // second exchange — exactly one shuffle after the monthly aggregate
    val exchanges = plan.split("Exchange hashpartitioning").length - 1
    assert(exchanges <= 2, s"window re-shuffled: $exchanges exchanges\n$plan")
    // every output row is a genuine >10% deviation from its yearly mean
    rows.foreach { r =>
      val sumQ = r.getLong(r.fieldIndex("sum_q")).toDouble
      val avgQ = r.getDouble(r.fieldIndex("avg_q"))
      assert(math.abs(sumQ - avgQ) > avgQ * 0.1)
    }
  }

  test("q176 grouping rank: Expand feeds one agg; leaf ranks stay inside their category") {
    val df = DecisionSupport.rollupGroupingRank(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("Expand"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan) // part stays broadcast
    // exactly one grand-total row, at the deepest hierarchy level
    val grand = rows.filter(r => r.getLong(r.fieldIndex("lh")) == 2L)
    assert(grand.length === 1 && grand.head.getLong(grand.head.fieldIndex("rk")) === 1L)
    // rank restarts per (lh, category): every partition has a rank-1 row
    val leafCats = rows.filter(r => r.getLong(r.fieldIndex("lh")) == 0L)
      .groupBy(_.getString(0))
    leafCats.values.foreach { g =>
      assert(g.exists(_.getLong(g.head.fieldIndex("rk")) == 1L))
    }
  }

  test("q179 rollup-partition top-N: single Expand, one window sort, ties kept whole") {
    val df = DecisionSupport.rollupPartitionTopN(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // ONE Expand (the rollup's 4 grouping sets from one fact pass) and
    // ONE Window — the rank sorts only the rollup OUTPUT, never the fact
    assert(plan.split("Expand").length - 1 === 1, plan)
    // exactly one Window operator ("Window [" — WindowGroupLimit, the
    // rank-pushdown prefilter Spark may add, prints differently and is
    // welcome: it truncates each partition before the sort)
    assert(plan.split("Window \\[").length - 1 === 1, plan)
    assert(plan.contains("BroadcastHashJoin"), plan) // part stays broadcast
    // the all-up row ranks ALONE in the NULL-category partition
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(grand.length === 1 &&
      grand.head.getLong(grand.head.fieldIndex("rk")) === 1L)
    // rank() semantics inside each category: equal sums share a rank,
    // and a brand's yearly leaf can tie its own subtotal (structural tie)
    val rk = rows.head.fieldIndex("rk")
    val sq = rows.head.fieldIndex("sum_q")
    rows.filter(!_.isNullAt(0)).groupBy(_.getString(0)).values.foreach { g =>
      assert(g.forall(_.getLong(rk) <= 10L))
      assert(g.exists(_.getLong(rk) == 1L))
      g.groupBy(_.getLong(sq)).values.foreach { same =>
        assert(same.map(_.getLong(rk)).distinct.length === 1,
          "equal sums must share a rank within their category")
      }
    }
  }

  test("q170 reachability: semi self-join + anti join, no cartesian") {
    val df = DecisionSupport.reachabilitySemiJoins(spark, sf)
    val rows = df.collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(rows.head.fieldIndex("n_orders")) > 0L)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the EXISTS sibling check must stay an equi join on orderkey with a
    // non-equi residual — never a nested-loop pair blowup
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q171 cross-channel intersect: semi-join chain, broadcast item set + 1-row stats") {
    val df = DecisionSupport.crossChannelIntersect(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the HAVING keeps only above-global-average brands: re-check one
    // side of the cross-multiplied inequality from the output itself
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q172 multi-channel ratios: full outer on the (yr, part) grid, exact div") {
    val df = DecisionSupport.multiChannelRatios(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val uq = r.getLong(r.fieldIndex("urgent_q"))
      val sq = r.getLong(r.fieldIndex("std_q"))
      if (sq > 0) {
        val pct = r.getLong(r.fieldIndex("ratio_pct"))
        assert(pct === (100L * uq) / sq, r)
      } else assert(r.isNullAt(r.fieldIndex("ratio_pct")), r)
    }
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("FullOuter"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q165 rollup + window top-k: Expand feeds one agg, window over rollup") {
    val df = DecisionSupport.rollupWindowTopK(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("rk")) >= 1 &&
        r.getLong(r.fieldIndex("rk")) <= 5, r)
      assert(Set(0L, 1L, 3L, 7L)(r.getLong(r.fieldIndex("gid"))), r)
    }
    // every mfgr partition's ranks start at 1 (total order ⇒ dense here)
    rows.groupBy(r => Option(r.getString(0))).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(rs.head.fieldIndex("rk"))).min === 1L)
    }
    // the grand-total row (gid=7) survives as its own partition's rank 1
    assert(rows.count(_.getLong(rows.head.fieldIndex("gid")) == 7L) === 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert(plan.contains("Window"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q166 cumulative channels: full outer over aggregated month grids") {
    val df = DecisionSupport.cumulativeChannels(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // totals are the window maxima: overtake count never exceeds months
    rows.foreach(r => assert(r.getLong(r.fieldIndex("n_over")) <= 12L, r))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("q167 cross-year growth: self-joined aggregates, growth preserved") {
    val df = DecisionSupport.crossYearGrowth(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every contributing part grew, so every brand's totals grew
    rows.foreach(r => assert(
      r.getLong(r.fieldIndex("tot97")) > r.getLong(r.fieldIndex("tot96")), r))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q112 small-qty revenue: per-part agg broadcasts, no cartesian") {
    val df = DecisionSupport.smallQtyRevenue(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // brands are distinct and sorted
    val brands = rows.map(_.getString(0)).toSeq
    assert(brands == brands.sorted && brands.distinct.size == brands.size)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q112 threshold agrees with the double-avg spelling off-boundary") {
    // the decimal cross-multiplication must select the same rows the
    // textbook 0.5*avg predicate selects when no row sits on a ulp
    // boundary (true of the integer-quantity fixture)
    import org.apache.spark.sql.functions._
    import graft.ops.{table, Dec}
    val li = table(spark, sf, "lineitem")
    val viaAvg = li.groupBy("l_partkey").agg(avg("l_quantity").as("a"))
      .join(li, Seq("l_partkey"))
      .filter(col("l_quantity") < col("a") * 0.5)
      .count()
    val viaDec = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast(Dec)).as("sq"), count(lit(1)).as("n"))
      .join(li, col("pk") === col("l_partkey"))
      .filter(col("l_quantity").cast(Dec) * lit(2) * col("n") < col("sq"))
      .count()
    assert(viaAvg == viaDec)
  }

  test("q128 sole-supplier share: semi join, broadcast per-part agg, no cartesian") {
    val df = DecisionSupport.soleSupplierShare(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // supplier keys distinct and sorted — the semi join cannot multiply rows
    val keys = rows.map(_.getLong(0)).toSeq
    assert(keys == keys.sorted && keys.distinct.size == keys.size)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q132 min-cost supplier: every row is its part's EU minimum, all broadcast") {
    import org.apache.spark.sql.functions._
    val df = DecisionSupport.minCostSupplier(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // each surviving row's price equals the true min over the same
    // restricted population, recomputed independently
    val mins = graft.ops.table(spark, sf, "lineitem")
      .join(graft.ops.table(spark, sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.ops.table(spark, sf, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.ops.table(spark, sf, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("l_partkey").agg(min("l_extendedprice").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val pk = r.getLong(r.fieldIndex("p_partkey"))
      assert(r.getDouble(r.fieldIndex("price")) === mins(pk), s"part $pk")
    }
    // the only shuffle is the per-part MIN; every join is a broadcast
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q133 top-revenue supplier: argmax ties kept, decimal equality exact") {
    import org.apache.spark.sql.functions._
    val df = DecisionSupport.topRevenueSupplier(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // winners all share the maximum revenue
    val revs = rows.map(r => r.getDouble(r.fieldIndex("total_revenue"))).toSeq
    assert(revs.distinct.size === 1)
    // and it IS the max of the independently recomputed per-supplier revenue
    val expected = graft.ops.table(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1995-04-01"))
      .groupBy("l_suppkey")
      .agg(graft.ops.drevenue(col("l_extendedprice"), col("l_discount")).as("rev"))
      .agg(max("rev")).collect()(0).getDouble(0)
    assert(revs.head === expected)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q137 volume shipping: both trade directions present, no cartesian") {
    // the chosen nation pair trades at the gate SF but not in the tiny
    // unit fixture — run this one at the driver's correctness scale
    val df = DecisionSupport.volumeShipping(spark, "/root/testdata/sf0.01")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).distinct.toSet
    assert(dirs === Set(("NATION_9", "NATION_6"), ("NATION_6", "NATION_9")))
    rows.foreach(r => assert(r.getDouble(r.fieldIndex("revenue")) > 0, r))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q138 market share: ratio bounded, customers filter via semi join") {
    val df = DecisionSupport.marketShare(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getDouble(r.fieldIndex("mkt_share"))
      assert(share >= 0.0 && share <= 1.0, r)
      assert(r.getDouble(r.fieldIndex("total_rev")) > 0, r)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q139 incremental MV refresh: delta scans only new segments, equals rebuild") {
    import org.apache.spark.sql.functions._
    val rows = DecisionSupport.incrementalMvRefresh(spark, sf).collect()
    // the merged summary equals a from-scratch rollup of the final fact
    val full = spark.table("graft_cat.db.imv_fact").groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("cents_sum"))
      .orderBy("grp").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      full.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    // the table holds 3 segments (2 from the first insert, 1 from the
    // second — visible through the versions metadata table)...
    val segsNow = spark.sql(
      "SELECT n_segments FROM graft_cat.db.imv_fact.versions ORDER BY v DESC LIMIT 1")
      .collect()(0).getLong(0)
    assert(segsNow === 3L)
    // ...but the incremental read plans ONLY the post-v1 segment
    spark.sql(
      "SELECT grp, cents FROM graft_cat.db.imv_fact VERSION AS OF '1..'").collect()
    val (_, _, planned) = graft.sources.SegHooks.lastPlanned.get()
    assert(planned === 1, s"delta read planned $planned segments")
  }

  test("q140 brand revenue: disjunctive predicate stays on a broadcast equi-join") {
    // the brand/size conjuncts select nothing in the tiny unit fixture —
    // run at the driver's correctness scale (same move as q137)
    val df = DecisionSupport.brandRevenue(spark, "/root/testdata/sf0.01")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val allowed = Set("Brand#12", "Brand#23", "Brand#34")
    rows.foreach { r =>
      assert(allowed(r.getString(0)), r)
      assert(r.getLong(r.fieldIndex("n")) > 0, r)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q113 order-count distribution covers zero-order customers") {
    val df = DecisionSupport.orderCountDistribution(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // histogram masses must add back up to |customer|
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nCust)
  }

  test("q114 large-volume: single lineitem aggregation feeds filter and output") {
    val df = DecisionSupport.largeVolumeCustomers(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // every emitted sum_qty exceeds the HAVING threshold
    assert(rows.forall(_.getDouble(5) > 250.0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // exactly one scan of lineitem: the HAVING subquery IS the aggregate
    // (AQE's toString appends an "== Initial Plan ==" duplicate — count
    // only the executed section)
    val executedSection = plan.split("== Initial Plan ==")(0)
    val nLiScans = "lineitem\\.parquet".r.findAllIn(executedSection).size
    assert(nLiScans == 1, s"expected 1 lineitem scan, plan:\n$plan")
  }

  test("q116 exact-sums corr/slope agree with Spark's builtin aggregates") {
    import org.apache.spark.sql.functions._
    val df = DecisionSupport.corrRegression(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the exact-integer-sums formulation must agree with the one-pass
    // double builtins to far beyond statistical noise
    val builtin = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").as("x"), (col("l_discount") * 100).as("y"))
      .groupBy("flag").agg(corr(col("x"), col("y")).as("c"),
        regr_slope(col("y"), col("x")).as("sl"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (c, sl) = builtin(r.getString(0))
      assert(math.abs(r.getDouble(2) - c) < 1e-9, s"corr ${r.getDouble(2)} vs $c")
      assert(math.abs(r.getDouble(3) - sl) < 1e-9, s"slope ${r.getDouble(3)} vs $sl")
    }
    // correlations are genuine (finite, within [-1, 1])
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0))
    // one scan, two-phase aggregation, no join
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("q124 join elimination: dim scan vanishes; unsafe variants keep the join") {
    import org.apache.spark.sql.functions._
    val df = DecisionSupport.joinElimination(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.toLowerCase.contains("join"), plan)
    assert(!plan.contains("je_customer"), plan)
    // semantics preserved vs the un-eliminated computation
    val direct = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) === direct(r.getString(0))))
    // variant 1: referencing a dim column keeps the join
    val factDir = graft.ops.scratchDir(spark, "je_orders")
    val dimDir = graft.ops.scratchDir(spark, "je_customer")
    val fact = spark.read.parquet(factDir)
    val dim = spark.read.parquet(dimDir)
    val refDim = fact.join(dim, fact("o_custkey") === dim("c_custkey"), "left")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    assert(refDim.queryExecution.executedPlan.toString.contains("je_customer"))
    // variant 2: INNER join is never eliminated (it filters rows)
    val inner = fact.join(dim, fact("o_custkey") === dim("c_custkey"), "inner")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(inner.queryExecution.executedPlan.toString.contains("je_customer"))
    // variant 3: joining on a NON-unique dim column keeps the join
    val nonUnique = fact.join(dim, fact("o_custkey") === dim("c_nationkey"), "left")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(nonUnique.queryExecution.executedPlan.toString.contains("je_customer"))
  }

  test("q122 DPP: the dim filter reaches the fact scan as a runtime partition filter") {
    val df = DecisionSupport.dynamicPartitionPruning(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 3 == 1)) // only dim-selected years
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
  }

  test("q120 MV rewrite: plan reads the summary, results match the fact") {
    import org.apache.spark.sql.functions._
    val df = DecisionSupport.mvRewriteRollup(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the executed plan must scan the MV parquet, never the fact
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_mv_summary"), plan)
    assert(!plan.contains("graft_mv_fact"), plan)
    // rewrite is semantics-preserving: equal to the direct computation
    val direct = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      .orderBy("prio").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("q120 MV rewrite declines filters and unregistered aggregates") {
    import org.apache.spark.sql.functions._
    // registration happened in the previous test (order-dependent is fine:
    // re-run the catalog entry to be self-sufficient)
    DecisionSupport.mvRewriteRollup(spark, sf).collect()
    val factDir = graft.ops.scratchDir(spark, "mv_fact")
    // a Filter between Aggregate and scan → no rewrite (no subsumption proof)
    val filtered = spark.read.parquet(factDir)
      .filter(col("yr") > 1995)
      .groupBy("prio").agg(count(lit(1)).as("n"))
    assert(filtered.queryExecution.executedPlan.toString.contains("graft_mv_fact"))
    // an aggregate the MV has no partial for → no rewrite
    val minAgg = spark.read.parquet(factDir)
      .groupBy("prio").agg(min(col("cents")).as("m"))
    assert(minAgg.queryExecution.executedPlan.toString.contains("graft_mv_fact"))
    // grouping at EXACTLY the MV granularity → no rewrite: that is the
    // MV's own rebuild shape, which must read the fact, not the MV it
    // is overwriting
    val fullGran = spark.read.parquet(factDir)
      .groupBy("prio", "yr")
      .agg(count(lit(1)).as("cnt2"), sum(col("cents")).as("sc2"))
    assert(fullGran.queryExecution.executedPlan.toString.contains("graft_mv_fact"))
  }

  test("q115 idle-rich: NOT EXISTS plans as anti join, stats join broadcasts") {
    val df = DecisionSupport.idleRichCustomers(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(plan.toLowerCase.contains("leftanti"), plan)
    // numcust per nation ≤ customers with positive acctbal
    assert(rows.map(_.getLong(1)).sum <= spark.read.parquet(s"$sf/customer.parquet").count())
  }

  test("q141 shipping priority: semi-join customer, top-10 as ordered limit") {
    val df = DecisionSupport.shippingPriority(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // revenue strictly ordered desc with the orderkey tiebreak
    val rv = rows.map(r => (-r.getDouble(1), r.getLong(0))).toSeq
    assert(rv == rv.sorted)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q142 order-priority check: EXISTS runs as a keyed semi join") {
    val df = DecisionSupport.orderPriorityCheck(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    // the non-equi residual must not degrade the join to a nested loop
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // every priority count ≤ quarter's order count
    val quarter = graft.ops.table(spark, sf, "orders")
      .filter("o_orderdate >= '1996-07-01' and o_orderdate < '1996-10-01'")
      .count()
    assert(rows.map(_.getLong(1)).sum <= quarter)
  }

  test("q143 local supplier volume: co-nation filter, dims broadcast") {
    val df = DecisionSupport.localSupplierVolume(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // revenue desc with name tiebreak
    val rv = rows.map(r => (-r.getDouble(1), r.getString(0))).toSeq
    assert(rv == rv.sorted)
  }

  test("q144 forecast revenue: no join, single codegen'd scan-aggregate") {
    val df = DecisionSupport.forecastRevenue(spark, sf)
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows(0).getDouble(0) > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // codegen spans print as "*(n)" in the executed-plan string
    assert(plan.contains("*(1)"), plan)
  }

  test("q145 product-type profit: LIKE prunes part before the fact join") {
    val df = DecisionSupport.productTypeProfit(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // (nation, year) keys are unique — the rollup grain holds
    val keys = rows.map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(keys.distinct.size == keys.size)
  }

  test("q146 important parts: every survivor is above 1.5x the mean value") {
    import org.apache.spark.sql.functions._
    val df = DecisionSupport.importantParts(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // independently recompute the threshold in double (off-boundary fixture)
    val pv = graft.ops.table(spark, sf, "lineitem")
      .groupBy("l_partkey").agg(sum("l_extendedprice").as("v"))
    val mean = pv.agg(avg("v")).head.getDouble(0)
    rows.foreach { r =>
      assert(r.getDouble(1) > 1.5 * mean - 1e-6, s"part ${r.getLong(0)}")
    }
    // and no qualifying part is missing
    assert(rows.length ==
      pv.filter(col("v") > mean * 1.5).count())
  }

  test("q147 priority shipping: one pass, high+low = joined row count") {
    import org.apache.spark.sql.functions._
    val df = DecisionSupport.priorityShipping(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val total = graft.ops.table(spark, sf, "lineitem")
      .filter(year(col("l_shipdate")) === 1997)
      .join(graft.ops.table(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total)
  }

  test("q148 promo revenue: single-row ratio in [0, 100], part broadcasts") {
    val df = DecisionSupport.promoRevenue(spark, sf)
    val rows = df.collect()
    assert(rows.length == 1)
    val share = rows(0).getDouble(0)
    assert(share >= 0 && share <= 100, share.toString)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q149 supplier counts: anti join excludes complained suppliers") {
    val df = DecisionSupport.supplierCounts(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("leftanti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // counts bounded by the supplier population minus the excluded ones
    val ok = graft.ops.table(spark, sf, "supplier")
      .filter("s_acctbal >= 0").count()
    assert(rows.forall(_.getLong(3) <= ok))
  }
}
