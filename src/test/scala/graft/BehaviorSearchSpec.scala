package graft

import graft.ext.{Behavior, Search}
import graft.functions.BloomFilterAgg
import org.apache.spark.sql.functions._

/** Mechanism assertions for the behavioral-analytics (ext67-ext69) and
  * retrieval (ext70-ext73) tiers — value-level equivalence vs DuckDB is
  * the driver's oracle gate; these pin the properties the oracle can't
  * see (pruning actually pruning, session gaps actually bounding).
  */
class BehaviorSearchSpec extends SparkTestBase {

  test("ext154 exponential smoothing: recurrence replays bitwise per series") {
    val rows = Behavior.expSmoothing(spark, sf).collect()
    assert(rows.nonEmpty)
    // L_1 = y_1 and L_t = 0.5*L_{t-1} + 0.5*y_t, replayed in plain Scala
    // — alpha = 1/2 makes every step exact, so equality is BITWISE
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val series = rs.sortBy(_.getString(1))
      var level = series.head.getLong(2).toDouble
      assert(java.lang.Double.compare(series.head.getDouble(3), level) === 0)
      series.tail.foreach { r =>
        level = level * 0.5 + r.getLong(2).toDouble * 0.5
        assert(java.lang.Double.compare(r.getDouble(3), level) === 0,
          s"smooth diverged at ${r.getString(1)}")
      }
      // smoothing stays inside the observed range
      val ys = series.map(_.getLong(2).toDouble)
      series.map(_.getDouble(3)).foreach { sm =>
        assert(sm >= ys.min - 1e-9 && sm <= ys.max + 1e-9)
      }
    }
  }

  test("ext155 Holt forecast: level+trend recurrence replays bitwise") {
    val rows = Behavior.holtForecast(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val series = rs.sortBy(_.getString(1))
      var l = series.head.getLong(2).toDouble
      var tr = 0.0
      assert(java.lang.Double.compare(series.head.getDouble(3), l) === 0)
      assert(java.lang.Double.compare(series.head.getDouble(4), tr) === 0)
      series.tail.foreach { r =>
        val l1 = l * 0.5 + r.getLong(2).toDouble * 0.5
        tr = (l1 - l) * 0.5 + tr * 0.5
        l = l1
        assert(java.lang.Double.compare(r.getDouble(3), l) === 0,
          s"level diverged at ${r.getString(1)}")
        assert(java.lang.Double.compare(r.getDouble(4), tr) === 0,
          s"trend diverged at ${r.getString(1)}")
        assert(java.lang.Double.compare(r.getDouble(5), l + tr) === 0)
      }
    }
  }

  test("ext156 MAD anomalies: medians and flags replay exactly") {
    val rows = Behavior.madAnomalies(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ys = rs.map(_.getLong(2)).sorted
      def medOf(v: Seq[Double]): Double = {
        val s0 = v.sorted; val n = s0.length
        if (n % 2 == 1) s0((n - 1) / 2) else (s0(n / 2 - 1) + s0(n / 2)) / 2.0
      }
      val med = medOf(ys.map(_.toDouble))
      val mad = medOf(rs.map(r => math.abs(r.getLong(2).toDouble - med)))
      rs.foreach { r =>
        assert(java.lang.Double.compare(r.getDouble(3), med) === 0)
        assert(java.lang.Double.compare(r.getDouble(4), mad) === 0)
        assert(r.getBoolean(5) ===
          (math.abs(r.getLong(2).toDouble - med) > mad * 3.0))
      }
    }
  }

  test("ext157 weekly seasonality: profile replays; residuals exact") {
    val rows = Behavior.weeklySeasonality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getString(0), r.getLong(2))).foreach { case (_, rs) =>
      val ys = rs.map(_.getLong(3).toDouble).sorted
      val n = ys.length
      val med =
        if (n % 2 == 1) ys((n - 1) / 2) else (ys(n / 2 - 1) + ys(n / 2)) / 2.0
      rs.foreach { r =>
        assert(r.getLong(4) === n.toLong)
        assert(java.lang.Double.compare(r.getDouble(5), med) === 0)
        assert(java.lang.Double.compare(
          r.getDouble(6), r.getLong(3).toDouble - med) === 0)
      }
    }
    // weekday arithmetic: every wd in [0, 6]
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 6))
  }

  test("ext158 seasonal anomalies: adjusted flags replay; composition binds") {
    val rows = Behavior.seasonalAnomalies(spark, sf).collect()
    assert(rows.nonEmpty)
    def medOf(v: Seq[Double]): Double = {
      val s0 = v.sorted; val n = s0.length
      if (n % 2 == 1) s0((n - 1) / 2) else (s0(n / 2 - 1) + s0(n / 2)) / 2.0
    }
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val med = medOf(rs.map(_.getDouble(3)))
      val mad = medOf(rs.map(r => math.abs(r.getDouble(3) - med)))
      rs.foreach { r =>
        assert(java.lang.Double.compare(r.getDouble(4), med) === 0)
        assert(java.lang.Double.compare(r.getDouble(5), mad) === 0)
        assert(r.getBoolean(6) ===
          (math.abs(r.getDouble(3) - med) > mad * 3.0))
      }
    }
    // composition binds: residuals here equal ext157's for the same keys
    val res157 = Behavior.weeklySeasonality(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6)).toMap
    rows.foreach { r =>
      assert(java.lang.Double.compare(
        r.getDouble(3), res157((r.getString(0), r.getString(1)))) === 0)
    }
  }

  test("ext96 bitmap distinct: rollup equals recompute; one fact scan; no aliasing") {
    // unit level: Union.reduce must never mutate its INPUT bitmap (rows
    // can be shared buffers), and Build must fail fast past MaxBits
    val u = new graft.functions.BitmapAgg.Union
    val shared = Array(1L, 2L)
    val merged = u.reduce(u.zero, shared)
    merged(0) |= 4L
    assert(shared(0) == 1L, "Union.reduce aliased its input array")
    val b = new graft.functions.BitmapAgg.Build
    intercept[IllegalArgumentException] {
      b.reduce(b.zero, graft.functions.BitmapAgg.MaxBits)
    }
    // value level: the sketch rollup equals Spark's own exact recompute
    val df = Behavior.bitmapDistinct(spark, sf)
    val rows = df.collect()
    val exact = graft.ops.table(spark, sf, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(countDistinct(col("o_custkey")).as("ac"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getLong(0)),
        s"year ${r.getLong(0)}: bitmap ${r.getLong(1)} != exact recompute")
      // sum of month distincts over-counts repeat customers; max is a
      // single month's — union must sit between them
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(1) <= r.getLong(3))
    }
    // plan level: orders is scanned ONCE — the year rollup runs over
    // sketch rows, not the fact table (AQE's toString repeats the scan
    // in its "Initial Plan" echo; count the final plan only)
    val planStr = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(planStr).length
    assert(scans == 1, s"expected 1 fact scan, got $scans")
  }

  test("ext102 trending top-k: 3 ranked rows per observed day; WindowGroupLimit plan") {
    val df = Behavior.trendingTopk(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every observed day emits at most 3 rows, dense ranks from 1, counts
    // non-increasing within a day
    rows.groupBy(_.getString(0)).foreach { case (day, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.length <= 3, s"$day emits ${sorted.length} rows")
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length),
        s"$day: ranks not dense")
      val cnts = sorted.map(_.getLong(2))
      assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
        s"$day: counts not non-increasing")
    }
    // rank<=k over a window plans as the per-group top-k pushdown
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("ext101 markov transitions: totals conserve events minus per-user lasts; top-k plan") {
    val df = Behavior.markovTransitions(spark, sf)
    // conservation: total transitions (unfiltered by top-k) = events - users
    val ev = graft.ops.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tsu"), col("event_id"))
    val total = ev
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("tsu"))
      .withColumn("dst", lead("event_type", 1).over(w))
      .filter(col("dst").isNotNull).count()
    assert(total == nEvents - nUsers)
    // plan: partial (map-side) aggregation over the bounded pair space,
    // top-k via TakeOrdered — never a global sort
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(df.collect().nonEmpty)
  }

  test("ext99 incremental bitmap: merged partials equal one-pass build; split non-trivial") {
    val merged = Behavior.incrementalBitmap(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val onePass = graft.ops.table(spark, sf, "orders")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("mid"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == onePass, "standing+delta merge diverges from one-pass build")
    // the associativity claim is vacuous if either side of the split is
    // empty — both partials must carry rows
    val o = graft.ops.table(spark, sf, "orders")
    assert(o.filter(pmod(col("o_orderkey"), lit(10)) === 0).limit(1).count() == 1)
    assert(o.filter(pmod(col("o_orderkey"), lit(10)) =!= 0).limit(1).count() == 1)
  }

  test("ext98 repeat customers: bitmap AND equals distinct-join; sketch join broadcasts") {
    val df = Behavior.repeatCustomers(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // exact overlap recomputed from the base table in-engine
    val mu = graft.ops.table(spark, sf, "orders")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("mid"), col("o_custkey").as("ck")).distinct()
    val inter = mu.as("a").join(mu.as("b"),
        col("b.mid") === col("a.mid") + 1 && col("b.ck") === col("a.ck"))
      .groupBy(col("a.mid")).agg(count(lit(1)).as("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (mid, c, nc, rep) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rep == inter.getOrElse(mid, 0L), s"month $mid overlap")
      assert(rep <= math.min(c, nc), s"month $mid: overlap exceeds a side")
    }
    // plan: one fact scan; the adjacent-month sketch join broadcasts
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(plan).length <= 2, // self-join reads twice at most
      s"fact rescan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"sketch join not broadcast:\n$plan")
  }

  test("ext97 basket pairs: basket-local generation equals naive self-join; no join in plan") {
    // full unfiltered pair distribution must equal the naive self-join
    // (the oracle proves this at sf0.01 through DuckDB; this pins it
    // in-engine, including the empty/low-support tail the top-k hides)
    val li = graft.ops.table(spark, sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val naive = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("pair_n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val baskets = graft.ops.table(spark, sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok")
      .agg(expr(s"slice(sort_array(collect_set(pk)), 1, ${Behavior.BasketCap})").as("ps"))
      .select(expr(
        """explode(flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1),
          |    y -> struct(x AS p1, y AS p2))))) AS pair""".stripMargin))
      .groupBy(col("pair.p1"), col("pair.p2")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(baskets == naive,
      s"basket-local pairs diverge from self-join (${baskets.size} vs ${naive.size})")
    assert(naive.nonEmpty)
    // plan: no join operator anywhere — pairs are generated inside the
    // basket rows; the ordered top-k serves via TakeOrdered
    val plan = Behavior.basketPairs(spark, sf)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
  }

  test("ext67 sessionize: events partition into sessions; gaps bound spans") {
    val sess = Behavior.sessionize(spark, sf).cache()
    try {
      val ev = graft.ops.events(spark, sf)
      // every event lands in exactly one session
      assert(sess.agg(sum("n_events")).head.getLong(0) === ev.count())
      // within a session the span is consistent with its event count:
      // n-1 gaps of at most 30 minutes each
      val bad = sess.filter(
        col("duration_s") > (col("n_events") - 1) * 1800L).count()
      assert(bad === 0)
      // session_seq is dense per user starting at 1
      val perUser = sess.groupBy("user_id")
        .agg(min("session_seq").as("lo"), max("session_seq").as("hi"),
          count(lit(1)).as("n"))
        .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
      assert(perUser.count() === 0)
    } finally sess.unpersist()
  }

  test("ext68 funnel: stage populations are monotonically non-increasing") {
    val rows = Behavior.funnel(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("1_view", "2_click", "3_purchase"))
    val counts = rows.map(_.getLong(1))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2))
    assert(counts(0) > 0)
  }

  test("ext69 retention: offset-0 cell equals cohort size; offsets non-negative") {
    val ret = Behavior.retention(spark, sf).cache()
    try {
      assert(ret.filter(col("week_offset") < 0).count() === 0)
      // every user is active in their own cohort week, so the offset-0
      // diagonal must cover every user exactly once across cohorts
      val users = graft.ops.events(spark, sf)
        .select(countDistinct("user_id")).head.getLong(0)
      val diag = ret.filter(col("week_offset") === 0)
        .agg(sum("n_users")).head.getLong(0)
      assert(diag === users)
    } finally ret.unpersist()
  }

  test("ext70 bm25: scores positive, rarer term outscores a commoner one at equal tf") {
    val out = Search.bm25TopK(spark, sf).collect()
    assert(out.length <= 20 && out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(2) > 0.0)
      assert(r.getLong(1) >= 1L && r.getLong(1) <= 3L)
    }
    // descending by score with doc_id tiebreak
    val scores = out.map(_.getDouble(2)).toSeq
    assert(scores === scores.sorted(Ordering[Double].reverse))
  }

  test("ext71 chunking: stride-15 windows cover every token of every doc") {
    val chunks = Search.chunkOverlap(spark, sf).cache()
    try {
      // token conservation: sum over chunks of n_tokens equals
      // sum over docs of (len + overlap), overlap = 15*(n_chunks-1) capped
      // by the tail — easier exact check: last chunk of each doc ends at
      // the doc's final token
      val docs = graft.ops.table(spark, sf, "documents")
        .select(col("doc_id"),
          expr("size(filter(split(lower(text), ' '), t -> t <> ''))").as("len"))
      val lastEnd = chunks.groupBy("doc_id")
        .agg(max(col("chunk_idx") * 15 + col("n_tokens")).as("covered"))
      val uncovered = lastEnd.join(docs, Seq("doc_id"))
        .filter(col("covered") =!= col("len")).count()
      assert(uncovered === 0)
      // chunk count matches the stride formula and sizes are in (0, 30]
      val badCount = chunks.groupBy("doc_id").agg(count(lit(1)).as("n"))
        .join(docs, Seq("doc_id"))
        .filter(col("n") =!= floor((col("len") - 1) / 15) + 1)
      assert(badCount.count() === 0)
      assert(chunks.filter(col("n_tokens") < 1 || col("n_tokens") > 30).count() === 0)
    } finally chunks.unpersist()
  }

  test("ext72 hard negatives: no anchor-label matches, ranks dense 1..5") {
    val out = Search.hardNegatives(spark, sf).cache()
    try {
      assert(out.filter(col("q_label") === col("n_label")).count() === 0)
      val badRank = out.groupBy("q_id")
        .agg(collect_list("rank").as("rs"))
        .filter(expr("sort_array(rs) <> sequence(1, size(rs))"))
      assert(badRank.count() === 0)
    } finally out.unpersist()
  }

  test("ext75 ivf-pq: approximate distances non-negative, ranks dense per query") {
    val out = graft.ext.Similarity.pqTopK(spark, sf).cache()
    try {
      assert(out.filter(col("adc2") < 0.0).count() === 0)
      val badRank = out.groupBy("q_id")
        .agg(collect_list("rank").as("rs"))
        .filter(expr("sort_array(rs) <> sequence(1, size(rs))"))
      assert(badRank.count() === 0)
      // ADC of a vector against itself would be the quantization error
      // floor; self-matches are excluded by construction
      assert(out.filter(col("q_id") === col("n_id")).count() === 0)
    } finally out.unpersist()
  }

  test("ext74 triangles: oriented wedge count equals the naive 3-way join") {
    val out = graft.ext.GraphRank.triangleCount(spark, sf).head()
    val und = graft.ops.events(spark, sf)
      .select((col("user_id") % 120).as("a"), (col("event_id") % 120).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
    // u<v in every row, so the ordered 3-join counts each triangle once
    val naive = und.as("e1")
      .join(und.as("e2"), col("e1.v") === col("e2.u"))
      .join(und.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .count()
    assert(out.getLong(3) === naive)
    assert(out.getLong(2) >= out.getLong(3)) // wedges ⊇ closed wedges
  }

  test("ext74 triangles: shared subplans execute once (cached, one scan)") {
    // the four-way count crossJoin consumes und/e from several branches;
    // persist() must collapse them so the events scan + distinct runs
    // once, not once per branch (the r5 4× re-derivation). Programmatic
    // traversal, not string matching: AQE's toString interleaves initial
    // plans and cached-relation dumps that double-count FileScan lines.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val df = graft.ext.GraphRank.triangleCount(spark, sf)
    df.collect()
    var fileScans = 0
    var cacheReads = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: InMemoryTableScanExec => cacheReads += 1 // shared, not re-run
      case _: FileSourceScanExec => fileScans += 1
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    assert(cacheReads >= 2,
      s"expected und/e cache reuse across branches, saw $cacheReads reads")
    assert(fileScans === 0,
      s"expected every branch to read the cache, saw $fileScans raw scans")
  }

  test("ext73 bloom: probe prunes most non-matching rows, keeps all matches") {
    import spark.implicits._
    val urgent = graft.ops.table(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val bits = urgent
      .select(xxhash64(col("o_orderkey")).as("h1"),
        xxhash64(col("o_orderkey"), lit(7)).as("h2"))
      .as[(Long, Long)]
      .select(new BloomFilterAgg.Agg().toColumn.name("bits"))
      .toDF("bits")
    val probeSql = (0 until BloomFilterAgg.K).map { i =>
      s"(element_at(bits, CAST(((h1 + $i * h2) & ${BloomFilterAgg.NumBits - 1})" +
        s" div 64 AS INT) + 1) & " +
        s"shiftleft(CAST(1 AS BIGINT), CAST((h1 + $i * h2) & 63 AS INT))) <> 0"
    }.mkString(" AND ")
    val li = graft.ops.table(spark, sf, "lineitem")
      .withColumn("h1", xxhash64(col("l_orderkey")))
      .withColumn("h2", xxhash64(col("l_orderkey"), lit(7)))
      .crossJoin(broadcast(bits))
    val total = li.count()
    val kept = li.filter(expr(probeSql)).count()
    val trueMatches = graft.ops.table(spark, sf, "lineitem")
      .join(urgent, col("l_orderkey") === col("o_orderkey")).count()
    // no false negatives: every true match survives the bloom
    assert(kept >= trueMatches)
    // real pruning: the bloom removes a majority of the non-matching rows
    // (selectivity ~20%, fp rate ~8% at this geometry)
    assert(kept < total * 2 / 5, s"kept=$kept of $total — bloom not pruning")
  }

  test("ext105 CUPED: theta well-formed, mean preserved across variants") {
    val rows = ext.Behavior.cuped(spark, sf).collect()
    assert(rows.length === 2) // variants 0, 1
    val theta = rows.head.getDouble(4)
    assert(rows.forall(_.getDouble(4) == theta)) // pooled, same everywhere
    assert(!theta.isNaN && !theta.isInfinite)
    // variants partition users, so the n-weighted adjustments cancel:
    // Σ n_v·adj_v == Σ n_v·mean_post_v (CUPED shifts variance, not means)
    val wAdj = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    val wRaw = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    assert(math.abs(wAdj - wRaw) < 1e-6, s"$wAdj vs $wRaw")
    // the adjustment actually moved the per-variant means (theta != 0)
    assert(rows.exists(r => math.abs(r.getDouble(3) - r.getDouble(2)) > 1e-12))
  }

  test("ext104 interpolation: observed days pass through, gaps bracketed") {
    val rows = ext.Behavior.interpolateGaps(spark, sf).collect()
    assert(rows.nonEmpty)
    val interp = rows.filter(_.getInt(3) == 1)
    assert(interp.nonEmpty, "dropout simulation produced no gaps")
    // interpolated values sit within the bracketing observed values
    // per (etype): check each gap value lies between its neighbours
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { ts =>
      val sorted = ts.sortBy(_.getLong(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (r.getInt(3) == 1) {
          val prevObs = sorted.take(i).reverse.find(_.getInt(3) == 0).get.getDouble(2)
          val nextObs = sorted.drop(i + 1).find(_.getInt(3) == 0).get.getDouble(2)
          val v = r.getDouble(2)
          assert(v >= math.min(prevObs, nextObs) - 1e-9 &&
            v <= math.max(prevObs, nextObs) + 1e-9, s"$v outside [$prevObs,$nextObs]")
        }
      }
    }
  }

  test("ext113 hybrid RRF: fused score decomposes into the two rank legs") {
    val rows = ext.Search.queries("ext113_hybrid_rrf")(spark, sf).collect()
    assert(rows.length === 10)
    var prev = Double.MaxValue
    rows.foreach { r =>
      val lex = Option(r.get(r.fieldIndex("rank_lex"))).map(_.asInstanceOf[Int])
      val sem = Option(r.get(r.fieldIndex("rank_sem"))).map(_.asInstanceOf[Int])
      val rrf = r.getDouble(r.fieldIndex("rrf"))
      assert(lex.nonEmpty || sem.nonEmpty, "fused row without any rank")
      val expect = lex.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(rrf === expect, s"rrf $rrf != $expect")
      assert(rrf <= prev + 1e-12, "fused ranking not sorted")
      prev = rrf
    }
    // vector 0 matches itself with cosine 1: it must lead the semantic
    // leg, so its fused score includes 1/61
    val v0 = rows.find(_.getLong(0) == 0L)
    assert(v0.exists(r => r.getInt(r.fieldIndex("rank_sem")) === 1))
  }

  test("ext115 retrieval metrics: bounds, consistency, ideal-ranking edge") {
    val rows = ext.Search.queries("ext115_retrieval_metrics")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nRel10Implied = math.round(r.getDouble(r.fieldIndex("p_at_10")) * 10)
      val mrr = r.getDouble(r.fieldIndex("mrr"))
      val ndcg = r.getDouble(r.fieldIndex("ndcg_at_10"))
      assert(mrr >= 0.0 && mrr <= 1.0, s"mrr $mrr")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"ndcg $ndcg")
      // any relevant hit in the top-10 forces all three metrics positive
      if (nRel10Implied > 0) assert(mrr > 0 && ndcg > 0)
      else assert(mrr === 0.0 && ndcg === 0.0)
      // MRR is 1/rank of the first hit: bounded by 1, and at least 1/10
      // whenever a hit exists
      if (nRel10Implied > 0) assert(mrr >= 0.1 - 1e-12)
    }
  }
}
