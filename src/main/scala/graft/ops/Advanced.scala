package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serving-surface operators beyond the round-1 catalog: interval (range)
  * join via bin bucketing, skew-salted join, and exact percentiles.
  */
object Advanced {

  /** Range/interval join WITHOUT a nested-loop: Spark plans a raw
    * `p BETWEEN start AND end` join as BroadcastNestedLoop/Cartesian —
    * O(n·m). Bin bucketing makes it an equi join: intervals explode to the
    * fixed-width bins they overlap (≤ 2 here, since spans ≤ 6 days < the
    * 7-day bin), points map to exactly one bin, the join runs on the bin
    * key, and the range predicate filters inside the join. Each (point,
    * interval) pair meets in exactly one bin (the point's), so no dedup is
    * needed. At 100 TB this is one shuffle on the bin key with per-bucket
    * work proportional to genuine overlap — the standard spatial-binning
    * trade (bin width ~ median interval length).
    */
  val rangeJoinBinned: Q = (s, d) => {
    val W = 7
    val k = col("o_orderkey")
    val ivals = table(s, d, "orders")
      .filter(k <= 200)
      .select(k.as("ival_id"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).as("start_d"))
      .withColumn("end_d", (col("start_d") + col("ival_id") % 5 + 1).cast("int"))
    val points = table(s, d, "lineitem")
      .filter(col("l_orderkey") <= 3000)
      .select(datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date")).as("p_d"))
    val ivalBins = ivals.select(col("ival_id"), col("start_d"), col("end_d"),
      explode(expr(s"sequence(start_d DIV $W, end_d DIV $W)")).as("bin"))
    val pointBins = points.withColumn("bin", expr(s"p_d DIV $W"))
    pointBins.join(ivalBins, Seq("bin"))
      .filter(col("p_d") >= col("start_d") && col("p_d") <= col("end_d"))
      .groupBy("ival_id")
      .agg(count(lit(1)).as("n_points"),
        min(col("p_d")).as("first_d"), max(col("p_d")).as("last_d"))
      .orderBy("ival_id")
  }

  /** Skew-salted equi join: the fact side's 3 hot keys would each funnel
    * into one task in a plain shuffle join; a deterministic salt
    * (row-key % 16) fans every hot key across 16 tasks and the dim side is
    * replicated once per salt (dim × 16 rows — the cheap side pays). The
    * result is identical to the unsalted join, which is what the oracle
    * states. (AQE's skew-join split is the automatic variant; explicit
    * salting is the portable one that also works mid-pipeline on
    * intermediate data AQE can't see.)
    */
  val saltedJoin: Q = (s, d) => {
    val S = 16
    val fact = table(s, d, "orders")
      .select(col("o_orderkey"), (col("o_custkey") % 3).as("hot_key"), col("o_totalprice"))
    val dim = table(s, d, "region")
      .filter(col("r_regionkey") < 3)
      .select(col("r_regionkey").cast("long").as("hot_key"), col("r_name"))
    val saltedFact = fact.withColumn("salt", (col("o_orderkey") % S).cast("int"))
    val saltedDim = dim.select(col("hot_key"), col("r_name"),
      explode(expr(s"sequence(0, ${S - 1})")).as("salt"))
    saltedFact.join(saltedDim, Seq("hot_key", "salt"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy("r_name")
  }

  /** Exact percentiles (sort-based, no float summation — deterministic
    * across engines; the quantity domain keeps linear interpolation on
    * exact dyadic fractions, so Spark's a(1-g)+bg and DuckDB's a+(b-a)g
    * produce bit-identical doubles).
    */
  val percentiles: Q = (s, d) =>
    table(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Explicit GROUPING SETS with grouping_id — the third A3 shape beyond
    * rollup (q13) and cube (q14): an arbitrary set list, including the
    * grand total, disambiguated by grouping_id so null data values can't
    * be confused with subtotal rows. */
  val groupingSets: Q = (s, d) => {
    table(s, d, "orders").createOrReplaceTempView("graft_orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM graft_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |                        (o_orderstatus, o_orderpriority), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  /** RANGE-framed window (trailing 30 days by VALUE, not row count) plus
    * the distribution functions (percent_rank, cume_dist) and framed
    * first/last_value — the window shapes q36's ROWS-frame suite doesn't
    * cover. The order key is an int day so the range frame is exact. */
  val windowRangeFrame: Q = (s, d) => {
    val k = col("o_custkey")
    val base = table(s, d, "orders")
      .filter(k <= 40)
      .select(col("o_orderkey"), k,
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).as("day"),
        col("o_totalprice"))
    val byDay = Window.partitionBy("o_custkey").orderBy(col("day"), col("o_orderkey"))
    val range30 = Window.partitionBy("o_custkey").orderBy(col("day")).rangeBetween(-30, 0)
    base.select(col("o_orderkey"), col("o_custkey"), col("day"),
        sum(col("o_totalprice").cast(Dec)).over(range30).cast(DecOut)
          .cast("double").as("total_30d"),
        count(lit(1)).over(range30).as("n_30d"),
        percent_rank().over(byDay).as("pr"),
        cume_dist().over(byDay).as("cd"),
        first(col("o_orderkey")).over(byDay).as("first_key"),
        last(col("o_orderkey")).over(
          Window.partitionBy("o_custkey").orderBy(col("day"), col("o_orderkey"))
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("last_key"))
      .orderBy("o_custkey", "day", "o_orderkey")
  }

  /** SCD Type-2 dimension merge — MERGE INTO semantics composed from
    * Spark-first primitives (no table-format dependency): updated keys
    * close out the current version (valid_to stamped, is_current=false)
    * and append a new open version; untouched keys pass through. The
    * update KEY SET is broadcast for both the close-out semi and the
    * pass-through anti join — at 100 TB the daily delta is orders of
    * magnitude smaller than the dimension, so the merge costs one
    * dimension scan with zero shuffles on the big side (a bucketed dim
    * keeps even the output co-located). */
  val scd2Merge: Q = (s, d) => {
    val dim = table(s, d, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        lit("2024-01-01").as("valid_from"),
        lit(null).cast("string").as("valid_to"),
        lit(true).as("is_current"))
    val updates = table(s, d, "customer")
      .filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") + 100).as("c_acctbal"),
        lit("2024-06-01").as("valid_from"))
    val updKeys = updates.select("c_custkey")
    val closedOut = dim.join(broadcast(updKeys), Seq("c_custkey"), "left_semi")
      .withColumn("valid_to", lit("2024-06-01"))
      .withColumn("is_current", lit(false))
    val untouched = dim.join(broadcast(updKeys), Seq("c_custkey"), "left_anti")
    val newVersions = updates
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))
    untouched.unionByName(closedOut).unionByName(newVersions)
      .orderBy("c_custkey", "valid_from")
  }

  /** Typed COGROUP — the per-key two-sided custom logic tier (the Scala
    * analog of pandas-on-Spark's cogroup/applyInPandas): clicks and
    * purchases are grouped by user and each key's two iterators meet in
    * one function — here computing purchases attributable to the user's
    * first click, logic that would otherwise need a join plus windowed
    * post-processing. Physically both sides shuffle once on the key and
    * merge — same exchange shape as a shuffled join, with arbitrary
    * per-key code instead of join semantics. The oracle restates it
    * relationally (window min + conditional counts). */
  val cogroupAttribution: Q = (s, d) => {
    import s.implicits._
    val e = graft.ops.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tsu"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("tsu")).as[(Long, Long)]
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tsu")).as[(Long, Long)]
    clicks.groupByKey(_._1).cogroup(purchases.groupByKey(_._1)) {
      (uid, cs, ps) =>
        val cl = cs.map(_._2).toArray
        val pu = ps.map(_._2).toArray
        val firstClick = if (cl.isEmpty) Long.MaxValue else cl.min
        val attributed = pu.count(_ >= firstClick).toLong
        Iterator((uid, cl.length.toLong, pu.length.toLong, attributed))
    }.toDF("user_id", "n_clicks", "n_purchases", "n_attributed")
      .orderBy("user_id")
  }

  /** GROUP BY ALL — group by every non-aggregate select item (the
    * modern-SQL ergonomics both Spark 4 and DuckDB ship); semantics
    * identical to listing the keys. */
  val groupByAll: Q = (s, d) => {
    table(s, d, "orders").createOrReplaceTempView("graft_ord_gba")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM graft_ord_gba
        |GROUP BY ALL
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
  }

  /** TPC-H Q9-shaped profit rollup (nation × year): a 5-table star join
    * (lineitem ⋈ part ⋈ supplier ⋈ orders ⋈ nation) with a computed
    * per-row measure. The fixture schema has no partsupp, so supply cost
    * is modeled as 10 % of retail price — the join/aggregation shape (the
    * point of Q9) is unchanged. part/supplier/nation broadcast; the only
    * real shuffle is lineitem ⋈ orders on orderkey, then the tiny
    * (nation, year) aggregate. */
  val profitByNationYear: Q = (s, d) => {
    val profit = (col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.1) * col("p_retailprice") * col("l_quantity")).as("profit")
    table(s, d, "lineitem")
      .join(broadcast(table(s, d, "part").filter(col("p_name").contains("a"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(table(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(table(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        year(col("o_orderdate").cast("date")).as("o_year"), profit)
      .groupBy("nation", "o_year")
      .agg(dsum(col("profit")).as("sum_profit"), count(lit(1)).as("n"))
      .orderBy(col("nation"), col("o_year"))
  }

  /** TPC-H Q10-shaped returned-item report: revenue lost to returns per
    * customer, top 20. The orders⋈lineitem shuffle carries only returned
    * rows (filter pushed below the join); customer and nation broadcast;
    * TakeOrderedAndProject caps the result without a global sort. */
  val returnedTopCustomers: Q = (s, d) => {
    val revenue = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev")
    table(s, d, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(table(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), revenue)
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(dsum(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Higher-order array functions (transform/filter/aggregate/array_max)
    * — per-row collection processing entirely inside codegen, the Spark
    * idiom that replaces row-wise Python loops over lists. The token
    * stats here (count, summed length, longest token) stay in one narrow
    * projection; DuckDB's list_* lambdas restate the same semantics. */
  val hofArrays: Q = (s, d) =>
    table(s, d, "documents")
      .filter(col("doc_id") <= 60)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)")
          .as("total_len"),
        expr("array_max(transform(toks, t -> length(t)))").as("longest"),
        expr("size(filter(toks, t -> length(t) >= 6))").as("n_long"))
      .orderBy("doc_id")

  /** Time-series gap fill + forward fill (the as-of cousin every metrics
    * pipeline needs): a shared day spine (distinct order days) crosses
    * the tracked customers, daily totals left-join onto it, and
    * `last(value, ignoreNulls)` over an ordered running frame carries the
    * last observation forward across the gaps. Spine × keys is a
    * broadcast cross of two small distinct sets; the fill is one
    * partitioned window, no self-join chains. */
  val gapFill: Q = (s, d) => {
    val orders = table(s, d, "orders").filter(col("o_custkey") <= 8)
    val days = orders.select(
      date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd").as("day")).distinct()
    val custs = orders.select(col("o_custkey")).distinct()
    val daily = orders
      .groupBy(col("o_custkey"),
        date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd").as("day"))
      .agg(dsum(col("o_totalprice")).as("day_total"))
    val w = Window.partitionBy("o_custkey").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    custs.crossJoin(days)
      .join(daily, Seq("o_custkey", "day"), "left")
      .withColumn("filled", last(col("day_total"), ignoreNulls = true).over(w))
      .withColumn("observed", col("day_total").isNotNull.cast("int"))
      .select(col("o_custkey"), col("day"), col("filled"), col("observed"))
      .orderBy("o_custkey", "day")
  }

  /** SQL pipe syntax (Spark 4's `|>` operator chain) — the linear
    * FROM → WHERE → AGGREGATE → ORDER BY dataflow form; Catalyst
    * eliminates the pipe operators into the ordinary plan, so this is
    * pure surface — the oracle states the classic formulation. */
  val sqlPipe: Q = (s, d) => {
    table(s, d, "orders").createOrReplaceTempView("graft_ord_pipe")
    s.sql(
      """FROM graft_ord_pipe
        ||> WHERE o_orderstatus = 'O'
        ||> AGGREGATE COUNT(*) AS n,
        |     CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS total
        |   GROUP BY o_orderpriority
        ||> ORDER BY o_orderpriority""".stripMargin)
  }

  /** Arg-max/arg-min aggregates (`max_by`/`min_by` ⇔ DuckDB
    * `arg_max`/`arg_min`): the "row attribute at the extremum" shape that
    * otherwise needs a window + filter; one partial-aggregable pass, no
    * per-group sort. The ordering key is a fixed-width string packing
    * (quantity, orderkey, linenumber) — unique per row, so ties are
    * impossible and both engines pick the same row; lexicographic order
    * on the padded key equals numeric order on the tuple. */
  val argExtremes: Q = (s, d) => {
    table(s, d, "lineitem").createOrReplaceTempView("graft_li_argx")
    s.sql(
      """SELECT l_returnflag,
        |  max_by(l_orderkey, lpad(CAST(CAST(l_quantity AS INT) AS STRING), 3, '0')
        |    || lpad(CAST(l_orderkey AS STRING), 12, '0')
        |    || lpad(CAST(l_linenumber AS STRING), 2, '0')) AS max_qty_order,
        |  min_by(l_orderkey, lpad(CAST(CAST(l_quantity AS INT) AS STRING), 3, '0')
        |    || lpad(CAST(l_orderkey AS STRING), 12, '0')
        |    || lpad(CAST(l_linenumber AS STRING), 2, '0')) AS min_qty_order,
        |  MAX(l_quantity) AS max_qty, MIN(l_quantity) AS min_qty
        |FROM graft_li_argx
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Schema-evolution union (`unionByName` with `allowMissingColumns`):
    * two snapshots of a table with drifted schemas (a dropped column, an
    * added column) union by NAME, null-filling the gaps — the
    * heterogeneous-batch append every long-lived warehouse needs. The
    * oracle states the null-padded UNION ALL. */
  val unionEvolved: Q = (s, d) => {
    val v1 = table(s, d, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val v2 = table(s, d, "customer")
      .filter(col("c_custkey") > 200 && col("c_custkey") <= 400)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    v1.unionByName(v2, allowMissingColumns = true)
      .orderBy("c_custkey")
  }

  /** Aggregate FILTER clause — per-aggregate predicates in one pass over
    * the data (the tidy form of q16's CASE-WHEN conditional aggregation);
    * identical syntax in DuckDB. */
  val aggFilterClause: Q = (s, d) => {
    table(s, d, "orders").createOrReplaceTempView("graft_ord_filt")
    s.sql(
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |    FILTER (WHERE o_totalprice > 100000) AS DECIMAL(38,4)) AS DOUBLE) AS big_total
        |FROM graft_ord_filt
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** Calendar arithmetic suite: month truncation, month addition,
    * end-of-month, ISO weekday, quarter, and integer month spans — the
    * date-dimension derivations (reference `transformation.py:89-137`)
    * beyond q17/q22's day-level scalars. All emitted as ISO strings/ints
    * (never raw DATE — the cross-engine rule). */
  val dateArithmetic: Q = (s, d) =>
    table(s, d, "orders")
      .filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("dt"))
      .select(col("o_orderkey"),
        date_format(col("dt"), "yyyy-MM-dd").as("day"),
        date_format(date_trunc("MONTH", col("dt")), "yyyy-MM-dd").as("month_start"),
        date_format(add_months(col("dt"), 3), "yyyy-MM-dd").as("plus_3m"),
        date_format(last_day(col("dt")), "yyyy-MM-dd").as("month_end"),
        (expr("weekday(dt)") + 1).as("iso_dow"),
        quarter(col("dt")).as("qtr"),
        ((lit(1998) - year(col("dt"))) * 12 + (lit(1) - month(col("dt"))))
          .as("months_to_1998"))
      .orderBy("o_orderkey")

  /** Null-safe equality join (`<=>` ⇔ `IS NOT DISTINCT FROM`): NULL keys
    * MATCH each other — the dedup/merge semantics SQL equality can't
    * express (a plain join drops every null-keyed row; q68's as-of and
    * SMJ treat them unmatchable). Still a hash join: null-safe equality
    * is hashable, so no nested loop appears (spec asserts). */
  val nullSafeJoin: Q = (s, d) => {
    def keyed = table(s, d, "customer")
      .select(col("c_custkey"),
        when(col("c_custkey") % 7 === 0, lit(null))
          .otherwise(col("c_custkey") % 5).as("k"))
    val a = keyed.filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey").as("a_key"), col("k").as("ak"))
    val b = keyed.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("b_key"), col("k").as("bk"))
    a.join(b, col("ak") <=> col("bk"))
      .groupBy(coalesce(col("ak"), lit(-1L)).as("k"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("a_key")).as("n_left"),
        countDistinct(col("b_key")).as("n_right"))
      .orderBy("k")
  }

  /** SQL join hints: `/*+ BROADCAST(d) */` forces the replicate-the-small-
    * side plan, `/*+ MERGE(o2) */` forces sort-merge where stats would
    * broadcast — the operational escape hatch when the optimizer's size
    * estimates are wrong mid-pipeline (plan shapes asserted in spec;
    * results are hint-invariant, which is what the oracle states). */
  val joinHints: Q = (s, d) => {
    table(s, d, "orders").createOrReplaceTempView("graft_ord_hint")
    table(s, d, "nation").createOrReplaceTempView("graft_nat_hint")
    s.sql(
      """SELECT /*+ BROADCAST(d) */ d.n_name, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM graft_ord_hint o JOIN graft_nat_hint d
        |  ON o.o_custkey % 25 = d.n_nationkey
        |GROUP BY d.n_name ORDER BY d.n_name""".stripMargin)
  }

  /** Schema-driven column profiling — the data-quality summary every
    * warehouse load job emits (null rate, cardinality, value range), as
    * ONE long-format result over four lineitem columns of three types
    * (integral, string, date). The per-column stat sets are independent
    * single-pass aggregates unioned lazily, so Spark runs them as
    * parallel scans of the same cached relation; min/max surface as
    * strings to keep the output schema uniform (doubles are deliberately
    * excluded — float-to-string formatting is engine-specific, memory:
    * never output raw doubles without decimal staging).
    *
    * Scale: each profile is a full-scan agg with map-side partials and a
    * bytes-sized result; COUNT(DISTINCT) expands to the standard
    * two-phase distinct agg keyed by the column — the one shuffle whose
    * width grows with cardinality, exactly as a dedicated profiler would
    * pay. */
  val profileStats: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    def prof(label: String, c: org.apache.spark.sql.Column) = li.groupBy().agg(
      count(lit(1)).as("n_rows"),
      sum(when(c.isNull, 1L).otherwise(0L)).as("n_null"),
      countDistinct(c).as("n_distinct"),
      min(c).cast("string").as("min_s"),
      max(c).cast("string").as("max_s"))
      .select(lit(label).as("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
    Seq(
      "l_orderkey" -> col("l_orderkey"),
      "l_linenumber" -> col("l_linenumber"),
      "l_returnflag" -> col("l_returnflag"),
      // profiled at day granularity: DATE stringifies identically across
      // engines, raw timestamp rendering does not
      "l_shipdate" -> col("l_shipdate").cast("date"))
      .map((prof _).tupled).reduce(_ unionByName _)
      .orderBy("col_name")
  }

  /** Single-pass histogram quantiles — the streaming/distributed
    * alternative to exact percentiles (q51): bin every price into fixed
    * width-50 buckets, then read p50/p95 off the cumulative histogram
    * with linear interpolation inside the crossing bin. The binning (not
    * sampling) makes the approximation DETERMINISTIC, so unlike a sketch
    * the oracle can restate it exactly.
    *
    * Scale: one map-side-combining agg keyed by (group, bin) — state is
    * #groups × #bins regardless of row count — then a window over the
    * tiny histogram. This is how a 100 TB percentile dashboard actually
    * gets computed; q51's exact sort-based form is the correctness
    * baseline. */
  val histogramQuantiles: Q = (s, d) => {
    val hist = table(s, d, "lineitem")
      .groupBy(col("l_returnflag"),
        floor(col("l_extendedprice") / 50).as("bin"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("l_returnflag").orderBy("bin")
    val cum = hist
      .withColumn("cum", sum("c").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("c").over(Window.partitionBy("l_returnflag")))
    val quantiles = s.range(1).select(
      explode(array(lit(0.5), lit(0.95))).as("q"))
    cum.join(broadcast(quantiles),
        col("cum") >= ceil(col("n") * col("q")) &&
          col("cum") - col("c") < ceil(col("n") * col("q")))
      .select(col("l_returnflag"),
        concat(lit("p"), (col("q") * 100).cast("int")).as("quantile"),
        col("n"),
        (col("bin") * 50 + lit(50) *
          (ceil(col("n") * col("q")) - (col("cum") - col("c"))).cast("double") /
          col("c")).as("estimate"))
      .orderBy("l_returnflag", "quantile")
  }

  /** Ordered-set / positional aggregates new in Spark 4 — LISTAGG with
    * WITHIN GROUP ordering (the ISO ordered-set form; unordered LISTAGG
    * is nondeterministic by definition and never leaves this library),
    * exact interpolated MEDIAN, and MODE with the deterministic
    * lowest-value tie-break. The oracle restates mode as min-of-argmax
    * over the (group, value) count table — the only portable definition —
    * and median stays bit-exact here because the quantity domain (small
    * integers ± .5 midpoints) is closed under interpolation arithmetic.
    *
    * Scale: all three are single-exchange aggregates; LISTAGG's state is
    * bounded by the DISTINCT value domain (2 statuses), never row count —
    * the guard that keeps string aggregation usable at 100 TB. */
  val orderedSetAggs: Q = (s, d) => {
    table(s, d, "lineitem").createOrReplaceTempView("graft_li_osa")
    s.sql(
      """SELECT l_returnflag,
        |  listagg(DISTINCT l_linestatus, ',')
        |    WITHIN GROUP (ORDER BY l_linestatus) AS statuses,
        |  median(l_quantity) AS med_qty,
        |  mode(l_quantity, true) AS mode_qty,
        |  COUNT(*) AS n
        |FROM graft_li_osa
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Winsorized group statistics — the outlier-clipping normalization a
    * training pipeline applies before loss-weighting or feature scaling:
    * clip every value into its group's [p01, p99] and report the clipped
    * mean. Quantile bounds are RANK-BASED (the value at row ceil(n*q) in
    * group order — quantile_disc semantics), so both engines select the
    * same stored double and no interpolation arithmetic is compared; the
    * clipped mean goes through the usual exact-decimal staging.
    *
    * Scale: the bounds pass is q51's exact per-group sort (fixture-exact
    * baseline; a 100 TB deployment swaps in ext78's deterministic
    * histogram bounds — the clip stage is unchanged); bounds are a
    * per-group scalar broadcast and the clip+mean is one map-side-
    * combining agg over the fact scan. */
  val winsorizedStats: Q = (s, d) => {
    val li = table(s, d, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val ranked = li.select(col("g"), col("v"),
      row_number().over(Window.partitionBy("g").orderBy("v")).as("rn"),
      count(lit(1)).over(Window.partitionBy("g")).as("n"))
    val bounds = ranked.groupBy("g").agg(
      min("n").as("n"),
      min(when(col("rn") === ceil(col("n") * 0.01), col("v"))).as("lo"),
      min(when(col("rn") === ceil(col("n") * 0.99), col("v"))).as("hi"))
    li.join(broadcast(bounds), Seq("g"))
      .groupBy("g", "n", "lo", "hi")
      .agg(davg(greatest(col("lo"), least(col("hi"), col("v"))))
        .as("wins_mean"))
      .orderBy("g")
  }

  /** Data-quality expectations — the dbt-test / Deequ-style validation
    * suite a warehouse load runs before publishing: primary-key
    * uniqueness, referential integrity, range, domain, and null checks,
    * emitted as ONE violations report.
    *
    * Scale: each check is an independent aggregate (the FK check a LEFT
    * ANTI join that broadcasts nothing data-sized); Spark runs the lazy
    * union as parallel scans. Reports counts, not violating rows — the
    * report stays bytes-sized at any input scale (drill-down is a
    * follow-up filter query on the named check).
    */
  val dataQualityChecks: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    val ord = table(s, d, "orders")
    def report(name: String, violations: org.apache.spark.sql.DataFrame) =
      violations.select(lit(name).as("check_name"),
        col("n_violations"),
        when(col("n_violations") === 0L, "pass").otherwise("fail")
          .as("status"))
    val pkUnique = ord.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).agg(count(lit(1)).as("n_violations"))
    val fkOrders = li.join(ord, col("l_orderkey") === col("o_orderkey"),
        "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val qtyRange = li.filter(col("l_quantity") < 1 || col("l_quantity") > 50)
      .agg(count(lit(1)).as("n_violations"))
    val flagDomain = li.filter(!col("l_returnflag").isin("A", "N", "R"))
      .agg(count(lit(1)).as("n_violations"))
    val shipNotNull = li.filter(col("l_shipdate").isNull)
      .agg(count(lit(1)).as("n_violations"))
    report("1_orders_pk_unique", pkUnique)
      .unionByName(report("2_lineitem_fk_orders", fkOrders))
      .unionByName(report("3_quantity_range", qtyRange))
      .unionByName(report("4_returnflag_domain", flagDomain))
      .unionByName(report("5_shipdate_not_null", shipNotNull))
      .orderBy("check_name")
  }

  /** Co-located join via persistent BUCKETED tables — the warehouse-layout
    * answer to the join shuffle: both fact tables are written once with
    * `bucketBy(8, <join key>)`, so the scan's output partitioning already
    * satisfies the join's distribution and the sort-merge join runs with
    * ZERO exchange under it (asserted post-AQE in AdvancedSpec). The `merge`
    * hint pins the SMJ so the plan proves the bucketed path rather than
    * broadcasting the small fixture side — at 100 TB neither side
    * broadcasts and this IS the plan.
    *
    * Staged once per (session, sf-dir): re-bucketing per bench pass would
    * measure the write, not the join. Bucket pruning/SPJ over the custom
    * connector is q82's twin proof; this is the builtin-parquet form a
    * warehouse actually deploys.
    */
  val bucketedJoin: Q = (s, d) => {
    val key = s"${(d.hashCode & 0x7fffffff).toHexString}_${sessionToken(s)}"
    val ordT = s"graft_bkt_ord_$key"
    val custT = s"graft_bkt_cust_$key"
    val dir = scratchDir(s, s"bucketed_$key")
    if (!s.catalog.tableExists(ordT)) {
      table(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$dir/orders").saveAsTable(ordT)
      table(s, d, "customer").select("c_custkey", "c_mktsegment")
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$dir/customer").saveAsTable(custT)
    }
    s.table(ordT).hint("merge")
      .join(s.table(custT), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy("c_mktsegment")
  }

  /** Full-outer snapshot reconciliation — the audit query every warehouse
    * runs after a reload: diff two keyed snapshots (here per-customer 1995
    * vs 1996 order counts — both years present in the generated data, so
    * all four outcomes occur) and classify every key as added / removed /
    * changed / same. Completes the join matrix (inner, left, semi, anti,
    * full) as a first-class entry; previously full-outer appeared only
    * inside q101's MERGE rewrite.
    *
    * Scale: both snapshots aggregate on o_custkey and the full-outer join
    * keys on the SAME column, so Catalyst reuses the aggregation's hash
    * partitioning — one shuffle per snapshot, none for the join. The
    * classification is a row-local projection. */
  val fullOuterDiff: Q = (s, d) => {
    val o = table(s, d, "orders").withColumn("yr", year(col("o_orderdate")))
    def snap(y: Int, as: String) = o.filter(col("yr") === y)
      .groupBy("o_custkey").agg(count(lit(1)).as(as))
    snap(1995, "n_prev").as("a").join(snap(1996, "n_curr").as("b"),
        col("a.o_custkey") === col("b.o_custkey"), "full_outer")
      .select(
        coalesce(col("a.o_custkey"), col("b.o_custkey")).as("custkey"),
        when(col("a.o_custkey").isNull, "added")
          .when(col("b.o_custkey").isNull, "removed")
          .when(col("n_prev") === col("n_curr"), "same")
          .otherwise("changed").as("status"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_curr"), lit(0L)).as("n_curr"))
      .orderBy("custkey")
  }

  /** TPC-H Q21-shaped "sole late supplier": late lines (ship lag > 90
    * days vs order date) on multi-supplier orders where NO other
    * supplier was also late — the classic dual-correlated-subquery shape
    * (EXISTS + NOT EXISTS), expressed directly as the semi + anti join
    * plan Catalyst's RewritePredicateSubquery would decorrelate to.
    * (The fixture lacks receipt/commit dates, so lateness is ship lag —
    * same structure, same plan class as the original.)
    *
    * Scale: all three legs key on l_orderkey — the late build, the
    * multi-supplier semi probe, and the sole-late anti probe — so the
    * supplier ≠ predicates ride along as join residuals on one join key.
    * At test SF Catalyst broadcasts every leg and reuses the broadcast
    * exchange (observed: 4 BHJ, 1 ReusedExchange); past the broadcast
    * threshold the same key means co-partitioned shuffle joins that
    * share the fact table's hash partitioning instead of re-shuffling
    * per subquery. Top-k serves via TakeOrdered. */
  val soleLateSupplier: Q = (s, d) => {
    val l = table(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val o = table(s, d, "orders").select(col("o_orderkey"), col("o_orderdate"))
    val late = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date")) > 90)
      .select(col("l_orderkey"), col("l_suppkey"))
    val multi = late.as("l1").join(l.as("l2"),
      col("l1.l_orderkey") === col("l2.l_orderkey") &&
        col("l1.l_suppkey") =!= col("l2.l_suppkey"), "left_semi")
    val sole = multi.as("l1").join(late.as("l3"),
      col("l1.l_orderkey") === col("l3.l_orderkey") &&
        col("l1.l_suppkey") =!= col("l3.l_suppkey"), "left_anti")
    sole.groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("suppkey"))
      .limit(25)
  }

  /** Table reconciliation checksums — the cross-replica verification
    * pattern (pt-table-checksum, warehouse-to-lake audit): per partition
    * group, a COUNT plus an order-independent content checksum
    * (SUM of 60-bit md5-derived row hashes mod 1e9+7). Two sides each
    * compute locally and compare the tiny per-group summaries; a
    * mismatched group pinpoints where to diff rows. SUM commutes and
    * merges across partitions, so the checksum is a standard two-phase
    * agg — no row ever leaves its executor. The double column is
    * excluded (float formatting is engine-specific; checksums hash the
    * exactly-representable columns). md5 is the repo-wide cross-engine
    * hash (see package scaladoc). */
  val tableChecksum: Q = (s, d) => {
    table(s, d, "customer")
      .select(col("c_nationkey").cast("long").as("nk"),
        expr("""CAST(conv(substring(md5(concat_ws('|',
          |  CAST(c_custkey AS STRING), c_name,
          |  CAST(c_nationkey AS STRING), c_mktsegment)), 1, 15), 16, 10)
          |AS BIGINT) % 1000000007""".stripMargin).as("h"))
      .groupBy("nk")
      .agg(count(lit(1)).as("n_rows"), sum("h").as("checksum"))
      .orderBy("nk")
  }

  /** Multiple DISTINCT aggregates in one pass — COUNT(DISTINCT a),
    * COUNT(DISTINCT b) and a plain aggregate together. Catalyst plans
    * this with one Expand (row replicated per distinct group, gid-tagged)
    * + two aggregate phases instead of N self-joins — the planner surface
    * every BI dashboard query hits.
    *
    * Scale: Expand multiplies rows by the distinct-column count BEFORE
    * the shuffle, but each replica carries only its own distinct column
    * (others nulled), so shuffled bytes stay ~one column per replica;
    * partial aggregation then dedups map-side. One shuffle, no join. */
  val multiDistinct: Q = (s, d) => {
    table(s, d, "orders")
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(year(col("o_orderdate"))).as("n_years"),
        count(lit(1)).as("n_orders"))
      .orderBy("prio")
  }

  /** Relative-standing window functions — percent_rank and cume_dist
    * over per-(priority, year) order counts, completing the rank family
    * (q36 covers lag/lead/rank/dense_rank/ntile). The window orders by
    * (n, yr) — unique within each partition — so both engines rank
    * identically; the emitted doubles are the same small-integer IEEE
    * divisions on both sides, hence hash-stable. */
  val windowRelativeRanks: Q = (s, d) => {
    val byYear = table(s, d, "orders")
      .groupBy(col("o_orderpriority").as("prio"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("prio").orderBy(col("n"), col("yr"))
    byYear
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .orderBy("prio", "yr")
  }

  val queries: Map[String, Q] = Map(
    "q111_window_relative_ranks" -> windowRelativeRanks,
    "q110_multi_distinct" -> multiDistinct,
    "q109_table_checksum" -> tableChecksum,
    "q108_sole_late_supplier" -> soleLateSupplier,
    "q107_full_outer_diff" -> fullOuterDiff,
    "q102_ordered_set_aggs" -> orderedSetAggs,
    "ext85_winsorized_stats" -> winsorizedStats,
    "q99_bucketed_join" -> bucketedJoin,
    "q98_data_quality" -> dataQualityChecks,
    "ext78_histogram_quantiles" -> histogramQuantiles,
    "q97_profile_stats" -> profileStats,
    "q79_date_arithmetic" -> dateArithmetic,
    "q80_nullsafe_join" -> nullSafeJoin,
    "q81_join_hints" -> joinHints,
    "q76_arg_extremes" -> argExtremes,
    "q77_union_evolved" -> unionEvolved,
    "q78_agg_filter" -> aggFilterClause,
    "q75_sql_pipe" -> sqlPipe,
    "q69_group_by_all" -> groupByAll,
    "q70_profit_rollup" -> profitByNationYear,
    "q71_returned_topn" -> returnedTopCustomers,
    "q72_hof_arrays" -> hofArrays,
    "q73_gap_fill" -> gapFill,
    "ext36_cogroup_attribution" -> cogroupAttribution,
    "q58_scd2_merge" -> scd2Merge,
    "ext25_range_join_binned" -> rangeJoinBinned,
    "q50_salted_join" -> saltedJoin,
    "q51_percentiles" -> percentiles,
    "q52_grouping_sets" -> groupingSets,
    "q53_window_range_frame" -> windowRangeFrame)

  val oracleSql: Map[String, String] = Map(
    "q111_window_relative_ranks" ->
      """WITH y AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(year(o_orderdate) AS BIGINT) AS yr, COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT prio, yr, n,
        |  percent_rank() OVER (PARTITION BY prio ORDER BY n, yr) AS pr,
        |  cume_dist() OVER (PARTITION BY prio ORDER BY n, yr) AS cd
        |FROM y ORDER BY prio, yr""".stripMargin,
    "q110_multi_distinct" ->
      """SELECT o_orderpriority AS prio,
        |  COUNT(DISTINCT o_custkey) AS n_custs,
        |  COUNT(DISTINCT year(o_orderdate)) AS n_years,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // both engines derive the 60-bit row hash from the same md5 hex
    // prefix (Spark conv(..,16,10); DuckDB '0x' cast) — checksum equality
    // IS the reconciliation claim
    "q109_table_checksum" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nk, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(concat('0x', substr(md5(concat_ws('|',
        |    CAST(c_custkey AS VARCHAR), c_name,
        |    CAST(c_nationkey AS VARCHAR), c_mktsegment)), 1, 15)) AS BIGINT)
        |    % 1000000007) AS BIGINT) AS checksum
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle keeps the EXISTS / NOT EXISTS spelling — equality with
    // the explicit semi+anti plan is the decorrelation-correctness claim
    "q108_sole_late_supplier" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE date_diff('day', CAST(o_orderdate AS DATE),
        |                  CAST(l_shipdate AS DATE)) > 90)
        |SELECT l1.l_suppkey AS suppkey, COUNT(*) AS numwait
        |FROM late l1
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY 1 ORDER BY numwait DESC, suppkey LIMIT 25""".stripMargin,
    "q107_full_outer_diff" ->
      """WITH a AS (
        |  SELECT o_custkey, COUNT(*) AS n_prev FROM orders
        |  WHERE year(o_orderdate) = 1995 GROUP BY 1),
        |b AS (
        |  SELECT o_custkey, COUNT(*) AS n_curr FROM orders
        |  WHERE year(o_orderdate) = 1996 GROUP BY 1)
        |SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
        |  CASE WHEN a.o_custkey IS NULL THEN 'added'
        |       WHEN b.o_custkey IS NULL THEN 'removed'
        |       WHEN a.n_prev = b.n_curr THEN 'same'
        |       ELSE 'changed' END AS status,
        |  COALESCE(a.n_prev, 0) AS n_prev,
        |  COALESCE(b.n_curr, 0) AS n_curr
        |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
        |ORDER BY custkey""".stripMargin,
    "q102_ordered_set_aggs" ->
      """WITH m AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |md AS (
        |  SELECT l_returnflag, MIN(l_quantity) AS mode_qty FROM (
        |    SELECT *, RANK() OVER (PARTITION BY l_returnflag
        |                           ORDER BY c DESC) AS rk FROM m)
        |  WHERE rk = 1 GROUP BY 1)
        |SELECT l.l_returnflag,
        |  string_agg(DISTINCT l.l_linestatus, ',' ORDER BY l.l_linestatus) AS statuses,
        |  median(l.l_quantity) AS med_qty,
        |  MIN(md.mode_qty) AS mode_qty,
        |  COUNT(*) AS n
        |FROM lineitem l JOIN md ON md.l_returnflag = l.l_returnflag
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ext85_winsorized_stats" ->
      """WITH r AS (
        |  SELECT l_returnflag AS g, l_extendedprice AS v,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_extendedprice) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |b AS (
        |  SELECT g, MIN(n) AS n,
        |    MIN(CASE WHEN rn = CAST(ceil(n * 0.01) AS BIGINT) THEN v END) AS lo,
        |    MIN(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN v END) AS hi
        |  FROM r GROUP BY g)
        |SELECT b.g, b.n, b.lo, b.hi,
        |  CAST(CAST(SUM(CAST(greatest(b.lo, least(b.hi, l.v)) AS DECIMAL(18,6)))
        |       AS DECIMAL(38,4)) AS DOUBLE) / COUNT(*) AS wins_mean
        |FROM b JOIN (SELECT l_returnflag AS g, l_extendedprice AS v
        |             FROM lineitem) l USING (g)
        |GROUP BY b.g, b.n, b.lo, b.hi ORDER BY g""".stripMargin,
    "q99_bucketed_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q98_data_quality" ->
      """SELECT check_name, n_violations,
        |  CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
        |FROM (
        |  SELECT '1_orders_pk_unique' AS check_name, COUNT(*) AS n_violations
        |  FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)
        |  UNION ALL
        |  SELECT '2_lineitem_fk_orders', COUNT(*)
        |  FROM lineitem l WHERE NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT '3_quantity_range', COUNT(*)
        |  FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
        |  UNION ALL
        |  SELECT '4_returnflag_domain', COUNT(*)
        |  FROM lineitem WHERE l_returnflag NOT IN ('A', 'N', 'R')
        |  UNION ALL
        |  SELECT '5_shipdate_not_null', COUNT(*)
        |  FROM lineitem WHERE l_shipdate IS NULL)
        |ORDER BY check_name""".stripMargin,
    "ext78_histogram_quantiles" ->
      """WITH hist AS (
        |  SELECT l_returnflag,
        |    CAST(floor(l_extendedprice / 50) AS BIGINT) AS bin,
        |    COUNT(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT *,
        |    CAST(SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bin
        |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM hist),
        |qs AS (SELECT CAST(0.5 AS DOUBLE) AS q UNION ALL SELECT CAST(0.95 AS DOUBLE))
        |SELECT l_returnflag,
        |  'p' || CAST(CAST(q * 100 AS INT) AS VARCHAR) AS quantile,
        |  n,
        |  bin * 50 + 50 * CAST(CAST(ceil(n * q) AS BIGINT) - (cum - c) AS DOUBLE) / c
        |    AS estimate
        |FROM cum JOIN qs
        |  ON cum >= CAST(ceil(n * q) AS BIGINT)
        | AND cum - c < CAST(ceil(n * q) AS BIGINT)
        |ORDER BY l_returnflag, quantile""".stripMargin,
    "q97_profile_stats" ->
      """SELECT col_name, n_rows, n_null, n_distinct, min_s, max_s FROM (
        |  SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
        |    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    COUNT(DISTINCT l_orderkey) AS n_distinct,
        |    CAST(MIN(l_orderkey) AS VARCHAR) AS min_s,
        |    CAST(MAX(l_orderkey) AS VARCHAR) AS max_s
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linenumber', COUNT(*),
        |    CAST(SUM(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(DISTINCT l_linenumber),
        |    CAST(MIN(l_linenumber) AS VARCHAR), CAST(MAX(l_linenumber) AS VARCHAR)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', COUNT(*),
        |    CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(DISTINCT l_returnflag),
        |    CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', COUNT(*),
        |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(DISTINCT CAST(l_shipdate AS DATE)),
        |    CAST(MIN(CAST(l_shipdate AS DATE)) AS VARCHAR),
        |    CAST(MAX(CAST(l_shipdate AS DATE)) AS VARCHAR)
        |  FROM lineitem)
        |ORDER BY col_name""".stripMargin,
    "q79_date_arithmetic" ->
      """SELECT o_orderkey,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
        |  strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_start,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |  CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS iso_dow,
        |  CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
        |  CAST((1998 - year(CAST(o_orderdate AS DATE))) * 12
        |    + (1 - month(CAST(o_orderdate AS DATE))) AS INT) AS months_to_1998
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,
    "q80_nullsafe_join" ->
      """WITH keyed AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey % 5 END AS k
        |  FROM customer),
        |a AS (SELECT c_custkey AS a_key, k AS ak FROM keyed WHERE c_custkey % 2 = 1),
        |b AS (SELECT c_custkey AS b_key, k AS bk FROM keyed WHERE c_custkey % 2 = 0)
        |SELECT COALESCE(ak, -1) AS k, COUNT(*) AS n_pairs,
        |  COUNT(DISTINCT a_key) AS n_left, COUNT(DISTINCT b_key) AS n_right
        |FROM a JOIN b ON ak IS NOT DISTINCT FROM bk
        |GROUP BY 1 ORDER BY k""".stripMargin,
    "q81_join_hints" ->
      """SELECT n_name, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM orders JOIN nation ON o_custkey % 25 = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q76_arg_extremes" ->
      """SELECT l_returnflag,
        |  arg_max(l_orderkey, lpad(CAST(CAST(l_quantity AS INT) AS VARCHAR), 3, '0')
        |    || lpad(CAST(l_orderkey AS VARCHAR), 12, '0')
        |    || lpad(CAST(l_linenumber AS VARCHAR), 2, '0')) AS max_qty_order,
        |  arg_min(l_orderkey, lpad(CAST(CAST(l_quantity AS INT) AS VARCHAR), 3, '0')
        |    || lpad(CAST(l_orderkey AS VARCHAR), 12, '0')
        |    || lpad(CAST(l_linenumber AS VARCHAR), 2, '0')) AS min_qty_order,
        |  MAX(l_quantity) AS max_qty, MIN(l_quantity) AS min_qty
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q77_union_evolved" ->
      """SELECT c_custkey, c_name, c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
        |FROM customer WHERE c_custkey <= 200
        |UNION ALL
        |SELECT c_custkey, c_name, CAST(NULL AS DOUBLE), c_mktsegment
        |FROM customer WHERE c_custkey > 200 AND c_custkey <= 400
        |ORDER BY c_custkey""".stripMargin,
    "q78_agg_filter" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |    FILTER (WHERE o_totalprice > 100000) AS DECIMAL(38,4)) AS DOUBLE) AS big_total
        |FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q75_sql_pipe" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q69_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ALL
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q70_profit_rollup" ->
      """SELECT n_name AS nation,
        |  CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
        |  CAST(CAST(SUM(CAST(
        |    l_extendedprice * (1.0 - l_discount) - 0.1 * p_retailprice * l_quantity
        |    AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_profit,
        |  COUNT(*) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%a%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY nation, o_year""".stripMargin,
    "q71_returned_topn" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q72_hof_arrays" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id <= 60)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS total_len,
        |  CAST(list_max(list_transform(toks, t -> length(t))) AS INT) AS longest,
        |  CAST(len(list_filter(toks, t -> length(t) >= 6)) AS INT) AS n_long
        |FROM t ORDER BY doc_id""".stripMargin,
    "q73_gap_fill" ->
      """WITH o AS (
        |  SELECT o_custkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
        |    o_totalprice
        |  FROM orders WHERE o_custkey <= 8),
        |days AS (SELECT DISTINCT day FROM o),
        |custs AS (SELECT DISTINCT o_custkey FROM o),
        |daily AS (
        |  SELECT o_custkey, day,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS day_total
        |  FROM o GROUP BY 1, 2)
        |SELECT c.o_custkey, s.day,
        |  last_value(d.day_total IGNORE NULLS) OVER (
        |    PARTITION BY c.o_custkey ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  CAST(d.day_total IS NOT NULL AS INT) AS observed
        |FROM custs c CROSS JOIN days s
        |LEFT JOIN daily d ON d.o_custkey = c.o_custkey AND d.day = s.day
        |ORDER BY c.o_custkey, s.day""".stripMargin,
    "ext36_cogroup_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT user_id, event_type, tsu,
        |    MIN(CASE WHEN event_type = 'click' THEN tsu END)
        |      OVER (PARTITION BY user_id) AS fc
        |  FROM e)
        |SELECT user_id,
        |  CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_clicks,
        |  CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchases,
        |  CAST(COUNT(CASE WHEN event_type = 'purchase' AND fc IS NOT NULL
        |             AND tsu >= fc THEN 1 END) AS BIGINT) AS n_attributed
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q58_scd2_merge" ->
      """WITH dim AS (
        |  SELECT c_custkey, c_name, c_acctbal,
        |    '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
        |    TRUE AS is_current
        |  FROM customer),
        |upd AS (
        |  SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal,
        |    '2024-06-01' AS valid_from
        |  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT * FROM (
        |  SELECT c_custkey, c_name, c_acctbal, valid_from, valid_to, is_current
        |  FROM dim WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_acctbal, valid_from, '2024-06-01', FALSE
        |  FROM dim WHERE c_custkey IN (SELECT c_custkey FROM upd)
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_acctbal, valid_from, CAST(NULL AS VARCHAR), TRUE
        |  FROM upd)
        |ORDER BY c_custkey, valid_from""".stripMargin,
    "ext25_range_join_binned" ->
      """WITH ivals AS (
        |  SELECT o_orderkey AS ival_id,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS start_d,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      + (o_orderkey % 5 + 1) AS end_d
        |  FROM orders WHERE o_orderkey <= 200),
        |pts AS (
        |  SELECT datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS p_d
        |  FROM lineitem WHERE l_orderkey <= 3000)
        |SELECT ival_id, COUNT(*) AS n_points,
        |  CAST(MIN(p_d) AS INT) AS first_d, CAST(MAX(p_d) AS INT) AS last_d
        |FROM ivals JOIN pts ON p_d BETWEEN start_d AND end_d
        |GROUP BY ival_id ORDER BY ival_id""".stripMargin,
    "q50_salted_join" ->
      """SELECT r_name, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM orders JOIN region ON o_custkey % 3 = r_regionkey AND r_regionkey < 3
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q51_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q52_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |                        (o_orderstatus, o_orderpriority), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q53_window_range_frame" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INT) AS day,
        |    o_totalprice
        |  FROM orders WHERE o_custkey <= 40)
        |SELECT o_orderkey, o_custkey, day,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER r30 AS DECIMAL(38,4)) AS DOUBLE) AS total_30d,
        |  COUNT(*) OVER r30 AS n_30d,
        |  percent_rank() OVER bd AS pr,
        |  cume_dist() OVER bd AS cd,
        |  first_value(o_orderkey) OVER bd AS first_key,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
        |FROM base
        |WINDOW bd AS (PARTITION BY o_custkey ORDER BY day, o_orderkey),
        |  r30 AS (PARTITION BY o_custkey ORDER BY day RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin)
}
