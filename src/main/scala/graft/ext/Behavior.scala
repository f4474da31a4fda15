package graft.ext

import graft.ops.{dsum, events, table, Q}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the `events` fixture — the batch twins of the
  * streaming tier (ext15 computes gap-sessions with
  * `session_window`; these run the same class of analysis as plain
  * relational plans): gap-based sessionization, ordered funnel
  * conversion, and weekly cohort retention.
  *
  * The reference delegates all post-warehouse analysis to SQL
  * (`test_sql.py:8-14`); these are the event-log queries such a warehouse
  * serves in practice, expressed so every derived value is integer
  * arithmetic (epoch micros, day indexes) — no float, no engine-specific
  * date semantics — and hash-compares bit-for-bit against DuckDB.
  *
  * Scale: each query is keyed on `user_id` — one hash exchange carries
  * window + aggregation (150 users at sf0.01, millions at 100 TB: the
  * key space grows with the data, so parallelism scales and no key is a
  * hotspot by construction). Nothing is collected, broadcast frames are
  * single-row scalars.
  */
object Behavior {

  /** 30 minutes in epoch micros — the session gap threshold. */
  private val GapUs = 1800000000L

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds 30 minutes. Output: one row per session with
    * event count, span, and purchase count.
    *
    * Plan shape: ONE hash exchange on user_id feeds the lag window, the
    * running-sum window (same partitioning + ordering — Spark fuses the
    * two into one Window node), and the (user_id, session_seq) hash agg
    * (partial aggregation runs map-side). At 100 TB this is the canonical
    * shape: shuffle by user once, everything else is per-partition.
    */
  /** Event rows labeled with their session: (user_id, event_id, tsu,
    * event_type, session_seq) — the shared sessionization front-end of
    * ext67 and ext76. */
  private def sessioned(s: org.apache.spark.sql.SparkSession, d: String,
      gapUs: Long) = {
    val ev = events(s, d).select(col("user_id"), col("event_id"),
      expr("unix_micros(ts)").as("tsu"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    ev
      .withColumn("new_sess",
        when(lag("tsu", 1).over(w).isNull ||
          col("tsu") - lag("tsu", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum("new_sess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  val sessionize: Q = (s, d) => {
    val sess = sessioned(s, d, GapUs)
    sess.groupBy("user_id", "session_seq").agg(
      count(lit(1)).as("n_events"),
      min("tsu").as("start_us"),
      max("tsu").as("end_us"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("n_purchases"))
      .withColumn("duration_s", expr("(end_us - start_us) div 1000000"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("start_us"), col("end_us"), col("duration_s"), col("n_purchases"))
      .orderBy("user_id", "session_seq")
  }

  /** Ordered funnel view → click → purchase: a user converts a stage only
    * with an event STRICTLY AFTER their previous stage's earliest
    * conversion. Output: 3 rows (stage, n_users).
    *
    * Plan shape: three conditional-min aggregations chained by keyed
    * joins — all on user_id, so AQE coalesces them onto one exchange
    * footprint; the final counts are single-row aggregates unioned
    * together. No window over the full event log, no driver loop.
    */
  val funnel: Q = (s, d) => {
    val ev = events(s, d).select(col("user_id"),
      expr("unix_micros(ts)").as("tsu"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("tsu").as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("tsu") > col("v_ts"))
      .groupBy("user_id").agg(min("tsu").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("tsu") > col("c_ts"))
      .groupBy("user_id").agg(min("tsu").as("p_ts"))
    v.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("1_view"))
      .unionByName(
        c.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("2_click")))
      .unionByName(
        p.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("3_purchase")))
      .select(col("stage"), col("n_users"))
      .orderBy("stage")
  }

  /** Weekly cohort retention: cohort = a user's first active week, cell
    * (cohort_week, offset) = distinct users of that cohort active
    * `offset` weeks later. Week index is pure integer arithmetic
    * (days-since-epoch div 7 anchored to 2024-01-01, a Monday) — no
    * engine week-truncation semantics involved.
    *
    * Plan shape: per-user first-week agg (keyed on user), join back on
    * user (same key, exchange reused), then the cohort-cell agg — whose
    * key count is weeks², i.e. tiny; its COUNT(DISTINCT user) expands to
    * a two-phase agg keyed by (cohort, offset, user), which carries
    * full user-level parallelism at any scale.
    */
  val retention: Q = (s, d) => {
    // 19723 = days from 1970-01-01 to 2024-01-01 (fixture start, a Monday)
    val ev = events(s, d).select(col("user_id"),
      expr("(unix_micros(ts) div 86400000000 - 19723) div 7").as("week_idx"))
    val cohorts = ev.groupBy("user_id").agg(min("week_idx").as("cohort_week"))
    ev.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week_idx") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Top-15 session paths: each session's ordered event-type sequence
    * joined into a `a>b>c` path string, counted across sessions — the
    * classic navigation-path mining query. Day-scale sessions (24 h gap)
    * so multi-event paths actually occur at fixture density.
    *
    * Scale: the path string is built array-locally from a per-session
    * collect_list whose order is pinned by (tsu, event_id) — sessions are
    * bounded by the gap rule, so the collected array is small by
    * construction; the path count is a keyed agg with map-side partials
    * and the top-15 is TakeOrdered, never a full sort.
    */
  val sessionPaths: Q = (s, d) => {
    val sess = sessioned(s, d, 86400000000L)
    sess.groupBy("user_id", "session_seq")
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(tsu, event_id, event_type)))," +
          " x -> x.event_type)"), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(15)
  }

  /** Incremental materialized-view maintenance — the pattern that keeps a
    * 100 TB rollup fresh without full recompute: the standing MV (events
    * with event_id % 10 != 0 stand in for "already aggregated") merges
    * with a delta batch's partial aggregate by RE-AGGREGATING the partial
    * states (counts add; DECIMAL partial sums add exactly, so the merged
    * result is bit-identical to a from-scratch rebuild — which is exactly
    * what the oracle computes).
    *
    * Scale: the merge touches MV rows + delta rows (both aggregate-sized,
    * ≪ raw), one keyed exchange; the raw events of the base are never
    * rescanned. This is the batch twin of ext24's streaming incremental
    * warehouse.
    */
  val incrementalMv: Q = (s, d) => {
    val ev = events(s, d).select(col("event_id"), col("event_type"),
      expr("unix_micros(ts) div 3600000000").as("hour_id"), col("value"))
    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type", "hour_id").agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(graft.ops.Dec)).as("vs"))
    val mv = partial(ev.filter(col("event_id") % 10 =!= 0))
    val delta = partial(ev.filter(col("event_id") % 10 === 0))
    mv.unionByName(delta)
      .groupBy("event_type", "hour_id")
      .agg(sum("n").as("n"),
        sum("vs").cast(graft.ops.DecOut).cast("double").as("value_sum"))
      .orderBy("event_type", "hour_id")
  }

  /** Rolling 7-day distinct actives (MAU-style) per observed day — the
    * dashboard rollup that tempts a COUNT(DISTINCT) OVER a range frame
    * (unsupported, and a per-day rescan at scale) or a BETWEEN self-join
    * (nested-loop, ext25's lesson). Instead each (day, user) observation
    * CONTRIBUTES itself to the 7 trailing window ends via a row-local
    * `sequence` explode, the pairs are deduped, and one keyed count per
    * day remains — shuffle-only, no join wider than the observed-day
    * filter.
    *
    * Scale: the daily-distinct projection compacts the raw stream first
    * (events → |users|x|days| pairs); the explode is a constant 7x on
    * that compacted table, keyed by day — the standard rolling-distinct
    * contribution pattern at any corpus size. */
  val rollingMau: Q = (s, d) => {
    val du = events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val contrib = du
      .select(explode(expr("sequence(day, date_add(day, 6))")).as("d"),
        col("user_id"))
    val days = du.select(col("day")).distinct()
    contrib.join(days, contrib("d") === days("day")).drop("day")
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("mau7"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("mau7"))
      .orderBy("day")
  }

  /** Exact distinct-count rollup via mergeable bitmaps
    * ([[graft.functions.BitmapAgg]]) — the Druid/ClickHouse/Kylin
    * accelerator pattern: materialize one exact customer bitmap per order
    * month, then answer the year rollup (or any coarser slice) by
    * OR-merging the 12 sketch rows instead of rescanning orders. The
    * output also carries max/sum of the monthly distincts — sum ≠ union
    * is exactly why distinct counts can't be rolled up without a
    * mergeable sketch.
    *
    * Plan shape: orders scanned ONCE; (yr, mo) bitmap agg is a standard
    * two-phase hash agg (partial ~2 KiB bitmaps map-side, OR
    * reduce-side); the year rollup shuffles only the ~84 sketch rows.
    * Popcount runs in codegen'd SQL (`aggregate` + `bit_count`) — the
    * JVM boundary is confined to the bit-set writes inside the two
    * Aggregators. At 100 TB the month bitmaps are a materialized table
    * and every ad-hoc range/rollup distinct is sketch-rows-only. */
  val bitmapDistinct: Q = (s, d) => {
    val bmBuild = udaf(new graft.functions.BitmapAgg.Build,
      ExpressionEncoder[Long]())
    val bmUnion = udaf(new graft.functions.BitmapAgg.Union,
      ExpressionEncoder[Array[Long]]())
    def pop(bm: String) =
      expr(s"aggregate($bm, 0L, (a, w) -> a + CAST(bit_count(w) AS BIGINT))")
    val monthly = table(s, d, "orders")
      .select(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"), col("o_custkey"))
      .groupBy("yr", "mo")
      .agg(bmBuild(col("o_custkey")).as("bm"))
      .withColumn("mc", pop("bm"))
    monthly.groupBy("yr")
      .agg(bmUnion(col("bm")).as("ybm"),
        max("mc").as("max_month_custs"),
        sum("mc").as("sum_month_custs"))
      .select(col("yr").cast("long").as("yr"), pop("ybm").as("active_custs"),
        col("max_month_custs"), col("sum_month_custs"))
      .orderBy("yr")
  }

  /** Within-order product co-occurrence (market-basket pair mining) —
    * the support-counting core of association rules / "bought together"
    * recommenders. Pairs are generated INSIDE each basket: one shuffle
    * of lineitem by order key builds the sorted distinct-part basket,
    * then nested `transform` + `flatten` emit the ordered pairs in
    * codegen — no self-join (the naive formulation shuffles the fact
    * twice and hits the join), no UDF. The only other exchange carries
    * (p1, p2) partial counts.
    *
    * Scale: per-basket work is quadratic in basket size, so the basket
    * is capped at [[BasketCap]] items after sort_array (deterministic;
    * a no-op on this data where baskets hold ≤ 7 lines — same guard
    * pattern as ext02/ext86's dfCap). TakeOrdered serves the top-k;
    * support ≥ 2 prunes the singleton-pair tail before the sort. */
  val BasketCap = 64

  val basketPairs: Q = (s, d) => {
    val baskets = table(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok")
      .agg(expr(s"slice(sort_array(collect_set(pk)), 1, $BasketCap)")
        .as("ps"))
    baskets
      .select(expr(
        """explode(flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1),
          |    y -> struct(x AS p1, y AS p2))))) AS pair""".stripMargin))
      .select(col("pair.p1").as("p1"), col("pair.p2").as("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= 2)
      .orderBy(desc("pair_n"), col("p1"), col("p2"))
      .limit(50)
  }

  /** Month-over-month repeat customers via bitmap set algebra — the
    * second half of the ext96 pattern: once per-month customer bitmaps
    * exist, set INTERSECTION is `zip_with(a, b, (x, y) -> x & y)` +
    * popcount, entirely in codegen'd SQL over sketch rows. Output per
    * consecutive month pair: both audience sizes and the exact overlap
    * (the retention numerator). `zip_with` pads the shorter bitmap with
    * NULL words, hence the coalesce.
    *
    * Plan shape: one fact scan builds the ~84 month bitmaps (two-phase
    * ObjectHashAggregate); the adjacent-month self-join runs over sketch
    * rows only (auto-broadcast — single-digit KiB), so at 100 TB the
    * fact table is still touched once and the set algebra is free. */
  val repeatCustomers: Q = (s, d) => {
    val bmBuild = udaf(new graft.functions.BitmapAgg.Build,
      ExpressionEncoder[Long]())
    def pop(bm: String) =
      expr(s"aggregate($bm, 0L, (a, w) -> a + CAST(bit_count(w) AS BIGINT))")
    val monthly = table(s, d, "orders")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("mid"), col("o_custkey"))
      .groupBy("mid").agg(bmBuild(col("o_custkey")).as("bm"))
    monthly.as("a").join(monthly.as("b"), col("b.mid") === col("a.mid") + 1)
      .select(col("a.mid").as("mid"),
        pop("a.bm").as("custs"),
        pop("b.bm").as("next_custs"),
        expr("""aggregate(
          |  zip_with(a.bm, b.bm, (x, y) -> coalesce(x, 0L) & coalesce(y, 0L)),
          |  0L, (a, w) -> a + CAST(bit_count(w) AS BIGINT))""".stripMargin)
          .as("repeat_n"))
      .orderBy("mid")
  }

  /** Incremental bitmap maintenance — the ext81 pattern applied to the
    * ext96 sketch: a STANDING per-month bitmap table (orders with
    * o_orderkey % 10 != 0 stand in for "already materialized") absorbs a
    * delta batch by re-aggregating the partial states with bitmap OR —
    * never touching the already-ingested rows. Equality with the
    * full-recompute oracle is the associativity-over-real-state-splits
    * claim that makes the sketch table a persistent accelerator: at
    * 100 TB the standing sketch rows live in the catalog and each
    * micro-batch contributes its partial bitmaps only.
    *
    * Plan shape: both partials are two-phase bitmap aggs over disjoint
    * row sets of ONE scan lineage each; the merge is a groupBy over
    * ~168 sketch rows. */
  val incrementalBitmap: Q = (s, d) => {
    val bmBuild = udaf(new graft.functions.BitmapAgg.Build,
      ExpressionEncoder[Long]())
    val bmUnion = udaf(new graft.functions.BitmapAgg.Union,
      ExpressionEncoder[Array[Long]]())
    def pop(bm: String) =
      expr(s"aggregate($bm, 0L, (a, w) -> a + CAST(bit_count(w) AS BIGINT))")
    val o = table(s, d, "orders")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("mid"), col("o_orderkey"), col("o_custkey"))
    def part(standing: Boolean) = o
      .filter(if (standing) pmod(col("o_orderkey"), lit(10)) =!= 0
        else pmod(col("o_orderkey"), lit(10)) === 0)
      .groupBy("mid").agg(bmBuild(col("o_custkey")).as("bm"))
    part(standing = true).unionByName(part(standing = false))
      .groupBy("mid").agg(bmUnion(col("bm")).as("bm"))
      .select(col("mid"), pop("bm").as("active_custs"))
      .orderBy("mid")
  }

  /** Event-transition matrix (first-order Markov counts): for each user's
    * time-ordered event sequence, count (current type → next type)
    * transitions corpus-wide — the "what do users do next" staple behind
    * next-action prediction and funnel design; the row-normalized counts
    * ARE the Markov transition probabilities. Complements ext76 (full
    * path strings): this is the edge histogram, not the path census.
    *
    * Plan shape: ONE hash exchange on user_id feeds the lead() window;
    * the (src, dst) aggregation is partial (map-side) over a key space
    * bounded by |types|², and the top-k serves via TakeOrdered.
    * Determinism: the window orders by (tsu, event_id) — unique per row —
    * so both engines see identical successors. */
  val markovTransitions: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("tsu"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("tsu"))
      .withColumn("dst", lead("event_type", 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("src"), col("dst"))
      .limit(20)
  }

  /** Trending top-k: for every observed day, the top-3 event types by
    * trailing-7-day event count — the "what's hot" dashboard staple.
    * Daily (day, type) counts contribute to the next 7 window ends
    * (ext91's contribution-explode — a constant 7× on the COMPACTED
    * daily table, never on raw events); per-day ranking is row_number
    * with a deterministic (count desc, type) tiebreak, filtered ≤ 3 so
    * Spark plans the per-group top-k as WindowGroupLimit (rank pushdown,
    * no full per-day sort of the type space at scale). */
  val trendingTopk: Q = (s, d) => {
    val daily = events(s, d)
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("n"))
    val contrib = daily
      .select(explode(expr("sequence(day, date_add(day, 6))")).as("d"),
        col("event_type"), col("n"))
    val days = daily.select(col("day")).distinct()
    val win7 = contrib.join(days, contrib("d") === days("day")).drop("day")
      .groupBy("d", "event_type").agg(sum("n").as("cnt7"))
    val w = Window.partitionBy("d")
      .orderBy(col("cnt7").desc, col("event_type"))
    win7.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("cnt7"), col("rnk").cast("long").as("rnk"))
      .orderBy("day", "rnk")
  }

  /** ext104 — linear interpolation of gaps in a daily series, the
    * complement to q73's forward-fill: missing days get
    * `prev + (next − prev)·(elapsed/gap)` from the SURROUNDING observed
    * points, not just the last one — the standard sensor-dropout /
    * sparse-metric repair before a model consumes the series. Dropout is
    * simulated deterministically (days ≡ 1,2 mod 5 removed), then the
    * spine is rebuilt per type and interior holes are interpolated;
    * edge rows with no bracketing observation stay null.
    *
    * Determinism: observed daily values go through exact-decimal
    * summation (dsum); day indexes are integers; the interpolation
    * expression is the same double arithmetic on both engines over those
    * exact inputs — bit-identical, no rounding fudge.
    *
    * Scale: one exchange keyed by (type, day) for the aggregate, one
    * window pass per direction keyed by type. The spine explode is
    * |types| × |days| — metadata-sized relative to the event log. The
    * two ignore-nulls window scans are the O(n) way to find bracketing
    * neighbours; a self-join ("nearest observed day per missing day")
    * would be quadratic per gap.
    */
  val interpolateGaps: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type").as("etype"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("day"))
      .agg(dsum(col("value")).as("v"))
    val thin = daily.filter(!(col("day") % 5).isin(1, 2))
    val spine = thin.groupBy("etype")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("etype"), explode(expr("sequence(d0, d1)")).as("day"))
    val joined = spine.join(thin, Seq("etype", "day"), "left")
    val wPrev = Window.partitionBy("etype").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("etype").orderBy("day")
      .rowsBetween(0, Window.unboundedFollowing)
    joined
      .withColumn("pd", last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("nd", first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wNext))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .select(col("etype"), col("day"),
        when(col("v").isNotNull, col("v")).otherwise(
          col("pv") + (col("nv") - col("pv")) *
            ((col("day") - col("pd")).cast("double") /
              (col("nd") - col("pd")).cast("double"))).as("filled"),
        col("v").isNull.and(col("pv").isNotNull).and(col("nv").isNotNull)
          .cast("int").as("interpolated"))
      .orderBy("etype", "day")
  }

  /** ext105 — CUPED variance reduction (Deng et al., WSDM 2013), the
    * standard experimentation-platform adjustment: a pre-period covariate
    * absorbs between-user variance from the experiment metric,
    * `adj = post − θ·(pre − mean(pre))` with `θ = cov(pre,post)/var(pre)`
    * pooled over all users. Same determinism discipline as q116: per-user
    * pre/post are exact integer counts, every co-moment is a product of
    * exact BIGINT sums, and θ / the adjusted means are the identical
    * final double expressions on both engines — bit-stable, no rounding.
    *
    * Scale: one exchange keyed by user for the per-user counts; the
    * global sufficient statistics are a 1-row broadcast (the house
    * scalar-stats pattern); variant-level sums are |variants| rows. No
    * second pass over raw events, nothing user-cardinality-sized moves.
    */
  val cuped: Q = (s, d) => {
    val day = datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
    val byUser = events(s, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(day < 15, 1L).otherwise(0L)).as("pre"),
        sum(when(day >= 15, 1L).otherwise(0L)).as("post"))
    val g = byUser.agg(
      count(lit(1)).as("n"), sum("pre").as("sp"), sum("post").as("so"),
      sum(col("pre") * col("post")).as("spo"),
      sum(col("pre") * col("pre")).as("spp"))
    val v = byUser.groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum("pre").as("sp_v"), sum("post").as("so_v"))
    v.crossJoin(broadcast(g))
      .withColumn("theta",
        (col("n") * col("spo") - col("sp") * col("so")).cast("double") /
          (col("n") * col("spp") - col("sp") * col("sp")).cast("double"))
      .select(col("variant"), col("n_users"),
        (col("so_v").cast("double") / col("n_users").cast("double")).as("mean_post"),
        ((col("so_v").cast("double") / col("n_users").cast("double")) -
          col("theta") *
            ((col("sp_v").cast("double") / col("n_users").cast("double")) -
              (col("sp").cast("double") / col("n").cast("double")))).as("adj_mean"),
        col("theta"))
      .orderBy("variant")
  }

  /** ext154 — exponential smoothing over daily event counts (the
    * forecasting primitive the event tier lacked): per event_type, the
    * level recurrence L_1 = y_1, L_t = ½·L_{t-1} + ½·y_t. α is FIXED at
    * ½ deliberately: multiplying a double by 0.5 is exact (pure exponent
    * decrement), so every smoothed value is a sum of exactly-scaled
    * terms folded in day order — bit-identical in DuckDB's list_reduce,
    * with no libm pow() in sight (a free-α implementation could not be
    * hash-compared across engines).
    *
    * Scale: the heavy input collapses to (event_type × day) counts in
    * one map-side-combined aggregate; the recurrence then runs on
    * series-sized arrays (array-local — the per-t fold is O(n²) on a
    * ~90-row series, trivial; a windowed running form exists but its
    * mixed-magnitude partial sums are not portable). */
  val expSmoothing: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("y"))
    daily.groupBy("event_type")
      .agg(expr("sort_array(collect_list(struct(day, y)))").as("arr"))
      .select(col("event_type"), explode(expr(
        "transform(sequence(1, size(arr)), t -> struct(" +
          "element_at(arr, t).day AS day, element_at(arr, t).y AS y, " +
          "aggregate(slice(arr, 2, t - 1)," +
          " CAST(element_at(arr, 1).y AS DOUBLE)," +
          " (acc, e) -> acc * 0.5D + CAST(e.y AS DOUBLE) * 0.5D) AS smooth))"))
        .as("r"))
      .select(col("event_type"), col("r.day").as("day"), col("r.y").as("y"),
        col("r.smooth").as("smooth"))
      .orderBy("event_type", "day")
  }

  /** ext155 — Holt double smoothing (level + trend) with a one-step
    * forecast, on ext154's exact-arithmetic discipline: L_1 = y_1,
    * T_1 = 0, L_t = ½L_{t-1} + ½y_t, T_t = ½(L_t − L_{t-1}) + ½T_{t-1},
    * forecast_next = L_t + T_t. Both smoothing constants are ½ (exact
    * halving); the trend subtraction operates on identically-computed
    * doubles, so the whole recurrence folds bit-identically in DuckDB's
    * struct-state list_reduce. The expression for L_t appears twice in
    * the lambda (SQL lambdas have no let-binding) — the SAME expression
    * on both engines, so recomputation cannot diverge. */
  val holtForecast: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("y"))
    daily.groupBy("event_type")
      .agg(expr("sort_array(collect_list(struct(day, y)))").as("arr"))
      .select(col("event_type"), explode(expr(
        "transform(sequence(1, size(arr)), t -> struct(" +
          "element_at(arr, t).day AS day, element_at(arr, t).y AS y, " +
          "aggregate(slice(arr, 2, t - 1)," +
          " struct(CAST(element_at(arr, 1).y AS DOUBLE) AS l, 0.0D AS tr)," +
          " (acc, e) -> struct(" +
          "   acc.l * 0.5D + CAST(e.y AS DOUBLE) * 0.5D AS l," +
          "   (acc.l * 0.5D + CAST(e.y AS DOUBLE) * 0.5D - acc.l) * 0.5D" +
          "     + acc.tr * 0.5D AS tr)) AS st))"))
        .as("r"))
      .select(col("event_type"), col("r.day").as("day"), col("r.y").as("y"),
        col("r.st.l").as("level"), col("r.st.tr").as("trend"),
        (col("r.st.l") + col("r.st.tr")).as("forecast_next"))
      .orderBy("event_type", "day")
  }

  /** ext156 — MAD anomaly flags over the daily series (the robust
    * companion to ext154/ext155's smoothing): per event_type, median of
    * the daily counts, median absolute deviation, and the classic
    * |y − med| > 3·MAD outlier flag. Every intermediate is EXACT:
    * medians of integers land on .0/.5, deviations on .5 steps, the MAD
    * (a median of those) on .25 steps, and ×3 / ÷2 are
    * exactly-representable operations — so the flag (a strict
    * comparison of exact doubles) cannot waver across engines. Medians
    * are computed by explicit sort-and-index on BOTH sides (ext125's
    * discipline), not engine median() builtins. Array-local per series;
    * the heavy input collapses in one map-side-combined aggregate. */
  val madAnomalies: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("y"))
    val g = daily.groupBy("event_type")
      .agg(expr("sort_array(collect_list(struct(day, y)))").as("arr"))
      .withColumn("ys", expr("array_sort(transform(arr, e -> e.y))"))
      .withColumn("n", size(col("ys")))
      .withColumn("med", expr(
        "if(n % 2 = 1," +
          " CAST(element_at(ys, CAST((n + 1) DIV 2 AS INT)) AS DOUBLE)," +
          " (CAST(element_at(ys, CAST(n DIV 2 AS INT)) AS DOUBLE)" +
          "  + CAST(element_at(ys, CAST(n DIV 2 + 1 AS INT)) AS DOUBLE))" +
          " / 2.0D)"))
      .withColumn("devs", expr(
        "array_sort(transform(arr, e -> abs(CAST(e.y AS DOUBLE) - med)))"))
      .withColumn("mad", expr(
        "if(n % 2 = 1, element_at(devs, CAST((n + 1) DIV 2 AS INT))," +
          " (element_at(devs, CAST(n DIV 2 AS INT))" +
          "  + element_at(devs, CAST(n DIV 2 + 1 AS INT))) / 2.0D)"))
    g.select(col("event_type"), col("med"), col("mad"),
        explode(col("arr")).as("e"))
      .select(col("event_type"), col("e.day").as("day"), col("e.y").as("y"),
        col("med"), col("mad"),
        (abs(col("e.y").cast("double") - col("med")) > col("mad") * 3.0)
          .as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** ext157 — weekly seasonality profile + deseasonalized residuals:
    * per (event_type, weekday) the median daily count (the seasonal
    * component), then each day's residual y − seasonal. Weekday is pure
    * integer arithmetic ((epoch_day + 4) % 7, 0 = Sunday — no engine
    * week-truncation semantics), medians are the explicit sort-and-index
    * of ext156 (exact .0/.5 values), residuals are exact subtractions —
    * every output hash-compares. The profile is (type × 7)-sized; the
    * residual join broadcasts it. */
  val weeklySeasonality: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("wd"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("y"))
    val prof = daily.groupBy("event_type", "wd")
      .agg(expr("array_sort(collect_list(y))").as("ys"),
        count(lit(1)).as("n_days"))
      .withColumn("seasonal", expr(
        "if(size(ys) % 2 = 1," +
          " CAST(element_at(ys, CAST((size(ys) + 1) DIV 2 AS INT)) AS DOUBLE)," +
          " (CAST(element_at(ys, CAST(size(ys) DIV 2 AS INT)) AS DOUBLE)" +
          "  + CAST(element_at(ys, CAST(size(ys) DIV 2 + 1 AS INT)) AS DOUBLE))" +
          " / 2.0D)"))
      .select("event_type", "wd", "n_days", "seasonal")
    daily.join(prof, Seq("event_type", "wd"))
      .select(col("event_type"), col("day"), col("wd"), col("y"),
        col("n_days"), col("seasonal"),
        (col("y").cast("double") - col("seasonal")).as("residual"))
      .orderBy("event_type", "day")
  }

  /** ext158 — seasonally-adjusted anomalies, the quartet's capstone
    * composition (what a production monitor actually runs): remove the
    * weekly profile first (ext157's per-weekday median), THEN MAD-flag
    * the residuals (ext156's rule) — a raw-count flag would fire on
    * every weekend dip; the adjusted flag fires only on days unusual
    * FOR THEIR WEEKDAY. Exactness compounds: residuals on .5 steps,
    * their median on .25, deviations on .25, the MAD on .125 — all
    * exactly representable, so the flag is engine-stable. */
  val seasonalAnomalies: Q = (s, d) => {
    val res = weeklySeasonality(s, d)
      .select("event_type", "day", "y", "residual")
    val g = res.groupBy("event_type")
      .agg(expr("array_sort(collect_list(residual))").as("rs"))
      .withColumn("n", size(col("rs")))
      .withColumn("med", expr(
        "if(n % 2 = 1, element_at(rs, CAST((n + 1) DIV 2 AS INT))," +
          " (element_at(rs, CAST(n DIV 2 AS INT))" +
          "  + element_at(rs, CAST(n DIV 2 + 1 AS INT))) / 2.0D)"))
    val mad = g
      .withColumn("devs", expr("array_sort(transform(rs, r -> abs(r - med)))"))
      .withColumn("mad", expr(
        "if(n % 2 = 1, element_at(devs, CAST((n + 1) DIV 2 AS INT))," +
          " (element_at(devs, CAST(n DIV 2 AS INT))" +
          "  + element_at(devs, CAST(n DIV 2 + 1 AS INT))) / 2.0D)"))
      .select("event_type", "med", "mad")
    res.join(mad, Seq("event_type"))
      .select(col("event_type"), col("day"), col("y"), col("residual"),
        col("med"), col("mad"),
        (abs(col("residual") - col("med")) > col("mad") * 3.0)
          .as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** ext160 — CUSUM changepoint detection over the daily series (the
    * monitoring set's final member, VERDICT r11 #7): per event_type,
    * the classic cumulative-sum statistic S_t = Σ_{j≤t} (y_j − ȳ),
    * kept EXACT by scaling with the series length — S'_t =
    * Σ_{j≤t} (n·y_j − T) with T = Σy, all BIGINT — so no mean division
    * ever happens and the hash comparison cannot waver. The changepoint
    * estimate is the standard argmax |S_t| (Page 1954's location
    * estimator); every day achieving the maximum is flagged
    * (deterministic — integer ties flag together). Array-local like
    * ext154: the heavy input collapses to (event_type × day) counts in
    * one map-side-combined aggregate; the cumulative sum is a window
    * over ~90-row series. */
  val cusumChangepoint: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("y"))
    val g = daily.groupBy("event_type")
      .agg(expr("sort_array(collect_list(struct(day, y)))").as("arr"))
      .withColumn("tot", expr("aggregate(arr, CAST(0 AS BIGINT), " +
        "(a, e) -> a + e.y)"))
      .withColumn("n", expr("CAST(size(arr) AS BIGINT)"))
    val rows = g.select(col("event_type"), explode(expr(
        "transform(sequence(1, size(arr)), t -> struct(" +
          "element_at(arr, t).day AS day, element_at(arr, t).y AS y, " +
          "aggregate(slice(arr, 1, t), CAST(0 AS BIGINT), " +
          "  (a, e) -> a + n * e.y - tot) AS cusum_scaled))")).as("r"))
      .select(col("event_type"), col("r.day").as("day"),
        col("r.y").as("y"), col("r.cusum_scaled").as("cusum_scaled"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    rows
      .withColumn("is_changepoint",
        abs(col("cusum_scaled")) === max(abs(col("cusum_scaled"))).over(w))
      .orderBy("event_type", "day")
  }

  val queries: Map[String, Q] = Map(
    "ext160_cusum_changepoint" -> cusumChangepoint,
    "ext154_exp_smoothing" -> expSmoothing,
    "ext155_holt_forecast" -> holtForecast,
    "ext156_mad_anomalies" -> madAnomalies,
    "ext157_weekly_seasonality" -> weeklySeasonality,
    "ext158_seasonal_anomalies" -> seasonalAnomalies,
    "ext105_cuped" -> cuped,
    "ext104_interpolate_gaps" -> interpolateGaps,
    "ext102_trending_topk" -> trendingTopk,
    "ext101_markov_transitions" -> markovTransitions,
    "ext99_incremental_bitmap" -> incrementalBitmap,
    "ext98_repeat_customers" -> repeatCustomers,
    "ext97_basket_pairs" -> basketPairs,
    "ext96_bitmap_distinct" -> bitmapDistinct,
    "ext91_rolling_mau" -> rollingMau,
    "ext81_incremental_mv" -> incrementalMv,
    "ext67_sessionize" -> sessionize,
    "ext68_funnel" -> funnel,
    "ext69_retention_cohorts" -> retention,
    "ext76_session_paths" -> sessionPaths)

  val oracleSql: Map[String, String] = Map(
    "ext160_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(SUM(y) AS BIGINT) AS t,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM daily GROUP BY event_type),
        |cus AS (
        |  SELECT d.event_type, d.day, CAST(d.y AS BIGINT) AS y,
        |    CAST(SUM(g.n * d.y - g.t) OVER (
        |      PARTITION BY d.event_type ORDER BY d.day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum_scaled
        |  FROM daily d JOIN tot g ON d.event_type = g.event_type)
        |SELECT event_type, day, y, cusum_scaled,
        |  abs(cusum_scaled) = MAX(abs(cusum_scaled))
        |    OVER (PARTITION BY event_type) AS is_changepoint
        |FROM cus ORDER BY event_type, day""".stripMargin,
    "ext154_exp_smoothing" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |series AS (
        |  SELECT event_type,
        |    list(struct_pack(day := day, y := y) ORDER BY day) AS arr
        |  FROM daily GROUP BY event_type),
        |ex AS (
        |  SELECT event_type, unnest(range(1, len(arr) + 1)) AS t, arr
        |  FROM series)
        |SELECT event_type, arr[t].day AS day, arr[t].y AS y,
        |  list_reduce([CAST(e.y AS DOUBLE) for e in arr[1:t]],
        |              (a, b) -> a * 0.5 + b * 0.5) AS smooth
        |FROM ex ORDER BY event_type, day""".stripMargin,
    "ext155_holt_forecast" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |series AS (
        |  SELECT event_type,
        |    list(struct_pack(day := day, y := y) ORDER BY day) AS arr
        |  FROM daily GROUP BY event_type),
        |ex AS (
        |  SELECT event_type, unnest(range(1, len(arr) + 1)) AS t, arr
        |  FROM series),
        |st AS (
        |  SELECT event_type, t, arr,
        |    -- tr is assigned BEFORE l: DuckDB's struct_pack resolves a
        |    -- field reference in a LATER argument against the fields
        |    -- already packed (a.l after "l :=" is the NEW level), so the
        |    -- trend must be computed while a.l still names the old one
        |    list_reduce(
        |      [struct_pack(tr := CAST(0.0 AS DOUBLE),
        |                   l := CAST(e.y AS DOUBLE)) for e in arr[1:t]],
        |      (a, b) -> struct_pack(
        |        tr := (a.l * 0.5 + b.l * 0.5 - a.l) * 0.5 + a.tr * 0.5,
        |        l := a.l * 0.5 + b.l * 0.5)) AS s
        |  FROM ex)
        |SELECT event_type, arr[t].day AS day, arr[t].y AS y,
        |  s.l AS level, s.tr AS trend, s.l + s.tr AS forecast_next
        |FROM st ORDER BY event_type, day""".stripMargin,
    "ext156_mad_anomalies" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |series AS (
        |  SELECT event_type,
        |    list(struct_pack(day := day, y := y) ORDER BY day) AS arr
        |  FROM daily GROUP BY event_type),
        |meds AS (
        |  SELECT event_type, arr,
        |    CASE WHEN len(ys) % 2 = 1
        |         THEN CAST(ys[(len(ys) + 1) // 2] AS DOUBLE)
        |         ELSE (CAST(ys[len(ys) // 2] AS DOUBLE)
        |               + CAST(ys[len(ys) // 2 + 1] AS DOUBLE)) / 2.0
        |    END AS med
        |  FROM (SELECT event_type, arr,
        |          list_sort([e.y for e in arr]) AS ys FROM series)),
        |mads AS (
        |  SELECT event_type, arr, med,
        |    CASE WHEN len(devs) % 2 = 1
        |         THEN devs[(len(devs) + 1) // 2]
        |         ELSE (devs[len(devs) // 2] + devs[len(devs) // 2 + 1]) / 2.0
        |    END AS mad
        |  FROM (SELECT event_type, arr, med,
        |          list_sort([abs(CAST(e.y AS DOUBLE) - med) for e in arr])
        |            AS devs
        |        FROM meds)),
        |ex AS (SELECT event_type, med, mad, unnest(arr) AS e FROM mads)
        |SELECT event_type, e.day AS day, e.y AS y, med, mad,
        |  abs(CAST(e.y AS DOUBLE) - med) > mad * 3.0 AS is_anomaly
        |FROM ex ORDER BY event_type, day""".stripMargin,
    "ext157_weekly_seasonality" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 AS wd,
        |    strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2, 3),
        |prof AS (
        |  SELECT event_type, wd, CAST(len(ys) AS BIGINT) AS n_days,
        |    CASE WHEN len(ys) % 2 = 1
        |         THEN CAST(ys[(len(ys) + 1) // 2] AS DOUBLE)
        |         ELSE (CAST(ys[len(ys) // 2] AS DOUBLE)
        |               + CAST(ys[len(ys) // 2 + 1] AS DOUBLE)) / 2.0
        |    END AS seasonal
        |  FROM (SELECT event_type, wd, list_sort(list(y)) AS ys
        |        FROM daily GROUP BY 1, 2)),
        |j AS (
        |  SELECT d.event_type, d.day, d.wd, d.y, p.n_days, p.seasonal,
        |    CAST(d.y AS DOUBLE) - p.seasonal AS residual
        |  FROM daily d JOIN prof p
        |    ON d.event_type = p.event_type AND d.wd = p.wd)
        |SELECT * FROM j ORDER BY event_type, day""".stripMargin,
    "ext158_seasonal_anomalies" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 AS wd,
        |    strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2, 3),
        |prof AS (
        |  SELECT event_type, wd,
        |    CASE WHEN len(ys) % 2 = 1
        |         THEN CAST(ys[(len(ys) + 1) // 2] AS DOUBLE)
        |         ELSE (CAST(ys[len(ys) // 2] AS DOUBLE)
        |               + CAST(ys[len(ys) // 2 + 1] AS DOUBLE)) / 2.0
        |    END AS seasonal
        |  FROM (SELECT event_type, wd, list_sort(list(y)) AS ys
        |        FROM daily GROUP BY 1, 2)),
        |res AS (
        |  SELECT d.event_type, d.day, d.y,
        |    CAST(d.y AS DOUBLE) - p.seasonal AS residual
        |  FROM daily d JOIN prof p
        |    ON d.event_type = p.event_type AND d.wd = p.wd),
        |meds AS (
        |  SELECT event_type,
        |    CASE WHEN len(rs) % 2 = 1 THEN rs[(len(rs) + 1) // 2]
        |         ELSE (rs[len(rs) // 2] + rs[len(rs) // 2 + 1]) / 2.0
        |    END AS med, rs
        |  FROM (SELECT event_type, list_sort(list(residual)) AS rs
        |        FROM res GROUP BY event_type)),
        |mads AS (
        |  SELECT event_type, med,
        |    CASE WHEN len(devs) % 2 = 1 THEN devs[(len(devs) + 1) // 2]
        |         ELSE (devs[len(devs) // 2] + devs[len(devs) // 2 + 1]) / 2.0
        |    END AS mad
        |  FROM (SELECT event_type, med,
        |          list_sort([abs(r - med) for r in rs]) AS devs FROM meds))
        |SELECT r.event_type, r.day, r.y, r.residual, m.med, m.mad,
        |  abs(r.residual - m.med) > m.mad * 3.0 AS is_anomaly
        |FROM res r JOIN mads m ON r.event_type = m.event_type
        |ORDER BY r.event_type, r.day""".stripMargin,
    // identical co-moment arithmetic over exact BIGINT sums (q116 pattern)
    "ext105_cuped" ->
      """WITH u AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN date_diff('day', DATE '2024-01-01',
        |        CAST(CAST(ts AS TIMESTAMP) AS DATE)) < 15
        |        THEN 1 ELSE 0 END) AS pre,
        |    SUM(CASE WHEN date_diff('day', DATE '2024-01-01',
        |        CAST(CAST(ts AS TIMESTAMP) AS DATE)) >= 15
        |        THEN 1 ELSE 0 END) AS post
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT COUNT(*) AS n, SUM(pre) AS sp, SUM(post) AS so,
        |    SUM(pre * post) AS spo, SUM(pre * pre) AS spp
        |  FROM u),
        |v AS (
        |  SELECT user_id % 2 AS variant, COUNT(*) AS n_users,
        |    SUM(pre) AS sp_v, SUM(post) AS so_v
        |  FROM u GROUP BY 1)
        |SELECT CAST(variant AS BIGINT) AS variant,
        |  CAST(n_users AS BIGINT) AS n_users,
        |  CAST(so_v AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_post,
        |  (CAST(so_v AS DOUBLE) / CAST(n_users AS DOUBLE)) -
        |    (CAST(n*spo - sp*so AS DOUBLE) / CAST(n*spp - sp*sp AS DOUBLE)) *
        |    ((CAST(sp_v AS DOUBLE) / CAST(n_users AS DOUBLE)) -
        |     (CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))) AS adj_mean,
        |  CAST(n*spo - sp*so AS DOUBLE) / CAST(n*spp - sp*sp AS DOUBLE) AS theta
        |FROM v CROSS JOIN g ORDER BY variant""".stripMargin,
    // same dropout simulation, spine, and bracketing ignore-nulls windows;
    // the interpolation arithmetic is the identical double expression
    "ext104_interpolate_gaps" ->
      """WITH daily AS (
        |  SELECT event_type AS etype,
        |    CAST(date_diff('day', DATE '2024-01-01',
        |         CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS day,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
        |         AS DECIMAL(38,4)) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |thin AS (SELECT * FROM daily WHERE day % 5 NOT IN (1, 2)),
        |spine AS (
        |  SELECT etype, CAST(unnest(generate_series(d0, d1)) AS BIGINT) AS day
        |  FROM (SELECT etype, MIN(day) AS d0, MAX(day) AS d1
        |        FROM thin GROUP BY 1)),
        |j AS (
        |  SELECT s.etype, s.day, t.v
        |  FROM spine s LEFT JOIN thin t USING (etype, day)),
        |w AS (
        |  SELECT etype, day, v,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY etype ORDER BY day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |    last_value(v IGNORE NULLS)
        |      OVER (PARTITION BY etype ORDER BY day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY etype ORDER BY day
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd,
        |    first_value(v IGNORE NULLS)
        |      OVER (PARTITION BY etype ORDER BY day
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
        |  FROM j)
        |SELECT etype, day,
        |  CASE WHEN v IS NOT NULL THEN v
        |       ELSE pv + (nv - pv) * (CAST(day - pd AS DOUBLE)
        |                              / CAST(nd - pd AS DOUBLE)) END AS filled,
        |  CAST(v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL
        |       AS INT) AS interpolated
        |FROM w ORDER BY etype, day""".stripMargin,
    // same contribution-explode restatement as ext91, plus QUALIFY-style
    // ranking; observed-days join keeps the window ends real
    "ext102_trending_topk" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |         COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |contrib AS (
        |  SELECT CAST(day + x * INTERVAL 1 DAY AS DATE) AS d, event_type, n
        |  FROM (SELECT day, event_type, n, unnest(range(7)) AS x FROM daily)),
        |days AS (SELECT DISTINCT day FROM daily),
        |win7 AS (
        |  SELECT c.d, c.event_type, CAST(SUM(c.n) AS BIGINT) AS cnt7
        |  FROM contrib c JOIN days ON days.day = c.d
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT d, event_type, cnt7,
        |    row_number() OVER (PARTITION BY d
        |                       ORDER BY cnt7 DESC, event_type) AS rnk
        |  FROM win7)
        |SELECT strftime(d, '%Y-%m-%d') AS day, event_type, cnt7,
        |       CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 3 ORDER BY day, rnk""".stripMargin,
    "ext101_markov_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
        |  FROM events),
        |t AS (
        |  SELECT event_type AS src,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY tsu, event_id) AS dst
        |  FROM e)
        |SELECT src, dst, COUNT(*) AS n FROM t WHERE dst IS NOT NULL
        |GROUP BY 1, 2 ORDER BY n DESC, src, dst LIMIT 20""".stripMargin,
    // the oracle rebuilds from scratch — equality with the merged
    // standing+delta partial bitmaps IS the incremental-maintenance claim
    "ext99_incremental_bitmap" ->
      """SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS mid,
        |       COUNT(DISTINCT o_custkey) AS active_custs
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle recomputes overlap from the base table with a distinct
    // self-join — equality proves the bitmap AND path
    "ext98_repeat_customers" ->
      """WITH mu AS (
        |  SELECT DISTINCT (year(o_orderdate) * 12 + month(o_orderdate)) AS mid,
        |         o_custkey AS ck
        |  FROM orders),
        |s AS (SELECT mid, COUNT(*) AS n FROM mu GROUP BY 1),
        |i AS (
        |  SELECT a.mid, COUNT(*) AS repeat_n
        |  FROM mu a JOIN mu b ON b.mid = a.mid + 1 AND b.ck = a.ck
        |  GROUP BY 1)
        |SELECT s.mid, s.n AS custs, s2.n AS next_custs,
        |       COALESCE(i.repeat_n, 0) AS repeat_n
        |FROM s JOIN s s2 ON s2.mid = s.mid + 1
        |LEFT JOIN i ON i.mid = s.mid
        |ORDER BY s.mid""".stripMargin,
    // the oracle uses the naive self-join formulation — equality with
    // the basket-local pair generation IS the rewrite's correctness
    // claim (the cap is a no-op at ≤7-line baskets, like ext02's dfCap)
    "ext97_basket_pairs" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        |SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS pair_n
        |FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY pair_n DESC, p1, p2 LIMIT 50""".stripMargin,
    // the oracle recomputes every level from the base table — equality
    // with the sketch-rollup path IS the mergeability claim
    "ext96_bitmap_distinct" ->
      """WITH m AS (
        |  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |         COUNT(DISTINCT o_custkey) AS mc
        |  FROM orders GROUP BY 1, 2),
        |y AS (
        |  SELECT year(o_orderdate) AS yr,
        |         COUNT(DISTINCT o_custkey) AS active_custs
        |  FROM orders GROUP BY 1)
        |SELECT y.yr, y.active_custs,
        |  MAX(m.mc) AS max_month_custs,
        |  CAST(SUM(m.mc) AS BIGINT) AS sum_month_custs
        |FROM y JOIN m ON y.yr = m.yr
        |GROUP BY y.yr, y.active_custs
        |ORDER BY y.yr""".stripMargin,
    // each (day, user) contributes to 7 trailing window ends; only
    // observed days survive — the same contribution semantics, declared
    "ext91_rolling_mau" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
        |  FROM events),
        |contrib AS (
        |  SELECT DISTINCT CAST(day + x * INTERVAL 1 DAY AS DATE) AS d, user_id
        |  FROM (SELECT day, user_id, unnest(range(7)) AS x FROM du)),
        |days AS (SELECT DISTINCT day FROM du)
        |SELECT strftime(c.d, '%Y-%m-%d') AS day, COUNT(*) AS mau7
        |FROM contrib c JOIN days ON days.day = c.d
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle rebuilds the rollup from scratch — equality with the
    // merged partial states IS the incremental-maintenance claim
    "ext81_incremental_mv" ->
      """SELECT event_type,
        |  epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_id,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,4))
        |       AS DOUBLE) AS value_sum
        |FROM events
        |GROUP BY event_type, hour_id
        |ORDER BY event_type, hour_id""".stripMargin,
    "ext67_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |         event_type
        |  FROM events),
        |flagged AS (
        |  SELECT *,
        |    CASE WHEN lag(tsu) OVER w IS NULL
        |           OR tsu - lag(tsu) OVER w > 1800000000 THEN 1 ELSE 0 END
        |      AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
        |sess AS (
        |  SELECT *,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |  MIN(tsu) AS start_us, MAX(tsu) AS end_us,
        |  (MAX(tsu) - MIN(tsu)) // 1000000 AS duration_s,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_purchases
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "ext68_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_type
        |  FROM events),
        |v AS (SELECT user_id, MIN(tsu) AS v_ts FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.tsu) AS c_ts
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.tsu > v.v_ts
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.tsu) AS p_ts
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.tsu > c.c_ts
        |      GROUP BY e.user_id)
        |SELECT stage, n_users FROM (
        |  SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
        |  UNION ALL
        |  SELECT '2_click', COUNT(*) FROM c
        |  UNION ALL
        |  SELECT '3_purchase', COUNT(*) FROM p)
        |ORDER BY stage""".stripMargin,
    "ext76_session_paths" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |         event_type
        |  FROM events),
        |flagged AS (
        |  SELECT *,
        |    CASE WHEN lag(tsu) OVER w IS NULL
        |           OR tsu - lag(tsu) OVER w > 86400000000 THEN 1 ELSE 0 END
        |      AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
        |sess AS (
        |  SELECT *,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS session_seq
        |  FROM flagged),
        |paths AS (
        |  SELECT user_id, session_seq,
        |    string_agg(event_type, '>' ORDER BY tsu, event_id) AS path
        |  FROM sess GROUP BY user_id, session_seq)
        |SELECT path, COUNT(*) AS n_sessions
        |FROM paths GROUP BY path
        |ORDER BY n_sessions DESC, path
        |LIMIT 15""".stripMargin,
    "ext69_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 - 19723) // 7
        |      AS week_idx
        |  FROM events),
        |cohorts AS (
        |  SELECT user_id, MIN(week_idx) AS cohort_week FROM ev GROUP BY user_id)
        |SELECT c.cohort_week, e.week_idx - c.cohort_week AS week_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM ev e JOIN cohorts c ON e.user_id = c.user_id
        |GROUP BY c.cohort_week, e.week_idx - c.cohort_week
        |ORDER BY cohort_week, week_offset""".stripMargin)
}
