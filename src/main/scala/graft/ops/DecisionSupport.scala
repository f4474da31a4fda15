package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-shaped decision-support classics the round-6 catalog still lacked:
  * the four canonical decorrelation surfaces (Q17 correlated scalar
  * aggregate, Q13 outer-join count distribution, Q18 IN-over-HAVING,
  * Q22 global-scalar threshold + NOT EXISTS), expressed as the explicit
  * join/aggregate plans Spark should decorrelate them into. The oracle
  * keeps the subquery spelling, so hash equality IS the decorrelation-
  * correctness claim (same pattern as q108 / TPC-H Q21).
  *
  * Determinism: every avg-threshold comparison is restated in exact
  * DECIMAL cross-multiplied form (`2·n·q < Σq` instead of
  * `q < 0.5·Σq/n`) — a double average differs between Spark's parallel
  * partial sums and DuckDB's sequential scan by ulps, and a row sitting
  * on the boundary would flip. Cross-multiplied decimals are exact on
  * both engines, so the predicate is bit-stable by construction.
  */
object DecisionSupport {

  /** q112 — TPC-H Q17 shape: revenue of lineitems whose quantity is below
    * half their part's average. The correlated scalar aggregate becomes
    * one per-part aggregate (2k rows at sf0.01; bounded by |part| at any
    * SF) broadcast back onto lineitem — no shuffle of the fact, one scan
    * per side. At 100 TB the per-part aggregate is the classic map-side-
    * combinable reduction; the broadcast is |part|-sized, not fact-sized.
    */
  val smallQtyRevenue: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    val perPart = li
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast(Dec)).as("part_qty"),
        count(lit(1)).as("part_n"))
    val brands = table(s, d, "part").select(col("p_partkey"), col("p_brand"))
    li.join(broadcast(perPart), col("l_partkey") === col("pk"))
      .filter(col("l_quantity").cast(Dec) * lit(2) * col("part_n") < col("part_qty"))
      .join(broadcast(brands), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_small"),
        dsum(col("l_extendedprice")).as("small_rev"))
      .orderBy("brand")
  }

  /** q113 — TPC-H Q13 shape: the distribution of per-customer order
    * counts (excluding one order class), customers with zero qualifying
    * orders included via the left outer join. Two aggregations: count per
    * customer, then histogram over counts — the second input is
    * |customer|-sized, so the expensive exchange happens once.
    */
  val orderCountDistribution: Q = (s, d) => {
    val nonUrgent = table(s, d, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    val perCust = table(s, d, "customer")
      .select(col("c_custkey"))
      .join(nonUrgent, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count")) // count(col): nulls (no match) excluded
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** q114 — TPC-H Q18 shape: large-volume orders (`o_orderkey IN (… GROUP
    * BY … HAVING SUM(qty) > t)`). The IN-over-HAVING subquery is the
    * aggregate itself here — aggregating lineitem once yields both the
    * filter and the output `sum_qty`, so the fact is scanned and shuffled
    * exactly once; orders joins the ~1% survivor set, customer (dim)
    * broadcasts. The HAVING threshold compares in DECIMAL (exact), only
    * the output column is cast to double.
    */
  val largeVolumeCustomers: Q = (s, d) => {
    val liAgg = table(s, d, "lineitem")
      .groupBy(col("l_orderkey").as("lk"))
      .agg(sum(col("l_quantity").cast(Dec)).as("qty_dec"))
      .filter(col("qty_dec") > lit(250))
      .select(col("lk"), col("qty_dec").cast(DecOut).cast("double").as("sum_qty"))
    val orders = table(s, d, "orders")
    val cust = table(s, d, "customer").select(col("c_custkey"), col("c_name"))
    orders.join(liAgg, col("o_orderkey") === col("lk"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** q115 — TPC-H Q22 shape: customers above the global positive-balance
    * average with no urgent orders. The global scalar subquery is a 1-row
    * aggregate crossJoined back (planned as a broadcast — the house
    * 1-row-statistics pattern, cf. q67/ext85); "has no urgent order" is a
    * left anti join, Spark's decorrelation target for NOT EXISTS. The
    * average threshold is cross-multiplied into exact DECIMAL
    * (`bal·n > Σbal`), never divided.
    */
  val idleRichCustomers: Q = (s, d) => {
    val cust = table(s, d, "customer")
    val stats = cust.filter(col("c_acctbal") > 0)
      .agg(sum(col("c_acctbal").cast(Dec)).as("tot_bal"),
        count(lit(1)).as("n_pos"))
    val urgent = table(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(stats))
      .filter(col("c_acctbal").cast(Dec) * col("n_pos") > col("tot_bal"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("nk"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("nk")
  }

  /** q116 — per-group Pearson correlation and OLS regression
    * (slope/intercept), the `corr`/`regr_*` aggregate family — computed
    * from EXACT integer sufficient statistics rather than the built-in
    * one-pass double aggregates. Rationale: Spark's `corr` accumulates
    * co-moments in doubles whose partial-merge order differs from
    * DuckDB's sequential scan, so the low bits are engine-dependent and
    * never hash-stable. Here both inputs are exact small integers
    * (quantity 1–50; discount×100 ∈ 0–10), the six sums
    * (n, Σx, Σy, Σxy, Σx², Σy²) and their cross products stay exact in
    * BIGINT (< 2⁵³ through sf0.1 and far beyond), and the final
    * corr/slope/intercept are the SAME correctly-rounded double
    * expressions on both engines — bit-identical by construction.
    * Scale: one map-side-combinable aggregate over the fact, six longs
    * per group — the textbook mergeable-statistics pattern (same shape
    * Spark itself uses, minus the double drift).
    */
  val corrRegression: Q = (s, d) => {
    val li = table(s, d, "lineitem")
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_discount") * 100, 0).cast("long").as("y"))
    val sums = li.groupBy("flag").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    sums
      .withColumn("cov_n", (col("n") * col("sxy") - col("sx") * col("sy")).cast("double"))
      .withColumn("var_x", (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("var_y", (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
      .select(col("flag"), col("n"),
        (col("cov_n") / (sqrt(col("var_x")) * sqrt(col("var_y")))).as("corr_xy"),
        (col("cov_n") / col("var_x")).as("slope"),
        ((col("sy").cast("double") - (col("cov_n") / col("var_x")) * col("sx").cast("double")) / col("n").cast("double")).as("intercept"))
      .orderBy("flag")
  }

  /** q120 — transparent materialized-view rollup rewrite
    * ([[graft.plans.MvRollupRewrite]]): a (priority, year) summary of an
    * exact-cents orders fact is registered as the MV; the catalog query
    * then aggregates THE FACT by priority alone, and the optimizer rule
    * rewrites it to re-aggregate the summary's mergeable partials
    * (SUM→SUM of partial sums, COUNT→SUM of partial counts) — the spec
    * pins that the executed plan scans the MV parquet, not the fact.
    * The oracle computes from the raw table, so the hash match proves
    * the rewrite is semantics-preserving, not just plausible. Money is
    * staged as exact BIGINT cents so every sum is integer arithmetic. */
  val mvRewriteRollup: Q = (s, d) => {
    val factDir = scratchDir(s, "mv_fact")
    val mvDir = scratchDir(s, "mv_summary")
    table(s, d, "orders").select(
        col("o_orderpriority").as("prio"),
        year(col("o_orderdate")).cast("long").as("yr"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .write.mode("overwrite").parquet(factDir)
    s.read.parquet(factDir)
      .groupBy("prio", "yr")
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"))
      .write.mode("overwrite").parquet(mvDir)
    graft.plans.MvRegistry.register(graft.plans.MvRegistry.MvDef(
      factDir, mvDir, Set("prio", "yr"),
      Map("cents" -> "sum_cents"), "cnt"))
    graft.plans.MvRewrite.register(s)
    s.read.parquet(factDir)
      .groupBy("prio")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .orderBy("prio")
  }

  /** q122 — dynamic partition pruning over hive-layout parquet: the fact
    * lands partitioned by year, the filter lives only on the DIM side,
    * and Spark derives the fact's partition filter AT RUNTIME from the
    * broadcast build (`dynamicpruningexpression` in the scan's
    * PartitionFilters — spec-pinned). This is the disk-layout twin of
    * q68's DSv2 runtime filtering and q91's catalog partition pruning:
    * at 100 TB the star-join dashboard touches only the year directories
    * the dim filter selects, without the user ever writing a fact
    * predicate. */
  val dynamicPartitionPruning: Q = (s, d) => {
    val dir = scratchDir(s, "dpp_orders")
    table(s, d, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(dir)
    // directory-name inference types the partition column INT — the dim
    // joins at that type so the runtime filter lands on the raw column
    val dim = s.range(1990, 2000)
      .select(col("id").cast("int").as("yr"), (col("id") % 3).as("cls"))
    s.read.parquet(dir)
      .join(dim.filter(col("cls") === 1), Seq("yr"))
      .groupBy(col("yr").cast("long").as("yr"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("yr")
  }

  /** q124 — left-join elimination on a declared unique key
    * ([[graft.plans.JoinEliminationRewrite]]): the query left-joins the
    * customer dim "just in case" but only consumes order columns; with
    * `c_custkey` declared unique, the optimizer removes the join AND the
    * dim scan entirely (pk-unique ⇒ no row multiplication; outer ⇒ no
    * row loss). The oracle keeps the join spelling, so the hash match
    * proves the elimination preserves semantics; the spec pins a
    * join-free plan and that the inner-join / dim-referencing variants
    * keep their joins. */
  val joinElimination: Q = (s, d) => {
    val factDir = scratchDir(s, "je_orders")
    val dimDir = scratchDir(s, "je_customer")
    table(s, d, "orders").write.mode("overwrite").parquet(factDir)
    table(s, d, "customer").write.mode("overwrite").parquet(dimDir)
    graft.plans.UniqueKeyRegistry.register(dimDir, "c_custkey")
    graft.plans.JoinElimination.register(s)
    val fact = s.read.parquet(factDir)
    val dim = s.read.parquet(dimDir)
    fact.join(dim, fact("o_custkey") === dim("c_custkey"), "left")
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("prio")
  }

  /** q128 — TPC-H Q20 shape, the last classic decorrelation surface: a
    * semi join into `IN (… GROUP BY pair HAVING agg > correlated scalar
    * agg)` — suppliers shipping more than 1/6 of a hot part's total
    * quantity. The nested IN-over-correlated-agg decorrelates into two
    * aggregates of the SAME fact: per-(part,supplier) quantities
    * (restricted to hot parts), and per-part totals (over ALL lineitem —
    * the correlation is per part, not per hot pair), joined on the part
    * key; qualifying supplier keys then semi-join the supplier dim.
    *
    * Scale: the fact is scanned twice but shuffled only on its join/agg
    * keys (both aggregates are map-side combinable); per-part totals are
    * bounded by |part| (broadcast, the q112 discipline); the final semi
    * join carries distinct supplier keys only. Both thresholds are
    * cross-multiplied DECIMAL (`6·pair > part_total`; `price·n > Σprice`)
    * — exact on both engines, so boundary rows cannot flip (class doc).
    * "Hot" parts are those priced above the part table's own mean (a
    * second, global scalar subquery in the oracle — q115's 1-row-stats
    * broadcast here), which keeps the filter meaningful at every SF
    * (fixture price ranges scale with SF, a fixed cut does not). */
  val soleSupplierShare: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    val part = table(s, d, "part")
    val priceStats = part.agg(
      sum(col("p_retailprice").cast(Dec)).as("tot_price"),
      count(lit(1)).as("n_parts"))
    val hotParts = part.crossJoin(broadcast(priceStats))
      .filter(col("p_retailprice").cast(Dec) * col("n_parts") > col("tot_price"))
      .select(col("p_partkey"))
    val pairAgg = li.join(broadcast(hotParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(sum(col("l_quantity").cast(Dec)).as("pair_qty"))
    val partAgg = li
      .groupBy(col("l_partkey").as("pk2"))
      .agg(sum(col("l_quantity").cast(Dec)).as("part_qty"))
    val qualifying = pairAgg.join(broadcast(partAgg), col("pk") === col("pk2"))
      .filter(col("pair_qty") * lit(6) > col("part_qty"))
      .select(col("sk")).distinct()
    table(s, d, "supplier")
      .join(qualifying, col("s_suppkey") === col("sk"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy("s_suppkey")
  }

  /** q132 — TPC-H Q2 shape: the minimum-cost supplier. The fixtures carry
    * no `partsupp`, so lineitem plays the part-supplier cost table (the
    * correlated-MIN-across-a-multi-table-subquery shape is what's under
    * test, not the table name): for each small part, the European
    * supplier rows whose price equals the minimum European price for
    * that part — and the correlated subquery re-states the WHOLE
    * region-restricted join, Q2's defining subtlety.
    *
    * Decorrelated plan: region/nation/supplier collapse to one broadcast
    * dim (|supplier|-sized); the per-part MIN over European lineitems is
    * one map-side-combinable aggregate bounded by |part| and broadcast
    * back; the equality `price = min_price` joins on (partkey, price).
    * MIN of stored doubles is pure selection — no accumulation, so the
    * equality is bit-stable on both engines (class doc: only COMPUTED
    * doubles drift). The fact shuffles once (the MIN aggregate);
    * everything else is broadcast. */
  val minCostSupplier: Q = (s, d) => {
    val nation = table(s, d, "nation")
      .join(broadcast(table(s, d, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = table(s, d, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val euLi = table(s, d, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
    val minPerPart = euLi.groupBy(col("l_partkey").as("mpk"))
      .agg(min(col("l_extendedprice")).as("min_price"))
    val parts = table(s, d, "part").filter(col("p_size") <= 5)
      .select(col("p_partkey"), col("p_brand"))
    euLi.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(minPerPart),
        col("l_partkey") === col("mpk") &&
          col("l_extendedprice") === col("min_price"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("l_extendedprice").as("price"))
      .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"),
        col("price"))
      .limit(100)
  }

  /** q133 — TPC-H Q15 shape: the top-revenue supplier(s) of a quarter,
    * `revenue = (SELECT MAX(revenue) FROM revenue)` over a derived
    * aggregate view — the argmax-over-aggregate surface the catalog
    * lacked. Revenue accumulates in exact DECIMAL
    * (`Σ price·(1−disc)`, the q03 discipline) so the MAX-equality cannot
    * flip on summation order; only the output column is cast to double.
    * Scale: one map-side-combinable aggregate over the (date-pruned)
    * fact, bounded by |supplier|; the 1-row MAX broadcasts back (q115's
    * global-scalar pattern); supplier is a broadcast dim. */
  val topRevenueSupplier: Q = (s, d) => {
    val revenue = table(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1995-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(col("l_extendedprice").cast(Dec) *
        (lit(1).cast(Dec) - col("l_discount").cast(Dec))).as("rev_dec"))
    val maxRev = revenue.agg(max(col("rev_dec")).as("max_rev"))
    table(s, d, "supplier")
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(maxRev))
      .filter(col("rev_dec") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast(DecOut).cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** q137 — TPC-H Q7 shape (volume shipping): bilateral trade revenue
    * between two nations by ship year. The nation-pair predicate pushes
    * DOWN to the dim side before the fact is touched: supplier and
    * customer each join the 2-row filtered nation dim (broadcast), so
    * the fact joins already-restricted key sets. The one unavoidable
    * shuffle is lineitem ⋈ orders on the order key (both SF-scaled —
    * Q7's intrinsic cost); supplier/customer joins are declared plain
    * and AQE promotes them to broadcast when the filtered side fits,
    * the right call at every scale. */
  val volumeShipping: Q = (s, d) => {
    val pair = Seq("NATION_9", "NATION_6")
    val nat = table(s, d, "nation")
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey"), col("n_name"))
    val supp = table(s, d, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = table(s, d, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    table(s, d, "lineitem")
      .filter(year(col("l_shipdate")).between(1995, 1996))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(table(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** q138 — TPC-H Q8 shape (national market share): one nation's share
    * of a region's promo-part revenue by order year — the
    * conditional-aggregation ratio (`SUM(CASE …)/SUM(…)`) computed in
    * ONE pass over the joined fact. Both legs accumulate in exact
    * DECIMAL; each is cast to double independently and THEN divided, so
    * the quotient is the same correctly-rounded double on both engines
    * (dividing decimals directly would hit engine-specific decimal
    * division scales). Customer-region membership is a LEFT SEMI join —
    * customers filter orders, never multiply them. */
  val marketShare: Q = (s, d) => {
    val vol = col("l_extendedprice").cast(Dec) *
      (lit(1).cast(Dec) - col("l_discount").cast(Dec))
    val natAm = table(s, d, "nation")
      .join(broadcast(table(s, d, "region").filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cnk"))
    val cust = table(s, d, "customer")
      .join(broadcast(natAm), col("c_nationkey") === col("cnk"))
      .select(col("c_custkey"))
    val supp = table(s, d, "supplier")
      .join(broadcast(table(s, d, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name"))),
        col("s_nationkey") === col("snk"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    table(s, d, "lineitem")
      .join(broadcast(table(s, d, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_6", vol)
          .otherwise(lit(0).cast(Dec))).as("nation_dec"),
        sum(vol).as("all_dec"))
      .select(col("o_year"),
        (col("nation_dec").cast(DecOut).cast("double") /
          col("all_dec").cast(DecOut).cast("double")).as("mkt_share"),
        col("all_dec").cast(DecOut).cast("double").as("total_rev"))
      .orderBy("o_year")
  }

  /** q139 — INCREMENTAL materialized-view refresh: the rollup MV built
    * at fact version 1 is brought current by aggregating ONLY the
    * segments committed since (`VERSION AS OF '1..'` — q106's
    * manifest-arithmetic incremental read) and merging mergeable
    * partials (SUM+SUM, COUNT+COUNT) into the stored summary via a full
    * outer join on the grouping key. The refresh is priced at the NEW
    * data + |MV| — never a rescan of the fact — which is the entire
    * point of maintaining an MV at 100 TB: the nightly refresh costs the
    * day's delta. COUNT/SUM are self-mergeable; AVG would ship as
    * SUM+COUNT partials, MIN/MAX merge for inserts only — the standard
    * incremental-maintenance envelope (append-only deltas; a rewrite in
    * the range would route through q136's net-changes tier with
    * retractions). The oracle recomputes the rollup from scratch, so
    * hash equality IS the maintenance-correctness claim. */
  val incrementalMvRefresh: Q = (s, _) => {
    ensureGraftCatalog(s)
    val mvDir = scratchDir(s, "imv_summary")
    s.sql("DROP TABLE IF EXISTS graft_cat.db.imv_fact")
    s.sql("CREATE TABLE graft_cat.db.imv_fact (grp BIGINT, cents BIGINT)")
    s.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "3000").option("parts", "2").load()
      .createOrReplaceTempView("graft_seq_imv")
    s.sql(
      """INSERT INTO graft_cat.db.imv_fact
        |SELECT id % 16, v FROM graft_seq_imv WHERE id < 2000""".stripMargin)
    // full build at v1, persisted as the stored summary
    s.table("graft_cat.db.imv_fact")
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("cents_sum"))
      .write.mode("overwrite").parquet(mvDir)
    s.sql(
      """INSERT INTO graft_cat.db.imv_fact
        |SELECT id % 16, v FROM graft_seq_imv WHERE id >= 2000""".stripMargin)
    // refresh: aggregate the delta segments only, merge partials
    val delta = s.sql(
      "SELECT grp, cents FROM graft_cat.db.imv_fact VERSION AS OF '1..'")
      .groupBy("grp")
      .agg(count(lit(1)).as("d_cnt"), sum(col("cents")).as("d_sum"))
    s.read.parquet(mvDir)
      .join(delta, Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("cents_sum"), lit(0L)) + coalesce(col("d_sum"), lit(0L)))
          .as("cents_sum"))
      .orderBy("grp")
  }

  /** q140 — TPC-H Q19 shape: discounted revenue under a DISJUNCTIVE
    * join predicate — three OR'd conjunct groups, each tying a part
    * predicate (brand + size band) to a lineitem predicate (quantity
    * band). The planner stress Q19 is famous for: the OR must not force
    * a cartesian or row-by-row re-evaluation of the whole disjunction on
    * an unfiltered join. Spelled Spark-first: the join stays a plain
    * equi-join on the part key (broadcast — |part|-bounded), with the
    * disjunction as a post-join filter; Catalyst pushes the
    * derivable prefix (`l_quantity <= 36`, the OR of the bands' upper
    * bounds ∧ lower bounds) through to both scans via constraint
    * propagation, and the codegen'd filter evaluates the residual. */
  val brandRevenue: Q = (s, d) => {
    val li = table(s, d, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
    val part = table(s, d, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val joined = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
    val disj =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 36))
    joined.filter(disj)
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"),
        drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("brand")
  }

  /** q141 — TPC-H Q3 shape (shipping priority): top-10 highest-revenue
    * orders in one market segment, ordered before the cut date with at
    * least one lineitem still shipping after it. Customer is a pure
    * FILTER here — it contributes no output column, so it joins LEFT
    * SEMI (no row multiplication, the dim never widens the fact) and is
    * declared PLAIN: customer is SF-scaled, so the q137 doctrine applies
    * — AQE promotes the segment-filtered side to broadcast when it fits,
    * and falls back to a keyed shuffle when it doesn't, the right call
    * at every scale. The one intrinsic shuffle is li ⋈ orders. Both
    * date predicates push to their scans; the top-10 runs as
    * TakeOrderedAndProject (per-partition heaps, never a full sort).
    * Revenue is exact DECIMAL cast to double at the end, so the DESC
    * order and the hash are engine-stable. */
  val shippingPriority: Q = (s, d) => {
    val cut = lit("1998-01-01").cast("timestamp")
    val cust = table(s, d, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = table(s, d, "orders")
      .filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    table(s, d, "lineitem")
      .filter(col("l_shipdate") > cut)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        col("o_orderpriority").as("prio"))
      .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("odate"), col("prio"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q142 — TPC-H Q4 shape (order-priority checking): orders placed in
    * one quarter with at least one lineitem shipped after the order
    * date (the fixtures carry no commit/receipt dates — `l_shipdate >
    * o_orderdate` is the same correlated EXISTS surface). The EXISTS
    * decorrelates to a LEFT SEMI join whose condition mixes the equi
    * key with a non-equi residual — Spark keys the shuffle on the equi
    * part and evaluates the residual inside the join, so the plan
    * stays a keyed sort-merge/hash join, never a nested loop. The
    * quarter filter prunes orders before the join; lineitem ships only
    * its two join columns. */
  val orderPriorityCheck: Q = (s, d) => {
    val ord = table(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val li = table(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("prio")
  }

  /** q143 — TPC-H Q5 shape (local supplier volume): revenue from orders
    * where the customer and the supplier sit in the SAME nation of one
    * region. The region restriction reaches the fact through TWO dim
    * legs (customer's nation and supplier's nation) and the co-nation
    * predicate `c_nationkey = s_nationkey` correlates them — the join
    * graph is cyclic, the classic Q5 planner stress. Spelled so the
    * cycle closes on the cheapest edge: orders ⋈ customer carries the
    * customer's nation key onto the fact, lineitem ⋈ supplier carries
    * the supplier's; the equality then filters the already-joined rows
    * (codegen'd, no extra shuffle). Nation/region broadcast explicitly
    * (25/5 rows at any SF); customer/supplier are SF-scaled and so
    * declared plain — AQE promotes them while they fit (q137 doctrine).
    * The li ⋈ orders shuffle is Q5's intrinsic cost. */
  val localSupplierVolume: Q = (s, d) => {
    val natAsia = table(s, d, "nation")
      .join(broadcast(table(s, d, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val ord = table(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = table(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
    val supp = table(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    table(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(natAsia), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q144 — TPC-H Q6 shape (forecast revenue change): the pure
    * scan-filter-aggregate — no join at all, the query that measures
    * raw scan + predicate + map-side-combine throughput. All three
    * predicates push to the parquet scan (row-group skipping via
    * min/max on shipdate and quantity at scale); the aggregate is one
    * exact DECIMAL product-sum collapsing to a single row, so the
    * entire query is one WholeStageCodegen span over the scan with a
    * 1-row exchange at the end. The discount band compares the column
    * against the same double literals on both engines — bit-identical
    * parquet values, bit-identical comparison. */
  val forecastRevenue: Q = (s, d) => {
    table(s, d, "lineitem")
      .filter(year(col("l_shipdate")) === 1995 &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(Dec) * col("l_discount").cast(Dec))
        .cast(DecOut).cast("double").as("revenue"))
  }

  /** q145 — TPC-H Q9 shape (product-type profit): profit by supplier
    * nation and order year over a part-name-matched slice. The fixtures
    * carry no partsupp, so supply cost is restated as 40% of the part's
    * retail price — same join graph (part + supplier + lineitem +
    * orders + nation), same LIKE filter, same two-level rollup.
    * Determinism: money stages as exact BIGINT at 10⁻⁴-dollar
    * resolution (`cents·(100−disc_pct)` and `40·retail_cents·qty` are
    * both integer), the per-group sum stays integer, and only the final
    * division by 10⁴ is double — both engines perform the identical
    * correctly-rounded operation. At scale the LIKE prunes part BEFORE
    * the fact join; part/supplier are SF-scaled so their joins are
    * declared plain (AQE promotes the pruned sides while they fit —
    * q137 doctrine); orders joins on the order key (the one fact-sized
    * shuffle); nation (25 rows) broadcasts onto supplier. */
  val productTypeProfit: Q = (s, d) => {
    val redParts = table(s, d, "part")
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100, 0).cast("long").as("retail_cents"))
    val supp = table(s, d, "supplier")
      .join(broadcast(table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val profitU = // 1e-4 dollar units, exact integers
      round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long")) -
        lit(40L) * col("retail_cents") * col("l_quantity").cast("long")
    table(s, d, "lineitem")
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(table(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(profitU).cast("double") / lit(10000.0)).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** q146 — TPC-H Q11 shape (important stock): parts whose total
    * lineitem value exceeds 1.5× the per-part mean — the
    * GROUP BY … HAVING > (scalar subquery over the same aggregation)
    * surface (the fixtures carry no partsupp; lineitem extended price
    * stands in for supplycost·availqty, the threshold is
    * mean-relative so it stays meaningful at every SF). Spark-first:
    * the per-part aggregate computes ONCE, the global mean derives from
    * a 1-row re-aggregation OF THE AGGREGATE (|part|-sized input, not
    * the fact) broadcast back as a cross join, and the threshold is
    * cross-multiplied into exact DECIMAL (`2·v·n > 3·Σv`) so boundary
    * parts cannot flip between engines. */
  val importantParts: Q = (s, d) => {
    val perPart = table(s, d, "lineitem")
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(col("l_extendedprice").cast(Dec)).as("v_dec"))
    val stats = perPart.agg(
      sum(col("v_dec")).as("tot_v"), count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(stats))
      .filter(col("v_dec") * col("n_parts") * lit(2) > col("tot_v") * lit(3))
      .select(col("partkey"),
        col("v_dec").cast(DecOut).cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("partkey"))
  }

  /** q147 — TPC-H Q12 shape (shipping-mode priority counts): per
    * lineitem class, how many late-shipping rows carried critical vs
    * non-critical order priority — the conditional-count pivot
    * (`SUM(CASE WHEN …)`) over a fact-fact join. The fixtures carry no
    * ship mode or commit/receipt dates: return flag stands in for the
    * grouping and `l_shipdate > o_orderdate` for the lateness
    * predicate, which correlates the two tables so the filter runs
    * inside the join (post-join codegen), not on either scan. One
    * keyed shuffle (li ⋈ orders), both CASE legs accumulate in one
    * pass — Q12's defining property. */
  val priorityShipping: Q = (s, d) => {
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    table(s, d, "lineitem")
      .filter(year(col("l_shipdate")) === 1997)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(table(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .groupBy(col("l_returnflag").as("flag"))
      .agg(sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("flag")
  }

  /** q148 — TPC-H Q14 shape (promotion effect): promo revenue share of
    * one ship month, the single-row conditional-aggregation ratio. The
    * part type is a dim attribute, so the CASE leg needs the join —
    * declared plain (part is SF-scaled; AQE promotes it to broadcast
    * while it fits), the month filter prunes the fact
    * scan to ~1/n of its rows before the join, and both ratio legs
    * accumulate exact DECIMAL in the same pass. Division discipline:
    * each leg casts to double independently, then `100·promo/total`
    * evaluates left-to-right identically on both engines (the q138
    * rule) — dividing decimals directly would hit engine-specific
    * decimal-division scale rules. */
  val promoRevenue: Q = (s, d) => {
    val vol = col("l_extendedprice").cast(Dec) *
      (lit(1).cast(Dec) - col("l_discount").cast(Dec))
    table(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(table(s, d, "part").select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0).cast(Dec)))
          .as("promo_dec"),
        sum(vol).as("all_dec"))
      .select((lit(100.0) * col("promo_dec").cast(DecOut).cast("double") /
        col("all_dec").cast(DecOut).cast("double")).as("promo_revenue"))
  }

  /** q149 — TPC-H Q16 shape (parts/supplier relationship): distinct
    * supplier counts per (brand, type, size) bucket, excluding one
    * brand, a size whitelist, and suppliers on a complaint list — the
    * NOT IN + COUNT(DISTINCT) surface. The fixtures carry no partsupp;
    * the observed lineitem (part, supplier) pairs are the relationship.
    * NOT IN over a non-null key column decorrelates to a LEFT ANTI
    * join (the null-semantics hazard of NOT IN doesn't arise —
    * `s_suppkey` is a primary key; documented, not assumed). The part
    * predicates prune their side BEFORE the fact join (both part and
    * supplier are SF-scaled, so the joins are declared plain and AQE
    * promotes the pruned sides while they fit), and the distinct count
    * shuffles the already-deduplicated (bucket, supp) pairs, not raw
    * lineitem. */
  val supplierCounts: Q = (s, d) => {
    val buckets = table(s, d, "part")
      .filter(col("p_brand") =!= "Brand#21" &&
        col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complained = table(s, d, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    table(s, d, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(buckets, col("l_partkey") === col("p_partkey"))
      .join(complained, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** q165 — TPC-DS Q67 shape (rollup + per-group window top-k): the
    * DS-only planner surface TPC-H lacks — an Expand-fed aggregation
    * over ROLLUP(mfgr, brand, month) followed by a rank window PER
    * MFGR and a top-5 cut. One fact pass: Expand multiplies rows 4×
    * map-side, the aggregate combines partially before its single
    * exchange, and the window re-shuffles only the (tiny) aggregated
    * rollup. Every measure is an exact BIGINT sum and the rank order is
    * a TOTAL order (qty desc → gid → brand → month, nulls first
    * SPELLED OUT — Spark defaults nulls first, DuckDB nulls last), so
    * rank equals row_number and hashes are engine-stable. */
  val rollupWindowTopK: Q = (s, d) => {
    val li = table(s, d, "lineitem")
      .join(broadcast(table(s, d, "part")
        .select(col("p_partkey"), col("p_type"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(split(col("p_type"), " ").getItem(0).as("cat"), col("p_brand"),
        month(col("l_shipdate")).cast("long").as("mth"),
        col("l_quantity").cast("long").as("q"))
    val rolled = li.rollup(col("cat"), col("p_brand"), col("mth"))
      .agg(sum(col("q")).as("sum_qty"), grouping_id().as("gid"))
    val w = Window.partitionBy(col("cat"))
      .orderBy(col("sum_qty").desc, col("gid"),
        col("p_brand").asc_nulls_first, col("mth").asc_nulls_first)
    rolled.withColumn("rk", rank().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("cat"), col("p_brand").as("brand"),
        col("mth"), col("sum_qty"), col("gid"), col("rk"))
      .orderBy(col("cat").asc_nulls_first, col("rk"), col("gid"),
        col("brand").asc_nulls_first, col("mth").asc_nulls_first)
  }

  /** q166 — TPC-DS Q51 shape (two-stream cumulative full-outer): two
    * channels of one fact (returned vs kept lineitems) each aggregate
    * per (supplier-band, month), take a RUNNING cumulative window per
    * band, FULL OUTER join on the (band, month) grid — the join
    * coalesces the keys, exactly Q51's web⊕store spelling — and the
    * final per-band reduction counts months where the return cumulative
    * overtakes a quarter of the kept cumulative. Both windows partition
    * by the band (bounded key space at any SF), the full outer joins
    * two ALREADY-AGGREGATED month grids (≤ 12·bands rows), and all
    * arithmetic is exact BIGINT. */
  val cumulativeChannels: Q = (s, d) => {
    val li = table(s, d, "lineitem")
      .select(pmod(col("l_suppkey"), lit(50)).cast("long").as("k"),
        month(col("l_shipdate")).cast("long").as("mth"),
        col("l_quantity").cast("long").as("q"), col("l_returnflag"))
    def monthly(f: org.apache.spark.sql.Column, cum: String) = {
      val w = Window.partitionBy(col("k")).orderBy(col("mth"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.filter(f).groupBy(col("k"), col("mth"))
        .agg(sum(col("q")).as("mq"))
        .withColumn(cum, sum(col("mq")).over(w)).drop("mq")
    }
    val ret = monthly(col("l_returnflag") === "R", "cum_r")
    val kept = monthly(col("l_returnflag") =!= "R", "cum_k")
    ret.join(kept, Seq("k", "mth"), "full_outer")
      .groupBy(col("k"))
      .agg(count(when(col("cum_r") * 4 > col("cum_k"), 1)).as("n_over"),
        max(col("cum_r")).as("tot_r"), max(col("cum_k")).as("tot_k"))
      .orderBy("k")
  }

  /** q167 — TPC-DS Q64 shape (multi-pass self-joined aggregates): the
    * same fact aggregated in two time periods, the per-key aggregates
    * joined to each other (cross-year comparison), filtered on growth,
    * widened by a dim, and re-aggregated. Two fact passes each prune to
    * (orderkey, partkey, quantity) + a year-filtered orders join; the
    * self-join runs over |part|-bounded aggregates, not the fact; part
    * broadcasts. All-BIGINT arithmetic keeps re-aggregation exact
    * (doubles would lose determinism at the second sum). */
  val crossYearGrowth: Q = (s, d) => {
    val ord = table(s, d, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).as("yr"))
    val li = table(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").cast("long").as("q"))
    def yearAgg(y: Int, out: String) =
      li.join(ord.filter(col("yr") === y),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey")).agg(sum(col("q")).as(out))
    yearAgg(1996, "q96").join(yearAgg(1997, "q97"), Seq("l_partkey"))
      .filter(col("q97") > col("q96"))
      .join(broadcast(table(s, d, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_parts"), sum(col("q96")).as("tot96"),
        sum(col("q97")).as("tot97"))
      .orderBy("brand")
  }

  /** q170 — TPC-DS Q95 shape (reachability semi-joins): orders whose
    * lineitems reach ≥2 distinct suppliers (EXISTS over a fact
    * SELF-join — Q95's ws_wh CTE) and with NO returned lineitem
    * (NOT EXISTS), counted over a date window. The oracle keeps the
    * EXISTS / NOT EXISTS spelling; the Spark plan is the decorrelated
    * target — a left-semi self-join with a non-equi residual, an
    * order-grain distinct, then semi + anti joins onto orders. At scale
    * everything shuffles on the one natural key (orderkey): the
    * self-join moves a 2-column projection, the distincts are
    * |orders|-bounded, and no step is quadratic — the sibling check is
    * key-local. */
  val reachabilitySemiJoins: Q = (s, d) => {
    val li = table(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val a = li.select(col("l_orderkey").as("ak"), col("l_suppkey").as("asup"))
    val b = li.select(col("l_orderkey").as("bk"), col("l_suppkey").as("bsup"))
    val multiSupp = a.join(b,
        col("ak") === col("bk") && col("asup") =!= col("bsup"), "left_semi")
      .select(col("ak")).distinct()
    val returned = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("rk")).distinct()
    table(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .join(multiSupp, col("o_orderkey") === col("ak"), "left_semi")
      .join(returned, col("o_orderkey") === col("rk"), "left_anti")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(Dec)).cast(DecOut).cast("double")
          .as("tot_price"))
  }

  /** q171 — TPC-DS Q14 shape (cross-channel INTERSECT feeding a
    * scalar-threshold aggregate): items sold in ALL THREE channels
    * (INTERSECT chains — planned as distinct-aggregate + semi-joins),
    * then 1997 sales of those items per brand, kept only where the
    * brand's average quantity beats the GLOBAL average (Q14's
    * avg_sales scalar subquery). The global average is a 1-row
    * aggregate crossJoined back (broadcast), and the comparison is
    * cross-multiplied into exact BIGINT (`sum·g_n > g_sum·n`) so the
    * boundary can't flip between engines. The item set is
    * |part|-bounded at any SF → broadcast semi-join; the fact is
    * scanned once per channel projection and once for the year slice. */
  val crossChannelIntersect: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    def chan(f: String) =
      li.filter(col("l_returnflag") === f).select(col("l_partkey"))
    val crossItems = chan("A").intersect(chan("N")).intersect(chan("R"))
    val glob = li.agg(sum(col("l_quantity").cast("long")).as("g_sum"),
      count(lit(1)).as("g_n"))
    li.filter(year(col("l_shipdate")) === 1997)
      .join(broadcast(crossItems), Seq("l_partkey"), "left_semi")
      .join(broadcast(table(s, d, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(glob))
      .filter(col("sum_qty") * col("g_n") > col("g_sum") * col("n_rows"))
      .select(col("brand"), col("sum_qty"), col("n_rows"))
      .orderBy("brand")
  }

  /** q172 — TPC-DS Q78 shape (multi-channel FULL-OUTER ratios): the
    * un-returned fact (returns excluded by a LEFT ANTI join on the
    * composite line key — the oracle keeps Q78's LEFT JOIN … IS NULL
    * spelling) split into two channels by order priority, aggregated
    * per (year, part), FULL OUTER joined on that grid so single-channel
    * parts survive with NULL on the other side, then re-aggregated per
    * (year, brand) with COALESCE sums, per-side exclusive-part counts,
    * and an exact integer-percent ratio (BIGINT `div` — no double
    * division to drift). Both channel aggregates shuffle once on
    * (yr, partkey); the grid is |part|·|years|-bounded, so the full
    * outer join and everything after it is dimension-scale. */
  val multiChannelRatios: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    val returned = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("ro"), col("l_linenumber").as("rl"))
    val kept = li.join(returned,
      col("l_orderkey") === col("ro") && col("l_linenumber") === col("rl"),
      "left_anti")
    val ord = table(s, d, "orders").select(col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "u")
        .otherwise("s").as("chan"))
    val sales = kept.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("yr"), col("l_partkey"), col("chan"),
        col("l_quantity").cast("long").as("q"))
    def byChan(c: String, out: String) = sales.filter(col("chan") === c)
      .groupBy(col("yr"), col("l_partkey")).agg(sum(col("q")).as(out))
    val grid = byChan("u", "u_q")
      .join(byChan("s", "s_q"), Seq("yr", "l_partkey"), "full_outer")
    grid.join(broadcast(table(s, d, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("yr"), col("p_brand").as("brand"))
      .agg(sum(coalesce(col("u_q"), lit(0L))).as("urgent_q"),
        sum(coalesce(col("s_q"), lit(0L))).as("std_q"),
        count(when(col("s_q").isNull, 1)).as("urgent_only"),
        count(when(col("u_q").isNull, 1)).as("std_only"))
      .withColumn("ratio_pct", when(col("std_q") > 0,
        expr("(100 * urgent_q) div std_q")).otherwise(lit(null).cast("long")))
      .orderBy("yr", "brand")
  }

  /** q175 — TPC-DS Q88 shape (multi-band scalar-count battery): Q88
    * spells eight independent COUNT(*) scalar subqueries over disjoint
    * time bands of one fact, cross-joined into a single row. The
    * Spark-first plan collapses all eight into ONE fact pass of
    * conditional aggregates — one scan and one partial-agg exchange
    * instead of eight scans — while the oracle keeps Q88's
    * eight-subquery cross-join spelling, so hash equality IS the proof
    * that the one-pass rewrite preserves semantics. At 100 TB the
    * difference is 8× the dominant cost (the fact scan). */
  val multiBandCounts: Q = (s, d) => {
    val li = table(s, d, "lineitem")
      .filter(col("l_quantity") < 25)
      .select(month(col("l_shipdate")).as("mth"))
    li.agg(
      count(when(col("mth") === 1, 1)).as("c1"),
      count(when(col("mth") === 2, 1)).as("c2"),
      count(when(col("mth") === 3, 1)).as("c3"),
      count(when(col("mth") === 4, 1)).as("c4"),
      count(when(col("mth") === 5, 1)).as("c5"),
      count(when(col("mth") === 6, 1)).as("c6"),
      count(when(col("mth") === 7, 1)).as("c7"),
      count(when(col("mth") === 8, 1)).as("c8"))
  }

  /** q176 — TPC-DS Q36 shape (rollup + GROUPING-level rank): the
    * second DS-only rollup surface — where q165 ranks within a DATA
    * column, Q36 ranks within the HIERARCHY DEPTH: lochierarchy =
    * grouping(cat) + grouping(brand) partitions the window together
    * with a CASE over grouping(brand), so leaf rows rank inside their
    * category, category subtotals rank against each other, and the
    * grand total ranks alone. Expand feeds one aggregation (4× map-side
    * rows, one exchange); the window runs over the rollup output only.
    * All measures exact BIGINT; every order is total (rank ≡
    * row_number), nulls-first spelled out on both engines. */
  val rollupGroupingRank: Q = (s, d) => {
    val f = table(s, d, "lineitem")
      .join(broadcast(table(s, d, "part")
        .select(col("p_partkey"), col("p_type"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(split(col("p_type"), " ").getItem(0).as("cat"),
        col("p_brand").as("brand"), col("l_quantity").cast("long").as("q"))
    val rolled = f.rollup(col("cat"), col("brand"))
      .agg(sum(col("q")).as("sum_q"),
        grouping(col("cat")).cast("long").as("gcat"),
        grouping(col("brand")).cast("long").as("gbrand"))
      .withColumn("lh", col("gcat") + col("gbrand"))
    val w = Window
      .partitionBy(col("lh"), when(col("gbrand") === 0, col("cat")))
      .orderBy(col("sum_q").desc, col("cat").asc_nulls_first,
        col("brand").asc_nulls_first)
    rolled.withColumn("rk", rank().over(w).cast("long"))
      .select(col("cat"), col("brand"), col("sum_q"), col("lh"), col("rk"))
      .orderBy(col("lh").desc, col("cat").asc_nulls_first,
        col("brand").asc_nulls_first)
  }

  /** q177 — TPC-DS Q47 shape (moving-average outliers): the canonical
    * "three windows over one monthly aggregate" surface — a yearly
    * average computed OVER a (nation, year) partition, month-over-month
    * neighbors via lag/lead OVER the (nation) sequence, and a deviation
    * filter that only makes sense after both. One exchange produces the
    * monthly grain; every window reuses that partitioning (nation
    * prefix), so Spark plans the three window functions over ONE sort —
    * no second shuffle. The yearly average is spelled as exact integer
    * SUM/COUNT divided once in DOUBLE on both engines (never the
    * engines' own AVG accumulators), so the deviation filter is
    * IEEE-identical. */
  val movingAvgOutliers: Q = (s, d) => {
    val monthly = table(s, d, "lineitem")
      .join(broadcast(table(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast("long").as("y"),
        month(col("l_shipdate")).cast("long").as("m"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_q"))
    val wYear = Window.partitionBy("nation", "y")
    val wSeq = Window.partitionBy("nation").orderBy("y", "m")
    monthly
      .withColumn("avg_q",
        sum(col("sum_q")).over(wYear).cast("double") /
          count(lit(1)).over(wYear).cast("double"))
      .withColumn("psum", lag(col("sum_q"), 1).over(wSeq))
      .withColumn("nsum", lead(col("sum_q"), 1).over(wSeq))
      .filter(col("y") === 1997 &&
        abs(col("sum_q") - col("avg_q")) > col("avg_q") * 0.1)
      .select(col("nation"), col("m"), col("sum_q"), col("avg_q"),
        col("psum"), col("nsum"))
      .orderBy("nation", "m")
  }

  /** q179 — TPC-DS Q67 shape (windowed top-N over rollup partitions):
    * the third DS rollup surface — where q176 ranks by HIERARCHY DEPTH
    * and q165 within a data column, Q67 ranks EVERY rollup row of one
    * top-level partition together: a category's leaf cells
    * (brand, year), its brand subtotals AND its own total all compete
    * in ONE rank window ordered by the measure alone, ties share a
    * rank (rank(), not row_number — a brand sold in a single year TIES
    * its own subtotal, so ties are structural here, not accidental),
    * and rk ≤ 10 keeps whole tie groups. The all-up row ranks alone in
    * the NULL-category partition — the DS Q67 NULL-category
    * semantics. One expand (4× map-side rows) feeds one aggregation;
    * the window sorts only the rollup OUTPUT (grouping-cells scale,
    * not fact scale) — the plan that survives a 100× fact growth. */
  val rollupPartitionTopN: Q = (s, d) => {
    val f = table(s, d, "lineitem")
      .join(broadcast(table(s, d, "part")
        .select(col("p_partkey"), col("p_type"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(split(col("p_type"), " ").getItem(0).as("cat"),
        col("p_brand").as("brand"),
        year(col("l_shipdate")).cast("long").as("yr"),
        col("l_quantity").cast("long").as("q"))
    val rolled = f.rollup(col("cat"), col("brand"), col("yr"))
      .agg(sum(col("q")).as("sum_q"))
    val w = Window.partitionBy(col("cat")).orderBy(col("sum_q").desc)
    rolled.withColumn("rk", rank().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("cat"), col("brand"), col("yr"), col("sum_q"), col("rk"))
      .orderBy(col("cat").asc_nulls_first, col("brand").asc_nulls_first,
        col("yr").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "q179_rollup_partition_topn" -> rollupPartitionTopN,
    "q177_moving_avg_outliers" -> movingAvgOutliers,
    "q175_multi_band_counts" -> multiBandCounts,
    "q176_rollup_grouping_rank" -> rollupGroupingRank,
    "q170_reachability_semi" -> reachabilitySemiJoins,
    "q171_cross_channel_intersect" -> crossChannelIntersect,
    "q172_multi_channel_ratios" -> multiChannelRatios,
    "q165_rollup_window_topk" -> rollupWindowTopK,
    "q166_cumulative_channels" -> cumulativeChannels,
    "q167_cross_year_growth" -> crossYearGrowth,
    "q149_supplier_counts" -> supplierCounts,
    "q148_promo_revenue" -> promoRevenue,
    "q147_priority_shipping" -> priorityShipping,
    "q146_important_parts" -> importantParts,
    "q145_product_type_profit" -> productTypeProfit,
    "q144_forecast_revenue" -> forecastRevenue,
    "q143_local_supplier_volume" -> localSupplierVolume,
    "q142_order_priority_check" -> orderPriorityCheck,
    "q141_shipping_priority" -> shippingPriority,
    "q140_brand_revenue" -> brandRevenue,
    "q139_incremental_mv_refresh" -> incrementalMvRefresh,
    "q137_volume_shipping" -> volumeShipping,
    "q138_market_share" -> marketShare,
    "q132_min_cost_supplier" -> minCostSupplier,
    "q133_top_revenue_supplier" -> topRevenueSupplier,
    "q128_sole_supplier_share" -> soleSupplierShare,
    "q124_join_elimination" -> joinElimination,
    "q122_dynamic_partition_pruning" -> dynamicPartitionPruning,
    "q120_mv_rewrite" -> mvRewriteRollup,
    "q112_small_qty_revenue" -> smallQtyRevenue,
    "q113_order_count_distribution" -> orderCountDistribution,
    "q114_large_volume_customers" -> largeVolumeCustomers,
    "q115_idle_rich_customers" -> idleRichCustomers,
    "q116_corr_regression" -> corrRegression)

  val oracleSql: Map[String, String] = Map(
    // DS Q88: the oracle keeps the eight-scalar-subquery cross-join
    // spelling; the Spark side is ONE conditional-aggregate fact pass —
    // hash equality proves the collapse is semantics-preserving
    // DS Q47: yearly average = exact integer SUM/COUNT divided once in
    // DOUBLE on both engines; lag/lead over the same nation sequence
    "q179_rollup_partition_topn" ->
      """WITH f AS (
        |  SELECT string_split(p.p_type, ' ')[1] AS cat, p.p_brand AS brand,
        |         CAST(year(l.l_shipdate) AS BIGINT) AS yr,
        |         CAST(l.l_quantity AS BIGINT) AS q
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |r AS (
        |  SELECT cat, brand, yr, CAST(SUM(q) AS BIGINT) AS sum_q
        |  FROM f GROUP BY ROLLUP(cat, brand, yr)),
        |x AS (
        |  SELECT cat, brand, yr, sum_q,
        |    CAST(rank() OVER (PARTITION BY cat ORDER BY sum_q DESC)
        |      AS BIGINT) AS rk
        |  FROM r)
        |SELECT cat, brand, yr, sum_q, rk FROM x WHERE rk <= 10
        |ORDER BY cat ASC NULLS FIRST, brand ASC NULLS FIRST,
        |  yr ASC NULLS FIRST""".stripMargin,
    "q177_moving_avg_outliers" ->
      """WITH monthly AS (
        |  SELECT n.n_name AS nation,
        |         CAST(year(l.l_shipdate) AS BIGINT) AS y,
        |         CAST(month(l.l_shipdate) AS BIGINT) AS m,
        |         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_q
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT nation, y, m, sum_q,
        |    CAST(SUM(sum_q) OVER (PARTITION BY nation, y) AS DOUBLE)
        |      / CAST(COUNT(*) OVER (PARTITION BY nation, y) AS DOUBLE)
        |      AS avg_q,
        |    lag(sum_q) OVER (PARTITION BY nation ORDER BY y, m) AS psum,
        |    lead(sum_q) OVER (PARTITION BY nation ORDER BY y, m) AS nsum
        |  FROM monthly)
        |SELECT nation, m, sum_q, avg_q, psum, nsum
        |FROM w
        |WHERE y = 1997 AND abs(sum_q - avg_q) > avg_q * 0.1
        |ORDER BY nation, m""".stripMargin,
    "q175_multi_band_counts" ->
      """SELECT * FROM
        |(SELECT COUNT(*) AS c1 FROM lineitem WHERE month(l_shipdate) = 1 AND l_quantity < 25),
        |(SELECT COUNT(*) AS c2 FROM lineitem WHERE month(l_shipdate) = 2 AND l_quantity < 25),
        |(SELECT COUNT(*) AS c3 FROM lineitem WHERE month(l_shipdate) = 3 AND l_quantity < 25),
        |(SELECT COUNT(*) AS c4 FROM lineitem WHERE month(l_shipdate) = 4 AND l_quantity < 25),
        |(SELECT COUNT(*) AS c5 FROM lineitem WHERE month(l_shipdate) = 5 AND l_quantity < 25),
        |(SELECT COUNT(*) AS c6 FROM lineitem WHERE month(l_shipdate) = 6 AND l_quantity < 25),
        |(SELECT COUNT(*) AS c7 FROM lineitem WHERE month(l_shipdate) = 7 AND l_quantity < 25),
        |(SELECT COUNT(*) AS c8 FROM lineitem WHERE month(l_shipdate) = 8 AND l_quantity < 25)""".stripMargin,
    // DS Q36: rank partitioned by the GROUPING level (lochierarchy) and
    // a CASE over grouping(brand); total orders spelled out both sides
    "q176_rollup_grouping_rank" ->
      """WITH f AS (
        |  SELECT string_split(p.p_type, ' ')[1] AS cat, p.p_brand AS brand,
        |         CAST(l.l_quantity AS BIGINT) AS q
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |r AS (
        |  SELECT cat, brand, CAST(SUM(q) AS BIGINT) AS sum_q,
        |         CAST(GROUPING(cat) AS BIGINT) AS gcat,
        |         CAST(GROUPING(brand) AS BIGINT) AS gbrand
        |  FROM f GROUP BY ROLLUP(cat, brand)),
        |x AS (
        |  SELECT cat, brand, sum_q, gcat + gbrand AS lh,
        |    CAST(rank() OVER (
        |      PARTITION BY gcat + gbrand, CASE WHEN gbrand = 0 THEN cat END
        |      ORDER BY sum_q DESC, cat ASC NULLS FIRST, brand ASC NULLS FIRST)
        |      AS BIGINT) AS rk
        |  FROM r)
        |SELECT cat, brand, sum_q, lh, rk FROM x
        |ORDER BY lh DESC, cat ASC NULLS FIRST, brand ASC NULLS FIRST""".stripMargin,
    // DS Q95: the EXISTS spelling is kept — hash equality with the
    // left-semi self-join + anti-join plan is the decorrelation claim
    "q170_reachability_semi" ->
      """SELECT COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |    AS DECIMAL(38,4)) AS DOUBLE) AS tot_price
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l1 JOIN lineitem l2
        |      ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
        |    WHERE l1.l_orderkey = o_orderkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem lr
        |    WHERE lr.l_orderkey = o_orderkey AND lr.l_returnflag = 'R')""".stripMargin,
    // DS Q14: INTERSECT chain + global-average scalar, cross-multiplied
    // exact (group avg > global avg in BIGINT)
    "q171_cross_channel_intersect" ->
      """WITH cross_items AS (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |  INTERSECT SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
        |  INTERSECT SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
        |gstats AS (
        |  SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS g_sum,
        |    COUNT(*) AS g_n FROM lineitem)
        |SELECT p_brand AS brand,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey CROSS JOIN gstats
        |WHERE year(l_shipdate) = 1997
        |  AND l_partkey IN (SELECT l_partkey FROM cross_items)
        |GROUP BY 1, g_sum, g_n
        |HAVING SUM(CAST(l_quantity AS BIGINT)) * g_n > g_sum * COUNT(*)
        |ORDER BY brand""".stripMargin,
    // DS Q78: LEFT JOIN … IS NULL return-exclusion, per-channel
    // (yr, part) aggregates FULL JOINed, COALESCE re-aggregate, exact
    // integer-percent ratio
    "q172_multi_channel_ratios" ->
      """WITH returned AS (
        |  SELECT l_orderkey AS ro, l_linenumber AS rl
        |  FROM lineitem WHERE l_returnflag = 'R'),
        |kept AS (
        |  SELECT l.* FROM lineitem l LEFT JOIN returned r
        |    ON l.l_orderkey = r.ro AND l.l_linenumber = r.rl
        |  WHERE r.ro IS NULL),
        |sales AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, l_partkey,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 'u' ELSE 's' END AS chan,
        |    CAST(l_quantity AS BIGINT) AS q
        |  FROM kept JOIN orders ON l_orderkey = o_orderkey),
        |u AS (SELECT yr, l_partkey, CAST(SUM(q) AS BIGINT) AS u_q
        |  FROM sales WHERE chan = 'u' GROUP BY 1, 2),
        |st AS (SELECT yr, l_partkey, CAST(SUM(q) AS BIGINT) AS s_q
        |  FROM sales WHERE chan = 's' GROUP BY 1, 2),
        |grid AS (
        |  SELECT COALESCE(u.yr, st.yr) AS yr,
        |    COALESCE(u.l_partkey, st.l_partkey) AS l_partkey, u_q, s_q
        |  FROM u FULL JOIN st ON u.yr = st.yr AND u.l_partkey = st.l_partkey),
        |agg AS (
        |  SELECT yr, p_brand AS brand,
        |    CAST(SUM(COALESCE(u_q, 0)) AS BIGINT) AS urgent_q,
        |    CAST(SUM(COALESCE(s_q, 0)) AS BIGINT) AS std_q,
        |    CAST(SUM(CASE WHEN s_q IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS urgent_only,
        |    CAST(SUM(CASE WHEN u_q IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS std_only
        |  FROM grid JOIN part ON l_partkey = p_partkey GROUP BY 1, 2)
        |SELECT yr, brand, urgent_q, std_q, urgent_only, std_only,
        |  CASE WHEN std_q > 0 THEN CAST((100 * urgent_q) // std_q AS BIGINT)
        |    ELSE NULL END AS ratio_pct
        |FROM agg ORDER BY yr, brand""".stripMargin,
    // DS Q67: ROLLUP + rank-per-mfgr top 5; gid encodings agree (SQL
    // standard GROUPING bit order); null ordering spelled out on both
    // sides because the engines' defaults differ
    "q165_rollup_window_topk" ->
      """WITH base AS (
        |  SELECT split_part(p_type, ' ', 1) AS cat, p_brand,
        |    CAST(month(l_shipdate) AS BIGINT) AS mth,
        |    CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |rolled AS (
        |  SELECT cat, p_brand, mth, CAST(SUM(q) AS BIGINT) AS sum_qty,
        |    CAST(GROUPING(cat, p_brand, mth) AS BIGINT) AS gid
        |  FROM base GROUP BY ROLLUP (cat, p_brand, mth)),
        |ranked AS (
        |  SELECT *, CAST(RANK() OVER (PARTITION BY cat
        |    ORDER BY sum_qty DESC, gid, p_brand ASC NULLS FIRST,
        |      mth ASC NULLS FIRST) AS BIGINT) AS rk
        |  FROM rolled)
        |SELECT cat, p_brand AS brand, mth, sum_qty, gid, rk
        |FROM ranked WHERE rk <= 5
        |ORDER BY cat ASC NULLS FIRST, rk, gid, brand ASC NULLS FIRST,
        |  mth ASC NULLS FIRST""".stripMargin,
    // DS Q51: per-channel running cumulatives full-outer joined on the
    // coalesced (band, month) grid, then the overtake count per band
    "q166_cumulative_channels" ->
      """WITH li AS (
        |  SELECT l_suppkey % 50 AS k, CAST(month(l_shipdate) AS BIGINT) AS mth,
        |    CAST(l_quantity AS BIGINT) AS q, l_returnflag
        |  FROM lineitem),
        |ret AS (
        |  SELECT k, mth, CAST(SUM(SUM(q)) OVER (PARTITION BY k ORDER BY mth
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_r
        |  FROM li WHERE l_returnflag = 'R' GROUP BY k, mth),
        |kept AS (
        |  SELECT k, mth, CAST(SUM(SUM(q)) OVER (PARTITION BY k ORDER BY mth
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_k
        |  FROM li WHERE l_returnflag <> 'R' GROUP BY k, mth)
        |SELECT k, CAST(SUM(CASE WHEN cum_r * 4 > cum_k THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_over,
        |  MAX(cum_r) AS tot_r, MAX(cum_k) AS tot_k
        |FROM ret FULL JOIN kept USING (k, mth)
        |GROUP BY k ORDER BY k""".stripMargin,
    // DS Q64: two yearly per-part aggregates self-joined, growth filter,
    // dim widen, re-aggregate — all-BIGINT so the second sum is exact
    "q167_cross_year_growth" ->
      """WITH y96 AS (
        |  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q96
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) = 1996 GROUP BY 1),
        |y97 AS (
        |  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q97
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) = 1997 GROUP BY 1)
        |SELECT p_brand AS brand, COUNT(*) AS n_parts,
        |  CAST(SUM(q96) AS BIGINT) AS tot96, CAST(SUM(q97) AS BIGINT) AS tot97
        |FROM y96 JOIN y97 USING (l_partkey)
        |JOIN part ON l_partkey = p_partkey
        |WHERE q97 > q96
        |GROUP BY 1 ORDER BY brand""".stripMargin,
    // Q3: customer kept as a join in the oracle — it contributes no
    // column, so equality also proves the semi-join rewrite is sound
    // (c_custkey is unique, so the inner join cannot multiply rows)
    "q141_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(38,4))
        |    AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |  o_orderpriority AS prio
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 3, 4
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    // Q4: the correlated EXISTS SPELLING is kept — equality with the
    // mixed equi+non-equi LEFT SEMI plan is the decorrelation claim
    "q142_order_priority_check" ->
      """SELECT o_orderpriority AS prio, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q143_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(38,4))
        |    AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q144_forecast_revenue" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |    CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,4))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE year(l_shipdate) = 1995
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    // Q9: the profit expression restated in the same exact 1e-4-dollar
    // integer units (class doc) — only the final /10000 is double
    "q145_product_type_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
        |      (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) -
        |    40 * CAST(round(p_retailprice * 100, 0) AS BIGINT) *
        |      CAST(l_quantity AS BIGINT)) AS DOUBLE) / 10000.0
        |    AS sum_profit
        |FROM part, supplier, lineitem, orders, nation
        |WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |  AND p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    // Q11: HAVING-over-scalar-subquery SPELLING kept; threshold
    // cross-multiplied (2·v·n > 3·Σv ⟺ v > 1.5·mean) — exact DECIMAL
    "q146_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey AS partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS v
        |  FROM lineitem GROUP BY 1)
        |SELECT partkey, CAST(CAST(v AS DECIMAL(38,4)) AS DOUBLE)
        |    AS part_value
        |FROM pv
        |WHERE v * (SELECT COUNT(*) FROM pv) * 2 >
        |      (SELECT SUM(v) FROM pv) * 3
        |ORDER BY part_value DESC, partkey""".stripMargin,
    "q147_priority_shipping" ->
      """SELECT l_returnflag AS flag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE year(l_shipdate) = 1997 AND l_shipdate > o_orderdate
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // both ratio legs cast to double separately, then 100·a/b evaluated
    // left-to-right — the q138 engine-neutral division discipline
    "q148_promo_revenue" ->
      """SELECT 100.0 *
        |  CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,6)) *
        |         (1 - CAST(l_discount AS DECIMAL(18,6)))
        |    ELSE 0 END) AS DECIMAL(38,4)) AS DOUBLE) /
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(38,4))
        |    AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,
    // Q16: NOT IN SPELLING kept (s_suppkey is a non-null key, so the
    // NOT-IN-vs-anti-join null hazard does not arise — class doc)
    "q149_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#21'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // the disjunction kept verbatim in WHERE — the OR-of-conjuncts shape
    "q140_brand_revenue" ->
      """SELECT p_brand AS brand, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(38,4))
        |    AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 36)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // recomputed FROM SCRATCH over the full population — equality with
    // the delta-merged summary is the incremental-maintenance claim
    "q139_incremental_mv_refresh" ->
      """WITH t AS (
        |  SELECT r.range AS id, (r.range * 2654435761) % 1000 AS v
        |  FROM range(3000) r)
        |SELECT id % 16 AS grp, COUNT(*) AS cnt,
        |  CAST(SUM(v) AS BIGINT) AS cents_sum
        |FROM t GROUP BY 1 ORDER BY grp""".stripMargin,
    "q137_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(38,4))
        |    AS DOUBLE) AS revenue
        |FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |  AND c_custkey = o_custkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
        |    OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9'))
        |  AND year(l_shipdate) BETWEEN 1995 AND 1996
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // both ratio legs cast to double separately, then divided — the
    // engine-neutral spelling (class doc)
    "q138_market_share" ->
      """WITH base AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,6)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,6))) AS vol,
        |    n2.n_name AS supp_nation
        |  FROM lineitem, part, supplier, orders, customer,
        |    nation n1, nation n2, region
        |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND c_nationkey = n1.n_nationkey
        |    AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |    AND s_nationkey = n2.n_nationkey AND p_type = 'PROMO')
        |SELECT o_year,
        |  CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_6' THEN vol
        |                     ELSE 0 END) AS DECIMAL(38,4)) AS DOUBLE) /
        |  CAST(CAST(SUM(vol) AS DECIMAL(38,4)) AS DOUBLE) AS mkt_share,
        |  CAST(CAST(SUM(vol) AS DECIMAL(38,4)) AS DOUBLE) AS total_rev
        |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,
    // the Q2 correlated-MIN subquery SPELLING is kept, re-stating the
    // full region-restricted join inside the subquery — equality with
    // the broadcast-min plan is the decorrelation claim
    "q132_min_cost_supplier" ->
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |  l_extendedprice AS price
        |FROM part, supplier, lineitem, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size <= 5
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice)
        |    FROM lineitem l2, supplier s2, nation n2, region r2
        |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey
        |      AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, s_name, p_partkey, price
        |LIMIT 100""".stripMargin,
    // the Q15 view + MAX-scalar-subquery SPELLING is kept; revenue stays
    // DECIMAL through the MAX equality (class doc)
    "q133_top_revenue_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |        (1 - CAST(l_discount AS DECIMAL(18,6)))) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1995-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  CAST(CAST(rev AS DECIMAL(38,4)) AS DOUBLE) AS total_revenue
        |FROM supplier, revenue
        |WHERE s_suppkey = supplier_no
        |  AND rev = (SELECT MAX(rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    // the Q20 subquery SPELLING is kept — nested IN over a grouped HAVING
    // with a correlated per-part scalar aggregate; equality with the
    // explicit two-aggregate semi-join plan is the decorrelation claim
    "q128_sole_supplier_share" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l.l_suppkey FROM lineitem l
        |  WHERE l.l_partkey IN (
        |      SELECT p_partkey FROM part
        |      WHERE CAST(p_retailprice AS DECIMAL(18,6)) *
        |            (SELECT COUNT(*) FROM part)
        |          > (SELECT SUM(CAST(p_retailprice AS DECIMAL(18,6)))
        |             FROM part))
        |  GROUP BY l.l_suppkey, l.l_partkey
        |  HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,6))) * 6 >
        |    (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
        |     FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey))
        |ORDER BY s_suppkey""".stripMargin,
    // the join SPELLING is kept — equality proves the elimination
    "q124_join_elimination" ->
      """SELECT o_orderpriority AS prio, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |       AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM orders LEFT OUTER JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the dim filter restated as a direct fact predicate
    "q122_dynamic_partition_pruning" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |       AS DECIMAL(38,4)) AS DOUBLE) AS total
        |FROM orders WHERE year(o_orderdate) % 3 = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // computed from the RAW table — equality proves the MV rewrite
    "q120_mv_rewrite" ->
      """SELECT o_orderpriority AS prio, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |       AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // correlated scalar aggregates kept (COUNT + SUM per part) — DuckDB
    // decorrelates them; equality with the explicit broadcast-agg plan is
    // the claim. Cross-multiplied decimal predicate, see class doc.
    "q112_small_qty_revenue" ->
      """SELECT p_brand AS brand, COUNT(*) AS n_small,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
        |       AS DECIMAL(38,4)) AS DOUBLE) AS small_rev
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE CAST(l.l_quantity AS DECIMAL(18,6)) * 2 *
        |      (SELECT COUNT(*) FROM lineitem l2
        |       WHERE l2.l_partkey = l.l_partkey)
        |    < (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(18,6)))
        |       FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q113_order_count_distribution" ->
      """WITH co AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q114_large_volume_customers" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate, o_totalprice,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
        |       AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem GROUP BY 1
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q115_idle_rich_customers" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nk, COUNT(*) AS numcust,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
        |       AS DECIMAL(38,4)) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,6)) *
        |      (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
        |    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6)))
        |       FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical expression tree over exact BIGINT sufficient statistics —
    // see corrRegression scaladoc for why the builtins can't hash-match
    "q116_corr_regression" ->
      """WITH s AS (
        |  SELECT l_returnflag AS flag, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
        |    SUM(x*x) AS sxx, SUM(y*y) AS syy
        |  FROM (
        |    SELECT l_returnflag,
        |      CAST(l_quantity AS BIGINT) AS x,
        |      CAST(round(l_discount * 100, 0) AS BIGINT) AS y
        |    FROM lineitem)
        |  GROUP BY 1),
        |m AS (
        |  SELECT flag, n,
        |    CAST(n*sxy - sx*sy AS DOUBLE) AS cov_n,
        |    CAST(n*sxx - sx*sx AS DOUBLE) AS var_x,
        |    CAST(n*syy - sy*sy AS DOUBLE) AS var_y,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM s)
        |SELECT flag, n,
        |  cov_n / (sqrt(var_x) * sqrt(var_y)) AS corr_xy,
        |  cov_n / var_x AS slope,
        |  (syd - (cov_n / var_x) * sxd) / CAST(n AS DOUBLE) AS intercept
        |FROM m ORDER BY flag""".stripMargin)
}
