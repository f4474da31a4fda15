package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Scale-infrastructure proofs (SURVEY.md §4, the 100 TB design notes):
  * bucketed tables must eliminate the join shuffle; partitioned writes
  * must produce partition-pruned scans.
  */
class ScaleInfraSpec extends SparkTestBase {

  test("scan planning caches the manifest per write-epoch; commits invalidate") {
    import graft.sources.SegStore
    ops.configure(spark)
    ops.ensureGraftCatalog(spark)
    val ttlKey = "graft.manifest.cache.ttl.ms"
    val old = System.getProperty(ttlKey)
    System.setProperty(ttlKey, "600000") // isolate from wall-clock in CI
    try {
      spark.sql("DROP TABLE IF EXISTS graft_cat.db.mcache_t")
      spark.sql("CREATE TABLE graft_cat.db.mcache_t (id BIGINT, v BIGINT)")
      spark.sql(
        "INSERT INTO graft_cat.db.mcache_t SELECT id, id * 2 FROM range(100)")
      // warm: the first planning after the commit re-reads the manifest
      assert(spark.table("graft_cat.db.mcache_t").count() === 100L)

      // a 3-scan self-join plans THREE scans of one table; the epoch
      // hasn't moved, so the cached head serves all of them with ZERO
      // further manifest IO (the round-10 per-scan re-read, ADVICE'd as
      // repeated file IO under the table monitor, is gone)
      val r0 = SegStore.manifestReads.get()
      val n = spark.sql("SELECT count(*) AS n FROM graft_cat.db.mcache_t a " +
        "JOIN graft_cat.db.mcache_t b ON a.id = b.id " +
        "JOIN graft_cat.db.mcache_t c ON a.id = c.id").head.getLong(0)
      assert(n === 100L)
      assert(SegStore.manifestReads.get() === r0,
        "multi-scan planning re-read the manifest per scan")

      // any same-JVM commit bumps the write epoch: the next planning
      // re-reads exactly once and observes the new head immediately
      // (the §16.19 cross-instance freshness guarantee is preserved)
      spark.sql(
        "INSERT INTO graft_cat.db.mcache_t SELECT id + 100, id FROM range(50)")
      val r1 = SegStore.manifestReads.get()
      assert(spark.table("graft_cat.db.mcache_t").count() === 150L,
        "stale read served after a commit")
      assert(SegStore.manifestReads.get() === r1 + 1,
        "post-commit planning should re-read the manifest exactly once")
    } finally {
      if (old == null) System.clearProperty(ttlKey)
      else System.setProperty(ttlKey, old)
    }
  }

  test("bucketed co-located join runs without a shuffle on either side") {
    val li = ops.table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = ops.table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    // the in-memory catalog forgets tables across JVMs but their
    // spark-warehouse locations persist — clear both
    Seq("graft_li_b", "graft_ord_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_li_b")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_ord_b")

    val joined = spark.table("graft_li_b")
      .join(spark.table("graft_ord_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() === li.count()) // every lineitem has its order
  }

  test("heavy hitters: sketch aggregates object-hash-side; candidates broadcast") {
    val df = graft.ext.TextAnalysis.heavyHitters(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // pass 1: the MG Aggregator must run through partial/final
    // ObjectHashAggregate (map-side sketches, ≤ k counters per task)
    assert(plan.contains("ObjectHashAggregate"), s"no object-hash agg:\n$plan")
    // pass 2: the ≤ k candidates join back via broadcast, never a
    // vocabulary-sized shuffle of the stream
    assert(plan.contains("BroadcastExchange"), s"candidates not broadcast:\n$plan")
    assert(df.count() <= 64) // output is capped by sketch capacity
  }

  test("full-outer diff: join reuses the snapshots' aggregation partitioning") {
    val plan = graft.ops.Advanced.fullOuterDiff(spark, sf)
      .queryExecution.executedPlan.toString
    // one exchange per snapshot aggregate; the full-outer join keys on
    // the same column and must NOT add a third
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 2, s"expected 2 hash exchanges, got $n:\n$plan")
  }

  test("partitionBy write yields partition-pruned scans (PartitionFilters)") {
    val dir = Files.createTempDirectory("graft_part").toString
    ops.table(spark, sf, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("order_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*order_year".r.findFirstIn(plan).isDefined,
      s"no partition pruning:\n$plan")
    val expected = ops.table(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(pruned.count() === expected)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in plan)") {
    import spark.implicits._
    // one key holds ~all rows; thresholds forced down so the tiny test
    // shuffle still counts as skewed
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) =>
      k -> util.Try(Option(spark.conf.get(k))).toOption.flatten
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val skewed = spark.range(50000)
        .select(when(col("id") % 100 === 0, col("id")).otherwise(lit(0L)).as("k"),
          concat(lit("payload_payload_payload_"), col("id")).as("pad"))
      val other = spark.range(2000).select(col("id").as("k"), lit("x").as("v"))
      val joined = skewed.join(other, "k")
      joined.collect() // materialize THIS dataset's plan so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew-join split in final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("rank<=k filters plan as WindowGroupLimit (per-group top-k pushdown)") {
    // the ANN top-k queries filter row_number() <= k; Spark's
    // WindowGroupLimit rule must turn that into a per-group limit BEFORE
    // the full Window sort — at scale this keeps k rows per key per
    // partition flowing into the exchange instead of every scored pair
    val plan = ext.Similarity.bruteForceTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"top-k rank filter did not plan a WindowGroupLimit:\n$plan")
  }

  test("ngramJaccard dfCap: no-op cap equals exact; tight cap still answers") {
    val docs = ops.table(spark, sf, "documents")
    val nDocs = docs.count().toInt
    val full = ext.Dedup.ngramJaccard(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    // df can't exceed the doc count, so this cap drops nothing
    val noop = ext.Dedup.ngramJaccard(docs, dfCap = Some(nDocs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(noop.toSeq === full.toSeq)
    // a tight cap drops hot posting lists but the pipeline stays well-formed
    val capped = ext.Dedup.ngramJaccard(docs, dfCap = Some(2)).collect()
    assert(capped.length <= 20)
    capped.foreach(r => assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1))
  }

  test("containment dfCap: no-op cap equals exact; tight cap bounds fan-out") {
    val docs = ops.table(spark, sf, "documents")
    val nDocs = docs.count().toInt
    val full = ext.Dedup.containment(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    // df can't exceed the doc count, so this cap drops nothing
    val noop = ext.Dedup.containment(docs, dfCap = Some(nDocs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(noop.toSeq === full.toSeq)
    // a tight cap drops hot posting lists but the pipeline stays
    // well-formed, and every emitted containment is a valid ratio
    val capped = ext.Dedup.containment(docs, dfCap = Some(2)).collect()
    assert(capped.length <= 20)
    capped.foreach(r => assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1))
  }

  test("dynamic partition pruning engages on a partitioned fact join") {
    val dir = Files.createTempDirectory("graft_dpp").toString
    ops.table(spark, sf, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(dir)
    val fact = spark.read.parquet(dir)
    // selective dim: the fact's partition filter is only knowable at
    // runtime from the dim's surviving rows — exactly what DPP exists
    // for. The dim must be a real scan with a surviving Filter node (a
    // local relation constant-folds its filter away and the pruning rule
    // sees nothing selective to derive).
    val dim = ops.table(spark, sf, "orders")
      .select(year(col("o_orderdate")).as("y")).distinct()
      .filter(col("y").isin(1995, 1996))
    val joined = fact.join(dim, col("order_year") === col("y"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    val expected = ops.table(spark, sf, "orders")
      .filter(year(col("o_orderdate")).isin(1995, 1996)).count()
    assert(joined.count() === expected)
  }

  test("runtime bloom-filter join pruning injects on a selective join") {
    // row-level runtime filtering: the build side's keys become a bloom
    // filter applied at the probe side's scan — at 100 TB this skips the
    // shuffle for rows that can't join. Thresholds forced down so the
    // small test join qualifies.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) =>
      k -> util.Try(Option(spark.conf.get(k))).toOption.flatten
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = ops.table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      val hot = ops.table(spark, sf, "orders")
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      val joined = li.join(hot, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter in optimized plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANALYZE TABLE feeds CBO: stats visible to the planner") {
    spark.sql("DROP TABLE IF EXISTS graft_stats_t")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/graft_stats_t")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    ops.table(spark, sf, "nation").write.saveAsTable("graft_stats_t")
    spark.sql("ANALYZE TABLE graft_stats_t COMPUTE STATISTICS FOR ALL COLUMNS")
    // rowCount/column stats reach the planner only under CBO
    val saved = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("graft_stats_t").queryExecution.optimizedPlan.stats
      // row count + per-column stats are what cost-based join reordering
      // and broadcast decisions consume on a real warehouse
      assert(stats.rowCount.contains(BigInt(25)), s"stats: $stats")
      assert(stats.attributeStats.nonEmpty, "no column-level stats")
    } finally spark.conf.set("spark.sql.cbo.enabled", saved)
  }

  test("partial re-sort: only the DV'd segment rewrites; disjoint files survive by reference") {
    ops.configure(spark)
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.resort_t")
    spark.sql("CREATE TABLE graft_cat.db.resort_t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.sort'='k:4', 'graft.dml.mode'='merge-on-read', " +
      "'graft.autocompact'='4194304:4:20')")
    spark.sql("INSERT INTO graft_cat.db.resort_t " +
      "SELECT id, concat('v', id) FROM range(1000)")
    def liveFiles: Set[String] = spark.table("graft_cat.db.resort_t")
      .select(col("_file")).distinct().collect().map(_.getString(0)).toSet
    val initial = liveFiles
    assert(initial.size === 4, s"sorted insert should land 4 segments: $initial")

    // _file predicates prune EXACTLY to the named segment
    val one = initial.head
    spark.table("graft_cat.db.resort_t").filter(col("_file") === one).count()
    val (tbl, planned, total) = graft.sources.SegHooks.lastPlanned.get()
    assert(tbl.contains("resort_t") && planned === 1 && total === 4,
      s"_file equality did not prune: $planned/$total on $tbl")

    // DV every other row of the first TWO segments (boundaries read from
    // the table itself — the range partitioner's cut points are sampled,
    // not fixed): ~25% deleted crosses the 20% autocompact threshold at
    // the DELETE's own delta commit, the DVs touch exactly two segments,
    // and neither empties (a fully-deleted segment self-drops with no DV)
    val ranges = spark.table("graft_cat.db.resort_t")
      .groupBy(col("_file")).agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    val cut = ranges(1)._2
    spark.sql(s"DELETE FROM graft_cat.db.resort_t WHERE k % 2 = 0 AND k <= $cut")
    spark.sql("INSERT INTO graft_cat.db.resort_t VALUES (5000, 'tail')")
    val after = liveFiles
    val ops_ = spark.sql("SELECT operation FROM graft_cat.db.resort_t.versions")
      .collect().map(_.getString(0).split('@').head).toSeq
    assert(ops_.contains("zorder"), s"DV ratio never triggered a re-sort: $ops_")
    assert(!ops_.contains("compact"), s"sorted table byte-merged: $ops_")
    // the two untouched disjoint segments survive by FILE IDENTITY —
    // the rewrite cost O(DV'd region), not O(table)
    val survivors = initial.filter(after.contains)
    assert(survivors.size === 2,
      s"expected 2 untouched segments to survive by reference; " +
        s"initial=$initial after=$after")
    // content is exactly the live rows, DVs purged into the rewrite
    val got = spark.table("graft_cat.db.resort_t").select("k")
      .collect().map(_.getLong(0)).sorted
    val expect = (0L until 1000L).filterNot(k => k % 2 == 0 && k <= cut) :+ 5000L
    assert(got.toSeq === expect)
    // clustering intact: a key probe in an untouched range still prunes
    spark.table("graft_cat.db.resort_t").filter(col("k") === 600L).count()
    val (_, p2, t2) = graft.sources.SegHooks.lastPlanned.get()
    assert(p2 < t2, s"zone pruning lost after partial re-sort: $p2/$t2")
  }

  test("partial re-sort rebase: concurrent append survives; superseded cluster abandons") {
    ops.configure(spark)
    ops.ensureGraftCatalog(spark)
    def mkTable(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS graft_cat.db.$t")
      spark.sql(s"CREATE TABLE graft_cat.db.$t (k BIGINT, v STRING) " +
        "TBLPROPERTIES ('graft.sort'='k:4', 'graft.dml.mode'='merge-on-read', " +
        "'graft.autocompact'='4194304:4:20')")
      spark.sql(s"INSERT INTO graft_cat.db.$t " +
        "SELECT id, concat('v', id) FROM range(1000)")
    }
    def files(t: String): Set[String] = spark.table(s"graft_cat.db.$t")
      .select(col("_file")).distinct().collect().map(_.getString(0)).toSet
    def bounds(t: String): Seq[(Long, Long)] = spark.table(s"graft_cat.db.$t")
      .groupBy(col("_file")).agg(min("k"), max("k"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq

    // race A: an append lands between the rewrite and its publish — the
    // rebase must carry the appended segment through the swap untouched
    mkTable("resort_race_a")
    val hiA = bounds("resort_race_a")(1)._2
    graft.sources.SegHooks.beforeResortPublish.set(() =>
      spark.sql("INSERT INTO graft_cat.db.resort_race_a VALUES (7777, 'racer')"))
    try // the DELETE's own delta commit triggers the re-sort inline
      spark.sql("DELETE FROM graft_cat.db.resort_race_a " +
        s"WHERE k % 2 = 0 AND k <= $hiA")
    finally graft.sources.SegHooks.beforeResortPublish.set(() => ())
    val opsA = spark.sql(
      "SELECT operation FROM graft_cat.db.resort_race_a.versions")
      .collect().map(_.getString(0).split('@').head).toSeq
    assert(opsA.contains("zorder"), s"no re-sort: $opsA")
    val gotA = spark.table("graft_cat.db.resort_race_a").select("k")
      .collect().map(_.getLong(0)).sorted.toSeq
    val expectA =
      ((0L until 1000L).filterNot(k => k % 2 == 0 && k <= hiA) :+ 7777L).sorted
    assert(gotA === expectA, "racing append lost through the swap")

    // race B: a second DELETE changes one targeted segment's DV between
    // rewrite and publish — that cluster must be ABANDONED (its original
    // file stays live, both DVs intact); the untouched cluster still swaps
    mkTable("resort_race_b")
    val bs = bounds("resort_race_b")
    val (hi1, hi2) = (bs(0)._2, bs(1)._2)
    val before = files("resort_race_b")
    // only HALF of seg1's odd rows: a full wipe would make the delete
    // path drop the emptied segment outright (no DV left to supersede)
    graft.sources.SegHooks.beforeResortPublish.set(() =>
      spark.sql("DELETE FROM graft_cat.db.resort_race_b " +
        s"WHERE k % 2 = 1 AND k <= ${hi1 / 2}"))
    try spark.sql("DELETE FROM graft_cat.db.resort_race_b " +
      s"WHERE k % 2 = 0 AND k <= $hi2")
    finally graft.sources.SegHooks.beforeResortPublish.set(() => ())
    val after = files("resort_race_b")
    val gotB = spark.table("graft_cat.db.resort_race_b").select("k")
      .collect().map(_.getLong(0)).sorted.toSeq
    val expectB = (0L until 1000L)
      .filterNot(k => k % 2 == 0 && k <= hi2)
      .filterNot(k => k % 2 == 1 && k <= hi1 / 2)
    assert(gotB === expectB,
      "concurrent delete's rows resurrected by an applied stale rewrite")
    // identify the file now serving each key range
    val byLo = spark.table("graft_cat.db.resort_race_b")
      .groupBy(col("_file")).agg(min("k").as("lo"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    // the superseded cluster ABANDONED: the low range is still served by
    // the ORIGINAL segment (both DVs intact on it) …
    assert(before.contains(byLo.head._1),
      s"superseded cluster was swapped anyway: ${byLo.head}")
    // … while the untouched DV'd cluster SWAPPED to a rewrite output
    val seg2Server = byLo.find(p => p._2 > hi1 && p._2 <= hi2)
      .getOrElse(fail(s"no file serves (>$hi1, <=$hi2]: $byLo"))
    assert(!before.contains(seg2Server._1),
      s"untouched cluster failed to swap: $seg2Server in $before")
  }

  test("AQE coalesces shuffle partitions on small data") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    val agg = ops.table(spark, sf, "lineitem")
      .groupBy("l_returnflag").count()
    agg.collect()
    val finalPlan = agg.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead") || finalPlan.contains("isFinalPlan=true"),
      s"AQE did not engage:\n$finalPlan")
  }
}
