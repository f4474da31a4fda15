package graft

import org.apache.spark.sql.functions._

/** The custom DataSource V2 connector: split planning, column pruning
  * reaching the reader, and value correctness.
  */
class SourcesSpec extends SparkTestBase {

  private def seq(rows: Long, parts: Int) =
    spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("planInputPartitions exposes the configured parallelism") {
    assert(seq(1000, 8).rdd.getNumPartitions === 8)
    assert(seq(3, 8).rdd.getNumPartitions === 3) // never more splits than rows
  }

  test("column pruning reaches the reader (scan description shows the pruned set)") {
    val plan = seq(100, 2).select(col("v")).queryExecution.executedPlan.toString
    assert(plan.contains("pruned=[v]"), s"pruning did not reach the source:\n$plan")
    val both = seq(100, 2).queryExecution.executedPlan.toString
    assert(both.contains("pruned=[id,v]"), both)
  }

  test("id-range filters eliminate splits at the source") {
    // 1000 rows / 8 parts = 125-row splits; id < 250 must plan only 2
    val narrowed = seq(1000, 8).filter(col("id") < 250)
    assert(narrowed.rdd.getNumPartitions === 2,
      narrowed.queryExecution.executedPlan.toString)
    assert(narrowed.count() === 250)
    val plan = narrowed.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[0,250)"), plan)
    // two-sided bound, crossing split edges
    val band = seq(1000, 8).filter(col("id") >= 200 && col("id") <= 700)
    assert(band.rdd.getNumPartitions === 5)
    assert(band.count() === 501)
  }

  test("limit pushdown truncates the scan; declined when filters are pushed") {
    val limited = seq(1000, 8).limit(100)
    assert(limited.count() === 100)
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[0,100)"), s"limit did not reach the scan:\n$plan")
    assert(limited.rdd.getNumPartitions === 1) // one 125-row split, clipped
    // with a pushed filter the limit must NOT truncate the scan (Spark
    // re-evaluates the filter above it) — result still correct
    val both = seq(1000, 8).filter(col("id") >= 500).limit(100)
    assert(both.count() === 100)
    assert(both.queryExecution.executedPlan.toString.contains("bounds=[500,1000)"))
  }

  test("count/min/max push to the source: answered from metadata, no scan") {
    seq(50000, 8).createOrReplaceTempView("graft_seq_agg_spec")
    val agg = spark.sql(
      "SELECT COUNT(*) AS n, MIN(id) AS id_min, MAX(id) AS id_max FROM graft_seq_agg_spec")
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("AGG-PUSHED"), s"aggregate did not push:\n$plan")
    val row = agg.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === (50000L, 0L, 49999L))
    // with a pushed filter the aggregate must NOT push (scan-level answers
    // would ignore the re-evaluated filter) — result stays correct
    val filtered = spark.sql(
      "SELECT COUNT(*) AS n FROM graft_seq_agg_spec WHERE id >= 49000")
    assert(!filtered.queryExecution.executedPlan.toString.contains("AGG-PUSHED"))
    assert(filtered.collect().head.getLong(0) === 1000L)
  }

  test("sink overwrite truncates stale parts; reader sees only the manifest") {
    val dir = ops.scratchDir(spark, "sink_overwrite_spec")
    def write(rows: Int, parts: Int): Unit =
      seq(rows, parts).write.format("graft.sources.NdjsonSinkProvider")
        .option("path", dir).mode("overwrite").save()
    write(800, 8)
    write(100, 2) // narrower overwrite: part-00002..7 must NOT survive
    val manifest = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(dir, "_MANIFEST"))
      .toArray(Array.empty[String]).filter(_.nonEmpty)
    assert(manifest.length === 2, manifest.toSeq)
    val back = spark.read
      .schema(graft.sources.SeqSource.schema)
      .json(manifest.map(f => s"$dir/$f"): _*)
    assert(back.count() === 100)
    assert(back.agg(max(col("id"))).head().getLong(0) === 99L)
  }

  test("values are the documented function of id, exactly once each") {
    val rows = seq(257, 4).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === 257)
    assert(rows.map(_._1).sorted.toSeq === (0L until 257L))
    rows.foreach { case (id, v) => assert(v === (id * 2654435761L) % 1000L) }
  }

  test("reported statistics make the small source the broadcast side") {
    // SupportsReportStatistics: the post-pushdown estimate reaches the
    // optimizer (without it a v2 relation costs defaultSizeInBytes =
    // Long.MaxValue and can never auto-broadcast)
    val small = seq(500, 2)
    assert(small.queryExecution.optimizedPlan.stats.sizeInBytes
      < BigInt(10L * 1024 * 1024))
    val q67 = ops.SemiStructured.q67SourceStatsJoin(spark, sf)
    val plan = q67.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"source stats did not trigger a broadcast join:\n$plan")
    assert(q67.collect().length === 5) // groups 0..4 all populated
    // pushed filters shrink the estimate: stats reflect the planned range
    val narrowed = seq(100000, 8).filter(col("id") < 100)
    assert(narrowed.queryExecution.optimizedPlan.stats.sizeInBytes
      < BigInt(100000L * 16))
  }

  test("runtime (DPP-style) filtering narrows the planned splits") {
    graft.sources.SeqSource.lastRuntimeFilter.set(null)
    val q68 = ops.SemiStructured.q68SourceRuntimeFilter(spark, sf)
    val rows = q68.collect()
    // nation regions 0/1 at sf0.001: every surviving id is nationkey*7919
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(1)
      assert(id % 7919L === 0L)
      assert(r.getLong(2) === (id * 2654435761L) % 1000L)
    }
    val trace = graft.sources.SeqSource.lastRuntimeFilter.get()
    assert(trace != null, "runtime filter never reached the source")
    val (lo, hi, splits) = trace
    // nationkey 0 is in region 0, so lo legitimately stays 0; the upper
    // bound (max surviving nationkey * 7919 + 1) must have narrowed
    assert(hi < 200000L, s"upper bound not narrowed: [$lo,$hi)")
    assert(splits < 16, s"no split eliminated: $splits of 16 planned")
  }

  test("streaming sink: epoch-tagged manifest commits are idempotent") {
    val res = streaming.Streams.streamCustomSink(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expect = (0L until 8000L).map(id => (id % 7, (id * 2654435761L) % 1000L))
      .groupBy(_._1).map { case (g, xs) => g -> ((xs.size.toLong, xs.map(_._2).sum)) }
    assert(res === expect)
    // the manifest must show multiple epoch tags (a real multi-batch run)
    val dir = ops.scratchDir(spark, "dsv2_stream_sink")
    def manifest(): Seq[String] = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(dir, "_MANIFEST"))
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
    val before = manifest()
    val epochs = before.map(_.takeWhile(_ != ':')).distinct
    assert(epochs.length >= 2, s"expected multiple epochs, got $epochs")
    // replaying a committed epoch must not double-publish: manifest
    // unchanged, published file left in place
    val firstEpoch = epochs.head.drop(1).toLong
    val firstFile = before.head.drop(epochs.head.length + 1)
    val w = new graft.sources.NdjsonStreamingWrite(dir,
      graft.sources.SeqSource.schema)
    w.commit(firstEpoch, Array(graft.sources.NdjsonCommit(firstFile)))
    assert(manifest() === before, "replayed epoch commit changed the manifest")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, firstFile)))
    // an aborted replay of a committed epoch must also leave it intact
    w.abort(firstEpoch, Array(graft.sources.NdjsonCommit(firstFile)))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, firstFile)),
      "abort of a replayed epoch deleted published data")
  }

  test("sink-required distribution: files come out clustered and sorted") {
    assert(ops.SemiStructured.q74SinkDistribution(spark, sf).collect().length === 10)
    val dir = ops.scratchDir(spark, "dsv2_sink_clustered")
    val files = graft.sources.NdjsonManifest.committedFiles(dir)
    assert(files.length === 5, files) // requiredNumPartitions honored
    val gRe = """"g":(\d+)""".r
    val idRe = """"id":(\d+)""".r
    val perFileGs = files.map { f =>
      val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(f))
        .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
      val ids = lines.map(l => idRe.findFirstMatchIn(l).get.group(1).toLong)
      assert(ids === ids.sorted, s"ids not sorted within $f") // sortBy honored
      lines.map(l => gRe.findFirstMatchIn(l).get.group(1).toLong).toSet
    }
    // clustering: every g lives wholly in ONE file (sets are disjoint)
    val all = perFileGs.flatten
    assert(all.size === all.toSet.size, s"a cluster key spans files: $perFileGs")
  }

  test("storage-partitioned join: no exchange on either side of the join") {
    val q = ops.SemiStructured.q82StoragePartitionedJoin(spark, sf)
    val rows = q.collect()
    // values correct: inner join keeps ids 0..799999, 200k per id%4 group
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getLong(1) === 200000L)
      val g = r.getLong(0)
      val expect = (0L until 800000L).filter(_ % 4 == g)
        .map(id => 2L * ((id * 2654435761L) % 1000L)).sum
      assert(r.getLong(2) === expect)
    }
    // the executed (post-AQE) join must have no shuffle beneath it.
    // QueryStageExec is a LEAF node, so a plain collect stops at stage
    // boundaries — recurse through them explicitly
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
    val nodes = allNodes(plan)
    val joins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(joins.nonEmpty, s"no shuffled join found:\n$plan")
    joins.foreach { j =>
      val shuffles = allNodes(j).collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty,
        s"storage-partitioned join still shuffled:\n$j")
    }
  }

  test("bucketed scan: every id exactly once, b column consistent") {
    val df = spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "1000").option("buckets", "8").load()
    assert(df.rdd.getNumPartitions === 8)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 1000)
    assert(rows.map(_._1).sorted.toSeq === (0L until 1000L))
    rows.foreach { case (id, v, b) =>
      assert(v === (id * 2654435761L) % 1000L)
      assert(b === id % 8)
    }
    // pushed range filters still prune inside buckets
    val narrowed = df.filter(col("id") < 100)
    assert(narrowed.count() === 100)
  }

  test("custom catalog: DDL + insert round trip, delete-where pushed and guarded") {
    val r83 = ops.SemiStructured.q83CustomCatalog(spark, sf).collect()
    assert(r83.length === 6)
    assert(r83.map(_.getLong(1)).sum === 3000L)
    val kept = (0L until 2000L).map(id => (id, (id * 2654435761L) % 1000L))
      .filterNot { case (id, v) => id >= 1500 || v < 100 }
    val r84 = ops.SemiStructured.q84CatalogDelete(spark, sf).head()
    assert(r84.getLong(0) === kept.length.toLong)
    assert(r84.getLong(1) === kept.map(_._2).sum)
    // an untranslatable predicate can't push as a metadata delete — with
    // SupportsRowLevelOperations it falls back to the group-based rewrite
    // and still deletes exactly the matching rows
    spark.sql("DELETE FROM graft_cat.db.del_t WHERE id % 2 = 0")
    val keptOdd = kept.filterNot(_._1 % 2 == 0)
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.del_t")
      .head().getLong(0) === keptOdd.length.toLong)
    // rerun builds from scratch (DROP + CREATE) — idempotent catalog DDL
    assert(ops.SemiStructured.q84CatalogDelete(spark, sf).head().getLong(0)
      === kept.length.toLong)
    // catalog listing sees the tables
    val listed = spark.sql("SHOW TABLES IN graft_cat.db").collect()
      .map(_.getString(1)).toSet
    assert(listed.contains("seq_copy") && listed.contains("del_t"))
  }

  test("pushed DELETE honors SQL three-valued logic on NULL keys") {
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.null3vl")
    spark.sql("CREATE TABLE graft_cat.db.null3vl (id BIGINT, v BIGINT)")
    spark.sql(
      "INSERT INTO graft_cat.db.null3vl VALUES (1, 1), (2, 2), (3, NULL)")
    // NOT (v = 1): for the NULL row the comparison is UNKNOWN, NOT keeps
    // it UNKNOWN (not-true) => SQL retains the row. Two-valued compile
    // would delete it.
    spark.sql("DELETE FROM graft_cat.db.null3vl WHERE NOT (v = 1)")
    val left = spark.sql("SELECT id FROM graft_cat.db.null3vl ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(left === Seq(1L, 3L), s"NULL-keyed row must survive NOT-delete: $left")
    // a predicate over an unknown column is refused, not thrown:
    // analysis fails cleanly or the rewrite path handles it — either way
    // no IllegalArgumentException escapes canDeleteWhere
    spark.sql("DELETE FROM graft_cat.db.null3vl WHERE v IS NULL")
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.null3vl")
      .head().getLong(0) >= 1L)
    spark.sql("DROP TABLE graft_cat.db.null3vl")
  }

  test("DROP NAMESPACE without CASCADE on a non-empty namespace errors") {
    spark.sql("DROP TABLE IF EXISTS graft_cat.nsx.t1")
    spark.sql("CREATE TABLE graft_cat.nsx.t1 (id BIGINT)")
    val e = intercept[Exception] {
      spark.sql("DROP NAMESPACE graft_cat.nsx")
    }
    assert(e.getMessage.toLowerCase.contains("cascade")
      || e.getClass.getName.contains("NonEmptyNamespace"), e.toString)
    spark.sql("DROP NAMESPACE graft_cat.nsx CASCADE")
    assert(spark.sql("SHOW TABLES IN graft_cat.nsx").collect().isEmpty)
  }

  test("metadata column _split materializes per-split lineage on demand") {
    val rows = ops.SemiStructured.q85MetadataColumns(spark, sf).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val (split, n, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n === 2500L)
      assert(lo === split * 2500L && hi === split * 2500L + 2499L)
    }
    // unreferenced -> not in the scan (still a 2-column read)
    val plain = seq(100, 2)
    assert(plain.queryExecution.executedPlan.toString.contains("pruned=[id,v]"))
  }

  test("catalog function resolves and computes through the v2 FunctionCatalog") {
    val rows = ops.SemiStructured.q86CatalogFunction(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === (r.getLong(0) * 2654435761L) % 1000L)
    }
  }

  test("catalog time travel: every committed mutation is a readable version") {
    val rows = ops.SemiStructured.q87CatalogTimeTravel(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(rows("v1") === ((600L, 599L)))
    assert(rows("v2") === ((1000L, 999L)))
    assert(rows("v3") === ((800L, 799L)))
    assert(rows("latest") === rows("v3"))
    // a version that never existed is refused
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_cat.db.tt VERSION AS OF 99").collect()
    }
  }

  test("zorder rewrite: box result layout-independent, zone maps prune the 2-D box") {
    val rows = ops.SemiStructured.q151ZOrderCluster(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("rewrite") === ((4L, 8L)))
    assert(rows("box")._1 === 256L)
    // a fresh box scan after the rewrite plans ~1 of the 8 segments:
    // each rewritten segment is a Morton rectangle, so BOTH columns'
    // zone maps exclude it unless the box intersects its rectangle
    spark.sql(
      """SELECT SUM(v) FROM graft_cat.db.zo_t
        |WHERE a BETWEEN 0 AND 15 AND b BETWEEN 0 AND 15""".stripMargin).collect()
    val (tbl, kept, total) = graft.sources.SegHooks.lastPlanned.get()
    assert(tbl.contains("zo_t"), tbl)
    assert(total === 8, s"planned $kept/$total")
    assert(kept <= 2, s"box kept $kept of $total segments — not clustered")
    // pre-rewrite version still readable (files immutable, refs swapped)
    val v1 = spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.zo_t VERSION AS OF 1").head.getLong(0)
    assert(v1 === 4096L)
    // a declared single-column sort conflicts with z-order: refused
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.zs_t")
    spark.sql(
      """CREATE TABLE graft_cat.db.zs_t (a BIGINT, b BIGINT)
        |TBLPROPERTIES ('graft.sort' = 'a')""".stripMargin)
    val err = intercept[Exception] {
      spark.sql("CALL graft_cat.system.zorder('db.zs_t', 'a', 'b')").collect()
    }
    assert(err.getMessage.contains("graft.sort"), err.getMessage)
  }

  test("version tags: pin, survive appends, drop via UNSET, refuse bad names") {
    val rows = ops.SemiStructured.q152VersionTags(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("rel1") === 1500L)
    assert(rows("latest") === 3000L)
    // tagging an explicit historical version works too
    spark.sql("CALL graft_cat.system.tag('db.tag_t', 'empty', 0)")
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.tag_t VERSION AS OF 'empty'")
      .head.getLong(0) === 0L)
    // dropping the ref makes the name unresolvable (data untouched)
    spark.sql("ALTER TABLE graft_cat.db.tag_t UNSET TBLPROPERTIES ('graft.tag.rel1')")
    val gone = intercept[Exception] {
      spark.sql("SELECT COUNT(*) FROM graft_cat.db.tag_t VERSION AS OF 'rel1'")
        .collect()
    }
    assert(gone.getMessage.contains("graft.tag.rel1"), gone.getMessage)
    // numeric names would shadow version numbers; nonexistent versions
    // cannot be pinned
    intercept[Exception](
      spark.sql("CALL graft_cat.system.tag('db.tag_t', '7')").collect())
    intercept[Exception](
      spark.sql("CALL graft_cat.system.tag('db.tag_t', 'nope', 99)").collect())
  }

  test("auto-compaction: trips at minFiles, anti-thrash guard, ledger accurate") {
    val rows = ops.SemiStructured.q154AutoCompact(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("files") === 3L)     // 4->1 compact, then two appends
    assert(rows("op_compact") === 1L)
    assert(rows("rows") === 3000L)
    // the 7th insert brings the small-file count back to 4: trips again
    spark.sql(
      """INSERT INTO graft_cat.db.ac_t
        |SELECT id + 3000, v FROM graft_seq_ac WHERE id < 500""".stripMargin)
    val after = spark.sql(
      """SELECT COUNT(*) AS files,
        |  (SELECT COUNT(*) FROM graft_cat.db.ac_t.versions
        |   WHERE operation = 'compact') AS compacts
        |FROM graft_cat.db.ac_t.files""".stripMargin).head
    assert(after.getLong(0) === 1L, s"files=${after.getLong(0)}")
    assert(after.getLong(1) === 2L)
    // row population intact through both compactions
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.ac_t")
      .head.getLong(0) === 3500L)
  }

  test("erasure pipeline: expired history unreadable, original segment gone") {
    val rows = ops.SemiStructured.q155ErasurePipeline(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("rows")._1 === 1750L)
    assert(rows("expire") === ((3L, 1L)))
    // history is GONE: the pre-delete snapshot can no longer be read —
    // that is the point of the erasure (vs rollback, which preserves it)
    intercept[Exception] {
      spark.sql("SELECT COUNT(*) FROM graft_cat.db.er_t VERSION AS OF 2")
        .collect()
    }
    // and the deleted rows are not reachable at ANY remaining version
    val vs = spark.sql("SELECT v FROM graft_cat.db.er_t.versions")
      .collect().map(_.getLong(0))
    vs.foreach { v =>
      val n = spark.sql(
        s"SELECT COUNT(*) FROM graft_cat.db.er_t VERSION AS OF $v WHERE id < 250")
        .head.getLong(0)
      assert(n === 0L, s"version $v still exposes erased rows")
    }
    // physically: only the two live segment files remain in the table dir
    val tdir = new java.io.File(
      sys.props("java.io.tmpdir") + "/graft_warehouse/graft_cat/db.er_t")
    assert(tdir.isDirectory, tdir.toString)
    val segs = tdir.listFiles().count(_.getName.startsWith("seg-"))
    assert(segs === 2, s"expected 2 live segment files, found $segs")
  }

  test("string zone maps: eq and range predicates prune whole segments") {
    val rows = ops.SemiStructured.q156StringPrune(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("eq") === 1000L)
    assert(rows("range") === 2000L)
    // equality plans exactly the one tenant segment
    spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.sz_t WHERE src = 'tenant_2'").collect()
    val (t1, kept1, total1) = graft.sources.SegHooks.lastPlanned.get()
    assert(t1.contains("sz_t") && total1 === 4 && kept1 === 1,
      s"eq planned $kept1/$total1")
    // the range predicate keeps the upper two tenants
    spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.sz_t WHERE src >= 'tenant_2'").collect()
    val (_, kept2, _) = graft.sources.SegHooks.lastPlanned.get()
    assert(kept2 === 2, s"range planned $kept2")
    // a value absent from every bloom prunes everything
    spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.sz_t WHERE src = 'zzz'").collect()
    val (_, kept3, _) = graft.sources.SegHooks.lastPlanned.get()
    assert(kept3 === 0, s"miss planned $kept3")
    // prefix ties stay indefinite: 9-char-sharing strings never let the
    // zone claim a definite verdict the suffix could overturn — rows
    // whose first 8 bytes tie ('tenant_2' vs a hypothetical longer key)
    // still read correctly through an inequality
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.sz_t WHERE src > 'tenant_1zzzz'")
      .head.getLong(0) === 2000L)
    // compaction keeps string stats only when every input has them:
    // merge the four segments and re-check pruning still works (all
    // inputs are new-writer segments, so stats survive the merge)
    spark.sql("CALL graft_cat.system.compact('db.sz_t', 1073741824)")
    spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.sz_t WHERE src = 'zzz'").collect()
    val (_, kept4, total4) = graft.sources.SegHooks.lastPlanned.get()
    assert(total4 === 1 && kept4 === 0, s"post-compact $kept4/$total4")
  }

  test("CTAS routes partitions during the create; RTAS fully supersedes") {
    val rows = ops.SemiStructured.q157Ctas(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("ctas_g2")._1 === 750L)
    assert(rows("rtas")._1 === 500L)
    // the CTAS'd identity partitioning prunes at planning like any
    // declared-partition table: g = 2 keeps only g=2's segments
    spark.sql("SELECT COUNT(*) FROM graft_cat.db.ct_t WHERE g = 2").collect()
    val (t, kept, total) = graft.sources.SegHooks.lastPlanned.get()
    assert(t.contains("ct_t"), t)
    assert(kept < total, s"planned $kept/$total — partition filter did not prune")
    // RTAS replaced the SCHEMA too (v -> w)
    val cols = spark.table("graft_cat.db.ct_r").schema.fieldNames.toSeq
    assert(cols === Seq("id", "w"), cols.toString)
  }

  test("string sort order: shuffled ingest lands range-clustered, zones prune") {
    val rows = ops.SemiStructured.q158SortedStringWrite(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("low") > 0 && rows("mid") > 0)
    // the declared sort produced 4 disjoint lexicographic ranges: a
    // range predicate on the sort key plans a strict subset
    spark.sql("SELECT COUNT(*) FROM graft_cat.db.ss_t WHERE k < 'k1000'").collect()
    val (t, kept, total) = graft.sources.SegHooks.lastPlanned.get()
    assert(t.contains("ss_t"), t)
    assert(total === 4 && kept < 4, s"planned $kept/$total")
    // segments' prefix zones are disjoint (each task owned a range)
    val segs = spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.ss_t.files").head.getLong(0)
    assert(segs === 4L)
  }

  test("write-audit-publish: failed batch rolled back, published ref stable") {
    val rows = ops.SemiStructured.q159WriteAuditPublish(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // published == final: the bad batch never became visible state
    assert(rows("published") === rows("final"))
    assert(rows("audits")._1 === 0L)    // batch 1 clean
    assert(rows("audits")._2 > 0L)      // batch 2 violated the policy
    // the ledger narrates the episode: append, tag, append, rollback
    val ops2 = spark.sql(
      """SELECT operation, COUNT(*) FROM graft_cat.db.wap_t.versions
        |GROUP BY operation""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops2("append") === 2L)
    assert(ops2("tag") === 1L)
    assert(ops2("rollback") === 1L)
  }

  test("zorder on a STRING column: prefix buckets cluster, content invariant") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.zstr_t")
    spark.sql("CREATE TABLE graft_cat.db.zstr_t (k STRING, v BIGINT)")
    // scattered ingest: 4 segments, each spanning the whole key domain
    spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "4000").option("parts", "4").load()
      .createOrReplaceTempView("graft_seq_zstr")
    spark.sql(
      """INSERT INTO graft_cat.db.zstr_t
        |SELECT concat('t', lpad(CAST((id * 2654435761) % 64 AS STRING), 2, '0')),
        |       id
        |FROM graft_seq_zstr""".stripMargin)
    val before = spark.sql(
      "SELECT COUNT(*) AS n, SUM(v) AS s FROM graft_cat.db.zstr_t").head
    spark.sql("CALL graft_cat.system.zorder('db.zstr_t', 'k', 'v', 8)")
    // layout-only: population identical
    val after = spark.sql(
      "SELECT COUNT(*) AS n, SUM(v) AS s FROM graft_cat.db.zstr_t").head
    assert(before === after)
    // the string axis is now clustered: a low-key range predicate prunes
    spark.sql("SELECT COUNT(*) FROM graft_cat.db.zstr_t WHERE k < 't10'").collect()
    val (t, kept, total) = graft.sources.SegHooks.lastPlanned.get()
    assert(t.contains("zstr_t"), t)
    assert(total === 8 && kept < total, s"planned $kept/$total")
  }

  test("rollback restores content as a new version; history stays travelable") {
    val rows = ops.SemiStructured.q153Rollback(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("restored") === 2000L)
    assert(rows("op_rollback") === 1L)
    // the deleted state (v3) is STILL readable — rollback appends, never
    // rewrites history
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.rb_t VERSION AS OF 3")
      .head.getLong(0) === 500L)
    // rolling back the rollback re-deletes: back to v3's content
    spark.sql("CALL graft_cat.system.rollback('db.rb_t', 3)")
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.rb_t")
      .head.getLong(0) === 500L)
    // rolling back to the current head (or later) is refused
    intercept[Exception](
      spark.sql("CALL graft_cat.system.rollback('db.rb_t', 5)").collect())
    intercept[Exception](
      spark.sql("CALL graft_cat.system.rollback('db.rb_t', 99)").collect())
  }

  test("timestamp travel: commit stamps are strictly monotonic, AS OF lands exactly") {
    val rows = ops.SemiStructured.q150TimestampTravel(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("asof_v1")._1 === 1200L)
    assert(rows("latest")._1 === 2400L)
    // the manifest's commit stamps strictly increase (the property that
    // makes AS OF <commit ts of v> resolve to v, never a later commit)
    val ts = spark.sql("SELECT ts_ms FROM graft_cat.db.tt_t.versions ORDER BY v")
      .collect().map(_.getLong(0))
    assert(ts.length === 3) // v0 create, v1, v2
    assert(ts.sliding(2).forall { case Array(a, b) => a < b })
    // asking for an instant before the table existed is refused
    val err = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft_cat.db.tt_t TIMESTAMP AS OF timestamp_millis(${ts.head - 1})")
        .collect()
    }
    assert(err.getMessage.contains("no version committed at or before"),
      err.getMessage)
    // an instant between v1 and v2 still sees exactly v1
    val mid = spark.sql(
      s"SELECT COUNT(*) FROM graft_cat.db.tt_t TIMESTAMP AS OF timestamp_millis(${ts(1)})")
      .head.getLong(0)
    assert(mid === 1200L)
  }

  test("row-level UPDATE and MERGE rewrite and commit atomically") {
    val upd = ops.SemiStructured.q88CatalogUpdate(spark, sf).head()
    assert(upd.getLong(0) === 1000L)
    assert(upd.getLong(2) === 300L) // id % 10 in {0,1,2}
    val expectedSum = (0L until 1000L).map { id =>
      val v = (id * 2654435761L) % 1000L
      if (id % 10 < 3) v + 1000L else v
    }.sum
    assert(upd.getLong(1) === expectedSum)
    val mrg = ops.SemiStructured.q89CatalogMerge(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def bandSum(lo: Long, hi: Long, bump: Long) =
      (lo until hi).map(id => (id * 2654435761L) % 1000L + bump).sum
    assert(mrg(0L) === ((500L, bandSum(0, 500, 0))))       // untouched
    assert(mrg(1L) === ((500L, bandSum(500, 1000, 5000)))) // matched-updated
    assert(mrg(2L) === ((500L, bandSum(1000, 1500, 5000))))// inserted
  }

  test("Trigger.AvailableNow drains the source in rate-limited batches and stops") {
    val rows = streaming.Streams.availableNowDrain(spark, sf).collect()
    val expect = (0L until 20000L).map(id => (id % 4, (id * 2654435761L) % 1000L))
      .groupBy(_._1).map { case (g, xs) => g -> ((xs.size.toLong, xs.map(_._2).sum)) }
    val got = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect)
  }

  test("time travel: epoch snapshots are consistent prefixes of the manifest") {
    streaming.Streams.sinkTimeTravel(spark, sf).collect() // drives the stream
    val dir = ops.scratchDir(spark, "dsv2_time_travel")
    val snap0 = graft.sources.NdjsonManifest.committedFiles(dir, Some(0L))
    val snap1 = graft.sources.NdjsonManifest.committedFiles(dir, Some(1L))
    val all = graft.sources.NdjsonManifest.committedFiles(dir, None)
    assert(snap0.nonEmpty && snap0.toSet.subsetOf(snap1.toSet))
    assert(snap1.toSet.subsetOf(all.toSet) && snap1.length < all.length)
    val s0 = spark.read.schema(graft.sources.SeqSource.schema).json(snap0: _*)
    assert(s0.count() === 2000) // exactly the first admitted range
    assert(s0.agg(max(col("id"))).head().getLong(0) === 1999L)
  }

  test("ALTER TABLE evolves schema without rewriting a single segment") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    val rows = ops.SemiStructured.q90CatalogAlter(spark, sf).collect()
    assert(rows.length === 5)
    def mm(lo: Long, hi: Long) = (lo until hi).map(id => (id * 2654435761L) % 1000L).sum
    rows.foreach { r =>
      val band = r.getLong(0)
      assert(r.getLong(1) === 500L)
      assert(r.getLong(2) === mm(band * 500, band * 500 + 500))
      // w: NULL for pre-evolution rows, id*3 after
      if (band < 2) assert(r.isNullAt(3))
      else assert(r.getLong(3) === (band * 500 until band * 500 + 500).map(_ * 3L).sum)
      assert(r.getLong(4) === 500L * 7) // existence default everywhere
    }
    // metadata-only: every segment that existed before the ALTERs is
    // still referenced, byte-identical, in the final version
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[TableCatalog]
    val t = cat.loadTable(Identifier.of(Array("db"), "alt_t"))
      .asInstanceOf[graft.sources.SegTable]
    assert(t.currentVersion === 6L) // 3 inserts + 3 alters after create(v0)
    // source split pruning means single-split inserts write ONE segment:
    // insert1 (id<1000) → 1, insert2 (1000..1999 spans splits) → 2,
    // insert3 (id>=2000) → 1; all three schema generations coexist
    assert(t.currentSegs.map(_.colIds.length).sorted === Seq(2, 3, 3, 4))
  }

  test("partitioned catalog table: IN-filter prunes whole segments at planning") {
    val rows = ops.SemiStructured.q91CatalogPartitioned(spark, sf).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val g = r.getLong(0)
      assert(r.getLong(1) === 500L)
      assert(r.getLong(2) === (0L until 4000L).filter(_ % 8 == g)
        .map(id => (id * 2654435761L) % 1000L).sum)
    }
    // 4 write tasks x 8 partition values = 32 segments; g IN (2,5) keeps 8
    val (tbl, kept, total) = graft.sources.SegHooks.lastPlanned.get()
    assert(tbl.contains("part_t"), tbl)
    assert(total === 32 && kept === 8, s"planned $kept/$total")
  }

  test("days/bucket partition transforms route and prune (q104)") {
    val rows = ops.SemiStructured.q104CatalogTransforms(spark, sf).collect()
    assert(rows.length === 2)
    def v(id: Long) = (id * 2654435761L) % 1000L
    val byPart = rows.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byPart("days") === ((96L, (480L until 576L).map(v).sum)))
    assert(byPart("bucket") === ((3L, Seq(100L, 2075L, 3999L).map(v).sum)))

    // days(ts): the 2-day window keeps exactly its 2 day-segments out of
    // 84 days + 3 task-boundary splits (4 contiguous write tasks over a
    // 30-min grid, 48 rows/day)
    spark.sql(
      """SELECT COUNT(*) FROM graft_cat.db.days_t
        |WHERE ts >= 10 * 86400000000 AND ts < 12 * 86400000000""".stripMargin
    ).collect()
    val (t1, kept1, total1) = graft.sources.SegHooks.lastPlanned.get()
    assert(t1.contains("days_t"), t1)
    assert(total1 === 87 && kept1 === 2, s"planned $kept1/$total1")

    // bucket(8, id): 4 tasks x 8 buckets = 32 segments; each IN value
    // lives in one task's id-zone AND one bucket, so bucket-membership
    // ∧ zone-map keeps exactly 3
    spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.buck_t WHERE id IN (100, 2075, 3999)"
    ).collect()
    val (t2, kept2, total2) = graft.sources.SegHooks.lastPlanned.get()
    assert(t2.contains("buck_t"), t2)
    assert(total2 === 32 && kept2 === 3, s"planned $kept2/$total2")

    // point equality: one bucket in one task zone
    spark.sql("SELECT COUNT(*) FROM graft_cat.db.buck_t WHERE id = 2075").collect()
    val (_, kept3, _) = graft.sources.SegHooks.lastPlanned.get()
    assert(kept3 === 1, s"expected single-segment point lookup, got $kept3")
  }

  test("storage-partitioned join: co-bucketed tables join with no exchange (q105)") {
    val rows = ops.SemiStructured.q105CatalogSpj(spark, sf).collect()
    // values: the oracle's statement, recomputed here
    def v(id: Long) = (id * 2654435761L) % 1000L
    val expect = (0L until 4000L).filter(_ % 3 != 0)
      .groupBy(_ / 500)
      .map { case (b, ids) =>
        b -> ((ids.length.toLong, ids.map(id => 2 * v(id) + id % 7).sum))
      }
    assert(rows.length === expect.size)
    rows.foreach { r =>
      assert(expect(r.getLong(0)) === ((r.getLong(1), r.getLong(2))))
    }
    // plan shape: under v2 bucketing the join must sit directly on the
    // grouped scans — no ShuffleExchange anywhere BELOW the join (the
    // post-join aggregation may shuffle; that one is fine)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql(
        """SELECT COUNT(*) AS n, SUM(a.v + b.w) AS vw
          |FROM graft_cat.db.spj_a a JOIN graft_cat.db.spj_b b
          |ON a.id = b.id""".stripMargin)
      df.collect()
      def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: QueryStageExec => q +: flatten(q.plan)
        case other => other +: other.children.flatMap(flatten)
      }
      val all = flatten(df.queryExecution.executedPlan)
      val join = all.collectFirst {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(join.isDefined, s"no shuffle-family join planned:\n${all.head}")
      val below = join.get.children.flatMap(flatten)
      assert(!below.exists(_.isInstanceOf[ShuffleExchangeLike]),
        s"exchange below the join — SPJ did not engage:\n${join.get}")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("incremental changes read: segment diff only, append-only enforced (q106)") {
    val rows = ops.SemiStructured.q106CatalogChanges(spark, sf).collect()
    def v(id: Long) = (id * 2654435761L) % 1000L
    assert(rows.length === 4) // bands 4..7 (ids 2000..3999)
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(b >= 4 && b < 8, s"band $b leaked from the v1 insert")
      assert(r.getLong(1) === 500L)
      assert(r.getLong(2) === (b * 500 until (b + 1) * 500).map(v).sum)
    }
    // the scan planned ONLY the second commit's segments (ids >= 2000
    // live in seq parts 2..3 → 2 segment files), not the whole table
    val (tbl, kept, total) = graft.sources.SegHooks.lastPlanned.get()
    assert(tbl.contains("chg_t@v1.."), tbl)
    assert(total === 2 && kept === 2, s"planned $kept/$total")
    // compaction between versions breaks append-only lineage: the range
    // crossing it must refuse (misattributing rewritten rows as new is
    // worse than failing), while a post-compaction range still works
    spark.sql("CALL graft_cat.system.compact('db.chg_t', 1048576)")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_cat.db.chg_t VERSION AS OF '1..'").collect()
    }
    assert(e.getMessage.contains("append-only"), e.getMessage)
    val after = spark.sql(
      "SELECT * FROM graft_cat.db.chg_t VERSION AS OF '3..'")
    assert(after.count() === 0L) // nothing landed after the compaction
  }

  test("SPJ generalizes to days/identity transforms: same-day join, no exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    def assertNoShuffleBelowJoin(df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect()
      val all = flatten(df.queryExecution.executedPlan)
      val join = all.collectFirst {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(join.isDefined, s"no shuffle-family join planned:\n${all.head}")
      assert(!join.get.children.flatMap(flatten)
          .exists(_.isInstanceOf[ShuffleExchangeLike]),
        s"exchange below the join — SPJ did not engage:\n${join.get}")
    }
    ops.ensureGraftCatalog(spark)
    for (t <- Seq("spjd_a", "spjd_b", "spji_a", "spji_b"))
      spark.sql(s"DROP TABLE IF EXISTS graft_cat.db.$t")
    spark.sql(
      """CREATE TABLE graft_cat.db.spjd_a (ts BIGINT, v BIGINT)
        |PARTITIONED BY (days(ts))""".stripMargin)
    spark.sql(
      """CREATE TABLE graft_cat.db.spjd_b (ts BIGINT, w BIGINT)
        |PARTITIONED BY (days(ts))""".stripMargin)
    spark.sql(
      """CREATE TABLE graft_cat.db.spji_a (g BIGINT, v BIGINT)
        |PARTITIONED BY (g)""".stripMargin)
    spark.sql(
      """CREATE TABLE graft_cat.db.spji_b (g BIGINT, w BIGINT)
        |PARTITIONED BY (g)""".stripMargin)
    spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "2000").option("parts", "2").load()
      .createOrReplaceTempView("graft_seq_spjx")
    spark.sql("INSERT INTO graft_cat.db.spjd_a SELECT id * 1800000000, v FROM graft_seq_spjx")
    spark.sql("INSERT INTO graft_cat.db.spjd_b SELECT id * 1800000000, v + 1 FROM graft_seq_spjx")
    spark.sql("INSERT INTO graft_cat.db.spji_a SELECT id % 8, v FROM graft_seq_spjx")
    spark.sql("INSERT INTO graft_cat.db.spji_b SELECT id % 8, v + 1 FROM graft_seq_spjx")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assertNoShuffleBelowJoin(spark.sql(
        """SELECT COUNT(*) AS n, SUM(a.v + b.w) AS vw
          |FROM graft_cat.db.spjd_a a JOIN graft_cat.db.spjd_b b
          |ON a.ts = b.ts""".stripMargin))
      assertNoShuffleBelowJoin(spark.sql(
        """SELECT COUNT(*) AS n, SUM(a.v + b.w) AS vw
          |FROM graft_cat.db.spji_a a JOIN graft_cat.db.spji_b b
          |ON a.g = b.g""".stripMargin))
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("catalog DEFAULT columns fill omitted INSERT values; SET DEFAULT is prospective") {
    val rows = ops.SemiStructured.q93CatalogDefault(spark, sf).collect()
    assert(rows.length === 3)
    def mm(lo: Long, hi: Long) = (lo until hi).map(id => (id * 2654435761L) % 1000L).sum
    val byBand = rows.map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(byBand(0L) === ((400L * 100, 400L * 42)))   // both defaults
    assert(byBand(1L) === ((mm(400, 800), 400L * 42))) // v explicit, old default
    assert(byBand(2L) === ((mm(800, 1200), 400L * 9))) // after SET DEFAULT 9
  }

  test("CALL compact: segments merge byte-level; pre-compaction version intact") {
    val out = ops.SemiStructured.q94CatalogCompact(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum === 2400L)
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val t = cat.segTable("db.cmp_t")
    // 3 inserts × 2 surviving splits each = 6 small segments, one merge
    // group (same colIds, unpartitioned) → exactly 1 after compaction
    assert(t.currentSegs.size === 1)
    val seg = t.currentSegs.head
    assert(seg.rows === 2400L)
    // merged zone-map is the elementwise combine of the inputs
    val idOrd = 0
    assert(seg.mins(idOrd) === 0L && seg.maxs(idOrd) === 2399L)
    // compaction NEVER deletes: time travel to the last pre-compaction
    // version (v0 create + 3 inserts = v3) reads the original 6 segments
    val pre = spark.sql(
      "SELECT COUNT(*) AS n, SUM(v) AS s FROM graft_cat.db.cmp_t VERSION AS OF 3")
      .collect().head
    val post = spark.sql(
      "SELECT COUNT(*) AS n, SUM(v) AS s FROM graft_cat.db.cmp_t")
      .collect().head
    assert(pre === post)
    // idempotent: a second CALL finds nothing to merge
    val again = spark.sql("CALL graft_cat.system.compact('db.cmp_t', 1048576)")
      .collect().head
    assert(again.getLong(0) === 0L)
  }

  test("z-ordered layout makes a two-column box predicate prune segments") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.z_t")
    spark.sql("CREATE TABLE graft_cat.db.z_t (event_id BIGINT, x BIGINT, y BIGINT, zkey BIGINT)")
    // z-order layout rewrite: range-partition on the Morton key → each of
    // the 16 write tasks covers a contiguous z range → every segment's
    // (x, y) zone-map is a ~64×64 bounding box, not a full-width slab
    graft.ext.Layout.zEvents(ops.table(spark, sf, "events"))
      .repartitionByRange(16, col("zkey"))
      .createOrReplaceTempView("graft_z_events")
    spark.sql("INSERT INTO graft_cat.db.z_t SELECT * FROM graft_z_events")
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val total = cat.segTable("db.z_t").currentSegs.size
    assert(total >= 8, s"expected many segments, got $total")
    val box = spark.sql(
      """SELECT COUNT(*) AS n FROM graft_cat.db.z_t
        |WHERE x >= 0 AND x < 64 AND y >= 64 AND y < 128""".stripMargin)
      .collect().head.getLong(0)
    val (tbl, kept, planned) = graft.sources.SegHooks.lastPlanned.get()
    assert(tbl.contains("z_t"), tbl)
    // the 64×64 box is ONE z bucket of 16; only quantile-boundary
    // segments straddle it
    assert(kept <= planned / 2, s"box predicate planned $kept/$planned")
    // pruning lost no rows: recompute without the catalog
    val expect = graft.ext.Layout.zEvents(ops.table(spark, sf, "events"))
      .filter(col("x") < 64 && col("y") >= 64 && col("y") < 128).count()
    assert(box === expect)
    // the decisive property: the SAME layout also prunes a y-ONLY
    // predicate (4 of 16 buckets), which no single-column sort can do —
    // an x-sorted control table keeps every segment for it
    spark.sql("SELECT COUNT(*) FROM graft_cat.db.z_t WHERE y >= 64 AND y < 128")
      .collect()
    val (_, keptY, _) = graft.sources.SegHooks.lastPlanned.get()
    assert(keptY <= planned * 2 / 3, s"y-only predicate planned $keptY/$planned")
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.x_t")
    spark.sql("CREATE TABLE graft_cat.db.x_t (event_id BIGINT, x BIGINT, y BIGINT, zkey BIGINT)")
    graft.ext.Layout.zEvents(ops.table(spark, sf, "events"))
      .repartitionByRange(16, col("x"))
      .createOrReplaceTempView("graft_x_events")
    spark.sql("INSERT INTO graft_cat.db.x_t SELECT * FROM graft_x_events")
    spark.sql("SELECT COUNT(*) FROM graft_cat.db.x_t WHERE y >= 64 AND y < 128")
      .collect()
    val (tblX, keptX, plannedX) = graft.sources.SegHooks.lastPlanned.get()
    assert(tblX.contains("x_t"), tblX)
    assert(keptX === plannedX,
      s"x-sorted layout should not prune a y predicate ($keptX/$plannedX)")
  }

  test("CALL expire_versions: unreferenced files GCed, expired travel errors") {
    val out = ops.SemiStructured.q95CatalogExpire(spark, sf).collect().head
    assert(out.getLong(0) === 1000L)
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val t = cat.segTable("db.exp_t")
    // create(v0) + insert(v1) + overwrite(v2); keep_last=1 leaves only v2
    assert(t.currentVersion === 2L)
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft_cat.db.exp_t VERSION AS OF 1").collect()
    }
    assert(err.getMessage.contains("no version"))
    // the overwritten first-load segments are physically gone: the table
    // dir holds exactly the live segments plus the manifest
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_warehouse", "graft_cat", "db.exp_t")
    val onDisk = java.nio.file.Files.list(dir).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(onDisk)
      .asScala.map(_.getFileName.toString).toSet
    assert(names -- Set("_meta.json", "_meta.json.lock") ===
      t.currentSegs.map(_.file).toSet,
      "table dir must hold exactly the live segments plus the manifest " +
        "(and its writer-lock sibling)")
    // a FRESH catalog instance reopens the rewritten manifest (durable)
    val reopened = new graft.sources.GraftCatalog
    reopened.initialize("graft_cat",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    assert(reopened.segTable("db.exp_t").currentVersion === 2L)
  }

  test("q121: ungrouped COUNT/MIN/MAX answered from the manifest, zero reads") {
    import org.apache.spark.sql.functions._
    val df = ops.SemiStructured.q121CatalogAggPushdown(spark, sf)
    val r = df.collect()(0)
    val d = spark.read.parquet(s"$sf/orders.parquet")
      .agg(count(lit(1)), min("o_orderkey"), max("o_orderkey"),
        min("o_custkey"), max("o_custkey")).collect()(0)
    (0 to 4).foreach(i => assert(r.getLong(i) === d.getLong(i), s"col $i"))
    val (tbl, vals) = graft.sources.SegHooks.lastAggPushdown.get()
    assert(tbl.contains("agg_t") && vals.length === 5)
    // complete pushdown: the plan carries the manifest-agg scan and NO
    // aggregate operator at all
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("MANIFEST-AGG"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    // a predicate disables the answer (filters re-evaluate above the scan)
    val filtered = spark.sql(
      "SELECT COUNT(*) AS n FROM graft_cat.db.agg_t WHERE k > 100")
    assert(!filtered.queryExecution.executedPlan.toString.contains("MANIFEST-AGG"))
    assert(filtered.collect()(0).getLong(0) ===
      spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderkey") > 100).count())
  }

  test("q123: CHECK constraint rejects, passes NULL, fails bad DDL, persists") {
    val rows = ops.SemiStructured.q123CatalogCheckConstraint(spark, sf).collect()
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows(0).getLong(0) === nCust)
    // a definite-FALSE row is rejected by the writer task
    val err = intercept[Exception] {
      spark.sql("INSERT INTO graft_cat.db.chk_t VALUES (-1, 0.0)")
    }
    def rootMsg(t: Throwable): String = {
      var cur: Throwable = t
      val sb = new StringBuilder
      while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
      sb.toString
    }
    assert(rootMsg(err).contains("CHECK constraint violated"), rootMsg(err))
    // rejected writes commit nothing
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.chk_t")
      .collect()(0).getLong(0) === nCust)
    // SQL CHECK semantics: NULL is not a violation
    spark.sql("INSERT INTO graft_cat.db.chk_t VALUES (7, CAST(NULL AS DOUBLE))")
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.chk_t")
      .collect()(0).getLong(0) === nCust + 1)
    // a bad expression fails the DDL, not later inserts
    val ddlErr = intercept[Exception] {
      spark.sql("ALTER TABLE graft_cat.db.chk_t " +
        "SET TBLPROPERTIES ('graft.check' = 'no_such_col > 0')")
    }
    assert(ddlErr != null)
    // the constraint is manifest-persisted: a fresh catalog sees it
    val reopened = new graft.sources.GraftCatalog
    reopened.initialize("graft_cat",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    assert(reopened.segTable("db.chk_t").properties()
      .get("graft.check") === "k >= 0 AND bal > -1000.0")
  }

  test("q125: grouped COUNT/MIN/MAX on the partition column folds the manifest") {
    val df = ops.SemiStructured.q125CatalogGroupAggPushdown(spark, sf)
    val rows = df.collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val g = r.getLong(0)
      assert(r.getLong(1) === 500L)
      // ids congruent to g mod 8: min = g, max = 4000 - 8 + g
      assert(r.getLong(2) === g)
      assert(r.getLong(3) === 3992L + g)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("MANIFEST-AGG"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    // grouping on a NON-partition column falls back to a real scan
    val byV = spark.sql(
      "SELECT v, COUNT(*) AS n FROM graft_cat.db.gagg_t GROUP BY v")
    assert(!byV.queryExecution.executedPlan.toString.contains("MANIFEST-AGG"))
  }

  test("SegBloom: no false negatives, exact union, saturation, base64") {
    import graft.sources.SegBloom
    val a = new Array[Long](SegBloom.Words)
    val vals = (0L until 2000L).map(v => v * 2654435761L % 100000L)
    vals.foreach(SegBloom.add(a, _))
    // no false negatives, ever
    assert(vals.forall(SegBloom.mightContain(a, _)))
    // useful rejection power at this load factor
    val misses = (1000000L until 1002000L).count(SegBloom.mightContain(a, _))
    assert(misses < 400, s"fpp too high: $misses/2000")
    assert(!SegBloom.saturated(a))
    // union answers for the union of value sets
    val b = new Array[Long](SegBloom.Words)
    (5000000L until 5002000L).foreach(SegBloom.add(b, _))
    val u = SegBloom.union(a, b)
    assert(vals.forall(SegBloom.mightContain(u, _)))
    assert((5000000L until 5002000L).forall(SegBloom.mightContain(u, _)))
    // manifest codec round-trips bit-exactly
    assert(SegBloom.fromBase64(SegBloom.toBase64(a)).sameElements(a))
    assert(SegBloom.fromBase64("").isEmpty)
    // saturation flips once most bits are set
    val s = new Array[Long](SegBloom.Words)
    (0L until 50000L).foreach(SegBloom.add(s, _))
    assert(SegBloom.saturated(s))
  }

  test("compaction OR-merges blooms: point lookups keep pruning after merge") {
    // q119 leaves bloom_t with 8 hash-scattered segments; compact them
    // down and prove the unioned blooms still answer (and never lie)
    ops.SemiStructured.q119CatalogBloomPrune(spark, sf).collect()
    spark.sql("CALL graft_cat.system.compact('db.bloom_t', " + (1L << 40) + ")")
    val t = {
      val c = new graft.sources.GraftCatalog
      c.initialize("graft_cat",
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap()))
      c.segTable("db.bloom_t")
    }
    assert(t.currentSegs.size < 8, "compaction merged nothing")
    // merged segment carries a unioned bloom for the key column
    val keyIdx = 0 // o_orderkey is physical column 0
    assert(t.currentSegs.forall(_.bloomAt(keyIdx).isDefined))
    // no false negatives through the union: the point rows still come back
    val rows = spark.sql(
      """SELECT o_orderkey FROM graft_cat.db.bloom_t
        |WHERE o_orderkey IN (3, 700, 1300) ORDER BY 1""".stripMargin).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L, 700L, 1300L))
  }

  test("q119: blooms prune point lookups the zone maps cannot") {
    val rows = ops.SemiStructured.q119CatalogBloomPrune(spark, sf).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L, 700L, 1300L))
    val (tbl, kept, total) = graft.sources.SegHooks.lastPlanned.get()
    assert(tbl.contains("bloom_t"), tbl)
    // hash-scattered layout: every segment's o_orderkey zone spans the
    // domain, so any pruning below total is bloom work; 3 keys live in at
    // most 3 segments, fpp adds a few — well under half survives
    assert(total === 8, s"planned $kept/$total")
    assert(kept <= 5, s"bloom pruned too little: $kept/$total")
    // values actually present are never pruned away: full-scan equality
    val full = spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.bloom_t").collect()(0).getLong(0)
    assert(full === spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("vacuum: grace period protects fresh files; live segments never deleted") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.vacspec_t")
    spark.sql("CREATE TABLE graft_cat.db.vacspec_t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft_cat.db.vacspec_t VALUES (1, 10), (2, 20)")
    val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft_warehouse", "graft_cat", "db.vacspec_t")
    java.nio.file.Files.write(dir.resolve("stale_orphan.seg"), Array[Byte](9))
    // a fresh orphan inside the grace period is an IN-FLIGHT writer's
    // staged file — vacuum must not touch it
    val protectedRun = spark.sql(
      "CALL graft_cat.system.vacuum('db.vacspec_t', 3600000)").collect()(0)
    assert(protectedRun.getLong(0) === 0L, "grace period ignored")
    assert(java.nio.file.Files.exists(dir.resolve("stale_orphan.seg")))
    // past the grace period it is a crash leftover — reclaimed
    val gc = spark.sql(
      "CALL graft_cat.system.vacuum('db.vacspec_t', 0)").collect()(0)
    assert(gc.getLong(0) === 1L)
    assert(!java.nio.file.Files.exists(dir.resolve("stale_orphan.seg")))
    // committed data intact through both passes
    val rows = spark.sql(
      "SELECT id, v FROM graft_cat.db.vacspec_t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 10L), (2L, 20L)))
  }

  test("shallow clone: zero-copy, CoW divergence, source files never deleted (q131)") {
    import scala.jdk.CollectionConverters._
    import graft.sources.{GraftCatalog, Seg}
    ops.ensureGraftCatalog(spark)
    Seq("clspec_dst2", "clspec_dst", "clspec_src").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_cat.db.$t"))
    spark.sql("CREATE TABLE graft_cat.db.clspec_src (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft_cat.db.clspec_src VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO graft_cat.db.clspec_src VALUES (3, 30), (4, 40)")
    val wh = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft_warehouse", "graft_cat")
    def dataFiles(t: String): Set[String] = {
      val st = java.nio.file.Files.list(wh.resolve(t))
      try st.iterator().asScala.map(_.getFileName.toString)
        .filterNot(_.startsWith("_meta")).toSet
      finally st.close()
    }
    val srcFiles = dataFiles("db.clspec_src")
    assert(srcFiles.nonEmpty)

    // 1. the clone is pure metadata: references, no copies
    val res = spark.sql(
      "CALL graft_cat.system.clone('db.clspec_src', 'db.clspec_dst')").collect()(0)
    assert(res.getLong(0) === srcFiles.size.toLong, "segments_referenced")
    assert(dataFiles("db.clspec_dst").isEmpty, "clone copied data files")
    def ids(t: String): Seq[Long] = spark.sql(
      s"SELECT id FROM graft_cat.db.$t ORDER BY id").collect().map(_.getLong(0)).toSeq
    assert(ids("clspec_dst") === Seq(1L, 2L, 3L, 4L))

    // 2. a DELETE on the clone copy-on-writes the FOREIGN segments into
    // local replacements — the source's files and rows must not move
    spark.sql("DELETE FROM graft_cat.db.clspec_dst WHERE id IN (1, 3)")
    assert(ids("clspec_dst") === Seq(2L, 4L))
    assert(ids("clspec_src") === Seq(1L, 2L, 3L, 4L))
    assert(dataFiles("db.clspec_src") === srcFiles, "clone CoW touched source files")

    // 3. expiring the clone's pre-delete version drops its foreign refs —
    // the GC must drop the REFERENCES, never the source's files
    spark.sql("CALL graft_cat.system.expire_versions('db.clspec_dst', 1)")
    assert(srcFiles.forall(f =>
      java.nio.file.Files.exists(wh.resolve("db.clspec_src").resolve(f))),
      "clone expire deleted source files")
    assert(ids("clspec_dst") === Seq(2L, 4L))

    // 4. compact MATERIALIZES a clone: foreign refs merge into local files
    spark.sql("CALL graft_cat.system.clone('db.clspec_src', 'db.clspec_dst2')")
    spark.sql("CALL graft_cat.system.compact('db.clspec_dst2')")
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[GraftCatalog]
    val segs = cat.segTable("db.clspec_dst2").currentSegs
    assert(segs.nonEmpty && segs.forall(s => !Seg.isExternal(s.file)),
      s"compact left foreign refs: ${segs.map(_.file)}")
    assert(ids("clspec_dst2") === Seq(1L, 2L, 3L, 4L))
    assert(dataFiles("db.clspec_src") === srcFiles)

    // 5. end-to-end catalog entry
    val rows = ops.SemiStructured.q131ShallowClone(spark, sf).collect()
    val byPart = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(3))).toMap
    assert(byPart("src")._1 === 2000L)
    assert(byPart("src")._2 === 0L, "clone copied files in q131")
    assert(byPart("dst")._1 > 2000L, "clone did not diverge")
  }

  test("declared sort order: disjoint zone maps, 1-of-8 point scan, typed DDL (q134)") {
    import graft.sources.GraftCatalog
    // end-to-end: the catalog entry pins (scanned=1, total=8) in its output
    val rows = ops.SemiStructured.q134SortedWrite(spark, sf).collect()
    assert(rows.nonEmpty)
    val r0 = rows(0)
    assert(r0.getLong(r0.fieldIndex("n_segs_scanned")) === 1L, r0)
    assert(r0.getLong(r0.fieldIndex("n_segs_total")) === 8L, r0)
    // the mechanism: 8 segments whose v zone maps are strictly disjoint
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[GraftCatalog]
    val segs = cat.segTable("db.srt_t").currentSegs
    assert(segs.size === 8)
    val vOrd = 1 // (id, v) — v is physical column 1
    assert(segs.forall(_.hasStats(vOrd)))
    val ranges = segs.map(s => (s.mins(vOrd), s.maxs(vOrd))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping sorted ranges: $ranges")
      case _ =>
    }
    // DDL validation: a non-zone-mapped sort type (DOUBLE) refused at
    // CREATE (STRING became sortable with the q156/q158 prefix zones)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.srtbad_t")
    val err = intercept[Exception] {
      spark.sql("""CREATE TABLE graft_cat.db.srtbad_t (a DOUBLE, v BIGINT)
                  |TBLPROPERTIES ('graft.sort' = 'a')""".stripMargin)
    }
    assert(err.getMessage.contains("graft.sort"), err.getMessage)
  }

  test("metadata tables: versions ledger + files ownership, bad kinds refused (q135)") {
    // end-to-end entry pins the full ledger
    val rows = ops.SemiStructured.q135MetadataTables(spark, sf).collect()
    val byPart = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byPart("v0") === ((0L, 0L, 0L)))
    assert(byPart("v2") === ((2L, 2000L, 0L)))
    assert(byPart("clone_files") === ((2L, 2000L, 2L)))
    // the source's own files are all owned (external = false)
    val own = spark.sql(
      "SELECT COUNT(*), SUM(CAST(external AS BIGINT)) FROM graft_cat.db.mt_t.files")
      .collect()(0)
    assert(own.getLong(0) === 2L && own.getLong(1) === 0L)
    // the clone's version ledger reports its borrowed segments
    val clv = spark.sql(
      "SELECT n_external FROM graft_cat.db.mt_cl.versions WHERE v = 1").collect()(0)
    assert(clv.getLong(0) === 2L)
    // unknown metadata kind stays a missing-table error
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft_cat.db.mt_t.nope").collect()
    }
    assert(err.getMessage.toLowerCase.contains("table"), err.getMessage)
  }

  test("net changes: rewrite commits surface as delete+insert pairs (q136)") {
    val rows = ops.SemiStructured.q136NetChanges(spark, sf).collect()
    val keys = rows.map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(keys === Seq((2L, "delete"), (3L, "delete"), (3L, "insert")))
    // the UPDATE commit's delete and insert legs cover the SAME rows
    // (equal counts and id populations; only v moved)
    val m = rows.map(r => (r.getLong(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(4))).toMap
    assert(m((3L, "delete")) === m((3L, "insert")))
  }

  test("optimistic commit: stale second writer rebases; both inserts survive (q129)") {
    // end-to-end: two catalog INSTANCES over one warehouse dir commit
    // interleaved INSERTs; the stale handle's conditional append must
    // rebase, so v2 (and latest) hold BOTH writers' 2000 rows
    val rows = ops.SemiStructured.q129ConcurrentCommits(spark, sf).collect()
    assert(rows.length === 2)
    rows.foreach(r => assert(r.getLong(r.fieldIndex("n")) === 2000L, r))

    // low-level contract: a conditional append against a stale expected
    // version is refused and leaves the log untouched
    import graft.sources.{SegStore, SegVersion}
    val dir = java.nio.file.Files.createTempDirectory("graft_occ")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
    val v0 = SegVersion(0L, Array(0), schema, None, Nil)
    SegStore.appendVersion(dir, v0)
    assert(SegStore.commitVersion(dir, 0L, v0.copy(v = 1L)))
    assert(!SegStore.commitVersion(dir, 0L, v0.copy(v = 2L)),
      "stale expected version must be refused")
    assert(SegStore.readVersions(dir).map(_.v) === Vector(0L, 1L))

    // the fast-forward re-seed primitive: conditional wholesale rewrite
    // succeeds only against the expected head; a commit that landed in
    // between survives untouched
    val lf = SegStore.branchLog("t")
    SegStore.appendVersion(dir, v0, lf)
    assert(SegStore.commitVersion(dir, 0L, v0.copy(v = 1L), lf))
    assert(!SegStore.rewriteVersionsIfHead(dir, lf, 0L, Seq(v0.copy(v = 9L))),
      "rewrite against a stale head must be refused")
    assert(SegStore.readVersions(dir, lf).map(_.v) === Vector(0L, 1L),
      "refused rewrite must leave the log untouched")
    assert(SegStore.rewriteVersionsIfHead(dir, lf, 1L, Seq(v0.copy(v = 9L))))
    assert(SegStore.readVersions(dir, lf).map(_.v) === Vector(9L))

    // torn-tail healing: a crash mid-append leaves an unterminated final
    // line; readers ignore it, and the NEXT locked commit must truncate
    // it away rather than welding its own line onto the partial tail
    // (which would turn a transient torn tail into a permanently
    // unparseable manifest line)
    val torn = "{\"v\":99,\"ids\":[0],\"schema".getBytes("UTF-8")
    java.nio.file.Files.write(dir.resolve("_meta.json"), torn,
      java.nio.file.StandardOpenOption.APPEND)
    assert(SegStore.readVersions(dir).map(_.v) === Vector(0L, 1L),
      "readers must ignore the in-flight partial line")
    assert(SegStore.commitVersion(dir, 1L, v0.copy(v = 2L)),
      "commit after a torn append must heal and succeed")
    assert(SegStore.readVersions(dir).map(_.v) === Vector(0L, 1L, 2L))
    // every line in the healed log must be individually parseable
    val lines = new String(java.nio.file.Files.readAllBytes(
      dir.resolve("_meta.json")), "UTF-8").split('\n').filter(_.nonEmpty)
    assert(lines.length === 3, "torn partial line must be gone")
  }

  test("evolve_spec: stamps gate bucket trust; both eras readable (q161)") {
    val rows = ops.SemiStructured.q161EvolveSpec(spark, sf).collect()
    def v(id: Long) = (id * 2654435761L) % 1000L
    val byLeg = rows.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byLeg("all") === ((4000L, (0L until 4000L).map(v).sum)))
    // the correctness claim: one PRE-evolution row (id=7, identity-era
    // segment) and one POST-evolution row (id=2345, bucket-routed) —
    // bucket pruning must not drop the unstamped-era segment
    assert(byLeg("needle") === ((2L, v(7) + v(2345))))
    assert(byLeg("evolve") === ((1L, 2L)))

    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val segs = cat.segTable("db.ev_t").currentSegs
    // every segment carries the spec it was ROUTED by
    assert(segs.map(_.spec).toSet === Set(Some("g"), Some("bucket:4:id")),
      segs.map(s => s.file -> s.spec).mkString(", "))

    // post-evolution point lookup: bucket membership prunes the new era
    // to ONE segment (2 write tasks x 4 buckets after source split
    // pruning; zone keeps one task, bucket keeps one of its 4);
    // identity-era segments all zone-drop (their id ranges exclude 2345)
    spark.sql("SELECT COUNT(*) FROM graft_cat.db.ev_t WHERE id = 2345").collect()
    val (t1, kept1, total1) = graft.sources.SegHooks.lastPlanned.get()
    assert(t1.contains("ev_t"), t1)
    assert(total1 === 16 && kept1 === 1, s"planned $kept1/$total1")

    // pre-evolution point lookup: the CURRENT (bucket) spec must not
    // prune identity-era segments — only their own zone maps/blooms do
    spark.sql("SELECT COUNT(*) FROM graft_cat.db.ev_t WHERE id = 7").collect()
    val (_, kept2, _) = graft.sources.SegHooks.lastPlanned.get()
    assert(kept2 >= 1 && kept2 <= 4, s"planned $kept2 segments for id=7")

    // keyed compaction sits out mismatched-spec segments: the 8
    // identity-era segments are ineligible under the bucket spec; the 8
    // bucket-era segments merge 2-per-bucket into 4
    spark.sql("CALL graft_cat.system.compact('db.ev_t')").collect()
    val after = cat.segTable("db.ev_t").currentSegs
    assert(after.size === 12, after.map(s => s.file -> s.spec).mkString(", "))
    assert(after.count(_.spec.contains("g")) === 8)
    assert(after.count(_.spec.contains("bucket:4:id")) === 4)
    // merged segments keep pruning: same point lookup, same single hit
    spark.sql("SELECT COUNT(*) FROM graft_cat.db.ev_t WHERE id = 2345").collect()
    val (_, kept3, total3) = graft.sources.SegHooks.lastPlanned.get()
    assert(total3 === 12 && kept3 === 1, s"planned $kept3/$total3")
    val n = spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.ev_t WHERE id IN (7, 2345)")
      .head.getLong(0)
    assert(n === 2L)

    // validation: unknown column / non-BIGINT / bad bucket count refused
    intercept[Exception](spark.sql(
      "CALL graft_cat.system.evolve_spec('db.ev_t', 'bucket:4:nope')").collect())
    intercept[Exception](spark.sql(
      "CALL graft_cat.system.evolve_spec('db.ev_t', 'bucket:0:id')").collect())
    // unpartition: metadata-only, all rows still readable
    spark.sql("CALL graft_cat.system.evolve_spec('db.ev_t', '')").collect()
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.ev_t").head.getLong(0)
      === 4000L)
  }

  test("compaction rebases over a concurrent insert: no committed segment dropped") {
    // a compaction whose commit loses the race must re-apply against the
    // winner's head — subtracting only the inputs it merged — so a
    // concurrent writer's committed segments survive (the q129 two-
    // instance pattern, with compact as the stale committer)
    ops.ensureGraftCatalog(spark)
    val wh = sys.props("java.io.tmpdir") + "/graft_warehouse/graft_cat"
    val keys = Seq("spark.sql.catalog.graft_cc2" -> "graft.sources.GraftCatalog",
      "spark.sql.catalog.graft_cc2.warehouse" -> wh)
    val saved = keys.map { case (k, _) => k -> spark.conf.getAll.get(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sessionState.catalogManager.catalog("graft_cc2")
    saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cr_t")
    spark.sql("CREATE TABLE graft_cat.db.cr_t (id BIGINT, v BIGINT)")
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO graft_cat.db.cr_t " +
        s"SELECT id, id FROM range(${i * 100}, ${i * 100 + 100}) AS t(id)")
    }
    // instance 2 caches its own handle at the current head, then commits
    // one more batch — instance 1's handle is now stale
    spark.sql("REFRESH TABLE graft_cc2.db.cr_t")
    spark.sql("SELECT COUNT(*) FROM graft_cc2.db.cr_t").collect()
    spark.sql(
      "INSERT INTO graft_cc2.db.cr_t SELECT id, id FROM range(400, 500) AS t(id)")
    // stale-handle compact: expectedV misses, publish rebases onto the
    // winner's head — the concurrent batch must survive the compaction
    spark.sql("CALL graft_cat.system.compact('db.cr_t')").collect()
    spark.sql("REFRESH TABLE graft_cat.db.cr_t")
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.cr_t").head.getLong(0)
      === 500L, "concurrent insert's rows vanished under compaction rebase")
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.cr_t WHERE id >= 400").head.getLong(0)
      === 100L)
  }

  test("durable reopen: a fresh catalog instance sees branches, stamps, refs") {
    // disk is the commit point: branch logs (_meta@name.json) and the
    // per-segment spec stamps ("ps" manifest key) must survive a full
    // catalog reopen — a second catalog instance over the SAME warehouse
    // dir resolves the branch, keeps bucket pruning gated, and lists refs
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.dur_t")
    spark.sql(
      """CREATE TABLE graft_cat.db.dur_t (id BIGINT, v BIGINT, g BIGINT)
        |PARTITIONED BY (g)""".stripMargin)
    spark.sql(
      """INSERT INTO graft_cat.db.dur_t
        |SELECT id, id * 2, id % 4 FROM range(0, 400) AS t(id)""".stripMargin)
    spark.sql("CALL graft_cat.system.evolve_spec('db.dur_t', 'bucket:4:id')")
    spark.sql(
      """INSERT INTO graft_cat.db.dur_t
        |SELECT id, id * 2, id % 4 FROM range(400, 800) AS t(id)""".stripMargin)
    spark.sql("CALL graft_cat.system.branch('db.dur_t', 'side')")
    spark.sql("INSERT INTO graft_cat.db.dur_t.branch_side VALUES (9000, 1, 0)")

    // second instance over the same warehouse dir (the q129 pattern)
    val wh = sys.props("java.io.tmpdir") + "/graft_warehouse/graft_cat"
    val keys = Seq("spark.sql.catalog.graft_dur2" -> "graft.sources.GraftCatalog",
      "spark.sql.catalog.graft_dur2.warehouse" -> wh)
    val saved = keys.map { case (k, _) => k -> spark.conf.getAll.get(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sessionState.catalogManager.catalog("graft_dur2")
    saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    spark.sql("REFRESH TABLE graft_dur2.db.dur_t")
    // reopened main: both eras readable, stamps decoded from disk gate
    // bucket pruning (post-evolution point = 1 planned segment)
    assert(spark.sql("SELECT COUNT(*) FROM graft_dur2.db.dur_t")
      .head.getLong(0) === 800L)
    spark.sql("SELECT COUNT(*) FROM graft_dur2.db.dur_t WHERE id = 650").collect()
    val (t1, kept, total) = graft.sources.SegHooks.lastPlanned.get()
    assert(t1.contains("dur_t"), t1)
    assert(kept === 1, s"planned $kept/$total after reopen")
    assert(spark.sql("SELECT COUNT(*) FROM graft_dur2.db.dur_t WHERE id = 7")
      .head.getLong(0) === 1L, "pre-evolution row lost after reopen")
    // reopened branch resolves with its own content; refs list it
    assert(spark.sql("SELECT COUNT(*) FROM graft_dur2.db.dur_t.branch_side")
      .head.getLong(0) === 801L)
    val refs = spark.sql("SELECT name, type FROM graft_dur2.db.dur_t.refs")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(refs.contains(("side", "branch")) && refs.contains(("main", "branch")))
  }

  test("continuous publish: land-on-branch / fast-forward cycles without re-fork") {
    // the fast-forward re-seed makes the branch a standing ingestion lane:
    // commit → publish → commit → publish, no drop/re-create between —
    // and branch-log expiry must not break fork-point tracking (the fork
    // travels as a version property, not the seed entry)
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cp_t")
    spark.sql("CREATE TABLE graft_cat.db.cp_t (id BIGINT, v BIGINT)")
    spark.sql("CALL graft_cat.system.branch('db.cp_t', 'lane')")
    (1 to 3).foreach { round =>
      spark.sql(
        s"""INSERT INTO graft_cat.db.cp_t.branch_lane
           |SELECT id, id FROM range(${round * 100 - 100}, ${round * 100}) AS t(id)
           |""".stripMargin)
      if (round == 2) // history expiry on the branch must not lose the fork
        spark.sql("CALL graft_cat.system.expire_versions('db.cp_t.branch_lane', 1)")
          .collect()
      val ff = spark.sql("CALL graft_cat.system.fast_forward('db.cp_t', 'lane')")
        .head
      assert(ff.getLong(ff.fieldIndex("commits_merged")) >= 1L, s"round $round")
      assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.cp_t").head.getLong(0)
        === round * 100L, s"round $round")
    }
    // an idle lane fast-forwards as a no-op, never a divergence error
    val idle = spark.sql("CALL graft_cat.system.fast_forward('db.cp_t', 'lane')")
      .head
    assert(idle.getLong(idle.fieldIndex("commits_merged")) === 0L)
  }

  test("dropped manifest log is never resurrected by a stale conditional append") {
    // drop_branch removes the branch log; a stale handle's commit racing
    // in AFTER the drop must fail permanently — not recreate the log as
    // a zero-byte file that breaks refs/branch resolution table-wide
    import graft.sources.{SegStore, SegVersion}
    val dir = java.nio.file.Files.createTempDirectory("graft_droprace")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
    val v0 = SegVersion(0L, Array(0), schema, None, Nil)
    val lf = SegStore.branchLog("gone")
    SegStore.appendVersion(dir, v0, lf)
    java.nio.file.Files.delete(dir.resolve(lf)) // the drop
    intercept[IllegalStateException] {
      SegStore.commitVersion(dir, 0L, v0.copy(v = 1L), lf)
    }
    assert(!java.nio.file.Files.exists(dir.resolve(lf)),
      "refused commit must not leave a resurrected log behind")
    // the conditional rewrite likewise refuses (returns false) and
    // leaves nothing behind
    assert(!SegStore.rewriteVersionsIfHead(dir, lf, 0L, Seq(v0.copy(v = 9L))))
    assert(!java.nio.file.Files.exists(dir.resolve(lf)))
  }

  test("refs metadata tolerates a damaged zero-byte branch log") {
    // a crashed creator (pre-CREATE_NEW era) or an external scribble can
    // leave a zero-byte _meta@x.json; the refs query must omit that ref,
    // not fail the whole metadata table with NoSuchElementException
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.zb_t")
    spark.sql("CREATE TABLE graft_cat.db.zb_t (id BIGINT)")
    spark.sql("INSERT INTO graft_cat.db.zb_t VALUES (1), (2)")
    spark.sql("CALL graft_cat.system.branch('db.zb_t', 'ok')")
    val tdir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_warehouse", "graft_cat", "db.zb_t")
    val broken = tdir.resolve(graft.sources.SegStore.branchLog("broken"))
    java.nio.file.Files.write(broken, Array.empty[Byte])
    try {
      val refs = spark.sql("SELECT name, type FROM graft_cat.db.zb_t.refs")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(refs.contains(("main", "branch")) && refs.contains(("ok", "branch")))
      assert(!refs.exists(_._1 == "broken"), refs.toString)
    } finally java.nio.file.Files.deleteIfExists(broken)
  }

  test("branch commit racing fast_forward's re-seed: fork carried forward") {
    // a branch commit that lands between the merge publish and the
    // re-seed builds on the merged head (= new main's state), so it IS a
    // descendant — the re-seed must carry the fork forward instead of
    // stranding the old fork (which would make every later fast_forward
    // refuse as 'diverged' and silently kill the ingestion lane)
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cf_t")
    spark.sql("CREATE TABLE graft_cat.db.cf_t (id BIGINT)")
    spark.sql("CALL graft_cat.system.branch('db.cf_t', 'lane')")
    spark.sql(
      "INSERT INTO graft_cat.db.cf_t.branch_lane SELECT id FROM range(0, 100)")
    graft.sources.SegHooks.betweenMergeAndReseed.set(() =>
      spark.sql("INSERT INTO graft_cat.db.cf_t.branch_lane " +
        "SELECT id FROM range(100, 200)"))
    try {
      val ff = spark.sql("CALL graft_cat.system.fast_forward('db.cf_t', 'lane')")
        .head
      assert(ff.getLong(ff.fieldIndex("commits_merged")) === 1L)
    } finally graft.sources.SegHooks.betweenMergeAndReseed.set(() => ())
    // the raced commit survived on the branch; main has only the merged rows
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.cf_t.branch_lane")
      .head.getLong(0) === 200L, "raced branch commit was dropped by the re-seed")
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.cf_t")
      .head.getLong(0) === 100L)
    // the decisive claim: the NEXT fast_forward sees a descendant (fork
    // carried forward), merges exactly the raced commit, and re-seeds
    val ff2 = spark.sql("CALL graft_cat.system.fast_forward('db.cf_t', 'lane')")
      .head
    assert(ff2.getLong(ff2.fieldIndex("commits_merged")) === 1L,
      "fork property stranded — fast_forward refused a true descendant")
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.cf_t")
      .head.getLong(0) === 200L)
    // and the lane keeps cycling cleanly afterwards
    spark.sql(
      "INSERT INTO graft_cat.db.cf_t.branch_lane SELECT id FROM range(200, 250)")
    val ff3 = spark.sql("CALL graft_cat.system.fast_forward('db.cf_t', 'lane')")
      .head
    assert(ff3.getLong(ff3.fieldIndex("commits_merged")) === 1L)
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.cf_t")
      .head.getLong(0) === 250L)
  }

  test("merge-on-read DML: a 1-row DELETE rewrites zero data segments") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.mor_t")
    spark.sql(
      """CREATE TABLE graft_cat.db.mor_t (id BIGINT, v BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.sql(
      "INSERT INTO graft_cat.db.mor_t SELECT id, id * 2 FROM range(0, 1000)")
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.GraftCatalog]
    def segs() = cat.segTable("db.mor_t").currentSegs
    val before = segs().map(_.file).toSet
    val vBefore = cat.segTable("db.mor_t").currentVersion

    // the headline claim: a 1-row DELETE writes a DV sidecar, not data
    spark.sql("DELETE FROM graft_cat.db.mor_t WHERE id = 7")
    assert(segs().map(_.file).toSet === before,
      "merge-on-read DELETE must not rewrite or drop any data segment")
    assert(segs().map(_.dv.map(_.ndel).getOrElse(0L)).sum === 1L)
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.mor_t")
      .head.getLong(0) === 999L)
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.mor_t WHERE id = 7")
      .head.getLong(0) === 0L)

    // second delete UNIONS into the vector (idempotent, still no rewrite)
    spark.sql("DELETE FROM graft_cat.db.mor_t WHERE id IN (7, 8, 9)")
    assert(segs().map(_.file).toSet === before)
    assert(segs().map(_.dv.map(_.ndel).getOrElse(0L)).sum === 3L)
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.mor_t")
      .head.getLong(0) === 997L)

    // merge-on-read UPDATE: old position joins the DV, new row lands in
    // a fresh segment — the original files all survive
    spark.sql("UPDATE graft_cat.db.mor_t SET v = -5 WHERE id = 10")
    assert(before.subsetOf(segs().map(_.file).toSet))
    assert(spark.sql("SELECT v FROM graft_cat.db.mor_t WHERE id = 10")
      .head.getLong(0) === -5L)
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.mor_t")
      .head.getLong(0) === 997L)

    // time travel crosses the DVs: the pre-delete snapshot is intact
    assert(spark.sql(
      s"SELECT COUNT(*) FROM graft_cat.db.mor_t VERSION AS OF $vBefore")
      .head.getLong(0) === 1000L)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM graft_cat.db.mor_t VERSION AS OF $vBefore " +
        "WHERE id = 7").head.getLong(0) === 1L)

    // COUNT(*) still answers from the manifest (live rows, no scan)
    val agg = spark.sql("SELECT COUNT(*) AS n FROM graft_cat.db.mor_t")
    assert(agg.queryExecution.executedPlan.toString.contains("MANIFEST-AGG"))
    assert(agg.head.getLong(0) === 997L)
    // ...but MIN/MAX decline the manifest answer (a deleted row could
    // have held the extremum) and scan exactly
    spark.sql("DELETE FROM graft_cat.db.mor_t WHERE id = 999")
    val mx = spark.sql("SELECT MAX(id) AS m FROM graft_cat.db.mor_t")
    assert(!mx.queryExecution.executedPlan.toString.contains("MANIFEST-AGG"))
    assert(mx.head.getLong(0) === 998L)

    // compaction PURGES the vectors: data survives, dvs disappear
    spark.sql("CALL graft_cat.system.compact('db.mor_t', 1000000)").collect()
    assert(segs().forall(_.dv.isEmpty), "compaction must purge DVs")
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.mor_t")
      .head.getLong(0) === 996L)
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.mor_t WHERE id IN (7,8,9,999)")
      .head.getLong(0) === 0L)
    assert(spark.sql("SELECT v FROM graft_cat.db.mor_t WHERE id = 10")
      .head.getLong(0) === -5L)
  }

  test("metadata columns: _file/_pos queryable and stable under deletes") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.meta_t")
    spark.sql(
      """CREATE TABLE graft_cat.db.meta_t (id BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft_cat.db.meta_t SELECT id FROM range(0, 100)")
    val rows = spark.sql(
      "SELECT id, _file, _pos FROM graft_cat.db.meta_t ORDER BY _file, _pos")
      .collect()
    assert(rows.length === 100)
    // positions are dense 0..n-1 within each file before any delete
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).toSeq === rs.indices.map(_.toLong))
    }
    // _pos is PHYSICAL: deleting a row leaves survivors' positions fixed
    val posOf42 = rows.find(_.getLong(0) == 42L).get.getLong(2)
    spark.sql("DELETE FROM graft_cat.db.meta_t WHERE id = 41")
    val after = spark.sql(
      "SELECT _pos FROM graft_cat.db.meta_t WHERE id = 42").head.getLong(0)
    assert(after === posOf42, "physical positions must not shift under a DV")
    // hidden from SELECT *
    assert(spark.table("graft_cat.db.meta_t").columns.toSeq === Seq("id"))
  }

  test("spec evolution on a branch: isolated routing, adopted by fast-forward") {
    // evolve_spec targets any log: evolving the BRANCH re-routes only
    // branch writes; fast_forward adopts the branch's spec with its data
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.bev_t")
    spark.sql("CREATE TABLE graft_cat.db.bev_t (id BIGINT, v BIGINT)")
    spark.sql(
      "INSERT INTO graft_cat.db.bev_t SELECT id, id FROM range(0, 100) AS t(id)")
    spark.sql("CALL graft_cat.system.branch('db.bev_t', 'sp')")
    spark.sql("CALL graft_cat.system.evolve_spec('db.bev_t.branch_sp', 'bucket:4:id')")
    spark.sql(
      """INSERT INTO graft_cat.db.bev_t.branch_sp
        |SELECT id, id FROM range(100, 200) AS t(id)""".stripMargin)
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.GraftCatalog]
    // main stays unpartitioned; the branch routes new segments by bucket
    assert(cat.segTable("db.bev_t").partitioning().isEmpty)
    assert(cat.segTable("db.bev_t.branch_sp").partitioning().nonEmpty)
    assert(cat.segTable("db.bev_t.branch_sp").currentSegs
      .exists(_.spec.contains("bucket:4:id")))
    spark.sql("CALL graft_cat.system.fast_forward('db.bev_t', 'sp')").collect()
    // main adopted the spec AND the data; both eras still readable
    assert(cat.segTable("db.bev_t").partitioning().nonEmpty)
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.bev_t").head.getLong(0)
      === 200L)
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.bev_t WHERE id IN (7, 150)")
      .head.getLong(0) === 2L)
  }

  test("branch schema evolution: isolated until fast-forward adopts schema+data") {
    // each version log carries its own (colIds, schema): ALTER on a
    // branch evolves the BRANCH only — stronger than Iceberg, where
    // schema is table-wide across refs — and fast_forward adopts the
    // evolved schema and the data in the same atomic manifest commit
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.evo_t")
    spark.sql("CREATE TABLE graft_cat.db.evo_t (id BIGINT, v BIGINT)")
    spark.sql(
      "INSERT INTO graft_cat.db.evo_t SELECT id, id * 2 FROM range(0, 10) AS t(id)")
    spark.sql("CALL graft_cat.system.branch('db.evo_t', 'evo')")
    spark.sql(
      "ALTER TABLE graft_cat.db.evo_t.branch_evo ADD COLUMN w BIGINT DEFAULT 5")
    spark.sql(
      "INSERT INTO graft_cat.db.evo_t.branch_evo VALUES (100, 200, 7)")
    // main's schema is untouched while the branch carries the new column
    assert(spark.table("graft_cat.db.evo_t").schema.fieldNames.toSeq
      === Seq("id", "v"))
    assert(spark.table("graft_cat.db.evo_t.branch_evo").schema.fieldNames.toSeq
      === Seq("id", "v", "w"))
    spark.sql("CALL graft_cat.system.fast_forward('db.evo_t', 'evo')").collect()
    // main now reads the evolved schema: pre-evolution rows see the
    // EXISTS_DEFAULT, the branch-landed row its written value
    val rows = spark.sql(
      "SELECT id, w FROM graft_cat.db.evo_t ORDER BY id").collect()
    assert(rows.length === 11)
    assert(rows.take(10).forall(_.getLong(1) === 5L), "exists-default lost")
    assert(rows.last.getLong(0) === 100L && rows.last.getLong(1) === 7L)
  }

  test("columnar read path: vectorized batches, identical results, DV-aware") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.col_t")
    spark.sql(
      """CREATE TABLE graft_cat.db.col_t (id BIGINT, s STRING, v BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_cat.db.col_t
        |SELECT id, CASE WHEN id % 7 = 0 THEN NULL ELSE concat('s', id) END,
        |  id * 3 FROM range(0, 5000)""".stripMargin)
    spark.sql("DELETE FROM graft_cat.db.col_t WHERE id % 500 = 3") // DV path
    spark.sql("ALTER TABLE graft_cat.db.col_t ADD COLUMN d BIGINT DEFAULT 9")
    val q = "SELECT id, s, v, d FROM graft_cat.db.col_t ORDER BY id"
    // AQE finalizes the plan at execution: collect first, then inspect
    // only the final-plan prefix (before the "== Initial Plan ==" echo)
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    }
    val on = spark.sql(q)
    val onRows = on.collect().map(_.toSeq).toSeq
    assert(finalPlan(on).contains("ColumnarToRow"),
      "catalog scan did not vectorize:\n" + finalPlan(on))
    spark.conf.set(graft.sources.SegColumnar.ConfKey, "false")
    try {
      val off = spark.sql(q)
      assert(off.collect().map(_.toSeq).toSeq === onRows,
        "columnar and row reads must be value-identical")
      assert(!finalPlan(off).contains("ColumnarToRow"))
    } finally spark.conf.set(graft.sources.SegColumnar.ConfKey, "true")
    assert(onRows.length === 4990)
    assert(onRows.forall(_.last == 9L), "existence default lost in columnar read")
    // metadata columns still route through the columnar fills
    assert(spark.sql(
      "SELECT COUNT(DISTINCT _file) FROM graft_cat.db.col_t WHERE _pos >= 0")
      .head.getLong(0) >= 1L)
  }

  test("streaming CDC apply onto merge-on-read: row-level, replay-idempotent (ext123)") {
    val rows = streaming.Streams.queries("ext123_stream_cdc_upsert_mor")(spark, sf)
      .collect()
    def v(id: Long) = (id * 2654435761L) % 1000L
    def bump(id: Long) = id match {
      case i if i < 100 => 10000L
      case i if i < 200 => 30000L
      case i if i < 400 => 20000L
      case i if i < 500 => 10000L
      case _ => 0L
    }
    def ver(id: Long) = id match {
      case i if i < 100 => 2L
      case i if i < 200 => 4L
      case i if i < 400 => 3L
      case i if i < 500 => 2L
      case _ => 1L
    }
    val live = (0L until 1000L).filterNot(id =>
      id % 2 == 1 && (id < 100 || (id >= 400 && id < 500)))
    val exp = live.groupBy(_ / 100).toSeq.sortBy(_._1).map { case (b, ids) =>
      (b, ids.size.toLong, ids.map(id => v(id) + bump(id)).sum,
        ids.map(ver).sum)
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === exp)

    // the row-level witness: the initial-image segments were never
    // rewritten — deletes/updates landed as vectors + new segments
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val segs = cat.segTable("db.cdc_mor").currentSegs
    assert(segs.exists(_.dv.nonEmpty), "CDC deletes did not use vectors")

    // REPLAY IDEMPOTENCE (the ext46 discipline on the row-level path):
    // a checkpoint-recovery re-delivery of the final batch must leave
    // the table byte-identical — upserts re-apply equal values, deletes
    // of absent keys match nothing
    val before = spark.sql(
      "SELECT * FROM graft_cat.db.cdc_mor ORDER BY id").collect().toSeq
    val seq0 = spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "1000").option("parts", "2").load()
    val b2replay = seq0.filter(col("id") >= 100 && col("id") < 400).select(
      (col("id") + 1400).as("seq"), col("id"), lit("U").as("op"),
      (col("v") + 20000).as("v"), lit(3L).as("ver"))
      .unionAll(seq0.filter(col("id") >= 100 && col("id") < 200).select(
        (col("id") + 1700).as("seq"), col("id"), lit("U").as("op"),
        (col("v") + 30000).as("v"), lit(4L).as("ver")))
    streaming.Streams.applyCdcMorBatch(b2replay)
    // also replay a batch containing only deletes of already-gone keys
    val delReplay = seq0.filter(col("id") < 100 && col("id") % 2 === 1)
      .select((col("id") + 1000).as("seq"), col("id"), lit("D").as("op"),
        col("v"), lit(2L).as("ver"))
    streaming.Streams.applyCdcMorBatch(delReplay)
    val after = spark.sql(
      "SELECT * FROM graft_cat.db.cdc_mor ORDER BY id").collect().toSeq
    assert(after === before, "replayed CDC batch changed the table state")
  }

  test("auto-compact triggers on deletion-vector ratio; GC reclaims purged DVs") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.dvac_t")
    spark.sql(
      """CREATE TABLE graft_cat.db.dvac_t (id BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read',
        |  'graft.autocompact'='100000000:999:25')""".stripMargin)
    spark.sql("INSERT INTO graft_cat.db.dvac_t SELECT id FROM range(0, 1000)")
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.GraftCatalog]
    def segs() = cat.segTable("db.dvac_t").currentSegs
    // 10% deleted: below the 25% threshold — vectors accumulate
    spark.sql("DELETE FROM graft_cat.db.dvac_t WHERE id % 10 = 3")
    assert(segs().exists(_.dv.nonEmpty),
      "sub-threshold delete must stay merge-on-read")
    val dvFiles = segs().flatMap(_.dv).map(_.file)
    // +20% more: the table-wide ratio crosses 25% and the delta commit's
    // trigger materializes the vectors away (minFiles=999 proves the
    // small-file arm did NOT fire — the ratio arm did)
    spark.sql("DELETE FROM graft_cat.db.dvac_t WHERE id % 10 IN (4, 5)")
    assert(segs().forall(_.dv.isEmpty),
      "crossing maxDeletePct must auto-compact the vectors away")
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.dvac_t")
      .head.getLong(0) === 700L)
    // purged DV sidecars fall to the normal GC once history is expired
    val tdir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_warehouse", "graft_cat", "db.dvac_t")
    spark.sql("CALL graft_cat.system.expire_versions('db.dvac_t', 1)").collect()
    spark.sql("CALL graft_cat.system.vacuum('db.dvac_t', 0)").collect()
    dvFiles.foreach(f => assert(
      !java.nio.file.Files.exists(tdir.resolve(f)),
      s"orphaned deletion vector $f survived expire+vacuum"))
  }

  test("merge-on-read lifecycle query matches its oracle shape (q163)") {
    val rows = ops.SemiStructured.q163MergeOnRead(spark, sf).collect()
    def v(id: Long) = (id * 2654435761L) % 1000L
    val all = (0L until 2000L)
    val mor = all.filter(_ % 100 != 7)
      .map(id => if (id % 100 == 13) v(id) + 100000L else v(id))
    val byPhase = rows.map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // zero data segments rewritten by the DML; 40 rows vectored
    assert(byPhase("t0_witness") === ((0L, 40L)))
    assert(byPhase("t1_preDml") === ((2000L, all.map(v).sum)))
    assert(byPhase("t2_mor") === ((1980L, mor.sum)))
    // compaction purged the vectors without changing a single value
    assert(byPhase("t3_compacted") === byPhase("t2_mor"))
  }

  test("cherry-pick adopts disjoint branch commits onto a diverged main (q164)") {
    val rows = ops.SemiStructured.q164CherryPick(spark, sf).collect()
    def v(id: Long) = (id * 2654435761L) % 1000L
    val merged = (0L until 1500L) ++ (2000L until 2500L)
    val byLeg = rows.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byLeg("merged") === ((merged.size.toLong, merged.map(v).sum)))
    assert(byLeg("picked") === ((1L, 3L)))
    assert(byLeg("refused") === ((1L, 1L)), "conflicting cherry-pick not refused")
    // the refused pick left main intact: its own delete applied, the
    // branch's delete did NOT leak through
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.cp_q WHERE id >= 50 AND id < 100")
      .head.getLong(0) === 50L)
    // the adopted lane re-seeded at the new main head: another lane
    // commit then fast-forwards cleanly (no divergence refusal)
    spark.sql(
      "INSERT INTO graft_cat.db.cp_q.branch_lane SELECT id, v FROM graft_seq_cp " +
        "WHERE id >= 1500 AND id < 1600")
    val e = intercept[Exception](spark.sql(
      "CALL graft_cat.system.fast_forward('db.cp_q', 'lane')").collect())
    // main moved again (its own DELETE) after the reseed → diverged is
    // the correct refusal; cherry_pick handles it because the sets are
    // disjoint
    assert(e.getMessage.contains("diverged") ||
      Option(e.getCause).exists(c => c.getMessage.contains("diverged")))
    val p2 = spark.sql("CALL graft_cat.system.cherry_pick('db.cp_q', 'lane')").head
    assert(p2.getLong(p2.fieldIndex("commits_picked")) === 1L)
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.cp_q WHERE id >= 1500 AND id < 1600")
      .head.getLong(0) === 100L)
  }

  test("branches: isolation, fast-forward, divergence refusal, GC safety (q162)") {
    val rows = ops.SemiStructured.q162BranchMerge(spark, sf).collect()
    def v(id: Long) = (id * 2654435761L) % 1000L
    val all = (0L until 2000L)
    val br = all.filter(v(_) >= 100)
    val byLeg = rows.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // main never saw the branch's append or delete until the merge
    assert(byLeg("main_v1") === ((1000L, (0L until 1000L).map(v).sum)))
    assert(byLeg("branch") === ((br.size.toLong, br.map(v).sum)))
    assert(byLeg("merged") === byLeg("branch"))
    assert(byLeg("ff") === ((2L, 2L)))

    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.GraftCatalog]

    // divergence refusal: new branch, then main moves on → ff must throw
    spark.sql("CALL graft_cat.system.branch('db.br_t', 'risky')").collect()
    spark.sql(
      "INSERT INTO graft_cat.db.br_t.branch_risky VALUES (90001, 1)")
    spark.sql("INSERT INTO graft_cat.db.br_t VALUES (90002, 2)") // main advances
    val e = intercept[Exception](
      spark.sql("CALL graft_cat.system.fast_forward('db.br_t', 'risky')").collect())
    assert(e.getMessage.contains("diverged"), e.getMessage)
    // the refused merge left main's content untouched
    assert(!spark.sql("SELECT * FROM graft_cat.db.br_t WHERE id = 90001")
      .collect().nonEmpty)

    // main's expire must NOT GC files the branch still references: the
    // branch's own row (90001) and its shared pre-fork files survive a
    // full main-side history expiry
    spark.sql("CALL graft_cat.system.expire_versions('db.br_t', 1)").collect()
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.br_t.branch_risky WHERE id = 90001")
      .head.getLong(0) === 1L)
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.br_t.branch_risky")
      .head.getLong(0) === br.size + 1L)

    // drop_branch: the log goes, the branch stops resolving; its
    // exclusive file becomes a vacuum-reclaimable orphan while main's
    // rows all survive
    spark.sql("CALL graft_cat.system.drop_branch('db.br_t', 'risky')").collect()
    intercept[Exception](
      spark.sql("SELECT * FROM graft_cat.db.br_t.branch_risky").collect())
    val (orphans, _) = cat.segTable("db.br_t").vacuum(0L)
    assert(orphans >= 1L, s"expected the branch-only segment GCed, got $orphans")
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.br_t").head.getLong(0)
      === br.size + 1L) // branch content + main's own 90002

    // branch name validation + duplicate refusal
    intercept[Exception](
      spark.sql("CALL graft_cat.system.branch('db.br_t', 'bad name')").collect())
    spark.sql("CALL graft_cat.system.branch('db.br_t', 'dup')").collect()
    intercept[Exception](
      spark.sql("CALL graft_cat.system.branch('db.br_t', 'dup')").collect())

    // the refs metadata table (Iceberg's `refs`): main + live branches
    // + tags, each with the version it resolves to
    spark.sql("CALL graft_cat.system.tag('db.br_t', 'rel')").collect()
    val refs = spark.sql(
      "SELECT name, type, v FROM graft_cat.db.br_t.refs ORDER BY type, name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val mainV = cat.segTable("db.br_t").currentVersion
    assert(refs.contains(("main", "branch", mainV - 1)) ||
      refs.contains(("main", "branch", mainV)), refs.mkString(", "))
    assert(refs.exists(r => r._1 == "dev" && r._2 == "branch"))
    assert(refs.exists(r => r._1 == "dup" && r._2 == "branch"))
    assert(refs.exists(r => r._1 == "rel" && r._2 == "tag"))
    assert(!refs.exists(_._1 == "risky"), "dropped branch must not be listed")
    spark.sql("CALL graft_cat.system.drop_branch('db.br_t', 'dup')").collect()
  }

  test("change feed: insert/delete/update attribution, compaction emits nothing") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.feed_t")
    spark.sql(
      """CREATE TABLE graft_cat.db.feed_t (id BIGINT, v BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.sql(
      "INSERT INTO graft_cat.db.feed_t SELECT id, id * 2 FROM range(0, 100)") // v1
    spark.sql(
      "INSERT INTO graft_cat.db.feed_t SELECT id, id * 2 FROM range(100, 200)") // v2
    spark.sql("DELETE FROM graft_cat.db.feed_t WHERE id % 10 = 3") // v3
    spark.sql("UPDATE graft_cat.db.feed_t SET v = -1 WHERE id = 50") // v4
    spark.sql("CALL graft_cat.system.compact('db.feed_t', 100000000)").collect() // v5

    def feed(range: String) = spark.sql(
      s"""SELECT id, v, _change_type AS c, _commit_version AS cv
         |FROM graft_cat.db.feed_t VERSION AS OF '$range'""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet

    val expected =
      (0L until 100L).map(i => (i, i * 2, "insert", 1L)).toSet ++
        (100L until 200L).map(i => (i, i * 2, "insert", 2L)) ++
        (0L until 200L).filter(_ % 10 == 3).map(i => (i, i * 2, "delete", 3L)) ++
        Set((50L, 100L, "delete", 4L), (50L, -1L, "insert", 4L))
    assert(feed("cdf:0..") === expected)
    // compaction (v4..v5) is a content-identical reorganization: nothing
    assert(feed("cdf:4..5") === Set.empty[(Long, Long, String, Long)])
    // a sub-range attributes only its own commits
    assert(feed("cdf:2..3") ===
      (0L until 200L).filter(_ % 10 == 3).map(i => (i, i * 2, "delete", 3L)).toSet)
  }

  test("change feed: a point delete's range plans only the touched segment") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.feed_p")
    spark.sql(
      """CREATE TABLE graft_cat.db.feed_p (id BIGINT, v BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    // 4 separate commits → 4+ segments
    (0 until 4).foreach(i => spark.sql(
      s"INSERT INTO graft_cat.db.feed_p SELECT id, id FROM range(${i * 100}, ${i * 100 + 100})"))
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val v0 = cat.segTable("db.feed_p").currentVersion
    spark.sql("DELETE FROM graft_cat.db.feed_p WHERE id = 250")
    val df = spark.sql(
      s"SELECT id, _change_type AS c FROM graft_cat.db.feed_p VERSION AS OF 'cdf:$v0..'")
    // the feed over the delete-only range reads the diff slice of the ONE
    // vectored segment — not the table
    assert(df.rdd.getNumPartitions === 1,
      "a 1-row delete's feed must plan exactly one diff slice")
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((250L, "delete")))
  }

  test("change feed: copy-on-write rewrite refuses; vector shrink refuses") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.feed_cow")
    spark.sql("CREATE TABLE graft_cat.db.feed_cow (id BIGINT, v BIGINT)")
    spark.sql(
      "INSERT INTO graft_cat.db.feed_cow SELECT id, id FROM range(0, 100)")
    // default mode: row-level UPDATE is a copy-on-write group rewrite
    spark.sql("UPDATE graft_cat.db.feed_cow SET v = -1 WHERE id = 5")
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM graft_cat.db.feed_cow VERSION AS OF 'cdf:0..'").collect())
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(msg).getOrElse("")
    assert(msg(e).contains("copy-on-write"), msg(e))

    // rollback across a merge-on-read delete shrinks a vector — refuse
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.feed_rb")
    spark.sql(
      """CREATE TABLE graft_cat.db.feed_rb (id BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft_cat.db.feed_rb SELECT id FROM range(0, 100)")
    spark.sql("DELETE FROM graft_cat.db.feed_rb WHERE id = 1") // v2
    spark.sql("CALL graft_cat.system.rollback('db.feed_rb', 1)").collect() // v3
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_cat.db.feed_rb VERSION AS OF 'cdf:0..'").collect())
    assert(msg(e2).contains("shrank"), msg(e2))
  }

  test("change feed: metadata DELETE's dropped segments emit their live rows") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.feed_md")
    spark.sql(
      """CREATE TABLE graft_cat.db.feed_md (id BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft_cat.db.feed_md SELECT id FROM range(0, 100)")    // v1
    spark.sql("INSERT INTO graft_cat.db.feed_md SELECT id FROM range(100, 200)")  // v2
    spark.sql("DELETE FROM graft_cat.db.feed_md WHERE id = 150") // v3: one vectored row
    // definite on zone maps → metadata delete drops whole segments; the
    // already-vectored row must NOT re-appear in the emitted deletes
    spark.sql("DELETE FROM graft_cat.db.feed_md WHERE id >= 100") // v4
    val rows = spark.sql(
      """SELECT id, _commit_version AS cv
        |FROM graft_cat.db.feed_md VERSION AS OF 'cdf:2..'
        |WHERE _change_type = 'delete'""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((150L, 3L)) ++
      (100L until 200L).filter(_ != 150L).map(i => (i, 4L))
    assert(rows === expected)
  }

  private def registerSecondCatalog(name: String): Unit = {
    val wh = sys.props("java.io.tmpdir") + "/graft_warehouse/graft_cat"
    val keys = Seq(s"spark.sql.catalog.$name" -> "graft.sources.GraftCatalog",
      s"spark.sql.catalog.$name.warehouse" -> wh)
    val saved = keys.map { case (k, _) => k -> spark.conf.getAll.get(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sessionState.catalogManager.catalog(name)
    saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def causeMessages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  test("merge-on-read DML aborts when a racing commit moved a target's dv") {
    // the Iceberg dv-drift validation on the DELTA path: a stale-handle
    // UPDATE whose target row a concurrent merge-on-read DELETE already
    // vectored would re-append the row's update image — resurrecting a
    // concurrently deleted row. The commit must abort instead.
    ops.ensureGraftCatalog(spark)
    registerSecondCatalog("graft_mor2")
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.mor_race")
    spark.sql(
      """CREATE TABLE graft_cat.db.mor_race (id BIGINT, v BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.sql(
      "INSERT INTO graft_cat.db.mor_race SELECT id, id FROM range(0, 1000)")
    // instance 2 vectors id=5; instance 1's cached handle is now stale
    spark.sql("REFRESH TABLE graft_mor2.db.mor_race")
    spark.sql("DELETE FROM graft_mor2.db.mor_race WHERE id = 5")
    val e = intercept[Exception] {
      spark.sql("UPDATE graft_cat.db.mor_race SET v = -1 WHERE id = 5")
    }
    assert(causeMessages(e).exists(
        _.contains("deletion vector a concurrent commit changed")),
      s"expected the dv-drift abort, got: ${causeMessages(e).mkString(" | ")}")
    // the racing delete's outcome is intact: id=5 stays deleted
    spark.sql("REFRESH TABLE graft_cat.db.mor_race")
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.mor_race")
      .head.getLong(0) === 999L)
    assert(spark.sql("SELECT COUNT(*) FROM graft_cat.db.mor_race WHERE id = 5")
      .head.getLong(0) === 0L)
    // a RETRY against the fresh head touches no pre-race state: the
    // update's predicate re-evaluates and the table converges
    spark.sql("UPDATE graft_cat.db.mor_race SET v = -1 WHERE id = 6")
    assert(spark.sql("SELECT v FROM graft_cat.db.mor_race WHERE id = 6")
      .head.getLong(0) === -1L)
  }

  test("zorder commits op='zorder'; the change feed skips it like compact") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.zcdf_t")
    spark.sql(
      """CREATE TABLE graft_cat.db.zcdf_t (a BIGINT, b BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.sql(
      """INSERT INTO graft_cat.db.zcdf_t
        |SELECT id % 100, id div 100 FROM range(0, 10000)""".stripMargin) // v1
    spark.sql("CALL graft_cat.system.zorder('db.zcdf_t', 'a', 'b', 4)")
      .collect() // v2
    val ops2 = spark.sql(
      "SELECT v, operation FROM graft_cat.db.zcdf_t.versions")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops2(2L) === "zorder", s"versions ledger: $ops2")
    // a content-identical physical reorganization is ZERO logical change:
    // a CDC consumer replaying v1..v2 must see nothing, not 10k deletes
    // + 10k inserts
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.zcdf_t VERSION AS OF 'cdf:1..2'")
      .head.getLong(0) === 0L)
    // the full range still attributes the original inserts
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft_cat.db.zcdf_t VERSION AS OF 'cdf:0..'")
      .head.getLong(0) === 10000L)
  }

  test("RLE deletion vectors: round-trip fuzz, dense compression, legacy reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv_rle")
    try {
      val rnd = new scala.util.Random(42)
      // round-trip fuzz: random sorted-distinct sets of many shapes
      // (empty, singletons, dense runs, sparse spray) decode identically
      (0 until 50).foreach { k =>
        val n = rnd.nextInt(2000)
        val ps = Array.fill(n)(rnd.nextLong(20000L).abs).distinct.sorted
        val dv = graft.sources.SegDv.write(dir, s"dv-f$k.bin", ps)
        assert(dv.ndel === ps.length.toLong)
        assert(graft.sources.SegDv.read(dir.resolve(dv.file)).toSeq ===
          ps.toSeq, s"fuzz round $k diverged")
      }
      // a fully-contiguous run is O(1) bytes, not 8 B/row: the VERDICT
      // scenario (half-deleted huge segment) collapses to one run
      val dense = (0L until 100000L).toArray
      val dd = graft.sources.SegDv.write(dir, "dv-dense.bin", dense)
      val denseBytes = java.nio.file.Files.size(dir.resolve(dd.file))
      assert(denseBytes < 32L,
        s"dense run must collapse (got $denseBytes bytes for 100k rows)")
      assert(graft.sources.SegDv.read(dir.resolve(dd.file)).length === 100000)
      // worst case (alternating singletons) still beats raw 8 B/row
      val sparse = (0L until 50000L).map(_ * 2).toArray
      val sd = graft.sources.SegDv.write(dir, "dv-sparse.bin", sparse)
      assert(java.nio.file.Files.size(dir.resolve(sd.file)) <
        8L * sparse.length / 2,
        "alternating singletons must stay well under the raw format")
      // pre-upgrade sidecars (raw longs) decode through the same read()
      val legacy = graft.sources.SegDv.writeLegacy(dir, "dv-old.bin",
        Array(3L, 4L, 5L, 99L))
      assert(graft.sources.SegDv.read(dir.resolve(legacy.file)).toSeq ===
        Seq(3L, 4L, 5L, 99L))
      // corrupt RLE count (claims more positions than the runs hold)
      val one = graft.sources.SegDv.write(dir, "dv-c.bin", Array(7L))
      val p = dir.resolve(one.file)
      val bytes = java.nio.file.Files.readAllBytes(p)
      bytes(7) = 9 // count 1 -> 9, payload still one 1-length run
      java.nio.file.Files.write(p, bytes)
      val e = intercept[IllegalArgumentException] {
        graft.sources.SegDv.read(p)
      }
      assert(e.getMessage.contains("bad deletion vector"), e.getMessage)
    } finally {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
    }
  }

  test("a truncated deletion-vector sidecar fails loudly, not mid-scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv_trunc")
    try {
      val dv = graft.sources.SegDv.write(dir, "dv-t.bin",
        Array(1L, 5L, 9L, 12L))
      val p = dir.resolve(dv.file)
      // drop the last 8 bytes: count says 4, payload holds 3
      val bytes = java.nio.file.Files.readAllBytes(p)
      java.nio.file.Files.write(p, bytes.dropRight(8))
      val e = intercept[IllegalArgumentException] {
        graft.sources.SegDv.read(p)
      }
      assert(e.getMessage.contains("bad deletion vector"), e.getMessage)
      // intact sidecars round-trip unchanged
      val ok = graft.sources.SegDv.write(dir, "dv-ok.bin", Array(2L, 3L))
      assert(graft.sources.SegDv.read(dir.resolve(ok.file)).toSeq ===
        Seq(2L, 3L))
    } finally {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
    }
  }

  test("columnar wholesale-decode bound is conf-tunable; over-bound row-reads") {
    // the bound caps PER-TASK heap (whole encoded segment + OnHeap
    // vectors); a segment above it must stream through the row reader
    // with identical values, not OOM the executor
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.colb_t")
    spark.sql("CREATE TABLE graft_cat.db.colb_t (id BIGINT, v BIGINT)")
    spark.sql(
      "INSERT INTO graft_cat.db.colb_t SELECT id, id * 7 FROM range(0, 4000)")
    val q = "SELECT id, v FROM graft_cat.db.colb_t ORDER BY id"
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    }
    val on = spark.sql(q)
    val onRows = on.collect().map(_.toSeq).toSeq
    assert(finalPlan(on).contains("ColumnarToRow"), finalPlan(on))
    spark.conf.set(graft.sources.SegColumnar.MaxSegBytesKey, "64")
    try {
      val off = spark.sql(q)
      assert(off.collect().map(_.toSeq).toSeq === onRows,
        "row fallback must be value-identical")
      assert(!finalPlan(off).contains("ColumnarToRow"),
        "a segment above the decode bound must not take the wholesale path")
    } finally spark.conf.unset(graft.sources.SegColumnar.MaxSegBytesKey)
  }

  test("cross-session read freshness: a cached handle follows new commits") {
    // a SECOND session state owns its own GraftCatalog instance — before
    // the scan-time snapshot refresh, its cached SegTable pinned every
    // read to the version it FIRST loaded, so commits from the writer
    // session stayed invisible to it forever (the ext133 foreachBatch
    // staleness). Reads must resolve the current committed head.
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.fresh_t")
    spark.sql("CREATE TABLE graft_cat.db.fresh_t (id BIGINT)")
    spark.sql("INSERT INTO graft_cat.db.fresh_t SELECT id FROM range(0, 10)")
    val other = spark.newSession()
    // CatalogManager resolves plugins through the thread-active SQLConf
    org.apache.spark.sql.classic.SparkSession.setActiveSession(
      other.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    try {
      ops.ensureGraftCatalog(other)
      assert(other.table("graft_cat.db.fresh_t").count() === 10L)
      // commit from the FIRST session; the second session's cached
      // handle must see it on its next planned scan
      spark.sql("INSERT INTO graft_cat.db.fresh_t SELECT id FROM range(10, 25)")
      assert(other.table("graft_cat.db.fresh_t").count() === 25L,
        "second-session read pinned to a stale snapshot")
      // and a row-level change (merge-on-read delete) is equally visible
      spark.sql("ALTER TABLE graft_cat.db.fresh_t " +
        "SET TBLPROPERTIES ('graft.dml.mode'='merge-on-read')")
      spark.sql("DELETE FROM graft_cat.db.fresh_t WHERE id < 5")
      assert(other.table("graft_cat.db.fresh_t").count() === 20L,
        "second-session read missed a merge-on-read delete")
    } finally org.apache.spark.sql.classic.SparkSession.setActiveSession(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
  }
}
