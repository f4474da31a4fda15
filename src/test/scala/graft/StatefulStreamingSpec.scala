package graft

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._

/** Custom streaming state via flatMapGroupsWithState (SURVEY.md §7.3 —
  * built-in session_window covers the oracle path; this demonstrates the
  * custom-state tier for semantics windows can't express: a running
  * per-user high-water mark emitting only new records).
  */
object StatefulStreamingSpec {
  // top-level: inner-class case classes can't get encoders
  case class Event(user_id: Long, value: Double)
  case class HighWater(user_id: Long, value: Double)
}

class StatefulStreamingSpec extends SparkTestBase {
  import StatefulStreamingSpec.{Event, HighWater}

  test("streaming bitmap distinct: emissions monotone, final equals batch recompute") {
    import org.apache.spark.sql.functions._
    val rows = graft.streaming.Streams.streamBitmapDistinct(spark, sf).collect()
    val byType = rows.groupBy(_.getString(0))
    assert(byType.nonEmpty)
    byType.foreach { case (t, rs) =>
      val emits = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(emits.length == 2, s"$t: expected 2 emissions")
      assert(emits(0) <= emits(1), s"$t: bitmap shrank across batches")
    }
    // final emission per type equals a batch COUNT(DISTINCT)
    val batch = graft.ops.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (t, rs) =>
      assert(rs.maxBy(_.getLong(1)).getLong(2) == batch(t), s"$t: final count")
    }
  }

  test("flatMapGroupsWithState: per-user high-water marks over a real stream") {
    import spark.implicits._
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    // drive a MemoryStream so state actually persists across micro-batches
    implicit val sc = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]

    val flow = source.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Event], state: GroupState[Double]) =>
          var hw = state.getOption.getOrElse(Double.NegativeInfinity)
          val out = events.toSeq.sortBy(_.value).flatMap { e =>
            if (e.value > hw) { hw = e.value; Some(HighWater(user, e.value)) }
            else None
          }
          state.update(hw)
          out.iterator
      }

    val query = flow.writeStream.outputMode("append")
      .format("memory").queryName("graft_highwater").start()
    try {
      source.addData(Event(1, 5.0), Event(1, 3.0), Event(2, 1.0))
      query.processAllAvailable()
      source.addData(Event(1, 4.0), Event(1, 9.0), Event(2, 2.0))
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table("graft_highwater").as[HighWater].collect()
      .groupBy(_.user_id).view.mapValues(_.map(_.value).sorted.toSeq).toMap
    // batch 1: u1 emits 3,5 (sorted within batch); u2 emits 1
    // batch 2: u1's 4 is below the high-water 5 -> only 9 emitted; u2 emits 2
    assert(got(1L) === Seq(3.0, 5.0, 9.0))
    assert(got(2L) === Seq(1.0, 2.0))
  }

  test("RocksDB state store: same stateful results with disk-backed state") {
    // the 100 TB state story: HDFSBackedStateStore keeps every key on the
    // executor heap; RocksDB spills to local disk so state size is bounded
    // by storage, not memory. Same query, same results, one conf.
    import spark.implicits._
    val saved = util.Try(spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass")).toOption
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sc = spark.sqlContext
      val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
      val flow = source.toDS()
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (user: Long, events: Iterator[Event], state: GroupState[Double]) =>
            var hw = state.getOption.getOrElse(Double.NegativeInfinity)
            val out = events.toSeq.sortBy(_.value).flatMap { e =>
              if (e.value > hw) { hw = e.value; Some(HighWater(user, e.value)) }
              else None
            }
            state.update(hw)
            out.iterator
        }
      val query = flow.writeStream.outputMode("append")
        .format("memory").queryName("graft_highwater_rocks").start()
      try {
        source.addData(Event(1, 5.0), Event(2, 1.0))
        query.processAllAvailable()
        source.addData(Event(1, 4.0), Event(1, 9.0), Event(2, 2.0))
        query.processAllAvailable()
      } finally query.stop()
      val got = spark.table("graft_highwater_rocks").as[HighWater].collect()
        .groupBy(_.user_id).view.mapValues(_.map(_.value).sorted.toSeq).toMap
      assert(got(1L) === Seq(5.0, 9.0)) // 4 suppressed by RocksDB-held state
      assert(got(2L) === Seq(1.0, 2.0))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState: both named state variables persist across batches") {
    // the Spark 4 arbitrary-state API behind ext82 — a ValueState counter
    // and a MapState type-set on the same key must BOTH survive into the
    // second micro-batch for the expected output
    import spark.implicits._
    import graft.streaming.Streams.{EvT, SeqOut}
    val saved = util.Try(spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass")).toOption
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sc = spark.sqlContext
      val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EvT]
      val flow = source.toDS()
        .groupByKey(_.user_id)
        .transformWithState(new graft.streaming.Streams.SeqNoProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
      val query = flow.writeStream.outputMode("append")
        .format("memory").queryName("graft_tws_spec").start()
      try {
        source.addData(EvT(1, 7, "a", 10), EvT(2, 7, "b", 20))
        query.processAllAvailable()
        // batch 2: counter must continue at 3; "a" must NOT flag again
        source.addData(EvT(3, 7, "a", 30), EvT(4, 7, "c", 40))
        query.processAllAvailable()
      } finally query.stop()
      val got = spark.table("graft_tws_spec").as[SeqOut].collect()
        .sortBy(_.event_id).toSeq
      assert(got === Seq(
        SeqOut(7, 1, 1, 1), SeqOut(7, 2, 2, 1),
        SeqOut(7, 3, 3, 0), SeqOut(7, 4, 4, 1)))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("catalog table as streaming source: version-diff batches, exactly once (ext92)") {
    val rows = streaming.Streams.queries("ext92_stream_catalog_source")(spark, sf)
      .collect()
    def v(id: Long) = (id * 2654435761L) % 1000L
    assert(rows.length === 8) // bands 0..7, each exactly once
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(1) === 500L,
        s"band $b counted ${r.getLong(1)} rows — a re-read would double-count")
      assert(r.getLong(2) === (b * 500 until (b + 1) * 500).map(v).sum)
    }
    // the exactly-once totals above ARE the diff-batch proof: the first
    // commit (bands 0..2) was already drained before the second insert,
    // so a source that re-planned the whole table per trigger would have
    // appended those rows twice and failed the n===500 assertion
  }

  test("streaming FROM a branch drains that log only; main commits invisible") {
    // the branch SegTable threads its own log into the micro-batch
    // stream: offsets are branch-log versions, so triggers see exactly
    // the commits landed on the branch — never main's
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.brs_t")
    spark.sql("CREATE TABLE graft_cat.db.brs_t (id BIGINT, v BIGINT)")
    spark.sql(
      "INSERT INTO graft_cat.db.brs_t SELECT id, id * 3 FROM range(0, 100) AS t(id)")
    spark.sql("CALL graft_cat.system.branch('db.brs_t', 'live')")
    val sinkName = "graft_stream_branch_sink"
    val query = spark.readStream.table("graft_cat.db.brs_t.branch_live")
      .writeStream.outputMode("append")
      .format("memory").queryName(sinkName).start()
    try {
      query.processAllAvailable()
      spark.sql(
        """INSERT INTO graft_cat.db.brs_t.branch_live
          |SELECT id, id * 3 FROM range(100, 150) AS t(id)""".stripMargin)
      spark.sql( // main-only commit: must never reach the branch stream
        "INSERT INTO graft_cat.db.brs_t SELECT id, id * 3 FROM range(900, 950) AS t(id)")
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table(sinkName).collect().map(_.getLong(0)).sorted.toSeq
    // offsets start at the FORK line, so the seed content is the initial
    // snapshot boundary and only post-fork branch commits stream
    assert(got === (100L until 150L).toSeq,
      s"branch stream drained ${got.size} rows: ${got.take(5)}..${got.takeRight(5)}")
  }

  test("live stream survives compact/zorder mid-flight; MoR delete refuses loudly") {
    // the q154/auto-compaction × streaming-reader interaction: a
    // content-identical physical reorganization (compact, zorder) must
    // NOT kill a live reader — the step-wise range walk skips it
    // (Delta's dataChange=false discipline) and keeps exactly-once at
    // the logical-row level — while a REAL content change mid-stream (a
    // merge-on-read DELETE vectoring delivered rows) must refuse loudly
    // rather than misattribute.
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cmp_s")
    spark.sql(
      """CREATE TABLE graft_cat.db.cmp_s (id BIGINT, v BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.sql(
      "INSERT INTO graft_cat.db.cmp_s SELECT id, id * 3 FROM range(0, 100) AS t(id)")
    val sinkName = "graft_stream_compact_sink"
    val query = spark.readStream.table("graft_cat.db.cmp_s")
      .writeStream.outputMode("append")
      .format("memory").queryName(sinkName).start()
    try {
      query.processAllAvailable() // offsets start at CREATE: v1 streams too
      spark.sql(
        "INSERT INTO graft_cat.db.cmp_s SELECT id, id * 3 FROM range(100, 200) AS t(id)")
      query.processAllAvailable()
      assert(spark.table(sinkName).count() === 200L)
      // compaction rewrites every delivered segment — the stream must
      // cross it delivering NOTHING for it (content-identical), then
      // keep draining appends
      spark.sql("CALL graft_cat.system.compact('db.cmp_s', 1048576)").collect()
      spark.sql(
        "INSERT INTO graft_cat.db.cmp_s SELECT id, id * 3 FROM range(200, 250) AS t(id)")
      query.processAllAvailable()
      val afterCompact = spark.table(sinkName).collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(afterCompact === (0L until 250L).toSeq,
        s"compaction crossing re-delivered or dropped rows: got ${afterCompact.size}")
      // zorder publishes through INSERT OVERWRITE but is labeled as the
      // content-identical reorganization it is — also skipped
      spark.sql("CALL graft_cat.system.zorder('db.cmp_s', 'id', 'v', 2)").collect()
      spark.sql(
        "INSERT INTO graft_cat.db.cmp_s SELECT id, id * 3 FROM range(250, 260) AS t(id)")
      query.processAllAvailable()
      assert(spark.table(sinkName).count() === 260L)
      // a merge-on-read DELETE changes delivered rows in place (vector
      // sidecar, same file name): real content change → loud refusal
      spark.sql("DELETE FROM graft_cat.db.cmp_s WHERE id < 10")
      spark.sql(
        "INSERT INTO graft_cat.db.cmp_s SELECT id, id * 3 FROM range(260, 270) AS t(id)")
      val e = intercept[Exception](query.processAllAvailable())
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("append-only")), messages(e).mkString(" | "))
    } finally query.stop()
  }

  test("startingVersion: fresh streams skip poisoned history; earliest refuses") {
    // a table with a historical rewrite (an old merge-on-read DELETE)
    // can never START a fresh default stream — the earliest replay hits
    // the non-append step. The startingVersion read option (Delta's
    // knob) is the operability fix: 'latest' tails new commits only; a
    // numeric N delivers from version N inclusive.
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.sv_t")
    spark.sql(
      """CREATE TABLE graft_cat.db.sv_t (id BIGINT, v BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO graft_cat.db.sv_t SELECT id, id FROM range(0, 50) AS t(id)")
    spark.sql("DELETE FROM graft_cat.db.sv_t WHERE id < 5")
    spark.sql("INSERT INTO graft_cat.db.sv_t SELECT id, id FROM range(100, 150) AS t(id)")
    val vIns2 = spark.sql("SELECT MAX(v) AS v FROM graft_cat.db.sv_t.versions")
      .head.getLong(0)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

    val q0 = spark.readStream.table("graft_cat.db.sv_t")
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sv_earliest").start()
    val e = try intercept[Exception](q0.processAllAvailable()) finally q0.stop()
    assert(messages(e).exists(_.contains("append-only")), messages(e).mkString(" | "))

    val q1 = spark.readStream.option("startingVersion", vIns2.toString)
      .table("graft_cat.db.sv_t")
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sv_numeric").start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.table("graft_sv_numeric").collect().map(_.getLong(0)).sorted.toSeq
      === (100L until 150L).toSeq)

    val q2 = spark.readStream.option("startingVersion", "latest")
      .table("graft_cat.db.sv_t")
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sv_latest").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("graft_sv_latest").count() === 0L,
        "latest must not replay history")
      spark.sql("INSERT INTO graft_cat.db.sv_t SELECT id, id FROM range(200, 210) AS t(id)")
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.table("graft_sv_latest").collect().map(_.getLong(0)).sorted.toSeq
      === (200L until 210L).toSeq)

    val bad = intercept[Exception] {
      val q = spark.readStream.option("startingVersion", "yesterday")
        .table("graft_cat.db.sv_t")
        .writeStream.format("memory").queryName("graft_sv_bad").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(messages(bad).exists(_.contains("startingVersion")),
      messages(bad).mkString(" | "))
  }

  test("admission control schedules one commit per trigger under the cap (ext103)") {
    val rows = streaming.Streams.queries("ext103_stream_rate_limit")(spark, sf)
      .collect()
    def v(id: Long) = (id * 2654435761L) % 1000L
    assert(rows.length === 4) // bands 0..3
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(1) === 1000L)
      assert(r.getLong(2) === (b * 1000 until (b + 1) * 1000).map(v).sum)
      // 4 versions x 4 segments, cap 4 -> exactly 4 data micro-batches;
      // an uncapped source would drain everything in one
      assert(r.getLong(3) === 4L, s"n_batches = ${r.getLong(3)}")
    }
  }

  test("quarantine split is exactly the declared constraint (ext107)") {
    val rows = streaming.Streams.queries("ext107_stream_quarantine")(spark, sf)
      .collect()
    def v(id: Long) = (id * 2654435761L) % 1000L
    val all = (0L until 1500L).map(v)
    val kept = rows.find(_.getString(0) == "kept").get
    val dead = rows.find(_.getString(0) == "quarantined").get
    assert(kept.getLong(1) === all.count(_ < 900).toLong)
    assert(dead.getLong(1) === all.count(_ >= 900).toLong)
    assert(kept.getLong(2) === all.filter(_ < 900).sum)
    assert(dead.getLong(2) === all.filter(_ >= 900).sum)
    // nothing lost, nothing duplicated: the split partitions the input
    assert(kept.getLong(1) + dead.getLong(1) === 1500L)
  }

  test("stream lands on a branch; audit+repair there; publish is atomic (ext114)") {
    val rows = streaming.Streams.queries("ext114_stream_wap_branch")(spark, sf)
      .collect()
    def v(id: Long) = (id * 2654435761L) % 1000L
    val byLeg = rows.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val seed = (0L until 500L)
    val ing = (500L until 1500L)
    val bad = ing.filter(v(_) >= 900)
    assert(byLeg("main_v1") === ((500L, seed.map(v).sum)))
    assert(byLeg("bad") === ((bad.size.toLong, bad.map(v).sum)))
    assert(byLeg("published") ===
      ((1500L - bad.size, seed.map(v).sum + ing.filterNot(v(_) >= 900).map(v).sum)))
    assert(byLeg("ff") === ((3L, 2L))) // 2 stream appends + 1 repair

    // no unaudited row was EVER visible on main: its whole history is
    // seed (v1) then audited-published (v2) — nothing in between
    val ops2 = spark.sql(
      "SELECT v, operation FROM graft_cat.db.wap_t.versions ORDER BY v")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(ops2 === Array((0L, "create"), (1L, "append"), (2L, "fastforward")))
    // the publish RE-SEEDED the branch at main's new head (the
    // continuous land-on-branch workflow: no manual re-fork needed):
    // fork property = main's v2, version numbering monotonic (old head
    // v4 -> re-seed v5 — never reset, so version-derived artifact names
    // are never reused)
    val bops = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.GraftCatalog]
      .segTable("db.wap_t.branch_ingest")
    assert(bops.currentVersion === 5L)
    assert(bops.properties().get("graft.fork") === "2")
  }

  test("StreamingQueryProgress exposes state-store size (the ops dashboard feed)") {
    // capacity planning at scale runs off these numbers: rows held per
    // stateful operator and their memory footprint, per micro-batch
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val flow = source.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Event], state: GroupState[Double]) =>
          val hw = math.max(state.getOption.getOrElse(Double.NegativeInfinity),
            events.map(_.value).max)
          state.update(hw)
          Iterator.single(HighWater(user, hw))
      }
    val query = flow.writeStream.outputMode("append")
      .format("memory").queryName("graft_state_metrics").start()
    try {
      source.addData(Event(1, 5.0), Event(2, 1.0), Event(3, 2.0))
      query.processAllAvailable()
      val state = query.lastProgress.stateOperators
      assert(state.nonEmpty, "no state operators reported")
      assert(state.head.numRowsTotal === 3, state.head.json)
      assert(state.head.memoryUsedBytes > 0, state.head.json)
    } finally query.stop()
  }

  test("observe(): pipeline metrics collected in-flight, no second pass") {
    // production pipelines need row counts / quality tallies without
    // re-executing the plan; observe() attaches metric aggregates to the
    // one materializing pass
    val obs = new org.apache.spark.sql.Observation("graft_obs")
    val df = ops.table(spark, sf, "lineitem")
      .observe(obs, count(lit(1)).as("rows_seen"),
        sum(when(col("l_quantity") > 45, 1).otherwise(0)).as("hot_rows"))
      .filter(col("l_quantity") > 45)
    val filtered = df.count()
    val metrics = obs.get
    assert(metrics("rows_seen").asInstanceOf[Long] ===
      ops.table(spark, sf, "lineitem").count())
    assert(metrics("hot_rows").asInstanceOf[Long] === filtered)
  }
}
