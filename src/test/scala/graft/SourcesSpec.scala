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
}
