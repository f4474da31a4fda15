package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** Pins the streaming change-feed source's contracts beyond ext128's
  * oracle: exactly-once at the CHANGE-ROW level across a checkpointed
  * restart (the foreachBatch sink recovers offsets; nothing replays,
  * nothing is skipped), loud refusal on unattributable copy-on-write
  * history, and `startingVersion` semantics on the CDF surface. */
class CdfStreamSpec extends SparkTestBase {

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("exactly-once across checkpoint restart; compaction emits nothing") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cdfs_t")
    spark.sql(
      """CREATE TABLE graft_cat.db.cdfs_t (id BIGINT, v BIGINT)
        |TBLPROPERTIES ('graft.dml.mode'='merge-on-read')""".stripMargin)
    spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "1000").option("parts", "2").load()
      .createOrReplaceTempView("graft_seq_cdfs")
    spark.sql("INSERT INTO graft_cat.db.cdfs_t SELECT id, v FROM graft_seq_cdfs WHERE id < 500") // v1

    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val cp = Files.createTempDirectory("graft_cdfs_cp").toString
    def start() = spark.readStream.table("graft_cat.db.cdfs_t.changes")
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("id", "_change_type", "_commit_version").collect().foreach(r =>
          buf.add((r.getLong(0), r.getString(1), r.getLong(2))))
        ()
      }
      .start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    import scala.jdk.CollectionConverters._
    assert(buf.asScala.toSeq.sorted === (0L until 500L).map((_, "insert", 1L)).sorted)

    spark.sql("DELETE FROM graft_cat.db.cdfs_t WHERE v < 50")                                     // v2
    spark.sql("INSERT INTO graft_cat.db.cdfs_t SELECT id, v FROM graft_seq_cdfs WHERE id >= 500") // v3
    spark.sql("CALL graft_cat.system.compact('db.cdfs_t', 100000000)").collect()                  // v4

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val all = buf.asScala.toSeq
    // v1 rows did NOT replay across the restart
    assert(all.count(_._3 == 1L) === 500, "checkpoint restart replayed v1")
    val deleted = spark.sql(
      "SELECT COUNT(*) FROM graft_seq_cdfs WHERE id < 500 AND v < 50").head.getLong(0)
    assert(all.count(t => t._3 == 2L && t._2 == "delete") === deleted)
    assert(all.count(_._3 == 3L) === 500)
    assert(!all.exists(_._3 >= 4L), "compaction must emit nothing")
    assert(all.size === 1000 + deleted, s"duplicate or stray change rows: ${all.size}")
  }

  test("copy-on-write rewrite mid-stream refuses loudly") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cdfs_cow")
    spark.sql("CREATE TABLE graft_cat.db.cdfs_cow (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft_cat.db.cdfs_cow SELECT id, id FROM range(0, 100) AS t(id)")
    val q = spark.readStream.table("graft_cat.db.cdfs_cow.changes")
      .writeStream.format("memory").queryName("graft_cdfs_cow").start()
    try {
      q.processAllAvailable()
      spark.sql("UPDATE graft_cat.db.cdfs_cow SET v = v + 1 WHERE id < 10") // CoW 'rewrite'
      val e = intercept[Exception](q.processAllAvailable())
      assert(msgs(e).exists(_.contains("copy-on-write")), msgs(e).mkString(" | "))
    } finally q.stop()
  }

  test("startingVersion 'latest' tails only post-start commits; batch read refuses") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cdfs_sv")
    spark.sql("CREATE TABLE graft_cat.db.cdfs_sv (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft_cat.db.cdfs_sv SELECT id, id FROM range(0, 100) AS t(id)")
    val q = spark.readStream.option("startingVersion", "latest")
      .table("graft_cat.db.cdfs_sv.changes")
      .writeStream.format("memory").queryName("graft_cdfs_sv").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_cdfs_sv").count() === 0L)
      spark.sql("INSERT INTO graft_cat.db.cdfs_sv SELECT id, id FROM range(100, 120) AS t(id)")
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("graft_cdfs_sv").select("id").collect().map(_.getLong(0)).sorted.toSeq
      === (100L until 120L).toSeq)

    val e = intercept[Exception] {
      spark.read.table("graft_cat.db.cdfs_sv.changes").collect()
    }
    assert(msgs(e).exists(m => m.contains("cdf:") || m.contains("streaming")),
      msgs(e).mkString(" | "))
  }
}
