package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.ext.{CdcIndex, DedupIndex}
import org.apache.spark.sql.functions._

/** Round-15 (VERDICT r14 #5): one shared driver, many independent index
  * jobs. The label ensure* entry points used to be object-level
  * `synchronized`, serializing concurrent builds of DIFFERENT corpora;
  * they now stripe on the index name. Three layers are pinned here:
  *
  *   1. the lock primitive — distinct keys overlap, the same key
  *      serializes;
  *   2. the transaction layer — a txn is THREAD-scoped, so another
  *      thread's unrelated write publishes immediately instead of
  *      silently staging into a stranger's transaction;
  *   3. the integration — two ensureLabels builds of different corpora
  *      run concurrently to completion with correct artifacts on both
  *      sides and no session-conf corruption (the CC loop's old
  *      set/restore of spark.sql.shuffle.partitions is gone).
  */
class ConcurrencySpec extends SparkTestBase {

  test("withNameLock: distinct keys overlap; the same key serializes") {
    val aInside = new CountDownLatch(1)
    val aRelease = new CountDownLatch(1)
    val bDone = new CountDownLatch(1)
    val tA = new Thread(() => CdcIndex.withNameLock("label:cs_a") {
      aInside.countDown()
      aRelease.await(30, TimeUnit.SECONDS); ()
    })
    tA.start()
    assert(aInside.await(10, TimeUnit.SECONDS), "A never took its lock")
    // a DIFFERENT key must proceed while A holds its lock
    val tB = new Thread(() => CdcIndex.withNameLock("label:cs_b") {
      bDone.countDown()
    })
    tB.start()
    assert(bDone.await(10, TimeUnit.SECONDS),
      "an independent index name must not wait on another name's build")
    // the SAME key must block until A releases
    @volatile var cRan = false
    val tC = new Thread(() => CdcIndex.withNameLock("label:cs_a") {
      cRan = true
    })
    tC.start()
    tC.join(300)
    assert(!cRan, "same-name ensure must serialize behind the holder")
    aRelease.countDown()
    tC.join(10000); tA.join(10000); tB.join(10000)
    assert(cRan, "the queued same-name ensure must run after release")
    // and reentrancy: an entry point delegating to a sibling under the
    // same key (ensureLabels -> ensureLabelsCdc) must not self-deadlock
    CdcIndex.withNameLock("label:cs_a") {
      CdcIndex.withNameLock("label:cs_a") { assert(true) }
    }
  }

  test("a transaction is thread-scoped: other threads' writes publish immediately") {
    ops.ensureGraftCatalog(spark)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cs_txn_mine")
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cs_txn_other")
    spark.sql("CREATE TABLE graft_cat.db.cs_txn_mine (x BIGINT)")
    spark.sql("CREATE TABLE graft_cat.db.cs_txn_other (x BIGINT)")
    spark.sql("CALL graft_cat.system.txn_begin()").collect()
    try {
      spark.sql("INSERT INTO graft_cat.db.cs_txn_mine VALUES (1)")
      // the owner's write stages: invisible before commit
      assert(spark.table("graft_cat.db.cs_txn_mine").count() === 0L,
        "the owning thread's write must stage until commit")
      // another thread's unrelated write must NOT stage into this txn —
      // before round 15 it was deferred behind a stranger's commit and
      // invisible to its own issuer's next read
      val otherOk = new java.util.concurrent.atomic.AtomicBoolean(false)
      val t = new Thread(() => {
        spark.sql("INSERT INTO graft_cat.db.cs_txn_other VALUES (7)")
        otherOk.set(spark.table("graft_cat.db.cs_txn_other").count() == 1L)
      })
      t.start(); t.join(60000)
      assert(otherOk.get(),
        "a concurrent thread's write must publish immediately, not stage")
      spark.sql("CALL graft_cat.system.txn_commit()").collect()
    } catch {
      case e: Throwable =>
        try spark.sql("CALL graft_cat.system.txn_abort()").collect()
        catch { case _: Throwable => () }
        throw e
    }
    assert(spark.table("graft_cat.db.cs_txn_mine").count() === 1L)
    assert(spark.table("graft_cat.db.cs_txn_other").count() === 1L)
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cs_txn_mine")
    spark.sql("DROP TABLE IF EXISTS graft_cat.db.cs_txn_other")
  }

  test("two ensureLabels of different corpora run concurrently to completion") {
    ops.ensureGraftCatalog(spark)
    val savedSp = spark.conf.get("spark.sql.shuffle.partitions")
    def mkCorpus(name: String, off: Long): String = {
      val t = s"graft_cat.db.cs_docs_$name"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      Seq("lb_labels", "lb_edges", "lb_posts", "lb_meta",
        "lc_labels", "lc_posts", "lc_df", "lc_meta", "lu_choice")
        .foreach(x =>
          spark.sql(s"DROP TABLE IF EXISTS graft_cat.db.dedup_cs_${name}_$x"))
      spark.sql(s"CREATE TABLE $t (doc_id BIGINT, text STRING) " +
        "TBLPROPERTIES ('graft.dml.mode'='merge-on-read')")
      // two near-dup pairs + singletons, ids offset per corpus
      spark.range(0, 40).select((col("id") + off).as("doc_id"),
          concat(lit("alpha beta gamma delta epsilon zeta eta theta "),
            when(col("id") % 20 < 2, lit("shared dup tail here okay"))
              .otherwise(concat(lit("uniq "), col("id"), lit(" tail "),
                col("id") * 7))).as("text"))
        .writeTo(t).append()
      t
    }
    val ca = mkCorpus("one", 0L)
    val cb = mkCorpus("two", 1000L)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val fams = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val threads = Seq(("one", ca), ("two", cb)).map { case (n, c) =>
      new Thread(() => {
        try {
          DedupIndex.ensureLabels(spark, c, s"cs_$n")
          fams.put(n, spark.table(s"graft_cat.db.dedup_cs_${n}_lu_choice")
            .select("family").head.getString(0))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    assert(errs.isEmpty, s"concurrent ensureLabels failed: ${errs.peek()}")
    // both chose a family and built correct artifacts
    assert(fams.size() === 2)
    Seq("one", "two").foreach { n =>
      val fam = fams.get(n)
      val labels = spark.table(
        s"graft_cat.db.dedup_cs_${n}_${if (fam == "exact") "lb" else "lc"}_labels")
      assert(labels.count() === 40L, s"corpus $n: every doc labeled")
    }
    // and the shared session width survived two concurrent CC loops
    assert(spark.conf.get("spark.sql.shuffle.partitions") === savedSp,
      "concurrent label builds corrupted the session shuffle width")
    Seq("one", "two").foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS graft_cat.db.cs_docs_$n")
      Seq("lb_labels", "lb_edges", "lb_posts", "lb_meta",
        "lc_labels", "lc_posts", "lc_df", "lc_meta", "lu_choice")
        .foreach(x =>
          spark.sql(s"DROP TABLE IF EXISTS graft_cat.db.dedup_cs_${n}_$x"))
    }
  }
}
