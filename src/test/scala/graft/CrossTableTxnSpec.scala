package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.{GraftCatalog, SegTxn}

/** Cross-table atomic transactions ([[graft.sources.SegTxn]]): the
  * all-or-nothing publication discipline the reference inherits from a
  * single DuckDB file (`transformation.py:517-547`) re-built over
  * per-table manifest logs — intention log + idempotent roll-forward.
  * Pins: staged invisibility, the single-file commit point, torn-state
  * recovery on catalog re-open (crash+restart), exactly-once roll-forward
  * under repeated recovery, abort GC, append/overwrite folding, and a
  * model-checked fuzz over random txn/crash/abort interleavings.
  */
class CrossTableTxnSpec extends SparkTestBase {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1337L + i)))

  private val warehouse: Path =
    Paths.get(sys.props("java.io.tmpdir") + "/graft_warehouse/graft_cat")

  private def intents(): Seq[String] = {
    val s = Files.list(warehouse)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("_txn-") && n.endsWith(".json")).toVector
    finally s.close()
  }

  private def count(t: String): Long =
    spark.sql(s"SELECT COUNT(*) AS n FROM graft_cat.db.$t").head.getLong(0)

  private def fresh(tables: String*): Unit = {
    ops.ensureGraftCatalog(spark)
    if (SegTxn.active) SegTxn.abort()
    SegTxn.afterTableCommit.set(_ => ())
    intents().foreach(n => Files.deleteIfExists(warehouse.resolve(n)))
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_cat.db.$t")
      spark.sql(s"CREATE TABLE graft_cat.db.$t (id BIGINT, v BIGINT)")
    }
  }

  private def ins(t: String, lo: Long, hi: Long, overwrite: Boolean = false): Unit =
    spark.sql(s"INSERT ${if (overwrite) "OVERWRITE" else "INTO"} " +
      s"graft_cat.db.$t SELECT id, id * 7 FROM range($lo, $hi)")

  test("staged writes invisible until commit; one commit publishes all tables") {
    fresh("ct_a", "ct_b")
    ins("ct_a", 0, 100); ins("ct_b", 0, 50)
    spark.sql("CALL graft_cat.system.txn_begin()").collect()
    ins("ct_a", 100, 200); ins("ct_b", 50, 150)
    assert(count("ct_a") === 100L, "staged write must be invisible")
    assert(count("ct_b") === 50L, "staged write must be invisible")
    val n = spark.sql("CALL graft_cat.system.txn_commit()").head.getLong(0)
    assert(n === 2L)
    assert(count("ct_a") === 200L)
    assert(count("ct_b") === 150L)
    assert(intents().isEmpty, "intent record must be deleted after roll-forward")
    // the roll-forward commits are tagged for idempotency
    val ops1 = spark.sql("SELECT operation FROM graft_cat.db.ct_a.versions")
      .collect().map(_.getString(0))
    assert(ops1.exists(_.matches("append@txn=[0-9a-f]{16}")), ops1.mkString(","))
  }

  test("crash between table commits: torn-but-durable; catalog re-open recovers exactly once") {
    fresh("ct_a", "ct_b")
    ins("ct_a", 0, 10); ins("ct_b", 0, 10)
    spark.sql("CALL graft_cat.system.txn_begin()").collect()
    ins("ct_a", 10, 40); ins("ct_b", 10, 30)
    SegTxn.afterTableCommit.set { _ =>
      SegTxn.afterTableCommit.set(_ => ())
      throw new RuntimeException("boom")
    }
    val crashed = intercept[Exception](
      spark.sql("CALL graft_cat.system.txn_commit()").collect())
    assert(Option(crashed.getMessage).exists(_.contains("boom")) ||
      Option(crashed.getCause).exists(c => Option(c.getMessage).exists(_.contains("boom"))))
    // tables roll forward in canonical ident order: ct_a applied, ct_b torn
    assert(count("ct_a") === 40L)
    assert(count("ct_b") === 10L)
    assert(intents().size === 1, "intent must survive the crash")
    // crash+restart: a NEW catalog instance over the same warehouse
    // completes the transaction at open time, before any query runs
    def reopen(): GraftCatalog = {
      val c = new GraftCatalog
      c.initialize("graft_cat",
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          Map("warehouse" -> warehouse.toString).asJava))
      c
    }
    val cat2 = reopen()
    assert(intents().isEmpty, "open-time recovery must consume the intent")
    def rows(c: GraftCatalog, t: String): Long =
      c.segTable(s"db.$t").currentSegs
        .map(s => s.rows - s.dv.map(_.ndel).getOrElse(0L)).sum
    assert(rows(cat2, "ct_a") === 40L, "already-applied table must not double-apply")
    assert(rows(cat2, "ct_b") === 30L, "torn table must be completed")
    // a second recovery (another restart) is a no-op
    val cat3 = reopen()
    assert(rows(cat3, "ct_a") === 40L)
    assert(rows(cat3, "ct_b") === 30L)
    // the session catalog converges through its own recover call
    assert(spark.sql("CALL graft_cat.system.txn_recover()").head.getLong(0) === 0L)
  }

  test("recovery rolls forward onto a head that advanced after the crash") {
    fresh("ct_a", "ct_b")
    ins("ct_a", 0, 10); ins("ct_b", 0, 10)
    spark.sql("CALL graft_cat.system.txn_begin()").collect()
    ins("ct_a", 10, 20); ins("ct_b", 10, 20)
    SegTxn.afterTableCommit.set { _ =>
      SegTxn.afterTableCommit.set(_ => ())
      throw new RuntimeException("boom")
    }
    intercept[Exception](spark.sql("CALL graft_cat.system.txn_commit()").collect())
    // a non-txn writer advances the torn table BEFORE recovery runs —
    // the staged append is a pure function of any head, so it rebases
    ins("ct_b", 100, 150)
    assert(spark.sql("CALL graft_cat.system.txn_recover()").head.getLong(0) === 1L)
    assert(count("ct_a") === 20L)
    assert(count("ct_b") === 70L, "recovered append must land on the advanced head")
  }

  test("abort publishes nothing and deletes the staged segment files") {
    fresh("ct_a")
    ins("ct_a", 0, 10)
    def dirFiles(): Set[String] = {
      val d = warehouse.resolve("db.ct_a")
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    val before = dirFiles()
    spark.sql("CALL graft_cat.system.txn_begin()").collect()
    ins("ct_a", 10, 20)
    assert((dirFiles() -- before).nonEmpty, "staged segments should be on disk")
    assert(spark.sql("CALL graft_cat.system.txn_abort()").head.getBoolean(0))
    assert(count("ct_a") === 10L)
    assert(dirFiles() === before, "abort must delete staged segment files")
    assert(intents().isEmpty)
  }

  test("append and INSERT OVERWRITE fold in stage order within one transaction") {
    fresh("ct_a")
    ins("ct_a", 0, 100)
    spark.sql("CALL graft_cat.system.txn_begin()").collect()
    ins("ct_a", 100, 150)                    // append (superseded)
    ins("ct_a", 1000, 1020, overwrite = true) // truncating write resets
    ins("ct_a", 2000, 2005)                  // append on top of the overwrite
    spark.sql("CALL graft_cat.system.txn_commit()").collect()
    val got = spark.sql("SELECT id FROM graft_cat.db.ct_a ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(got === ((1000L until 1020L) ++ (2000L until 2005L)).toSeq)
  }

  test("txn misuse is refused: nested begin, commit without txn, empty commit") {
    fresh("ct_a")
    spark.sql("CALL graft_cat.system.txn_begin()").collect()
    val nested = intercept[Exception](
      spark.sql("CALL graft_cat.system.txn_begin()").collect())
    assert(Option(nested.getMessage).getOrElse(nested.getCause.getMessage)
      .contains("already active"))
    // empty commit is a no-op publishing zero tables
    assert(spark.sql("CALL graft_cat.system.txn_commit()").head.getLong(0) === 0L)
    val noTxn = intercept[Exception](
      spark.sql("CALL graft_cat.system.txn_commit()").collect())
    assert(Option(noTxn.getMessage).getOrElse(noTxn.getCause.getMessage)
      .contains("no active"))
    assert(!spark.sql("CALL graft_cat.system.txn_abort()").head.getBoolean(0))
  }

  test("txn fuzz: random txn/crash/abort interleavings stay model-equal after recovery") {
    sealed trait Out
    case object Commit extends Out
    case object Abort extends Out
    case class Crash(afterN: Int) extends Out // throw after N table commits
    sealed trait Op
    case class NonTxn(tbl: Int, n: Int) extends Op
    case class Txn(writes: List[(Int, Int)], out: Out) extends Op

    val genWrite = Gen.zip(Gen.oneOf(0, 1), Gen.chooseNum(1, 30))
    val genOut: Gen[Out] = Gen.frequency(4 -> Gen.const(Commit),
      2 -> Gen.const(Abort), 3 -> Gen.chooseNum(0, 1).map(Crash(_)))
    val genOp: Gen[Op] = Gen.frequency(
      2 -> genWrite.map { case (t, n) => NonTxn(t, n) },
      5 -> Gen.zip(Gen.listOfN(3, genWrite), genOut)
        .map { case (ws, o) => Txn(ws.take(1 + ws.head._2 % 3), o) })

    samples(Gen.listOfN(6, genOp), 5).zipWithIndex.foreach { case (opsSeq, i) =>
      fresh("fz_a", "fz_b")
      val names = Array("fz_a", "fz_b")
      val model = Array.fill(2)(scala.collection.mutable.ArrayBuffer[Long]())
      var next = 0L
      def alloc(n: Int): (Long, Long) = { val lo = next; next += n; (lo, lo + n) }
      opsSeq.foreach {
        case NonTxn(t, n) =>
          val (lo, hi) = alloc(n)
          ins(names(t), lo, hi); model(t) ++= (lo until hi)
        case Txn(writes, out) =>
          spark.sql("CALL graft_cat.system.txn_begin()").collect()
          val staged = writes.map { case (t, n) =>
            val (lo, hi) = alloc(n); ins(names(t), lo, hi); (t, lo, hi) }
          out match {
            case Commit =>
              spark.sql("CALL graft_cat.system.txn_commit()").collect()
              staged.foreach { case (t, lo, hi) => model(t) ++= (lo until hi) }
            case Abort =>
              spark.sql("CALL graft_cat.system.txn_abort()").collect()
            case Crash(afterN) =>
              val seen = new java.util.concurrent.atomic.AtomicInteger(0)
              SegTxn.afterTableCommit.set { _ =>
                if (seen.incrementAndGet() > afterN) {
                  SegTxn.afterTableCommit.set(_ => ())
                  throw new RuntimeException("fuzz crash")
                }
              }
              try intercept[Exception](
                spark.sql("CALL graft_cat.system.txn_commit()").collect())
              catch { case _: org.scalatest.exceptions.TestFailedException =>
                // txn touched <= afterN tables: commit succeeded — fine
              }
              SegTxn.afterTableCommit.set(_ => ())
              // durability is all-or-nothing once the intent exists:
              // recovery completes the transaction
              spark.sql("CALL graft_cat.system.txn_recover()").collect()
              staged.foreach { case (t, lo, hi) => model(t) ++= (lo until hi) }
          }
      }
      (0 to 1).foreach { t =>
        val got = spark.sql(s"SELECT id FROM graft_cat.db.${names(t)}")
          .collect().map(_.getLong(0)).sorted.toSeq
        assert(got === model(t).sorted.toSeq, s"table ${names(t)} diverged, seq#$i: $opsSeq")
      }
    }
  }
}
