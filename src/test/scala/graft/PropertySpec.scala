package graft

import graft.dw.{DateDims, Keys}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5.4): explode/split round trips, surrogate
  * key density, date-spine invariants — over generated inputs, not just
  * the fixtures. Raw ScalaCheck generators with a fixed seed (the
  * scalatest-scalacheck bridge isn't in the offline dependency set).
  */
class PropertySpec extends SparkTestBase {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  test("bitmap aggregators: any reduce/merge tree equals set semantics") {
    val b = new graft.functions.BitmapAgg.Build
    val u = new graft.functions.BitmapAgg.Union
    def popcount(bm: Array[Long]): Long = bm.map(java.lang.Long.bitCount(_).toLong).sum
    val ids: Gen[List[Long]] =
      Gen.listOf(Gen.chooseNum(0L, 4096L))
    samples(Gen.zip(ids, Gen.chooseNum(1, 5)), 20).foreach { case (xs, nSplit) =>
      // arbitrary split into partial states (the shuffle's partition
      // assignment), each reduced independently, then merged pairwise in
      // a different order than reduction — must equal the distinct count
      val parts = xs.zipWithIndex.groupBy(_._2 % nSplit).values
        .map(_.map(_._1).foldLeft(b.zero)(b.reduce)).toList
      val viaBuild = parts match {
        case Nil => b.zero
        case h :: t => t.foldLeft(h)(b.merge)
      }
      assert(popcount(viaBuild) === xs.distinct.size.toLong)
      // Union over the SAME partial bitmaps (the rollup path) agrees
      val viaUnion = parts.foldLeft(u.zero)(u.reduce)
      assert(popcount(u.merge(viaUnion, u.zero)) === xs.distinct.size.toLong)
      // every set bit corresponds to an input id
      val setBits = for {
        w <- viaBuild.indices; bit <- 0 until 64
        if (viaBuild(w) & (1L << bit)) != 0L
      } yield w.toLong * 64 + bit
      assert(setBits.toSet === xs.toSet)
    }
  }

  test("SegBloom: membership complete, union exact, codec bijective on any input") {
    import graft.sources.SegBloom
    val vals: Gen[List[Long]] =
      Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    samples(Gen.zip(vals, vals), 30).foreach { case (xs, ys) =>
      val a = new Array[Long](SegBloom.Words)
      val b = new Array[Long](SegBloom.Words)
      xs.foreach(SegBloom.add(a, _))
      ys.foreach(SegBloom.add(b, _))
      // completeness: a bloom NEVER forgets an added value
      assert(xs.forall(SegBloom.mightContain(a, _)))
      // union answers for the union — both input sets fully present
      val u = SegBloom.union(a, b)
      assert((xs ++ ys).forall(SegBloom.mightContain(u, _)))
      // union is monotone: u admits everything a admits (bitwise superset)
      assert(a.zip(u).forall { case (x, y) => (x & ~y) == 0L })
      // manifest codec round-trips bit-exactly for any bit pattern
      assert(SegBloom.fromBase64(SegBloom.toBase64(u)).sameElements(u))
    }
  }

  test("split+explode row count equals token count for any token lists") {
    import spark.implicits._
    samples(Gen.listOfN(20, Gen.listOf(token)), 10).foreach { docs =>
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(",")) }
        .toDF("id", "csv")
      val exploded = df
        .filter(col("csv") =!= "")
        .select(col("id"), explode(split(col("csv"), ",")).as("tok"))
        .filter(col("tok") =!= "")
      val expected = docs.map(_.count(_.nonEmpty)).sum
      assert(exploded.count() === expected)
    }
  }

  test("denseIds are always a permutation of 1..n with no gaps or dupes") {
    import spark.implicits._
    samples(Gen.nonEmptyListOf(token), 10).foreach { words =>
      val distinctDf = words.toDF("w").distinct()
      val ids = Keys.denseIds(distinctDf, "id", Seq(col("w")))
        .select("id").collect().map(_.getInt(0)).sorted
      assert(ids.toSeq === (1 to ids.length))
    }
  }

  test("partitionOffsetIds are dense 1..n regardless of partitioning") {
    import spark.implicits._
    samples(Gen.zip(Gen.chooseNum(1, 200), Gen.chooseNum(1, 8)), 10)
      .foreach { case (n, parts) =>
        val df = (1 to n).toDF("x").repartition(parts)
        val ids = Keys.partitionOffsetIds(df, "id")
          .select("id").collect().map(_.getLong(0)).sorted
        assert(ids.toSeq === (1L to n.toLong))
      }
  }

  test("rangeIds equal global row_number ids and stay distributed") {
    import spark.implicits._
    // AQE coalesces the tiny test shuffle to one partition (desired at this
    // size); disable it here to assert the static multi-partition shape
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try testRangeIds() finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def testRangeIds(): Unit = {
    // skewed multi-partition input with duplicate keys and nulls
    val df = spark.range(5000)
      .select(
        when(col("id") % 11 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("k"), col("id") % 700)).as("k"),
        col("id").as("payload"))
      .repartition(7)
    val got = Keys.rangeIds(df, "rid", Seq(col("k"), col("payload")))
    // same ids as the single-partition global window (nulls first)
    val expected = Keys.denseIds(df, "rid", Seq(col("k"), col("payload")))
    assert(got.select(col("k"), col("payload"), col("rid")).collect().toSet ===
      expected.select(col("k"), col("payload"), col("rid").cast("long")).collect().toSet)
    // and the assignment ran across partitions, not through one task
    assert(got.rdd.getNumPartitions > 1)
    val perPartition = got.rdd.glom().map(_.length).collect()
    assert(perPartition.count(_ > 0) > 1, s"all rows in one partition: ${perPartition.toSeq}")
  }

  test("fact id plans contain no global-window single-partition stage") {
    import spark.implicits._
    val dim = DateDims.dimDatetime(spark)
    val checkins = Seq(
      ("b1", "2015-04-11 10:00:00, 2015-04-12 11:00:00"),
      ("b2", "2016-01-01 00:00:00")).toDF("business_id", "date")
    val fact = dw.Transforms.checkin(checkins, dim)
    val plan = fact.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // the range exchange + sort happen inside rangeIds' pre-zip stage;
    // assert the building block itself is distributed
    val sorted = checkins.repartitionByRange(col("business_id"))
    assert(sorted.queryExecution.executedPlan.toString.contains("rangepartitioning"))
  }

  test("date spine: date_id strictly increases with datetime_id, one row per day") {
    val dim = DateDims.dimDatetime(spark)
      .select("datetime_id", "date_id").orderBy("datetime_id").collect()
    dim.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getInt(0) + 1 === b.getInt(0))
        assert(a.getInt(1) < b.getInt(1))
      case _ =>
    }
  }

  test("BottomKAgg: any partitioning + merge order yields the k smallest distinct") {
    val agg = new graft.functions.BottomKAgg(5)
    samples(Gen.listOfN(60, Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)), 5)
      .zipWithIndex.foreach { case (values, i) =>
        val expected = values.distinct.sorted.take(5).mkString("|")
        // sequential fold
        val seq = agg.finish(values.foldLeft(agg.zero)(agg.reduce))
        assert(seq === expected)
        // random chunking, partial buffers merged in shuffled order —
        // exactly what partial aggregation does across partitions
        val rnd = new scala.util.Random(7 + i)
        val chunks = values.grouped(1 + rnd.nextInt(7)).toSeq
        val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
        assert(agg.finish(merged) === expected)
      }
  }

  test("hour parse: pmod(h, 24) lands in [0, 24) for any int hour") {
    import spark.implicits._
    samples(Gen.listOfN(50, Gen.chooseNum(-100, 100)), 5).foreach { hours =>
      val got = hours.toDF("h")
        .select(pmod(col("h"), lit(24)).as("m"))
        .collect().map(_.getInt(0))
      assert(got.forall(m => m >= 0 && m < 24))
    }
  }

  test("catalog DML fuzz: random insert/delete/compact under CHECK equals a model") {
    // the three newest catalog features COMPOSE: CHECK re-verify on every
    // write (violating batches abort atomically), DELETE via metadata drop
    // when zone maps decide whole segments — row-level rewrite otherwise,
    // and compaction OR-merging segment blooms. A random op sequence must
    // leave the table row-equal to a driver-side model, and bloom-pruned
    // point reads must agree after any number of compactions.
    ops.ensureGraftCatalog(spark)
    sealed trait Op
    case class Ins(rows: List[(Long, Long)]) extends Op
    case class Del(lo: Long, hi: Long) extends Op
    case object Compact extends Op
    case object ZOrder extends Op
    case class Evolve(spec: String) extends Op

    val genRow = Gen.zip(Gen.chooseNum(0L, 499L), Gen.chooseNum(-50L, 1000L))
    val genIns: Gen[Op] = Gen.nonEmptyListOf(genRow).map(l => Ins(l.take(40)))
    val genDel: Gen[Op] = Gen.zip(Gen.chooseNum(0L, 400L), Gen.chooseNum(0L, 200L))
      .map { case (lo, w) => Del(lo, lo + w) }
    // partition-spec evolution interleaved with every other op: the
    // per-segment spec stamps must keep bucket-trusted pruning, keyed
    // compaction, and zorder rewrites correct across spec changes
    val genEvolve: Gen[Op] = Gen.oneOf("id", "bucket:4:id", "bucket:8:v", "")
      .map(Evolve)
    val genOp: Gen[Op] = Gen.frequency(5 -> genIns, 3 -> genDel,
      2 -> Gen.const(Compact), 2 -> Gen.const(ZOrder), 2 -> genEvolve)

    samples(Gen.listOfN(8, genOp), 5).zipWithIndex.foreach { case (opsSeq, i) =>
      spark.sql("DROP TABLE IF EXISTS graft_cat.db.fuzz_t")
      spark.sql(
        """CREATE TABLE graft_cat.db.fuzz_t (id BIGINT, v BIGINT)
          |TBLPROPERTIES ('graft.check' = 'v >= 0')""".stripMargin)
      val model = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      opsSeq.foreach {
        case Ins(rows) =>
          val vals = rows.map { case (id, v) => s"($id, $v)" }.mkString(", ")
          if (rows.forall(_._2 >= 0)) {
            spark.sql(s"INSERT INTO graft_cat.db.fuzz_t VALUES $vals")
            model ++= rows
          } else {
            // CHECK violation aborts the WHOLE batch: no partial state
            intercept[Exception](
              spark.sql(s"INSERT INTO graft_cat.db.fuzz_t VALUES $vals"))
          }
        case Del(lo, hi) =>
          spark.sql(
            s"DELETE FROM graft_cat.db.fuzz_t WHERE id >= $lo AND id < $hi")
          val keep = model.filterNot(r => r._1 >= lo && r._1 < hi)
          model.clear(); model ++= keep
        case Compact =>
          spark.sql("CALL graft_cat.system.compact('db.fuzz_t', 1048576)")
        case ZOrder => // layout-only rewrite: must never change contents
          spark.sql("CALL graft_cat.system.zorder('db.fuzz_t', 'id', 'v', 3)")
        case Evolve(spec) => // metadata-only: contents invariant
          spark.sql(s"CALL graft_cat.system.evolve_spec('db.fuzz_t', '$spec')")
      }
      val got = spark.sql("SELECT id, v FROM graft_cat.db.fuzz_t").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === model.sorted.toSeq, s"scan diverged from model, seq#$i: $opsSeq")
      // point reads drive the (possibly OR-merged) blooms; counts must be
      // exact — a bloom can admit a dead segment, never hide a live row
      Seq(0L, 123L, 499L).foreach { k =>
        val n = spark.sql(
          s"SELECT COUNT(*) AS n FROM graft_cat.db.fuzz_t WHERE id = $k")
          .collect()(0).getLong(0)
        assert(n === model.count(_._1 == k).toLong, s"point read id=$k, seq#$i")
      }
    }
  }
  test("branch fuzz: main/branch model-equal; fast-forward honors divergence") {
    // branches compose with every DML path: random interleaving of main
    // inserts, branch inserts/deletes/compactions, and fast-forward (+
    // re-fork, the real workflow) must keep BOTH logs row-equal to their
    // driver-side models, and fast_forward must succeed exactly when
    // main has not advanced past the fork point (a content-neutral
    // branch compaction commit may make the merge non-empty — the
    // success/refusal rule is judged on the returned commits_merged)
    ops.ensureGraftCatalog(spark)
    sealed trait Op
    case class InsMain(rows: List[(Long, Long)]) extends Op
    case class InsBr(rows: List[(Long, Long)]) extends Op
    case class DelBr(lo: Long, hi: Long) extends Op
    case class DelMain(lo: Long, hi: Long) extends Op
    case class UpdBr(lo: Long, hi: Long, bump: Long) extends Op
    case object CompactBr extends Op
    case object FfRefork extends Op

    val genRow = Gen.zip(Gen.chooseNum(0L, 499L), Gen.chooseNum(0L, 1000L))
    val genInsM: Gen[Op] = Gen.nonEmptyListOf(genRow).map(l => InsMain(l.take(30)))
    val genInsB: Gen[Op] = Gen.nonEmptyListOf(genRow).map(l => InsBr(l.take(30)))
    val genDelB: Gen[Op] = Gen.zip(Gen.chooseNum(0L, 400L), Gen.chooseNum(0L, 200L))
      .map { case (lo, w) => DelBr(lo, lo + w) }
    val genDelM: Gen[Op] = Gen.zip(Gen.chooseNum(0L, 400L), Gen.chooseNum(0L, 120L))
      .map { case (lo, w) => DelMain(lo, lo + w) }
    val genUpdB: Gen[Op] = Gen.zip(Gen.chooseNum(0L, 400L), Gen.chooseNum(0L, 150L),
      Gen.chooseNum(1L, 50L)).map { case (lo, w, b) => UpdBr(lo, lo + w, b) }
    val genOp: Gen[Op] = Gen.frequency(3 -> genInsM, 4 -> genInsB,
      2 -> genDelB, 1 -> genDelM, 2 -> genUpdB, 1 -> Gen.const(CompactBr),
      3 -> Gen.const(FfRefork))

    def scan(t: String): Seq[(Long, Long)] =
      spark.sql(s"SELECT id, v FROM $t").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    // multiset subtraction: a − b keeping duplicates (row models carry
    // duplicate (id, v) pairs by construction)
    def msub(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      val cnt = scala.collection.mutable.Map.empty[(Long, Long), Int]
        .withDefaultValue(0)
      b.foreach(r => cnt(r) += 1)
      a.filter { r => if (cnt(r) > 0) { cnt(r) -= 1; false } else true }
    }

    samples(Gen.listOfN(8, genOp), 5).zipWithIndex.foreach { case (opsSeq, i) =>
      spark.sql("DROP TABLE IF EXISTS graft_cat.db.brfz_t")
      // alternate DML strategy so the fuzz covers cherry-picking dv
      // changes (merge-on-read) as well as group rewrites (copy-on-write)
      val props = if (i % 2 == 0)
        " TBLPROPERTIES ('graft.dml.mode'='merge-on-read')" else ""
      spark.sql(s"CREATE TABLE graft_cat.db.brfz_t (id BIGINT, v BIGINT)$props")
      spark.sql(
        """INSERT INTO graft_cat.db.brfz_t
          |SELECT id, id % 7 FROM range(0, 100) AS t(id)""".stripMargin)
      spark.sql("CALL graft_cat.system.branch('db.brfz_t', 'fz')")
      val mainRows = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      mainRows ++= (0L until 100L).map(id => (id, id % 7))
      val brRows = mainRows.clone()
      var forkRows = mainRows.clone()
      var mainMoved = false

      opsSeq.foreach { op =>
        op match {
          case InsMain(rows) =>
            val vals = rows.map { case (a, b) => s"($a, $b)" }.mkString(", ")
            spark.sql(s"INSERT INTO graft_cat.db.brfz_t VALUES $vals")
            mainRows ++= rows
            mainMoved = true
          case InsBr(rows) =>
            val vals = rows.map { case (a, b) => s"($a, $b)" }.mkString(", ")
            spark.sql(s"INSERT INTO graft_cat.db.brfz_t.branch_fz VALUES $vals")
            brRows ++= rows
          case DelBr(lo, hi) =>
            // only issue deletes that touch the model — a zero-match
            // DELETE's commit behavior would make merged-count tracking
            // ambiguous without buying coverage
            if (brRows.exists(r => r._1 >= lo && r._1 < hi)) {
              spark.sql(
                s"DELETE FROM graft_cat.db.brfz_t.branch_fz WHERE id >= $lo AND id < $hi")
              val keep = brRows.filterNot(r => r._1 >= lo && r._1 < hi)
              brRows.clear(); brRows ++= keep
            }
          case UpdBr(lo, hi, bump) =>
            // same matched-rows discipline as DelBr (see above)
            if (brRows.exists(r => r._1 >= lo && r._1 < hi)) {
              spark.sql(
                s"UPDATE graft_cat.db.brfz_t.branch_fz SET v = v + $bump " +
                  s"WHERE id >= $lo AND id < $hi")
              val upd = brRows.map(r =>
                if (r._1 >= lo && r._1 < hi) (r._1, r._2 + bump) else r)
              brRows.clear(); brRows ++= upd
            }
          case DelMain(lo, hi) =>
            // main-side DML: diverges main AND can touch the same base
            // segments a branch op touched — the cherry-pick conflict fuel
            if (mainRows.exists(r => r._1 >= lo && r._1 < hi)) {
              spark.sql(
                s"DELETE FROM graft_cat.db.brfz_t WHERE id >= $lo AND id < $hi")
              val keep = mainRows.filterNot(r => r._1 >= lo && r._1 < hi)
              mainRows.clear(); mainRows ++= keep
              mainMoved = true
            }
          case CompactBr =>
            spark.sql("CALL graft_cat.system.compact('db.brfz_t.branch_fz', 1048576)")
          case FfRefork =>
            val merged =
              try {
                val r = spark.sql(
                  "CALL graft_cat.system.fast_forward('db.brfz_t', 'fz')")
                  .head
                Some(r.getLong(r.fieldIndex("commits_merged")))
              } catch {
                // ONLY the divergence refusal is an expected outcome —
                // any other failure must fail the fuzz loudly
                case e: Exception
                    if Option(e.getMessage).exists(_.contains("diverged")) ||
                      Option(e.getCause).flatMap(c => Option(c.getMessage))
                        .exists(_.contains("diverged")) => None
              }
            merged match {
              case Some(m) if m > 0 =>
                assert(!mainMoved,
                  s"fast-forward succeeded past a diverged main, seq#$i: $opsSeq")
                mainRows.clear(); mainRows ++= brRows
              case Some(_) => // merged==0: no-op, content untouched
              case None =>
                assert(mainMoved,
                  s"fast-forward refused without divergence, seq#$i: $opsSeq")
                // diverged → cherry_pick is the escalation: either it
                // adopts the branch's delta (disjoint touch sets) and
                // main gains exactly that multiset diff, or it refuses
                // the conflict (both outcomes legal; silent data
                // loss/duplication is what the model equality catches)
                val picked =
                  try {
                    spark.sql(
                      "CALL graft_cat.system.cherry_pick('db.brfz_t', 'fz')")
                      .collect()
                    true
                  } catch {
                    case e: Exception
                        if Option(e.getMessage)
                          .exists(_.contains("cherry-pick")) ||
                          Option(e.getCause).flatMap(c => Option(c.getMessage))
                            .exists(_.contains("cherry-pick")) => false
                  }
                if (picked) {
                  val added = msub(brRows.toSeq, forkRows.toSeq)
                  val removed = msub(forkRows.toSeq, brRows.toSeq)
                  val next = msub(mainRows.toSeq, removed) ++ added
                  mainRows.clear(); mainRows ++= next
                }
            }
            // re-fork: abandon-or-continue from main's current head
            spark.sql("CALL graft_cat.system.drop_branch('db.brfz_t', 'fz')")
            spark.sql("CALL graft_cat.system.branch('db.brfz_t', 'fz')")
            brRows.clear(); brRows ++= mainRows
            forkRows = mainRows.clone()
            mainMoved = false
        }
        assert(scan("graft_cat.db.brfz_t") === mainRows.sorted.toSeq,
          s"main diverged from model after $op, seq#$i: $opsSeq")
        assert(scan("graft_cat.db.brfz_t.branch_fz") === brRows.sorted.toSeq,
          s"branch diverged from model after $op, seq#$i: $opsSeq")
      }
    }
  }

  test("strPrefix preserves UTF-8 byte order; ties only on 8-byte-prefix ties") {
    import graft.sources.SegStore.strPrefix
    import java.nio.charset.StandardCharsets.UTF_8
    def bytesOf(x: String) = x.getBytes(UTF_8)
    // unsigned lexicographic byte comparison — Spark's default (binary)
    // string collation
    def byteLt(a: Array[Byte], b: Array[Byte]): Boolean = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      a.length < b.length
    }
    val genStr: Gen[String] = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar,
        2 -> Gen.oneOf('\u00e9', '\u4e2d', ' ', '~'))).map(_.mkString))
    samples(Gen.zip(genStr, genStr), 200).foreach { case (x, y) =>
      val (bx, by) = (bytesOf(x), bytesOf(y))
      val (px, py) = (strPrefix(bx), strPrefix(by))
      if (byteLt(bx, by)) assert(px <= py, s"order broken: '$x' < '$y'")
      else if (byteLt(by, bx)) assert(py <= px, s"order broken: '$y' < '$x'")
      else assert(px == py)
      // a strict prefix inequality decides the string inequality — the
      // exact soundness condition SegPrune's definite verdicts rely on
      if (px < py) assert(byteLt(bx, by))
      // equal encodings only when the first 8 bytes tie
      if (px == py)
        assert(bx.take(8).sameElements(by.take(8)))
    }
  }
  test("geo 3x3 neighborhood covers every disk of radius <= cell edge") {
    // pure-model check of ext111's candidate-generation invariant: for
    // any point within r (r <= cell edge) of a center, the point's cell
    // is one of the center's 9 neighbor cells — including exact-boundary
    // and cell-border cases randomized generators actually hit
    val cell = 100000L
    val lonCells = 3601L
    def cellId(lat: Long, lon: Long): Long =
      (lat / cell) * lonCells + (lon / cell)
    val coord: Gen[Long] = Gen.chooseNum(0L, 2000000L)
    val r = 50000L
    samples(Gen.zip(Gen.zip(coord, coord), Gen.zip(coord, coord)), 500)
      .foreach { case ((plat, plon), (clat, clon)) =>
        val d2 = (plat - clat) * (plat - clat) + (plon - clon) * (plon - clon)
        if (d2 <= r * r) {
          val neighbors = for (dl <- -1L to 1L; dn <- -1L to 1L)
            yield cellId(clat, clon) + dl * lonCells + dn
          assert(neighbors.contains(cellId(plat, plon)),
            s"point ($plat,$plon) within r of ($clat,$clon) not in 3x3")
        }
      }
  }
}
