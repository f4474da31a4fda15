package graft

import graft.ext.TrainingPrep
import org.apache.spark.sql.functions._

/** Training-set assembly: pair construction, packing, capping, splits. */
class TrainingPrepSpec extends SparkTestBase {

  test("caption pairs: anchor never equals its negative; positives align by id") {
    val rows = TrainingPrep.captionPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = 500L // corpus size at every fixture sf
    rows.foreach { r =>
      val doc = r.getLong(0)
      val neg = r.getLong(3)
      assert(neg !== doc, s"self-negative for doc $doc")
      val expected = {
        val raw = (doc * 2654435761L + 17L) % n
        if (raw == doc) (raw + 1L) % n else raw
      }
      assert(neg === expected)
      assert(r.getInt(5) === (if (r.getInt(2) == r.getInt(4)) 1 else 0))
    }
  }

  test("sequence packing: bins fill to the budget in doc order per source") {
    val budget = 512L
    val perDoc = graft.ops.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(expr("filter(split(text, ' '), t -> t <> '')")).cast("long").as("t"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val binned: Seq[(String, Long, Long)] =
      perDoc.groupBy(_._1).toSeq.flatMap { case (src, docs) =>
        var cum = 0L
        docs.sortBy(_._2).toSeq.map { case (_, _, t) =>
          val bin = cum / budget; cum += t; (src, bin, t)
        }
      }
    val expected = binned.groupBy(x => (x._1, x._2))
      .map { case (k, xs) => k -> ((xs.size.toLong, xs.map(_._3).sum)) }
    val got = TrainingPrep.sequencePacking(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
  }

  test("group cap keeps at most K per class, hash-ordered, as a WindowGroupLimit") {
    val q = TrainingPrep.groupCap(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter did not become a group limit:\n$plan")
    val rows = q.collect()
    val perLang = rows.groupBy(_.getString(1))
    perLang.foreach { case (lang, xs) =>
      assert(xs.length <= 40, s"$lang over cap")
      assert(xs.map(_.getInt(2)).sorted.toSeq === (1 to xs.length))
    }
  }

  test("batch assembly: padded shape accounts for every token") {
    val rows = graft.ext.Multimodal.batchAssembly(spark, sf).collect()
    val total = graft.ops.table(spark, sf, "documents").count()
    assert(rows.map(_.getInt(1).toLong).sum === total) // every doc in a batch
    rows.foreach { r =>
      val (nItems, maxLen, totalToks, pad) =
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))
      assert(nItems <= 8)
      assert(pad === nItems.toLong * maxLen - totalToks)
      assert(pad >= 0L && totalToks <= nItems.toLong * maxLen)
    }
  }

  test("full pipeline: gate and dedup only shrink; bins cover kept tokens") {
    val rows = TrainingPrep.fullPipeline(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.ops.table(spark, sf, "documents").count()
    val kept = rows.map(_.getLong(2)).sum
    assert(kept > 0 && kept <= total)
    rows.foreach { r =>
      val (nDocs, bins) = (r.getLong(2), r.getLong(4))
      // contiguous packing: at least one bin, never more than one per doc
      // (oversized docs SKIP bin indices, so no tight lower bound exists)
      assert(bins >= 1 && bins <= nDocs, r.toString)
    }
    // the gate's filter must reach the parquet scan (pushdown across the
    // composed stages) — at minimum the scan must not read `lang`
    val scan = TrainingPrep.fullPipeline(spark, sf)
      .queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && !scan.contains("lang"),
      "unpruned scan in composed pipeline")
  }

  test("hash split partitions every document exactly once, ~13/2/1 ratio") {
    val rows = TrainingPrep.hashSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.ops.table(spark, sf, "documents").count()
    assert(rows.values.sum === total)
    assert(rows.keySet === Set("train", "val", "test"))
    // 13/16 expectation with generous tolerance at 500 docs
    assert(rows("train") > total * 6 / 10, rows.toString)
    assert(rows("test") < total * 2 / 10, rows.toString)
  }

  test("SFT assembly: spans tile the template, roles alternate, masks cover assistants") {
    val rows = TrainingPrep.queries("ext116_sft_assembly")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, ts) =>
      val sorted = ts.sortBy(_.getInt(1))
      assert(sorted.length <= 6, s"user $u over the turn cap")
      // dense 1..n turn indices, alternating roles from 'user'
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) === i + 1)
        val expectRole = if ((i + 1) % 2 == 1) "user" else "assistant"
        assert(r.getString(2) === expectRole)
        assert(r.getInt(5) === (if (expectRole == "assistant") 1 else 0))
      }
      // spans tile [0, total) with no gaps or overlaps
      var pos = 0L
      sorted.foreach { r =>
        assert(r.getLong(3) === pos, s"user $u: span gap at ${r.getInt(1)}")
        assert(r.getLong(4) > r.getLong(3))
        pos = r.getLong(4)
      }
    }
    // single exchange: both windows share the user_id partitioning
    val plan = TrainingPrep.queries("ext116_sft_assembly")(spark, sf)
      .queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(finalPlan).length
    assert(exchanges === 1, s"expected one keyed exchange, got $exchanges\n$finalPlan")
  }
}
