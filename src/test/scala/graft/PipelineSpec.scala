package graft

/** The composed LLM corpus pipeline (ext140): beyond the DuckDB oracle
  * (which hash-checks every document's lineage), pin the structural
  * invariants the composition must keep — the stages PARTITION the
  * corpus, the holdout/sample rules bind, and the one plan contains no
  * cartesian product and a bounded number of corpus scans.
  */
class PipelineSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("ext140: stages partition the corpus; rules bind; plan stays bounded") {
    ops.configure(spark)
    val df = ext.Pipeline.queries("ext140_corpus_pipeline")(spark, d)
    val rows = df.collect()
    val total = spark.read.parquet(s"$d/documents.parquet").count()
    assert(rows.length.toLong === total, "lineage must cover every document")
    assert(rows.map(_.getLong(0)).distinct.length === rows.length,
      "one lineage row per doc_id")

    val stages = Set("quality_drop", "exact_dup", "near_dup",
      "heldout_eval", "contaminated", "not_sampled", "train")
    val byStage = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byStage.keySet.subsetOf(stages), s"unknown stage in $byStage")
    // the funnel is non-degenerate on the fixture: quality drops exist
    // and a training set survives the whole chain
    assert(byStage.getOrElse("quality_drop", 0) > 0, byStage.toString)
    assert(byStage.getOrElse("train", 0) > 0, byStage.toString)

    rows.foreach { r =>
      val (id, stage, phase) = (r.getLong(0), r.getString(2), r.getLong(3))
      if (stage == "train") {
        assert(phase >= 1L && phase <= 3L, s"doc $id: bad phase $phase")
        assert(id % 10 != 0, s"doc $id: eval doc leaked into train")
        // the deterministic 50% sample rule really bound
        assert((id * 2654435761L) % 2147483648L < 1073741824L,
          s"doc $id: sampled past the budget")
      } else assert(phase === 0L, s"doc $id: phase on non-train stage $stage")
    }

    // plan audit: no cartesian product; the corpus parquet is scanned a
    // bounded number of times (token metrics ×2, normalization hash,
    // shingle derivations — deliberately uncached, Spark's exchange
    // reuse dedups the identical subtrees — plus the id spine) — a
    // regression that re-reads raw text per stage would show up here
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), plan)
    val scans = "documents\\.parquet".r.findAllIn(plan).length
    assert(scans <= 9, s"corpus scanned $scans times:\n$plan")
  }

  test("ext152: batch lineage partitions the batch; stages bind to their rules") {
    ops.configure(spark)
    val rows = ext.Pipeline.queries("ext152_incremental_pipeline")(spark, d)
      .collect()
    assert(rows.nonEmpty)
    // exactly the batch slice, once each
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
    assert(ids.forall(_ % 5 == 3))
    val stages = Set("quality_drop", "near_dup", "contaminated",
      "not_sampled", "train")
    rows.foreach { r =>
      val (nTok, stage, phase) = (r.getLong(1), r.getString(2), r.getLong(3))
      assert(stages(stage), stage)
      if (stage == "train") {
        val want = if (nTok < 60) 1L else if (nTok < 120) 2L else 3L
        assert(phase === want, s"phase $phase for $nTok tokens")
      } else assert(phase === 0L)
      // the sampling rule binds: a train doc must have passed the coin
      if (stage == "train" || stage == "not_sampled") {
        val u = (r.getLong(0) * 2654435761L) % 2147483648L
        val sampledOut = u.toDouble / 2147483648.0 >= 0.5
        if (stage == "not_sampled") assert(sampledOut)
        else assert(!sampledOut)
      }
    }
    // the stream is non-degenerate: at least two distinct stages occur
    assert(rows.map(_.getString(2)).distinct.length >= 2)
  }

  test("ext141: erasure propagates via APPLY slices, one per family, no rebuild") {
    ops.configure(spark)
    import ext.{AnnIndex, DedupIndex, SearchIndex}
    // pre-build the shared label seeds (round-14, VERDICT r13 #5) so the
    // counter deltas below measure the ENTRY's work: the two label
    // families arrive as zero-copy clones (no build), and only the
    // erasure propagation itself moves the counters
    ops.ensureGraftCatalog(spark)
    ext.Dedup.ensureLabelSeeds(spark, d)
    val b0 = (DedupIndex.builds.get(), SearchIndex.builds.get(),
      AnnIndex.builds.get(), AnnIndex.pqBuilds.get(), AnnIndex.sqBuilds.get(),
      AnnIndex.graphBuilds.get(), DedupIndex.gramBuilds.get(),
      DedupIndex.labelBuilds.get())
    val r0 = (DedupIndex.cdcRefreshes.get(), SearchIndex.cdcRefreshes.get(),
      AnnIndex.cdcRefreshes.get(), AnnIndex.pqCdcRefreshes.get(),
      AnnIndex.sqCdcRefreshes.get(), AnnIndex.graphCdcRefreshes.get(),
      DedupIndex.gramCdcRefreshes.get(), DedupIndex.labelIncRefreshes.get())
    val lcB0 = DedupIndex.labelCappedBuilds.get()
    val lcR0 = DedupIndex.labelCappedIncRefreshes.get()
    val rows = ext.Pipeline.queries("ext141_erasure_e2e")(spark, d).collect()
    // the audit itself: zero live rows attributable to erased subjects
    // (9 index families + the bm25 doclens twin + the label edge /
    // postings tables + the capped family's postings)
    assert(rows.length === 13)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_erased_live")) === 0L,
        s"erasure residue in ${r.getString(0)}")
      assert(r.getLong(r.fieldIndex("n_live")) > 0L, r.toString)
    }
    // the SCALE claim: exactly one full build per non-seeded family
    // (the initial ensure), ZERO exact-label builds (the family arrives
    // as a clone of the shared seed), and the post-delete propagation
    // was a feed-sized APPLY slice per family — never a second build
    val b1 = (DedupIndex.builds.get(), SearchIndex.builds.get(),
      AnnIndex.builds.get(), AnnIndex.pqBuilds.get(), AnnIndex.sqBuilds.get(),
      AnnIndex.graphBuilds.get(), DedupIndex.gramBuilds.get(),
      DedupIndex.labelBuilds.get())
    val r1 = (DedupIndex.cdcRefreshes.get(), SearchIndex.cdcRefreshes.get(),
      AnnIndex.cdcRefreshes.get(), AnnIndex.pqCdcRefreshes.get(),
      AnnIndex.sqCdcRefreshes.get(), AnnIndex.graphCdcRefreshes.get(),
      DedupIndex.gramCdcRefreshes.get(), DedupIndex.labelIncRefreshes.get())
    assert(b1 === ((b0._1 + 1, b0._2 + 1, b0._3 + 1, b0._4 + 1, b0._5 + 1,
      b0._6 + 1, b0._7 + 1, b0._8)),
      s"expected one build per non-seeded family and none for labels: $b0 -> $b1")
    assert(r1 === ((r0._1 + 1, r0._2 + 1, r0._3 + 1, r0._4 + 1, r0._5 + 1,
      r0._6 + 1, r0._7 + 1, r0._8 + 1)),
      s"expected exactly one CDC apply per family: $r0 -> $r1")
    // the ninth family is the documented EXCEPTION: erasure propagates
    // by a LINEAR rebuild (capped edges are not append-stable) — with
    // the seeded clone standing in for the initial build, the entry
    // pays exactly ONE capped build (the erasure rebuild) and zero
    // incremental applies
    assert(DedupIndex.labelCappedBuilds.get() === lcB0 + 1,
      "capped labels must rebuild on the erasure slice (and only then)")
    assert(DedupIndex.labelCappedIncRefreshes.get() === lcR0,
      "an erasure slice must never take the capped incremental path")
  }

  test("ext141b: the ensureLabels lifecycle — auto, sticky erasure, forced switch") {
    // VERDICT r14 #4: the audited erasure path must be the entry point a
    // user calls. Counter contract per the scaladoc: ZERO exact builds
    // (seeded clone + covered no-op), ONE exact apply (the first
    // erasure), TWO capped builds (the forced switch + the
    // erasure-triggered rebuild), ZERO capped applies.
    ops.configure(spark)
    import ext.DedupIndex
    ops.ensureGraftCatalog(spark)
    ext.Dedup.ensureLabelSeeds(spark, d)
    val lb0 = DedupIndex.labelBuilds.get()
    val la0 = DedupIndex.labelIncRefreshes.get()
    val cb0 = DedupIndex.labelCappedBuilds.get()
    val ca0 = DedupIndex.labelCappedIncRefreshes.get()
    val rows = ext.Pipeline.queries("ext141b_erasure_auto")(spark, d).collect()
    assert(rows.length === 7)
    val byFam = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    // zero erasure residue in every artifact leg; survivors non-empty
    Seq("exact-labels", "exact-edges", "exact-posts",
      "capped-labels", "capped-posts").foreach { f =>
      assert(byFam(f)._1 === 0L, s"erasure residue in $f")
      assert(byFam(f)._2 > 0L, s"empty survivor set in $f")
    }
    // the choice lifecycle: auto-exact first, forced-capped after the
    // switch — and the record SURVIVED the erasure-triggered rebuild
    assert(byFam("lu-choice-a-exact") === ((0L, 1L)),
      "step 1 must auto-pick exact (benign cohort), unforced")
    assert(byFam("lu-choice-b-capped") === ((1L, 1L)),
      "the forced capped choice must survive the erasure rebuild")
    assert(DedupIndex.labelBuilds.get() === lb0,
      "exact family must arrive as a seeded clone — zero builds")
    assert(DedupIndex.labelIncRefreshes.get() === la0 + 1,
      "the first erasure must take the exact family's APPLY path")
    assert(DedupIndex.labelCappedBuilds.get() === cb0 + 2,
      "expected exactly the forced-switch build + the erasure rebuild")
    assert(DedupIndex.labelCappedIncRefreshes.get() === ca0,
      "no capped incremental path anywhere in this lifecycle")
  }
}
