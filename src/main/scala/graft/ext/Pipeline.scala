package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ext140 — the end-to-end LLM corpus pipeline, one oracle-checked
  * entry chaining the curation operators the catalog provides piecemeal
  * (the way q49 chains the warehouse): Gopher quality rules (ext60) →
  * exact dedup (ext01) → MinHash-LSH near-dup removal (ext03's
  * banding) → eval holdout + decontamination (ext30) → deterministic
  * stratified sampling (ext61's hash-uniform discipline) → curriculum
  * phase assignment (ext118's length strata). The output is the FULL
  * per-document lineage — every doc_id with the first stage that
  * removed it (or its final training phase) — so the oracle hash-checks
  * not just the surviving set but the reason each document fell out.
  *
  * Stage order (documented contract; each predicate is evaluated only
  * for survivors of the previous stage):
  *   1. `quality_drop`  — Gopher flag ≠ keep (docs with zero tokens
  *      never reach the metric frame and drop here too);
  *   2. `exact_dup`     — not the min doc_id of its normalized-md5
  *      group (groups formed among quality keepers);
  *   3. `near_dup`      — the LARGER member of any LSH band collision
  *      (16 minhashes, 4 bands × 4 rows) among exact survivors;
  *   4. `heldout_eval`  — the eval split (doc_id % 10 == 0) never
  *      trains;
  *   5. `contaminated`  — ≥ 50% of the doc's 3-gram shingles appear in
  *      the eval split's shingle set;
  *   6. `not_sampled`   — deterministic uniform (Knuth-hash of doc_id)
  *      ≥ 0.5 — the 50% budget;
  *   7. `train`         — survivors, with curriculum phase 1/2/3 by
  *      token-length strata (< 60 / < 120 / rest).
  *
  * Scale notes (the shapes that survive 100 TB): every stage is a
  * keyed aggregate or a (semi/left) equi-join — no cartesian products;
  * the LSH candidate join is band-key-bucketed (never all-pairs); the
  * decontamination probe is a semi join on the shingle key (the train
  * side never multiplies rows); the corpus text is scanned a bounded
  * number of times (token metrics, normalization hash, shingles — the
  * shingle frame is cached and feeds signatures, the eval set and the
  * contamination sizes). A production run would persist the
  * intermediate frames as catalog tables ([[DedupIndex]]-style); the
  * entry keeps them in-plan so one oracle covers the whole chain.
  *
  * Reference capability: the reference's dedup/transform steps
  * (`transformation.py`, SURVEY §2 P4/P5) generalized to the
  * training-data curation chain the brief names as first-class scope.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  private def table(s: SparkSession, d: String, name: String): DataFrame =
    s.read.parquet(s"$d/$name.parquet")

  val corpusPipeline: Q = (s, d) => {
    val docs = table(s, d, "documents").select(col("doc_id"), col("text"))

    // 1. Gopher quality metrics + flag; docs outside the metric frame
    //    (zero tokens) are drops with n_tokens = 0
    val flags = docs.select("doc_id")
      .join(CorpusOps.gopherCore(s, d)
          .select(col("doc_id"), col("n_tokens"), col("quality_flag")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("quality_flag"), lit("drop")).as("quality_flag"))

    // 2. exact dedup among quality keepers: min doc_id per normalized md5
    val normh = docs
      .join(flags.filter(col("quality_flag") === "keep").select("doc_id"),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("h"))
    val exactKept = normh.groupBy("h").agg(min("doc_id").as("doc_id"))
      .select("doc_id")

    // 3. LSH near-dup among exact survivors: a band collision marks the
    //    larger doc_id as a near-duplicate (ext03's banding, 4 × 4)
    val sig = DedupIndex.signatures(
      docs.join(exactKept, Seq("doc_id"), "left_semi"))
    val bands = Dedup.bandsOf(sig)
    val lshDrop = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("y.doc_id").as("doc_id")).distinct()

    // 4. decontamination inputs: shingle sizes and eval-set overlap.
    //    The shingle frame feeds several consumers; it is deliberately
    //    NOT cached — a .cache() here would pin the full-corpus shingle
    //    blocks for the rest of the JVM (entries return lazy frames, so
    //    nothing could ever unpersist), and Spark's exchange reuse
    //    already dedups identical subtrees. A production run persists
    //    the intermediates as catalog tables instead (scaladoc above).
    val sh = Dedup.shingles(docs)
    val evalSh = sh.filter(col("doc_id") % 10 === 0).select("sh")
    val nSh = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val nShared = sh.join(evalSh, Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    val contam = nSh.join(nShared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") / col("n_sh"))
          .as("frac"))

    // 5.–7. resolve each doc's exit stage, sample, assign phase
    val u = (col("doc_id") * lit(2654435761L)) % lit(2147483648L)
    val staged = flags
      .join(exactKept.withColumn("in_exact", lit(1)), Seq("doc_id"), "left")
      .join(lshDrop.withColumn("in_lsh_drop", lit(1)), Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("stage",
        when(col("quality_flag") =!= "keep", "quality_drop")
          .when(col("in_exact").isNull, "exact_dup")
          .when(col("in_lsh_drop").isNotNull, "near_dup")
          .when(col("doc_id") % 10 === 0, "heldout_eval")
          .when(coalesce(col("frac"), lit(0.0)) >= 0.5, "contaminated")
          .when(u.cast("double") / 2147483648.0 >= 0.5, "not_sampled")
          .otherwise("train"))
    staged.select(col("doc_id"), col("n_tokens"), col("stage"),
        when(col("stage") === "train",
          when(col("n_tokens") < 60, 1L)
            .when(col("n_tokens") < 120, 2L).otherwise(3L))
          .otherwise(0L).as("phase"))
      .orderBy("doc_id")
  }

  /** ext141 — END-TO-END ERASURE across every persisted index family:
    * the right-to-be-forgotten path at 100 TB. A corpus table (docs) and
    * a vector table (embeddings) each take one DELETE of the subject
    * slice (`id % 7 = 2` — the erasure request), and CDC maintenance
    * propagates it to all NINE index families, eight with FEED-SIZED work
    * (one change-feed slice each, never a rebuild): MinHash signatures,
    * exact-substring gram rows, BM25 postings + doc lengths, IVF cells,
    * PQ codes, SQ codes, NSW graph edges (cell-granular — and audited on
    * BOTH edge ends, since an erased vector must vanish as src and as
    * dst), and component labels with their edge and shingle-postings
    * side tables (cluster-local retract, splits exact). The output audits
    * the claim the way a compliance review would: per family, the live
    * row count still attributable to erased subjects (hash-checked to be
    * ZERO) and the surviving total (hash-checked against a DuckDB
    * recomputation from the raw corpus minus the erased slice). Pairs
    * with the per-family maintenance entries (ext134–ext138) the way
    * ext140 pairs with the curation operators: the composition is the
    * contract. Round 12 adds the EIGHTH family: component labels
    * (ext153), whose delete path is now cluster-local over the stored
    * edge artifact ([[DedupIndex.ensureLabelsCdc]]) — both the label
    * rows and the persisted edge rows are audited (an erased doc must
    * vanish as a label, as an edge endpoint on either side, and the
    * surviving label count must equal the live-doc count). Round 13
    * adds the NINTH: the df-capped label family
    * ([[DedupIndex.ensureLabelsCappedCdc]]), whose erasure path is the
    * documented LINEAR rebuild (capped edges are not append-stable) —
    * the audit proves the rebuild actually purges the subjects from
    * the label and postings artifacts. */
  val erasureE2e: Q = (s, d) => {
    graft.ops.ensureGraftCatalog(s)
    Seq("er_docs", "er_vecs",
      "dedup_er_sigs", "dedup_er_meta",
      "dedup_er_gr_grams", "dedup_er_gr_meta",
      "dedup_er_lb_labels", "dedup_er_lb_edges", "dedup_er_lb_posts",
      "dedup_er_lb_meta",
      "dedup_er_lc_labels", "dedup_er_lc_posts", "dedup_er_lc_df",
      "dedup_er_lc_meta",
      "search_er_postings", "search_er_docs", "search_er_meta",
      "ann_er_cells", "ann_er_cents", "ann_er_meta",
      "ann_er_pq_codes", "ann_er_pq_cents", "ann_er_pq_meta",
      "ann_er_sq_codes", "ann_er_sq_meta",
      "ann_er_gr_edges", "ann_er_gr_meta")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS graft_cat.db.$t"))
    s.sql("CREATE TABLE graft_cat.db.er_vecs (vec_id BIGINT, label INT, " +
      "v ARRAY<DOUBLE>, norm DOUBLE) " +
      "TBLPROPERTIES ('graft.dml.mode'='merge-on-read')")
    // the demo cohort is BOUNDED (first 2500 ids): entry cost must stay
    // fixture-sized at any SF — the per-family maintenance entries
    // (ext134–ext138) already measure full-corpus builds; this entry
    // measures the COMPOSITION, and its erasure claim is id-local.
    // The corpus and the two LABEL families come from the shared seed
    // (VERDICT r13 #5 — this entry "audits an existing index", so
    // seeding is contract-compatible): er_docs is a zero-copy clone of
    // the full-cohort seed corpus, and the lb_/lc_ artifacts clone with
    // their watermarks bound to er_docs' head; the other seven families
    // still build here (no seed exists for them on this corpus).
    Dedup.ensureLabelSeeds(s, d)
    Dedup.cloneLabelIndex(s, "full", "graft_cat.db.er_docs", "er")
    Dedup.cloneSeedIndexTo(s, "lcfull", "er", "graft_cat.db.er_docs")
    table(s, d, "embeddings")
      .filter(col("vec_id") < 2500)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("norm", expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"))
      .writeTo("graft_cat.db.er_vecs").append()
    // the nine family builds write DISJOINT artifact sets: overlap them
    // (optimization guide §2.6 — the striped ensure* locks + thread-
    // scoped txns make concurrent maintenance of different indexes in
    // one driver safe; measured r15: the builds are many small stages,
    // so back-filling the stage tails cuts the entry's wall-clock
    // without changing any artifact). The two label families share the
    // "label:er" lock and serialize with each other by design.
    graft.ops.inParallel[Any](Seq(
      () => DedupIndex.ensureCdc(s, "graft_cat.db.er_docs", "er"),
      () => DedupIndex.ensureGramsCdc(s, "graft_cat.db.er_docs", "er"),
      () => DedupIndex.ensureLabelsCdc(s, "graft_cat.db.er_docs", "er"),
      () => DedupIndex.ensureLabelsCappedCdc(s, "graft_cat.db.er_docs", "er"),
      () => SearchIndex.ensureCdc(s, "graft_cat.db.er_docs", "er"),
      () => AnnIndex.ensureCdc(s, "graft_cat.db.er_vecs", "er"),
      () => AnnIndex.ensurePqCdc(s, "graft_cat.db.er_vecs", "er"),
      () => AnnIndex.ensureSqCdc(s, "graft_cat.db.er_vecs", "er"),
      () => AnnIndex.ensureGraphCdc(s, "graft_cat.db.er_vecs", "er")))
    // the erasure request lands on the PRIMARY tables only
    s.sql("DELETE FROM graft_cat.db.er_docs WHERE doc_id % 7 = 2")
    s.sql("DELETE FROM graft_cat.db.er_vecs WHERE vec_id % 7 = 2")
    // propagation: one change-feed slice per family, same overlap
    val props = graft.ops.inParallel[Any](Seq(
      () => DedupIndex.ensureCdc(s, "graft_cat.db.er_docs", "er"),
      () => DedupIndex.ensureGramsCdc(s, "graft_cat.db.er_docs", "er"),
      () => DedupIndex.ensureLabelsCdc(s, "graft_cat.db.er_docs", "er"),
      () => DedupIndex.ensureLabelsCappedCdc(s, "graft_cat.db.er_docs", "er"),
      () => SearchIndex.ensureCdc(s, "graft_cat.db.er_docs", "er"),
      () => AnnIndex.ensureCdc(s, "graft_cat.db.er_vecs", "er"),
      () => AnnIndex.ensurePqCdc(s, "graft_cat.db.er_vecs", "er"),
      () => AnnIndex.ensureSqCdc(s, "graft_cat.db.er_vecs", "er"),
      () => AnnIndex.ensureGraphCdc(s, "graft_cat.db.er_vecs", "er")))
    val td = props(0).asInstanceOf[DedupIndex.Tables]
    val tgm = props(1).asInstanceOf[String]
    val tl = props(2).asInstanceOf[String]
    val tlc = props(3).asInstanceOf[String]
    val ts = props(4).asInstanceOf[SearchIndex.Tables]
    val ta = props(5).asInstanceOf[AnnIndex.Tables]
    val tp = props(6).asInstanceOf[AnnIndex.PqTables]
    val tq = props(7).asInstanceOf[String]
    val tg = props(8).asInstanceOf[String]
    def leg(family: String, t: String, id: String) =
      s.table(t).agg(
        count(when(col(id) % 7 === 2, 1)).as("n_erased_live"),
        count(lit(1)).as("n_live"))
        .select(lit(family).as("family"),
          col("n_erased_live"), col("n_live"))
    leg("bm25-doclens", ts.docs, "doc_id")
      .unionAll(leg("bm25-postings", ts.postings, "doc_id"))
      .unionAll(leg("component-labels", tl, "doc_id"))
      .unionAll(s.table("graft_cat.db.dedup_er_lb_edges").agg(
        count(when(col("a_id") % 7 === 2 || col("b_id") % 7 === 2, 1))
          .as("n_erased_live"),
        count(lit(1)).as("n_live"))
        .select(lit("component-edges").as("family"),
          col("n_erased_live"), col("n_live")))
      .unionAll(leg("component-postings",
        "graft_cat.db.dedup_er_lb_posts", "doc_id"))
      .unionAll(leg("component-labels-capped", tlc, "doc_id"))
      .unionAll(leg("component-capped-postings",
        "graft_cat.db.dedup_er_lc_posts", "doc_id"))
      .unionAll(leg("ivf-cells", ta.cells, "vec_id"))
      .unionAll(leg("minhash-signatures", td.sigs, "doc_id"))
      .unionAll(leg("exact-grams", tgm, "doc_id"))
      .unionAll(leg("pq-codes", tp.codes, "vec_id"))
      .unionAll(leg("sq-codes", tq, "vec_id"))
      .unionAll(s.table(tg).agg(
        count(when(col("src") % 7 === 2 || col("dst") % 7 === 2, 1))
          .as("n_erased_live"),
        count(lit(1)).as("n_live"))
        .select(lit("nsw-edges").as("family"),
          col("n_erased_live"), col("n_live")))
      .orderBy("family")
  }

  /** ext141b — ERASURE THROUGH THE AUTO ENTRY POINT (round-15, VERDICT
    * r14 #4): ext141 audits the label families by driving their
    * internals (`ensureLabelsCdc` / `ensureLabelsCappedCdc`) directly,
    * but the product surface a 100 TB user calls is
    * [[DedupIndex.ensureLabels]] — so the audited path must be that
    * one, across the full choice lifecycle:
    *
    *   1. first ensure on a seeded clone: the heuristic picks EXACT
    *      (benign cohort stats), records it in `dedup_er2_lu_choice`,
    *      and the cloned artifacts make the build a covered no-op;
    *   2. an erasure request (doc_id % 7 = 2) propagates through the
    *      SAME entry point — the sticky record routes it to the exact
    *      family's cluster-local erasure APPLY (no rebuild);
    *   3. a FORCED mid-life family switch (`force = capped`) retires
    *      the exact artifacts, re-records the choice as forced, and
    *      builds the capped index over the post-erasure corpus;
    *   4. a second erasure (doc_id % 5 = 1) again goes through
    *      `ensureLabels` — the sticky capped record routes it to the
    *      documented erasure-triggered LINEAR REBUILD, and the choice
    *      record must SURVIVE that rebuild still saying capped/forced.
    *
    * The output audits both families' artifacts the ext141 way (zero
    * live rows attributable to erased subjects; survivor totals
    * hash-checked against a DuckDB recomputation) plus the two choice
    * records. The choice legs reuse the audit row shape: family =
    * "lu-choice-<family>", n_erased_live carries the FORCED flag (0 =
    * auto, 1 = forced), n_live = 1 — a uniform schema so one frame
    * hash-checks the whole lifecycle. The exact-family legs are
    * materialized BEFORE the switch (step 3 drops those tables).
    * Counter-pinned in PipelineSpec: zero exact builds (seeded clone),
    * one exact apply, two capped builds (the forced switch + the
    * erasure rebuild), zero capped applies. */
  val erasureAuto: Q = (s, d) => {
    graft.ops.ensureGraftCatalog(s)
    // hermetic start: a previous run's choice record or capped
    // artifacts would re-route step 1
    s.sql("DROP TABLE IF EXISTS graft_cat.db.dedup_er2_lu_choice")
    Seq("lc_labels", "lc_posts", "lc_df", "lc_meta").foreach(x =>
      s.sql(s"DROP TABLE IF EXISTS graft_cat.db.dedup_er2_$x"))
    Dedup.ensureLabelSeeds(s, d)
    Dedup.cloneLabelIndex(s, "full", "graft_cat.db.er2_docs", "er2")
    // 1. auto choice (records exact) + covered no-op on the clone
    DedupIndex.ensureLabels(s, "graft_cat.db.er2_docs", "er2")
    val cA = s.table("graft_cat.db.dedup_er2_lu_choice")
      .select("family", "forced").head
    val (famA, forcedA) = (cA.getString(0), cA.getBoolean(1))
    // 2. erasure request, propagated through the SAME entry point
    s.sql("DELETE FROM graft_cat.db.er2_docs WHERE doc_id % 7 = 2")
    DedupIndex.ensureLabels(s, "graft_cat.db.er2_docs", "er2")
    def leg(family: String, t: String, id: String, erased: Column) =
      s.table(t).agg(
        count(when(erased, 1)).as("n_erased_live"),
        count(lit(1)).as("n_live"))
        .select(lit(family).as("family"),
          col("n_erased_live"), col("n_live"))
    val e7 = (c: Column) => c % 7 === 2
    val exactLegs =
      leg("exact-labels", "graft_cat.db.dedup_er2_lb_labels", "doc_id",
        e7(col("doc_id")))
        .unionAll(s.table("graft_cat.db.dedup_er2_lb_edges").agg(
          count(when(e7(col("a_id")) || e7(col("b_id")), 1))
            .as("n_erased_live"),
          count(lit(1)).as("n_live"))
          .select(lit("exact-edges").as("family"),
            col("n_erased_live"), col("n_live")))
        .unionAll(leg("exact-posts", "graft_cat.db.dedup_er2_lb_posts",
          "doc_id", e7(col("doc_id"))))
        .localCheckpoint(true) // step 3 retires these tables
    // 3. forced family switch mid-life
    DedupIndex.ensureLabels(s, "graft_cat.db.er2_docs", "er2",
      force = Some("capped"))
    // 4. second erasure — the sticky capped record routes it to the
    //    documented linear rebuild
    s.sql("DELETE FROM graft_cat.db.er2_docs WHERE doc_id % 5 = 1")
    DedupIndex.ensureLabels(s, "graft_cat.db.er2_docs", "er2")
    val cB = s.table("graft_cat.db.dedup_er2_lu_choice")
      .select("family", "forced").head
    val (famB, forcedB) = (cB.getString(0), cB.getBoolean(1))
    val eB = (c: Column) => c % 7 === 2 || c % 5 === 1
    val cappedLegs =
      leg("capped-labels", "graft_cat.db.dedup_er2_lc_labels", "doc_id",
        eB(col("doc_id")))
        .unionAll(leg("capped-posts", "graft_cat.db.dedup_er2_lc_posts",
          "doc_id", eB(col("doc_id"))))
    val choiceLegs = s.range(1).select(
        lit(s"lu-choice-a-$famA").as("family"),
        lit(if (forcedA) 1L else 0L).as("n_erased_live"),
        lit(1L).as("n_live"))
      .unionAll(s.range(1).select(
        lit(s"lu-choice-b-$famB").as("family"),
        lit(if (forcedB) 1L else 0L).as("n_erased_live"),
        lit(1L).as("n_live")))
    exactLegs.unionAll(cappedLegs).unionAll(choiceLegs).orderBy("family")
  }

  /** ext152 — THE INCREMENTAL CORPUS PIPELINE: ext140's steady state.
    * ext140 curates a corpus from scratch; a production pipeline runs
    * DAILY, cleaning each incoming batch against artifacts built from
    * the corpus it already accepted. This entry is that shape end to
    * end: the corpus (doc_id % 5 <> 3) exists only as its PERSISTED
    * index artifacts — the MinHash signature table
    * ([[DedupIndex.ensure]]) and the gram-digest table
    * ([[DedupIndex.ensureGramsCdc]]) — and the batch (% 5 = 3) flows
    * through quality → near-dup-vs-corpus → span-contamination →
    * sampling → curriculum with BATCH-sized work: the batch is signed
    * and grammed in-query; the corpus side is two index scans (band
    * join + digest semi-join), never a re-shingle.
    *
    * Stage order (each predicate evaluated only for survivors):
    *   1. `quality_drop`  — Gopher flag ≠ keep (ext140 stage 1);
    *   2. `near_dup`      — ANY LSH band collision against the STORED
    *      corpus signatures (the corpus is canonical: a colliding batch
    *      doc always drops — no pair ordering needed);
    *   3. `contaminated`  — ≥ 50% of the doc's tokens fall inside
    *      spans flagged by the stored gram index (ext149's screen);
    *   4. `not_sampled`   — the Knuth-hash uniform ≥ 0.5;
    *   5. `train`         — phase 1/2/3 by token-length strata.
    */
  val incrementalPipeline: Q = (s, d) => {
    graft.ops.ensureGraftCatalog(s)
    val all = table(s, d, "documents").select(col("doc_id"), col("text"))
    val corpus = all.filter(col("doc_id") % 5 =!= 3)
    val batch = all.filter(col("doc_id") % 5 === 3)
    // the persisted corpus artifacts (sig index covered-no-ops across
    // runs of the same fixture; the gram corpus table reseeds per run)
    val sigT = DedupIndex.ensure(s, corpus,
      "inc_" + d.replaceAll("[^a-zA-Z0-9]", "_"))
    s.sql("DROP TABLE IF EXISTS graft_cat.db.inc_docs")
    s.sql("DROP TABLE IF EXISTS graft_cat.db.dedup_inc_pipe_gr_grams")
    s.sql("DROP TABLE IF EXISTS graft_cat.db.dedup_inc_pipe_gr_meta")
    s.sql("CREATE TABLE graft_cat.db.inc_docs (doc_id BIGINT, " +
      "text STRING) TBLPROPERTIES ('graft.dml.mode'='merge-on-read')")
    corpus.writeTo("graft_cat.db.inc_docs").append()
    val gramsT = DedupIndex.ensureGramsCdc(s, "graft_cat.db.inc_docs",
      "inc_pipe")

    // 1. quality flags for the batch (row-local metrics)
    val flags = batch.select("doc_id")
      .join(CorpusOps.gopherCore(s, d)
          .select(col("doc_id"), col("n_tokens"), col("quality_flag")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("quality_flag"), lit("drop")).as("quality_flag"))
    // 2. near-dup: batch signatures vs the STORED corpus signatures
    val batchSig = DedupIndex.signatures(batch)
    val nearDup = Dedup.bandsOf(s.table(sigT.sigs)).as("x")
      .join(Dedup.bandsOf(batchSig).as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key"))
      .select(col("y.doc_id").as("doc_id")).distinct()
    // 3. span contamination: the stored gram index screens the batch
    val contam = CorpusOps.screenAgainst(s, gramsT, batch)
      .select(col("doc_id"), col("frac_removed"))
    // 4.–5. sample + phase
    val u = (col("doc_id") * lit(2654435761L)) % lit(2147483648L)
    val staged = flags
      .join(nearDup.withColumn("in_nd", lit(1)), Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("stage",
        when(col("quality_flag") =!= "keep", "quality_drop")
          .when(col("in_nd").isNotNull, "near_dup")
          .when(coalesce(col("frac_removed"), lit(0.0)) >= 0.5, "contaminated")
          .when(u.cast("double") / 2147483648.0 >= 0.5, "not_sampled")
          .otherwise("train"))
    staged.select(col("doc_id"), col("n_tokens"), col("stage"),
        when(col("stage") === "train",
          when(col("n_tokens") < 60, 1L)
            .when(col("n_tokens") < 120, 2L).otherwise(3L))
          .otherwise(0L).as("phase"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "ext140_corpus_pipeline" -> corpusPipeline,
    "ext152_incremental_pipeline" -> incrementalPipeline,
    "ext141_erasure_e2e" -> erasureE2e,
    "ext141b_erasure_auto" -> erasureAuto)

  val oracleSql: Map[String, String] = Map(
    "ext141b_erasure_auto" ->
      """WITH a_live AS (
        |  SELECT * FROM documents WHERE doc_id < 2500 AND doc_id % 7 <> 2),
        |b_live AS (
        |  SELECT * FROM a_live WHERE doc_id % 5 <> 1),
        |shla AS (SELECT DISTINCT doc_id,
        |    unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |            for i in range(1, len(toks)-1)]) AS sh
        |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
        |        FROM a_live) t WHERE len(toks) >= 3),
        |shlb AS (SELECT DISTINCT doc_id,
        |    unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |            for i in range(1, len(toks)-1)]) AS sh
        |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
        |        FROM b_live) t WHERE len(toks) >= 3),
        |sza AS (SELECT doc_id, COUNT(*) AS n FROM shla GROUP BY doc_id),
        |ledga AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT a_id FROM (
        |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |    FROM shla a JOIN shla b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2) i
        |  JOIN sza sa ON sa.doc_id = i.a_id
        |  JOIN sza sb ON sb.doc_id = i.b_id
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5))
        |SELECT * FROM (
        |  SELECT 'exact-labels' AS family, CAST(0 AS BIGINT) AS n_erased_live,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM a_live) AS n_live
        |  UNION ALL SELECT 'exact-edges', 0, (SELECT n FROM ledga)
        |  UNION ALL SELECT 'exact-posts', 0,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM shla)
        |  UNION ALL SELECT 'capped-labels', 0,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM b_live)
        |  UNION ALL SELECT 'capped-posts', 0,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM shlb)
        |  UNION ALL SELECT 'lu-choice-a-exact', 0, 1
        |  UNION ALL SELECT 'lu-choice-b-capped', 1, 1)
        |ORDER BY family""".stripMargin,
    "ext141_erasure_e2e" ->
      """WITH docs_live AS (
        |  SELECT * FROM documents WHERE doc_id % 7 <> 2 AND doc_id < 2500),
        |vecs_live AS (
        |  SELECT * FROM embeddings WHERE vec_id % 7 <> 2 AND vec_id < 2500),
        |post AS (SELECT COUNT(*) AS n FROM (
        |  SELECT DISTINCT doc_id, unnest(list_filter(
        |    string_split(lower(text), ' '), t -> t <> '')) AS tok
        |  FROM docs_live)),
        |sig AS (SELECT COUNT(*) AS n FROM docs_live
        |  WHERE len(string_split(lower(trim(text)), ' ')) >= 3),
        |dl AS (SELECT COUNT(*) AS n FROM docs_live),
        |nv AS (SELECT COUNT(*) AS n FROM vecs_live),
        |gr AS (SELECT CAST(SUM(n * LEAST(4, n - 1)) AS BIGINT) AS n FROM (
        |  SELECT label, COUNT(*) AS n FROM vecs_live GROUP BY label)),
        |gm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT DISTINCT doc_id,
        |    md5(array_to_string(toks[i+1 : i+8], ' ')) AS h
        |  FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '),
        |                t -> t <> '') AS toks
        |        FROM docs_live) x,
        |       UNNEST(range(0, GREATEST(len(toks) - 7, 0))) AS u(i))),
        |shl AS (SELECT DISTINCT doc_id,
        |    unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |            for i in range(1, len(toks)-1)]) AS sh
        |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
        |        FROM docs_live) t WHERE len(toks) >= 3),
        |szl AS (SELECT doc_id, COUNT(*) AS n FROM shl GROUP BY doc_id),
        |ledg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT a_id FROM (
        |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |    FROM shl a JOIN shl b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2) i
        |  JOIN szl sa ON sa.doc_id = i.a_id
        |  JOIN szl sb ON sb.doc_id = i.b_id
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5))
        |SELECT * FROM (
        |  SELECT 'bm25-doclens' AS family, CAST(0 AS BIGINT) AS n_erased_live,
        |         (SELECT n FROM dl) AS n_live
        |  UNION ALL SELECT 'bm25-postings', 0, (SELECT n FROM post)
        |  UNION ALL SELECT 'ivf-cells', 0, (SELECT n FROM nv)
        |  UNION ALL SELECT 'minhash-signatures', 0, (SELECT n FROM sig)
        |  UNION ALL SELECT 'pq-codes', 0, (SELECT n FROM nv) * 8
        |  UNION ALL SELECT 'sq-codes', 0, (SELECT n FROM nv)
        |  UNION ALL SELECT 'nsw-edges', 0, (SELECT n FROM gr)
        |  UNION ALL SELECT 'exact-grams', 0, (SELECT n FROM gm)
        |  UNION ALL SELECT 'component-labels', 0, (SELECT n FROM dl)
        |  UNION ALL SELECT 'component-edges', 0, (SELECT n FROM ledg)
        |  UNION ALL SELECT 'component-postings', 0,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM shl)
        |  UNION ALL SELECT 'component-labels-capped', 0, (SELECT n FROM dl)
        |  UNION ALL SELECT 'component-capped-postings', 0,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM shl))
        |ORDER BY family""".stripMargin,
    "ext152_incremental_pipeline" ->
      s"""WITH ${CorpusOps.gopherCtesSql},
         |flags AS (
         |  SELECT d.doc_id,
         |    COALESCE(m.n_tokens, 0) AS n_tokens,
         |    CASE WHEN m.doc_id IS NULL THEN 'drop'
         |         ELSE ${CorpusOps.gopherFlagSql.replace("\n", " ")} END
         |      AS quality_flag
         |  FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
         |  WHERE d.doc_id % 5 = 3),
         |${Dedup.shinglesSql},
         |csig AS (
         |  SELECT doc_id, j, MIN(md5(sh || '#' || j)) AS h
         |  FROM sh, range(16) r(j) WHERE doc_id % 5 <> 3 GROUP BY doc_id, j),
         |bsig AS (
         |  SELECT doc_id, j, MIN(md5(sh || '#' || j)) AS h
         |  FROM sh, range(16) r(j) WHERE doc_id % 5 = 3 GROUP BY doc_id, j),
         |cbands AS (
         |  SELECT doc_id, CAST(j // 4 AS INT) AS band,
         |         string_agg(h, '|' ORDER BY j) AS band_key
         |  FROM csig GROUP BY doc_id, CAST(j // 4 AS INT)),
         |bbands AS (
         |  SELECT doc_id, CAST(j // 4 AS INT) AS band,
         |         string_agg(h, '|' ORDER BY j) AS band_key
         |  FROM bsig GROUP BY doc_id, CAST(j // 4 AS INT)),
         |nd AS (
         |  SELECT DISTINCT y.doc_id
         |  FROM cbands x JOIN bbands y
         |    ON x.band = y.band AND x.band_key = y.band_key),
         |cd AS (SELECT doc_id, ${CorpusOps.toksSql} AS toks
         |       FROM documents WHERE doc_id % 5 <> 3),
         |cg AS (
         |  SELECT DISTINCT md5(array_to_string(toks[i+1 : i+8], ' ')) AS h
         |  FROM cd, UNNEST(range(0, GREATEST(len(toks) - 7, 0))) AS u(i)),
         |bdocs AS (SELECT doc_id, ${CorpusOps.toksSql} AS toks
         |          FROM documents WHERE doc_id % 5 = 3),
         |bgrams AS (
         |  SELECT doc_id, i AS pos, md5(array_to_string(toks[i+1 : i+8], ' ')) AS h
         |  FROM bdocs, UNNEST(range(0, GREATEST(len(toks) - 7, 0))) AS u(i)),
         |hit AS (SELECT doc_id, pos FROM bgrams WHERE h IN (SELECT h FROM cg)),
         |isl2 AS (
         |  SELECT doc_id, pos,
         |    CAST(SUM(CASE WHEN prev IS NULL OR pos > prev + 7 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS island
         |  FROM (SELECT doc_id, pos,
         |          LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |        FROM hit)),
         |sp2 AS (
         |  SELECT doc_id, island, MAX(pos) - MIN(pos) + 8 AS span_len
         |  FROM isl2 GROUP BY doc_id, island),
         |pd2 AS (
         |  SELECT doc_id, CAST(SUM(span_len) AS BIGINT) AS n_removed
         |  FROM sp2 GROUP BY doc_id),
         |contam AS (
         |  SELECT b.doc_id,
         |    CASE WHEN len(b.toks) > 0
         |         THEN CAST(COALESCE(p.n_removed, 0) AS DOUBLE) / len(b.toks)
         |         ELSE 0.0 END AS frac
         |  FROM bdocs b LEFT JOIN pd2 p ON b.doc_id = p.doc_id),
         |staged AS (
         |  SELECT f.doc_id, f.n_tokens,
         |    CASE WHEN f.quality_flag <> 'keep' THEN 'quality_drop'
         |         WHEN n.doc_id IS NOT NULL THEN 'near_dup'
         |         WHEN COALESCE(c.frac, 0.0) >= 0.5 THEN 'contaminated'
         |         WHEN CAST((f.doc_id * 2654435761) % 2147483648 AS DOUBLE)
         |              / 2147483648.0 >= 0.5 THEN 'not_sampled'
         |         ELSE 'train' END AS stage
         |  FROM flags f
         |  LEFT JOIN nd n ON f.doc_id = n.doc_id
         |  LEFT JOIN contam c ON f.doc_id = c.doc_id)
         |SELECT doc_id, n_tokens, stage,
         |  CAST(CASE WHEN stage = 'train' THEN
         |         CASE WHEN n_tokens < 60 THEN 1
         |              WHEN n_tokens < 120 THEN 2 ELSE 3 END
         |       ELSE 0 END AS BIGINT) AS phase
         |FROM staged ORDER BY doc_id""".stripMargin,
    "ext140_corpus_pipeline" ->
      s"""WITH ${CorpusOps.gopherCtesSql},
         |flags AS (
         |  SELECT d.doc_id,
         |    COALESCE(m.n_tokens, 0) AS n_tokens,
         |    CASE WHEN m.doc_id IS NULL THEN 'drop'
         |         ELSE ${CorpusOps.gopherFlagSql.replace("\n", " ")} END
         |      AS quality_flag
         |  FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id),
         |normh AS (
         |  SELECT f.doc_id,
         |    md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS h
         |  FROM flags f JOIN documents d ON f.doc_id = d.doc_id
         |  WHERE f.quality_flag = 'keep'),
         |exact_kept AS (SELECT MIN(doc_id) AS doc_id FROM normh GROUP BY h),
         |${Dedup.shinglesSql},
         |shx AS (SELECT s.doc_id, s.sh FROM sh s
         |        JOIN exact_kept e ON s.doc_id = e.doc_id),
         |sig AS (
         |  SELECT doc_id, j, MIN(md5(sh || '#' || j)) AS h
         |  FROM shx, range(16) r(j) GROUP BY doc_id, j),
         |bands AS (
         |  SELECT doc_id, CAST(j // 4 AS INT) AS band,
         |         string_agg(h, '|' ORDER BY j) AS band_key
         |  FROM sig GROUP BY doc_id, CAST(j // 4 AS INT)),
         |lsh_drop AS (
         |  SELECT DISTINCT y.doc_id
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.band_key = y.band_key
         |   AND x.doc_id < y.doc_id),
         |evs AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0),
         |szsh AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |shared AS (
         |  SELECT doc_id, COUNT(*) AS n_shared FROM sh
         |  WHERE sh IN (SELECT sh FROM evs) GROUP BY doc_id),
         |contam AS (
         |  SELECT z.doc_id,
         |    CAST(COALESCE(r.n_shared, 0) AS DOUBLE) / z.n_sh AS frac
         |  FROM szsh z LEFT JOIN shared r ON z.doc_id = r.doc_id),
         |staged AS (
         |  SELECT f.doc_id, f.n_tokens,
         |    CASE WHEN f.quality_flag <> 'keep' THEN 'quality_drop'
         |         WHEN e.doc_id IS NULL THEN 'exact_dup'
         |         WHEN l.doc_id IS NOT NULL THEN 'near_dup'
         |         WHEN f.doc_id % 10 = 0 THEN 'heldout_eval'
         |         WHEN COALESCE(c.frac, 0.0) >= 0.5 THEN 'contaminated'
         |         WHEN CAST((f.doc_id * 2654435761) % 2147483648 AS DOUBLE)
         |              / 2147483648.0 >= 0.5 THEN 'not_sampled'
         |         ELSE 'train' END AS stage
         |  FROM flags f
         |  LEFT JOIN exact_kept e ON f.doc_id = e.doc_id
         |  LEFT JOIN lsh_drop l ON f.doc_id = l.doc_id
         |  LEFT JOIN contam c ON f.doc_id = c.doc_id)
         |SELECT doc_id, n_tokens, stage,
         |  CAST(CASE WHEN stage = 'train' THEN
         |         CASE WHEN n_tokens < 60 THEN 1
         |              WHEN n_tokens < 120 THEN 2 ELSE 3 END
         |       ELSE 0 END AS BIGINT) AS phase
         |FROM staged ORDER BY doc_id""".stripMargin)
}
