package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED lexical index: the inverted postings of the BM25 demo
  * (ext70) stored as `graft_cat` catalog tables with incremental append
  * maintenance — the third persisted-index family alongside [[AnnIndex]]
  * (vectors) and [[DedupIndex]] (near-dup signatures), closing the
  * round-9 north-star theme for the retrieval path too.
  *
  * Like MinHash signatures (and unlike IVF centroids), postings rows
  * and document lengths are pure PER-DOCUMENT functions, so incremental
  * maintenance is EXACT: tokenizing only the delta and appending yields
  * byte-identical state to a full rebuild. The corpus-level BM25 inputs
  * (df, n_docs, sum_dl) are NOT stored — they are cheap aggregates over
  * the stored tables computed at probe time, so they can never go stale.
  *
  * Layout (per index name):
  *   - `graft_cat.db.search_<name>_postings` (doc_id BIGINT, tok STRING,
  *     tf BIGINT) — the inverted index;
  *   - `graft_cat.db.search_<name>_docs` (doc_id BIGINT, dl BIGINT) —
  *     document lengths (every doc, including token-less ones: BM25's
  *     N and avgdl count them);
  *   - `graft_cat.db.search_<name>_meta` (k, n_docs, max_id) — the
  *     corpus watermark ([[DedupIndex]]'s discipline: coverage cannot
  *     be derived from postings — empty docs have no postings rows).
  *
  * The refresh publishes postings append + docs append + watermark in
  * ONE THREE-TABLE transaction (SegTxn): a torn refresh can never leave
  * dl rows without their postings (which would silently deflate tf) or
  * advance the watermark past unindexed documents. A full rebuild
  * writes meta LAST so a torn build self-heals into a rebuild.
  *
  * At 100 TB: the tokenize+explode pass over raw text is the dominant
  * cost of every lexical query; storing postings moves it to ingest,
  * and the per-query cost becomes a probe of the query terms' postings
  * (plus two metadata-scale aggregates). The postings table is
  * term-clustered (`graft.sort = tok:8`, see [[writePostings]]), so the
  * term filter also prunes whole segments via the string-prefix zone
  * maps — probe IO ∝ the query terms' segments, not the postings table.
  */
object SearchIndex {

  val builds = new java.util.concurrent.atomic.AtomicLong(0)
  val refreshes = new java.util.concurrent.atomic.AtomicLong(0)

  final case class Tables(postings: String, docs: String, meta: String)

  /** Token frame shared with ext70: lowered, whitespace-split, empties
    * dropped. */
  private val toksExpr = "filter(split(lower(text), ' '), t -> t <> '')"

  /** The postings table declares `graft.sort = tok:8`: every write
    * (build CTAS and each incremental/CDC INSERT) range-distributes and
    * sorts by term, so segments carry DISJOINT token ranges and a term
    * probe prunes via the string-prefix zone maps (q156's machinery).
    * At 100 TB this is what makes the probe cost ∝ query-term postings
    * instead of a full postings scan — the same role tok-partitioning
    * plays in a production inverted index, without a partition column.
    * Spec-pinned: the BM25 probe plans a strict subset of segments. */
  private def writePostings(tf: DataFrame, t: Tables): Unit =
    tf.writeTo(t.postings)
      .tableProperty(graft.sources.SegSort.PropKey, "tok:8")
      // sorted + autocompact: clustering decay / DV growth triggers the
      // catalog's RE-SORT compaction (not a byte-merge), so postings
      // segments stay term-disjoint across maintenance (spec-pinned)
      .tableProperty("graft.autocompact", CdcIndex.AutoCompactSpec)
      .createOrReplace()

  /** Per-document index rows — (postings, dl) — bit-identical to
    * ext70's in-query tf/dl construction. */
  private[graft] def postingsOf(docs: DataFrame): (DataFrame, DataFrame) = {
    val toks = docs.select(col("doc_id"), expr(toksExpr).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    (tf, dl)
  }

  /** Ensure the named index covers `docs` (doc_id BIGINT, text STRING):
    * covered → no-op; append-only growth → tokenize ONLY the delta,
    * publish all three tables in one txn; anything else → rebuild.
    *
    * Watermark strength ([[DedupIndex.ensure]]'s discipline): a pure
    * `graft_cat`-scan corpus stores the table's committed VERSION in
    * meta's `k` as a content fingerprint, so count/max-preserving
    * in-place UPDATEs still force a rebuild and the delta-append path
    * requires provably append-only intervening commits. A plain
    * DataFrame corpus has no fingerprint (k = −1): an UPDATE preserving
    * count+max is NOT detected — use [[ensureCdc]] for mutable
    * catalog corpora. */
  def ensure(s: SparkSession, docs: DataFrame, name: String): Tables =
    CdcIndex.withNameLock(s"search:$name") {
      CdcIndex.requireIndexName(name)
      graft.ops.ensureGraftCatalog(s)
      val t = Tables(s"graft_cat.db.search_${name}_postings",
        s"graft_cat.db.search_${name}_docs",
        s"graft_cat.db.search_${name}_meta")

      val src = CdcIndex.sourceVersion(s, docs)
      val metaCols: Option[Seq[String]] =
        try Some(s.table(t.meta).schema.fieldNames.toSeq)
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      if (metaCols.exists(_.headOption.contains("version"))) {
        // CDC-built index: k-mode meta values would silently reset the
        // version watermark to 0 (full feed replay on the next
        // ensureCdc). Same catalog corpus → delegate; else → rebuild,
        // explicitly converting the index to k-mode.
        return src match {
          case Some((tbl, _)) => ensureCdc(s, tbl, name)
          case None => build(s, docs, t, -1L)
        }
      }
      val fp = src.map(_._2).getOrElse(-1L)

      val stored: Option[(Long, Long, Long)] =
        try {
          val r = s.table(t.meta).select("k", "n_docs", "max_id").head
          Some((r.getLong(0), r.getLong(1), r.getLong(2)))
        } catch {
          case _: org.apache.spark.sql.AnalysisException => None
          case _: NoSuchElementException => None
        }
      val bodiesExist =
        try { s.table(t.postings).schema; s.table(t.docs).schema; true }
        catch { case _: org.apache.spark.sql.AnalysisException => false }

      (stored, bodiesExist) match {
        case (Some((storedK, storedN, storedMax)), true) if storedN > 0 =>
          val cs = docs.agg(count(lit(1)), max(col("doc_id")),
            count(when(col("doc_id") <= lit(storedMax), 1))).head
          val (cnt, mx, prefixCnt) = (cs.getLong(0),
            if (cs.isNullAt(1)) -1L else cs.getLong(1), cs.getLong(2))
          if (cnt == storedN && mx == storedMax && storedK == fp)
            t // covered — no-op
          else if (cnt == storedN && mx == storedMax && storedK >= 0 &&
              fp > storedK &&
              CdcIndex.appendOnlyBetween(s, src.get._1, storedK, fp)) {
            // content-preserving commits (compact, zorder, tag, alter —
            // or a zero-row append) moved the fingerprint while count and
            // max prove the indexed content unchanged: advance the
            // watermark instead of an O(corpus) rebuild
            s.sql(s"INSERT OVERWRITE ${t.meta} SELECT CAST($fp AS BIGINT), " +
              s"CAST($storedN AS BIGINT), CAST($storedMax AS BIGINT)")
            t
          } else if (mx > storedMax && prefixCnt == storedN &&
              ((storedK < 0 && fp < 0) ||
               (storedK >= 0 && fp > storedK &&
                CdcIndex.appendOnlyBetween(s, src.get._1, storedK, fp)))) {
            val (tf, dl) = postingsOf(docs.filter(col("doc_id") > lit(storedMax)))
            val uid = java.util.UUID.randomUUID().toString.replace("-", "")
            val (tfV, dlV) = (s"graft_srch_tf_$uid", s"graft_srch_dl_$uid")
            tf.createOrReplaceTempView(tfV)
            dl.createOrReplaceTempView(dlV)
            try CdcIndex.inTxn(s) {
              s.sql(s"INSERT INTO ${t.postings} SELECT * FROM $tfV")
              s.sql(s"INSERT INTO ${t.docs} SELECT * FROM $dlV")
              s.sql(s"INSERT OVERWRITE ${t.meta} SELECT CAST($fp AS BIGINT), " +
                s"CAST($cnt AS BIGINT), CAST($mx AS BIGINT)")
            } finally {
              s.catalog.dropTempView(tfV); s.catalog.dropTempView(dlV)
            }
            refreshes.incrementAndGet()
            t
          } else build(s, docs, t, fp)
        case _ => build(s, docs, t, fp)
      }
    }

  // ------------------------------------------------- CDC maintenance

  /** CDC-applied refreshes — specs pin "deletes were maintained without
    * a rebuild" through this. */
  val cdcRefreshes = new java.util.concurrent.atomic.AtomicLong(0)

  /** Version-keyed maintenance over a CATALOG-table corpus — the lexical
    * member of the CDC-maintenance triple ([[DedupIndex.ensureCdc]],
    * [[AnnIndex.ensureCdc]]): coverage keys on the table's committed
    * VERSION, and one change-feed slice retracts the changed docs'
    * postings AND dl rows (merge-on-read deletion-vector appends on both
    * tables), re-tokenizes only the touched head images, and advances
    * the watermark. Postings and dl are per-document pure, and the
    * corpus-level BM25 inputs (df, n_docs, sum_dl) are derived at probe
    * time from the stored tables — so CDC maintenance is EXACT and the
    * probe-time stats can never go stale (spec-pinned: maintained state
    * equals a rebuild over the head).
    *
    * Meta (CDC variant): `(version BIGINT, n_docs BIGINT, max_id
    * BIGINT)`. Crash ordering as in the twins: retractions publish
    * immediately and idempotently; both inserts + the watermark advance
    * land in ONE three-table txn, so a crash between replays the same
    * slice and converges. */
  def ensureCdc(s: SparkSession, corpusTable: String, name: String): Tables =
    CdcIndex.withNameLock(s"search:$name") {
      CdcIndex.requireIndexName(name)
      graft.ops.ensureGraftCatalog(s)
      val t = Tables(s"graft_cat.db.search_${name}_postings",
        s"graft_cat.db.search_${name}_docs",
        s"graft_cat.db.search_${name}_meta")
      CdcIndex.ensure(s, corpusTable, t.meta)(t) { (v0, headV) =>
        applyCdc(s, corpusTable, t, v0, headV); t
      }(headV => buildCdc(s, corpusTable, t, headV))
    }

  private def applyCdc(s: SparkSession, corpusTable: String, t: Tables,
      v0: Long, headV: Long): Unit = {
    val uid = java.util.UUID.randomUUID().toString.replace("-", "")
    val tv = s"graft_srch_touched_$uid"
    val (tfV, dlV) = (s"graft_srch_ctf_$uid", s"graft_srch_cdl_$uid")
    s.sql(s"SELECT DISTINCT doc_id FROM $corpusTable " +
        s"VERSION AS OF 'cdf:$v0..$headV'")
      .createOrReplaceTempView(tv)
    try {
      // 1. retract the changed docs from BOTH tables — idempotent replay
      s.sql(s"DELETE FROM ${t.postings} WHERE doc_id IN " +
        s"(SELECT doc_id FROM $tv)")
      s.sql(s"DELETE FROM ${t.docs} WHERE doc_id IN " +
        s"(SELECT doc_id FROM $tv)")
      // 2. re-tokenize the surviving HEAD images + advance the watermark
      //    in ONE three-table txn
      val head = s.table(corpusTable).select(col("doc_id"), col("text"))
      val (tf, dl) = postingsOf(
        head.join(s.table(tv), Seq("doc_id"), "left_semi"))
      tf.createOrReplaceTempView(tfV)
      dl.createOrReplaceTempView(dlV)
      val cs = head.agg(count(lit(1)), max(col("doc_id"))).head
      val (cnt, mx) = (cs.getLong(0),
        if (cs.isNullAt(1)) -1L else cs.getLong(1))
      CdcIndex.inTxn(s) {
        s.sql(s"INSERT INTO ${t.postings} SELECT * FROM $tfV")
        s.sql(s"INSERT INTO ${t.docs} SELECT * FROM $dlV")
        s.sql(s"INSERT OVERWRITE ${t.meta} SELECT CAST($headV AS BIGINT), " +
          s"CAST($cnt AS BIGINT), CAST($mx AS BIGINT), '$corpusTable'")
      }
      cdcRefreshes.incrementAndGet()
    } finally {
      s.catalog.dropTempView(tv)
      s.catalog.dropTempView(tfV)
      s.catalog.dropTempView(dlV)
    }
  }

  private def buildCdc(s: SparkSession, corpusTable: String, t: Tables,
      headV: Long): Tables = {
    val docs = s.table(corpusTable).select(col("doc_id"), col("text"))
    val cs = docs.agg(count(lit(1)), max(col("doc_id"))).head
    val (cnt, mx) = (cs.getLong(0),
      if (cs.isNullAt(1)) -1L else cs.getLong(1))
    val (tf, dl) = postingsOf(docs)
    writePostings(tf, t)
    dl.writeTo(t.docs)
      .tableProperty("graft.autocompact", CdcIndex.AutoCompactSpec)
      .createOrReplace()
    // retractions must be deletion-vector appends, not segment rewrites
    s.sql(s"ALTER TABLE ${t.postings} SET TBLPROPERTIES " +
      "('graft.dml.mode'='merge-on-read')")
    s.sql(s"ALTER TABLE ${t.docs} SET TBLPROPERTIES " +
      "('graft.dml.mode'='merge-on-read')")
    // meta LAST: a crash above leaves meta ≠ version → next ensure rebuilds
    s.sql(s"DROP TABLE IF EXISTS ${t.meta}")
    s.sql(s"CREATE TABLE ${t.meta} " +
      "(version BIGINT, n_docs BIGINT, max_id BIGINT, corpus STRING)")
    s.sql(s"INSERT INTO ${t.meta} SELECT CAST($headV AS BIGINT), " +
      s"CAST($cnt AS BIGINT), CAST($mx AS BIGINT), '$corpusTable'")
    builds.incrementAndGet()
    t
  }

  private def build(s: SparkSession, docs: DataFrame, t: Tables,
      fp: Long): Tables = {
    val cs = docs.agg(count(lit(1)), max(col("doc_id"))).head
    val (cnt, mx) = (cs.getLong(0),
      if (cs.isNullAt(1)) -1L else cs.getLong(1))
    val (tf, dl) = postingsOf(docs)
    writePostings(tf, t)
    dl.writeTo(t.docs)
      .tableProperty("graft.autocompact", CdcIndex.AutoCompactSpec)
      .createOrReplace()
    s.sql(s"DROP TABLE IF EXISTS ${t.meta}")
    s.sql(s"CREATE TABLE ${t.meta} (k BIGINT, n_docs BIGINT, max_id BIGINT)")
    s.sql(s"INSERT INTO ${t.meta} SELECT CAST($fp AS BIGINT), " +
      s"CAST($cnt AS BIGINT), CAST($mx AS BIGINT)")
    builds.incrementAndGet()
    t
  }

}
