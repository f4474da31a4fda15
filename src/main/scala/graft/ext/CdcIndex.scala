package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared skeleton of version-keyed CDC index maintenance — the common
  * half of [[DedupIndex.ensureCdc]], [[AnnIndex.ensureCdc]],
  * [[AnnIndex.ensurePqCdc]] and [[SearchIndex.ensureCdc]]: resolve the
  * corpus table's committed head version, compare it to the watermark
  * stored in the index's meta table, and dispatch to no-op / feed apply
  * / full rebuild. The artifact-specific halves (what to retract, what
  * to re-derive, the meta schema) stay with each index.
  *
  * The feed-apply callback may throw `UnsupportedOperationException`
  * when the change feed refuses a slice it cannot attribute row-exactly
  * (e.g. a copy-on-write rewrite in history) — the skeleton then falls
  * back to the full rebuild, the documented degradation path.
  */
private[graft] object CdcIndex {

  /** `graft.autocompact` spec every persisted index artifact declares
    * (4 MiB target : 4 small files : 20% DV ratio): CDC maintenance
    * takes deletes as merge-on-read DV appends, so without a compaction
    * policy an index under churn pays ever-growing DV subtraction on
    * every probe. With the property, the catalog's write-time trigger
    * byte-merges small append segments and materializes DVs past the
    * ratio — and a `graft.sort`ed postings table re-sorts instead of
    * byte-merging, so term clustering survives the compaction. */
  val AutoCompactSpec = "4194304:4:20"

  /** Shared ensure*() name validation: catalog-safe charset. */
  def requireIndexName(name: String): Unit =
    require(name.matches("[a-zA-Z0-9_]+"), s"bad index name: $name")

  /** Per-name lock striping for ensure* entry points (round-15, VERDICT
    * r14 #5): builds of DIFFERENT indexes in one driver proceed in
    * parallel; two ensures of the SAME index serialize (idempotence of
    * the watermark dispatch needs at-most-one in flight per artifact
    * set). Monitors are per-thread reentrant, so an entry point calling
    * a sibling under the SAME key (ensureLabels → ensureLabelsCdc)
    * nests safely. The map only ever grows by distinct index names a
    * driver actually touches — bounded by the catalog, not the data. */
  private val nameLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def withNameLock[T](key: String)(body: => T): T =
    nameLocks.computeIfAbsent(key, _ => new Object).synchronized(body)

  /** Extra validation for the BASE-family entry points of a prefix that
    * owns sub-families (minhash under `dedup`, IVF under `ann`): a base
    * index named with one of the prefix's sub-family suffixes — derived
    * from the classification source of truth,
    * [[graft.sources.IndexesProcedure.Families]] — would make its meta
    * table (`dedup_x_gr_meta`, `ann_x_pq_meta`, …) the SAME name a
    * sub-family index uses, so the two could clobber each other and
    * `CALL system.indexes()` could not classify the row. Sub-family
    * entry points (ensurePq/ensureSq/ensureGraphCdc/ensureLabelsCdc/
    * ensureGramsCdc) append their own suffix and stay collision-free
    * for ANY charset-valid name — a SQ index named `spec_sq` is legal
    * and classifies correctly — so they use the plain
    * [[requireIndexName]]. */
  def requireBaseFamilyName(name: String, prefix: String): Unit = {
    requireIndexName(name)
    val reserved = graft.sources.IndexesProcedure.Families
      .collect { case (_, p, suf, _) if p == prefix && suf.nonEmpty => suf }
    require(!reserved.exists(name.endsWith),
      s"index name '$name' ends with a reserved $prefix sub-family " +
        s"suffix (${reserved.mkString(", ")}) — its tables would collide " +
        "with that sub-family's naming and break the system.indexes() " +
        "inventory classification")
  }

  /** Head version of a catalog table (one manifest read). */
  def headVersion(s: SparkSession, table: String): Long =
    graft.ops.withDesc(s, "cdc: watermark")(
      s.table(s"$table.versions").agg(max(col("v"))).head.getLong(0))

  /** The stored watermark, or None when the meta table is absent/empty
    * or predates the CDC layout (no `version` column → rebuild). */
  def storedVersion(s: SparkSession, meta: String): Option[Long] =
    try Some(graft.ops.withDesc(s, "cdc: watermark")(
      s.table(meta).select("version").head.getLong(0)))
    catch {
      case _: org.apache.spark.sql.AnalysisException => None
      case _: NoSuchElementException => None
    }

  /** The corpus table a CDC meta is bound to — None when the meta is
    * absent/empty or predates the identity column. */
  def storedCorpus(s: SparkSession, meta: String): Option[String] =
    try {
      val df = s.table(meta)
      if (!df.schema.fieldNames.contains("corpus")) None
      else Option(graft.ops.withDesc(s, "cdc: watermark")(
        df.select("corpus").head.getString(0)))
    } catch {
      case _: org.apache.spark.sql.AnalysisException => None
      case _: NoSuchElementException => None
    }

  /** Dispatch: covered → no-op, stale → apply (rebuild on feed refusal),
    * absent → rebuild. Returns whatever the branches return.
    *
    * The watermark is a version NUMBER, meaningful only against the
    * table it was recorded for — so the meta also records the corpus
    * IDENT, and a call naming a DIFFERENT table rebuilds (re-binding
    * the index to the requested corpus) instead of silently no-opping
    * or grafting another table's feed slice onto this index. A meta
    * from before the identity column exists is unverifiable and
    * rebuilds once, which self-migrates it. */
  /** (version, corpus) from one meta read (round-16): storedVersion +
    * storedCorpus each paid a separate scan job of the same one-row
    * table — at ~0.1 s scheduler floor per job that was a visible slice
    * of every ensure* call's fixed cost (ext141 alone makes 18 of
    * them). Same absent/legacy semantics as the two helpers. */
  private def storedMeta(s: SparkSession, meta: String)
      : Option[(Long, Option[String])] =
    try {
      val df = s.table(meta)
      val hasCorpus = df.schema.fieldNames.contains("corpus")
      val r = graft.ops.withDesc(s, "cdc: watermark")(
        (if (hasCorpus) df.select(col("version"), col("corpus"))
         else df.select(col("version"), lit(null).cast("string"))).head())
      Some((r.getLong(0), Option(r.getString(1))))
    } catch {
      case _: org.apache.spark.sql.AnalysisException => None
      case _: NoSuchElementException => None
    }

  def ensure[T](s: SparkSession, corpusTable: String, meta: String)(
      noOp: => T)(apply: (Long, Long) => T)(rebuild: Long => T): T = {
    val headV = headVersion(s, corpusTable)
    val stored = storedMeta(s, meta)
    stored.map(_._1) match {
      case Some(_) if !stored.exists(_._2.contains(corpusTable)) =>
        rebuild(headV)
      case Some(v0) if v0 >= headV => noOp
      case Some(v0) =>
        // retention guard: `expire_versions` may have dropped commits
        // INSIDE (v0, headV] — the change feed then refuses the range
        // with IllegalArgumentException (NOT the feed-refusal
        // UnsupportedOperationException), which would wedge maintenance
        // permanently: same watermark, same failure, every call, until
        // someone drops the meta by hand. Detect the gap from the
        // retained-version metadata (manifest arithmetic, no data read)
        // and take the documented degradation path instead — a full
        // rebuild, which also re-binds the watermark above the horizon.
        // The feed resolves `at(v0)` too (the from-version snapshot is
        // the delta's base), so v0 itself must still be retained — an
        // expiry that kept exactly (v0, headV] passes a (v0, headV]
        // count but still throws IAE on the read. Count [v0, headV].
        val retained = graft.ops.withDesc(s, "cdc: watermark")(
          s.table(s"$corpusTable.versions")
            .filter(col("v") >= v0 && col("v") <= headV).count())
        if (retained < headV - v0 + 1) rebuild(headV)
        else try apply(v0, headV)
        catch {
          case _: UnsupportedOperationException => rebuild(headV)
        }
      case None => rebuild(headV)
    }
  }

  /** The (catalog table ident, committed head version) behind `df` when
    * it is a PURE scan of one `graft_cat` table — optional subquery
    * aliases / bare-attribute projections over a single
    * DataSourceV2Relation; None for anything else (filters, computed
    * columns, joins, non-catalog sources), where content cannot be
    * keyed by a table version. Plain ensure() uses this as a cheap
    * content fingerprint: a catalog table's version changes on EVERY
    * commit, so an in-place UPDATE that preserves row count and max id
    * — invisible to the (cnt, max, prefixCnt) watermark — still moves
    * the fingerprint. One manifest read, no data scan. */
  def sourceVersion(s: SparkSession, df: org.apache.spark.sql.DataFrame)
      : Option[(String, Long)] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    @annotation.tailrec
    def strip(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
      case SubqueryAlias(_, c) => strip(c)
      case Project(es, c) if es.forall(_.isInstanceOf[AttributeReference]) =>
        strip(c)
      case r: DataSourceV2Relation => Some(r)
      case _ => None
    }
    strip(df.queryExecution.analyzed).flatMap { r =>
      (r.catalog, r.identifier) match {
        case (Some(cat), Some(id)) if cat.name == "graft_cat" =>
          val ident = (cat.name +: id.namespace :+ id.name).mkString(".")
          try Some((ident, headVersion(s, ident)))
          catch { case _: Exception => None }
        case _ => None
      }
    }
  }

  /** True when every commit in (v0, v1] on `table` is append-only or
    * content-preserving ("append", "compact", "zorder", "alter", "tag")
    * — the proof plain ensure()'s delta-append path needs that the
    * already-indexed prefix was not edited in place while new rows
    * arrived. Metadata-sized (one manifest read, one row per version). */
  def appendOnlyBetween(s: SparkSession, table: String, v0: Long,
      v1: Long): Boolean = {
    val safe = Set("append", "compact", "zorder", "alter", "tag")
    val ops = s.table(s"$table.versions")
      .filter(col("v") > v0 && col("v") <= v1)
      .select("operation").collect()
    // completeness first: expire_versions may have dropped commits
    // inside the range, and an EXPIRED non-append commit (an in-place
    // UPDATE, say) must not become invisible to this proof — judging
    // only the retained rows would let the delta path serve stale
    // entries for rows the missing commit rewrote
    ops.length == (v1 - v0) &&
      ops.forall(r => safe(r.getString(0).split('@').head))
  }

  /** One cross-table transaction (CALL system.txn_*): the atomic
    * publish every CDC refresh ends with.
    *
    * Serialized on a JVM-global gate (round-15, VERDICT r14 #5): the
    * catalog allows ONE open transaction per JVM (`txn_begin` throws on
    * a second), so with the per-name build locks two concurrent ensures
    * would otherwise race their publish windows into that error. The
    * gate queues them instead — the expensive build phases (shingle
    * scans, pair joins, CC) run fully in parallel; only the
    * metadata-sized commit section serializes, which is how lakehouse
    * commit protocols behave on a real cluster anyway (the table
    * pointer is a CAS). */
  private val txnGate = new Object
  def inTxn(s: SparkSession)(body: => Unit): Unit = txnGate.synchronized {
    graft.ops.withDesc(s, "cdc: txn publish") {
      s.sql("CALL graft_cat.system.txn_begin()").collect()
      try { body; s.sql("CALL graft_cat.system.txn_commit()").collect() }
      catch {
        case t: Throwable =>
          try s.sql("CALL graft_cat.system.txn_abort()").collect()
          catch { case s2: Throwable => t.addSuppressed(s2) }
          throw t
      }
    }
  }
}
