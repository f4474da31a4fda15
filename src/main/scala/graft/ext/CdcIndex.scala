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
private[ext] object CdcIndex {

  /** Head version of a catalog table (one manifest read). */
  def headVersion(s: SparkSession, table: String): Long =
    s.table(s"$table.versions").agg(max(col("v"))).head.getLong(0)

  /** The stored watermark, or None when the meta table is absent/empty
    * or predates the CDC layout (no `version` column → rebuild). */
  def storedVersion(s: SparkSession, meta: String): Option[Long] =
    try Some(s.table(meta).select("version").head.getLong(0))
    catch {
      case _: org.apache.spark.sql.AnalysisException => None
      case _: NoSuchElementException => None
    }

  /** Dispatch: covered → no-op, stale → apply (rebuild on feed refusal),
    * absent → rebuild. Returns whatever the branches return. */
  def ensure[T](s: SparkSession, corpusTable: String, meta: String)(
      noOp: => T)(apply: (Long, Long) => T)(rebuild: Long => T): T = {
    val headV = headVersion(s, corpusTable)
    storedVersion(s, meta) match {
      case Some(v0) if v0 >= headV => noOp
      case Some(v0) =>
        try apply(v0, headV)
        catch {
          case _: UnsupportedOperationException => rebuild(headV)
        }
      case None => rebuild(headV)
    }
  }

  /** One cross-table transaction (CALL system.txn_*): the atomic
    * publish every CDC refresh ends with. */
  def inTxn(s: SparkSession)(body: => Unit): Unit = {
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
