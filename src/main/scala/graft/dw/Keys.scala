package graft.dw

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Surrogate-key generation (SURVEY.md §2.4 A4, §7.4.1).
  *
  * The reference assigns ids positionally (`np.arange(1, len+1)`,
  * `/root/reference/transformation.py:160,188,277,395,405,442`), which
  * depends on pandas file order. Spark has no stable row order, so:
  *
  *   - [[denseIds]]: ids 1..n by an explicit natural-key order —
  *     deterministic and oracle-reproducible. Costs a global sort; correct
  *     choice for dimension tables (categories, attributes, elite years —
  *     at most a few million rows even at 100 TB input).
  *   - [[partitionOffsetIds]]: zipWithIndex-style — one count per
  *     partition, no global sort; ids are dense but their order follows
  *     partition layout. Correct choice for fact-table ids (checkin_id,
  *     tip_id) at scale, where ids are opaque handles; kept deterministic
  *     here by sorting within the caller first only when needed.
  */
object Keys {

  /** Dense 1..n ids ordered by the given natural key. */
  def denseIds(df: DataFrame, idCol: String, orderBy: Seq[Column]): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(orderBy: _*)))

  /** Scalable dense ids: per-partition offsets + local index (no global
    * sort; one extra job to count partitions — the standard zipWithIndex
    * trade). Ids are dense 1..n but partition-order dependent.
    */
  def partitionOffsetIds(df: DataFrame, idCol: String): DataFrame = {
    val schema = df.schema
    val withId = df.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(withId,
      schema.add(idCol, LongType, nullable = false))
  }

  /** Scale-safe deterministic dense ids in natural-key order — the fact-
    * table replacement for [[denseIds]] (whose unpartitioned Window funnels
    * every row through one task).
    *
    * Range-repartition by the key, sort within partitions, then assign
    * per-partition offsets + local indexes (zipWithIndex). Range partitions
    * are totally ordered by the key, so (partition, local position)
    * enumerates rows in global key order: the ids equal
    * `row_number() OVER (ORDER BY keys)` — including NULLS FIRST semantics —
    * while both the exchange and the sort stay fully distributed. Sampled
    * range boundaries only decide where partition cuts fall, never the
    * global order, so the ids are deterministic for any boundary placement
    * (ties between rows equal on the whole key are arbitrary, as with any
    * row_number over a non-unique key).
    */
  def rangeIds(df: DataFrame, idCol: String, orderBy: Seq[Column]): DataFrame =
    partitionOffsetIds(
      df.repartitionByRange(orderBy: _*).sortWithinPartitions(orderBy: _*),
      idCol)
}
