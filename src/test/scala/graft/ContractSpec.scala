package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: catalog maps merge without collisions and
  * every oracle entry has a query (a ++ collision would silently drop a
  * query — this is the regression net).
  */
class ContractSpec extends AnyFunSuite {

  private val moduleQueryMaps: Seq[(String, Map[String, _])] = Seq(
    "Relational" -> ops.Relational.queries,
    "SemiStructured" -> ops.SemiStructured.queries,
    "WarehouseDemo" -> ops.WarehouseDemo.queries,
    "DateDimQueries" -> dw.DateDimQueries.queries,
    "Dedup" -> ext.Dedup.queries,
    "Similarity" -> ext.Similarity.queries,
    "TextAnalysis" -> ext.TextAnalysis.queries,
    "TrainingPrep" -> ext.TrainingPrep.queries,
    "GraphRank" -> ext.GraphRank.queries,
    "Multimodal" -> ext.Multimodal.queries,
    "Streams" -> streaming.Streams.queries,
    "AsOfQueries" -> plans.AsOfQueries.queries,
    "Advanced" -> ops.Advanced.queries)

  test("no query name collides across modules (++ would silently drop one)") {
    val perModule = moduleQueryMaps.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
    val dupes = perModule.groupBy(_._1).filter(_._2.length > 1)
    assert(dupes.isEmpty, s"colliding query names: $dupes")
    assert(SparkEntry.queries.size === perModule.length)
  }

  test("every oracle entry names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("bench short keys (prefix before first underscore) stay unique") {
    val shorts = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    assert(shorts.distinct.length === shorts.length,
      s"duplicate short keys: ${shorts.groupBy(identity).filter(_._2.length > 1).keys}")
  }

  test("rows-only queries (no oracle) are the documented exceptions") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("q38_approx_distinct"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
