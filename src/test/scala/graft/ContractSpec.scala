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
    "CorpusOps" -> ext.CorpusOps.queries,
    "Behavior" -> ext.Behavior.queries,
    "Search" -> ext.Search.queries,
    "GraphRank" -> ext.GraphRank.queries,
    "Multimodal" -> ext.Multimodal.queries,
    "Layout" -> ext.Layout.queries,
    "Geo" -> ext.Geo.queries,
    "Expectations" -> ext.Expectations.queries,
    "Streams" -> streaming.Streams.queries,
    "AsOfQueries" -> plans.AsOfQueries.queries,
    "Advanced" -> ops.Advanced.queries,
    "DecisionSupport" -> ops.DecisionSupport.queries,
    "IncrementalMv" -> ops.IncrementalMv.queries,
    "Pipeline" -> ext.Pipeline.queries)

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

  test("bench short keys stay unique and the contract line fits the tail") {
    val names = SparkEntry.queries.keys.toSeq
    val shorts = names.map(Bench.shortKey)
    assert(shorts.distinct.length === shorts.length,
      s"duplicate short keys: ${shorts.groupBy(identity).filter(_._2.length > 1).keys}")
    // the driver parses the contract line from a ~2000-char captured tail.
    // contractLine SELF-LIMITS (slowest-first packing into a 1900-char
    // budget; full map goes to BENCH_LOCAL.json) — assert the cap holds
    // even in the worst case: every value at interference-inflated width.
    val worst = names.map(_ -> 3599.6).toMap
    val line = Bench.contractLine(worst, "sf0.1")
    assert(line.length <= 1900, s"contract line ${line.length} chars")
    assert(line.contains("\"nq\":" + names.size)) // full count always present
    assert(line.contains("\"value\":" +
      Bench.r2(worst.values.sum))) // total covers omitted entries too
    // realistic mixed run: slow entries must survive packing, omissions
    // come only from the fast end
    val mixed = names.sorted.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 17 == 0) 25.0 else 0.3)
    }.toMap
    val ml = Bench.contractLine(mixed, "sf0.1")
    assert(ml.length <= 1900)
    mixed.filter(_._2 > 1.0).keys.foreach { n =>
      assert(ml.contains("\"" + Bench.shortKey(n) + "\":"),
        s"slow query ${Bench.shortKey(n)} omitted from the contract line")
    }
  }

  test("rows-only queries (no oracle) are the documented exceptions") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("q38_approx_distinct"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  // --- window-sum cast hardening (the ext48 bug class) -------------------
  //
  // DuckDB returns HUGEINT for SUM(BIGINT) — including windowed sums — so
  // any oracle column derived from a window SUM hashes differently from
  // Spark's LONG unless explicitly CAST. Statically enforce: every
  // `SUM(...) OVER (...)` in an oracle is either wrapped in CAST at the
  // definition site, or its alias only ever appears in later projections
  // inside a type-resetting call (CAST, COUNT).

  /** Index of the close paren matching the open paren at `open`. */
  private def closeOf(s: String, open: Int): Int = {
    var depth = 0; var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Enclosing function-call names (innermost first) at position `pos`. */
  private def enclosingCalls(s: String, pos: Int): Seq[String] = {
    val callRe = "(?i)\\b([a-z_][a-z0-9_]*)\\s*\\(".r
    callRe.findAllMatchIn(s).toSeq.flatMap { m =>
      val open = m.end - 1
      val close = closeOf(s, open)
      if (open < pos && pos < close) Some(m.group(1).toLowerCase) else None
    }.reverse
  }

  /** True when the alias occurrence at `pos` sits in a SELECT projection
    * list (vs GROUP BY / ORDER BY / ON / WHERE / PARTITION BY, where the
    * output type is irrelevant).
    */
  private def inProjection(s: String, pos: Int): Boolean = {
    val kwRe = "(?i)\\b(select|from|where|group|order|on|partition|qualify|having|join|when|then)\\b".r
    kwRe.findAllMatchIn(s.substring(0, pos)).toSeq.lastOption
      .exists(_.group(1).toLowerCase == "select")
  }

  test("windowed SUMs in oracle SQL are cast (DuckDB HUGEINT vs Spark LONG)") {
    val sumOverRe = "(?i)\\bsum\\s*\\(".r
    val violations = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      sumOverRe.findAllMatchIn(sql).toSeq.flatMap { m =>
        val close = closeOf(sql, m.end - 1)
        val isWindow = close > 0 &&
          sql.substring(close + 1).matches("(?is)\\s*over\\b.*")
        if (!isWindow) None
        else if (enclosingCalls(sql, m.start).headOption.contains("cast")) None
        else {
          // un-cast window sum: find its alias and audit every later
          // projection use of that alias
          val overOpen = sql.indexOf('(', sql.toLowerCase.indexOf("over", close))
          val afterWindow = sql.substring(closeOf(sql, overOpen) + 1)
          val aliasRe = "(?is)^\\s*as\\s+([a-z_][a-z0-9_]*)".r
          aliasRe.findFirstMatchIn(afterWindow) match {
            case None =>
              Some(s"$name: anonymous un-cast window SUM at offset ${m.start}")
            case Some(am) =>
              val alias = am.group(1)
              val tail = sql.substring(closeOf(sql, overOpen) + 1 + am.end)
              val aliasUse = s"(?i)\\b$alias\\b".r
              val bad = aliasUse.findAllMatchIn(tail).toSeq.filter { u =>
                inProjection(tail, u.start) &&
                  !enclosingCalls(tail, u.start).exists(c => c == "cast" || c == "count")
              }
              if (bad.isEmpty) None
              else Some(s"$name: window-sum alias `$alias` projected without CAST " +
                s"(${bad.length} site(s)) — DuckDB HUGEINT will hash-mismatch Spark LONG")
          }
        }
      }
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
