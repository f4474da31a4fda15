package graft.ext

import graft.ops.{table, Dec, Q}
import org.apache.spark.sql.functions._

/** Iterative graph ranking over an edge-list DataFrame — PageRank, the
  * classic quality signal a crawl-scale training pipeline computes over
  * its domain/link graph to weight sources.
  *
  * The graph is an edge list derived deterministically from the events
  * fixture (user → event buckets, distinct). Three synchronous PageRank
  * iterations run as a FOLD over DataFrame plans: each step is
  * edges ⋈ ranks ⋈ outdegree → per-target mass sum → damped update. No
  * driver-side loops over data — the loop composes plans; data never
  * leaves the cluster.
  *
  * Cross-engine float determinism: per-edge contributions are cast to
  * DECIMAL(18,6) before the mass SUM (exact addition, order-free), then
  * back to double for the damped update — the same staging discipline as
  * every money aggregate here (memory: decimal staging). The final rank
  * is rounded to the same scale for output.
  *
  * Scale: each iteration is one shuffle of the edge-contribution table on
  * dst plus a node-table join — the standard message-passing (Pregel)
  * round expressed relationally. At 100 TB you persist `pr` between
  * iterations and checkpoint every few rounds to cut the lineage; the
  * plan per round is unchanged. (ext38's connected components is the
  * converging cousin; this one runs a fixed 3 rounds.)
  */
object GraphRank {

  val pageRank: Q = (s, d) => {
    val edges = table(s, d, "events")
      .select((col("user_id") % 50).as("src"), (col("event_id") % 50).as("dst"))
      .distinct()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val cnt = nodes.agg(count(lit(1)).as("n_nodes"))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var pr = nodes.crossJoin(cnt)
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("pr"))
    for (_ <- 1 to 3) {
      val contribs = edges
        .join(pr.withColumnRenamed("node", "csrc"), col("src") === col("csrc"))
        .join(deg, Seq("src"))
        .select(col("dst"), (col("pr") / col("outdeg")).cast(Dec).as("c"))
      val mass = contribs.groupBy("dst").agg(sum(col("c")).cast("double").as("m"))
      pr = nodes
        .join(mass, col("node") === col("dst"), "left")
        .crossJoin(cnt)
        .select(col("node"),
          (lit(0.15) / col("n_nodes") +
            lit(0.85) * coalesce(col("m"), lit(0.0))).as("pr"))
    }
    pr.select(col("node"), col("pr").cast(Dec).cast("double").as("pr"))
      .orderBy("node")
  }

  val queries: Map[String, Q] = Map(
    "ext52_pagerank" -> pageRank)

  /** The oracle unrolls the same three damped rounds as CTEs with the
    * identical decimal staging — the two engines must agree bit-for-bit
    * on every rank. */
  private def round(prev: String, out: String): String =
    s"""$out AS (
       |  SELECT n.node,
       |    CAST(0.15 AS DOUBLE) / (SELECT COUNT(*) FROM nodes) +
       |    0.85 * COALESCE(CAST(SUM(CAST(p.pr / d.outdeg AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS pr
       |  FROM nodes n
       |  LEFT JOIN edges e ON e.dst = n.node
       |  LEFT JOIN $prev p ON p.node = e.src
       |  LEFT JOIN deg d ON d.src = e.src
       |  GROUP BY n.node)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "ext52_pagerank" ->
      s"""WITH edges AS (
         |  SELECT DISTINCT user_id % 50 AS src, event_id % 50 AS dst FROM events),
         |nodes AS (
         |  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
         |pr0 AS (
         |  SELECT node, CAST(1.0 AS DOUBLE) / (SELECT COUNT(*) FROM nodes) AS pr
         |  FROM nodes),
         |${round("pr0", "pr1")},
         |${round("pr1", "pr2")},
         |${round("pr2", "pr3")}
         |SELECT node, CAST(CAST(pr AS DECIMAL(18,6)) AS DOUBLE) AS pr
         |FROM pr3 ORDER BY node""".stripMargin)
}
