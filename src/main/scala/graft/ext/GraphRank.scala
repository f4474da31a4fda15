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

  /** Degree-oriented triangle counting — the canonical bounded-work
    * formulation (Suri & Vassilvitskii's MR-friendly orientation): orient
    * every undirected edge from its lower-(degree, node) endpoint to the
    * higher one, enumerate wedges only at each triangle's LOWEST-rank
    * vertex, and close them against the undirected edge set. Every
    * triangle is counted exactly once, and per-vertex wedge fan-out is
    * bounded by oriented out-degree = O(√m) — the property that makes the
    * wedge join survive power-law graphs at 100 TB, where the naive
    * 3-way edge self-join explodes on hub vertices.
    *
    * Plan shape: two keyed joins build the orientation, the wedge join is
    * keyed on the wedge center, the closing join on the (least, greatest)
    * edge key — all hash exchanges on data-proportional keys; output is
    * four scalar counts.
    */
  val triangleCount: Q = (s, d) => {
    val raw = table(s, d, "events")
      .select((col("user_id") % 120).as("a"), (col("event_id") % 120).as("b"))
      .filter(col("a") =!= col("b"))
    // und and e are each consumed by several of the four count branches
    // below (the final result is a 1-row crossJoin of four aggregates) —
    // without persist every branch re-derives the whole edge pipeline, so
    // the scan+distinct ran ~4× (observed 2.0 s at sf0.1 for a plan whose
    // single execution is sub-second). Both are node/edge-proportional,
    // far smaller than the raw event scan, so caching them is the same
    // bounded-artifact rule the CC/containment queries already apply.
    val und = raw.select(least(col("a"), col("b")).as("u"),
      greatest(col("a"), col("b")).as("v")).distinct().persist()
    val deg = und.select(col("u").as("n")).union(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val e = und
      .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
      .select(when(lowFirst, col("u")).otherwise(col("v")).as("src"),
        when(lowFirst, col("v")).otherwise(col("u")).as("dst"))
      .persist()
    val wedges = e.as("e1").join(e.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.dst").as("b"), col("e2.dst").as("c"))
    val tri = wedges.join(und,
      least(col("b"), col("c")) === col("u") &&
        greatest(col("b"), col("c")) === col("v"))
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges")))
      .crossJoin(wedges.agg(count(lit(1)).as("n_wedges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
  }

  /** Multi-source BFS hop levels (depth-capped at 8) — the reachability /
    * shortest-hop primitive behind link-graph crawl-depth features and
    * contamination-spread audits. Classic frontier expansion expressed
    * relationally: round i joins the lvl==i-1 frontier to the edge list
    * and folds new nodes in with a min-label groupBy, so a node keeps its
    * FIRST (= shortest) level and each node's neighborhood is expanded
    * exactly once. The oracle recomputes the same levels as a DuckDB
    * recursive CTE over depth-capped walks — matching proves the frontier
    * iteration equals the declarative fixpoint.
    *
    * Scale: per round one keyed join (frontier ⋈ edges) + one min-combine
    * shuffle; the frontier filter keeps the join input to newly-reached
    * nodes only. Edges are persisted across rounds (8 rescans otherwise),
    * and each round's level frame is EAGERLY localCheckpoint-ed — the
    * union+groupBy chain doubles the logical plan every round, so without
    * lineage truncation analysis cost is 2^rounds (first measured here as
    * a 48 s fixture run; 1.5 s with the checkpoint — ext38 hit the same
    * wall). Previous rounds' checkpoint blocks are freed as soon as the
    * next round materializes; on a real cluster use checkpoint(reliable
    * dir) against executor churn — same shape, same cost.
    */
  val bfsLevels: Q = (s, d) => {
    val edges = table(s, d, "events")
      .select((col("user_id") % 50).as("src"), (col("event_id") % 50).as("dst"))
      .distinct().persist()
    // loop micro-shuffles sized to the 50-node graph, not the session's
    // fact-table width (ext38's convention)
    val savedSp = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    var dist = s.range(3).select(col("id").as("node"), lit(0L).as("lvl"))
    try {
      for (i <- 1 to 8) {
        val reached = dist.filter(col("lvl") === (i - 1))
          .join(edges, col("node") === col("src"))
          .select(col("dst").as("node"), lit(i.toLong).as("lvl"))
        val next = dist.unionByName(reached)
          .groupBy("node").agg(min("lvl").as("lvl"))
          .localCheckpoint(true)
        // Dataset.unpersist does not free checkpoint storage; drop the
        // superseded round's blocks explicitly (ext38's pattern)
        prevCkpt.foreach(_.unpersist(blocking = false))
        prevCkpt = next.queryExecution.analyzed.collectFirst {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
        }
        dist = next
      }
    } finally s.conf.set("spark.sql.shuffle.partitions", savedSp)
    dist.orderBy("node")
  }

  val queries: Map[String, Q] = Map(
    "ext52_pagerank" -> pageRank,
    "ext74_triangle_count" -> triangleCount,
    "ext83_bfs_levels" -> bfsLevels)

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
    // depth-capped recursive walk; MIN(lvl) per node = BFS level. UNION
    // (distinct) recursion terminates because (node, lvl) pairs are
    // bounded by the lvl < 8 cap — the same cap the Spark loop runs.
    "ext83_bfs_levels" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT user_id % 50 AS src, event_id % 50 AS dst FROM events),
        |walk(node, lvl) AS (
        |  SELECT CAST(x AS BIGINT), CAST(0 AS BIGINT)
        |  FROM (VALUES (0), (1), (2)) t(x)
        |  UNION
        |  SELECT e.dst, w.lvl + 1 FROM walk w
        |  JOIN e ON e.src = w.node WHERE w.lvl < 8)
        |SELECT node, MIN(lvl) AS lvl FROM walk
        |GROUP BY node ORDER BY node""".stripMargin,
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
         |FROM pr3 ORDER BY node""".stripMargin,
    "ext74_triangle_count" ->
      """WITH raw AS (
        |  SELECT user_id % 120 AS a, event_id % 120 AS b FROM events
        |  WHERE user_id % 120 <> event_id % 120),
        |und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw),
        |deg AS (
        |  SELECT n, COUNT(*) AS deg FROM (
        |    SELECT u AS n FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY n),
        |e AS (
        |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
        |              THEN u ELSE v END AS src,
        |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
        |              THEN v ELSE u END AS dst
        |  FROM und JOIN deg du ON du.n = und.u JOIN deg dv ON dv.n = und.v),
        |w AS (
        |  SELECT e1.dst AS b, e2.dst AS c
        |  FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst),
        |tri AS (
        |  SELECT COUNT(*) AS n_triangles
        |  FROM w JOIN und ON least(b, c) = u AND greatest(b, c) = v)
        |SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
        |       (SELECT COUNT(*) FROM und) AS n_edges,
        |       (SELECT COUNT(*) FROM w) AS n_wedges,
        |       n_triangles
        |FROM tri""".stripMargin)
}
