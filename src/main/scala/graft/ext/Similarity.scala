package graft.ext

import graft.ops.{table, Q}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` fixture.
  *
  * Two tiers, as a real 100 TB pipeline would ship them:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     Query set × full corpus; at scale this is only viable for small
  *     query batches (broadcast the queries, scan the corpus once,
  *     per-partition top-k then global top-k — no full sort).
  *   - [[ivfTopK]]: IVF-style probe-1 search — the corpus is bucketed by a
  *     coarse quantizer (here the `label` column stands in for
  *     nearest-centroid assignment) and only the query's own cell is
  *     scanned, cutting scan cost by the number of cells. Recall < 1 by
  *     construction; the candidate set restriction IS the semantics, so
  *     the oracle encodes the same restriction.
  *
  * The cosine is an explicit sequential fold over doubles (zip_with +
  * aggregate), so Spark and DuckDB sum in the same order — bit-identical
  * results, which also makes the float-descending ORDER BY stable across
  * engines.
  */
object Similarity {

  private def vecs(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("norm", expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"))

  private val dot =
    "aggregate(zip_with(q.v, c.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"

  /** Exact top-5 cosine neighbors for every 50th vector. */
  val bruteForceTopK: Q = (s, d) => {
    val all = vecs(s, d)
    val queries = all.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v"), col("norm"))
    val scored = queries.as("q").join(all.as("c"), col("c.vec_id") =!= col("q.q_id"))
      .select(col("q.q_id").as("q_id"), col("c.vec_id").as("n_id"),
        (expr(dot) / (col("q.norm") * col("c.norm"))).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("int").as("rank"), col("n_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  /** IVF probe-1: same queries, candidates restricted to the query's
    * coarse cell (label). */
  val ivfTopK: Q = (s, d) => {
    val all = vecs(s, d)
    val queries = all.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("label"), col("v"), col("norm"))
    val scored = queries.as("q").join(all.as("c"),
        col("q.label") === col("c.label") && col("c.vec_id") =!= col("q.q_id"))
      .select(col("q.q_id").as("q_id"), col("q.label").as("cell"),
        col("c.vec_id").as("n_id"),
        (expr(dot) / (col("q.norm") * col("c.norm"))).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("cell"), col("rank").cast("int").as("rank"),
        col("n_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  /** Same search as [[bruteForceTopK]] scored by the native codegen'd
    * Catalyst expression (graft.functions.CosineSimilarity) — one fused
    * loop inside whole-stage codegen instead of zip_with+aggregate lambda
    * interpretation. Identical operation order → bit-identical results,
    * so it shares the brute-force oracle.
    */
  val bruteForceNativeExpr: Q = (s, d) => {
    graft.functions.CosineSimilarity.register(s)
    val all = vecs(s, d).select(col("vec_id"), col("v"))
    val queries = all.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v"))
    val scored = queries.as("q").join(all.as("c"), col("c.vec_id") =!= col("q.q_id"))
      .select(col("q.q_id").as("q_id"), col("c.vec_id").as("n_id"),
        expr("graft_cosine(q.v, c.v)").as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("int").as("rank"), col("n_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  /** Random-hyperplane LSH (SimHash-for-vectors): 8 signed projections →
    * 8-bit bucket; candidates share the query's bucket (probe-1). The
    * hyperplanes are pseudo-random but engine-portable: component i of
    * plane k is ((i*2654435761 + k*40503) % 1000)/1000 - 0.5 — pure
    * integer arithmetic + one exact-IEEE division, identical in Spark and
    * DuckDB, so the buckets (and therefore the recall<1 candidate sets,
    * which ARE the semantics) match the oracle. At 100 TB the bucket id
    * is the shuffle key: each query probes one bucket instead of the
    * corpus.
    */
  val lshTopK: Q = (s, d) => {
    val planes = (0 until 8).map { k =>
      s"""IF(aggregate(sequence(0, 63), 0D, (acc, i) ->
         |  acc + v[i] * (CAST((i * 2654435761 + $k * 40503) % 1000 AS DOUBLE) / 1000 - 0.5)) > 0,
         |  CAST(shiftleft(1, $k) AS INT), 0)""".stripMargin
    }.mkString(" + ")
    val bucketed = vecs(s, d).withColumn("bucket", expr(s"($planes)"))
    val queries = bucketed.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("bucket"), col("v"), col("norm"))
    val scored = queries.as("q").join(bucketed.as("c"),
        col("q.bucket") === col("c.bucket") && col("c.vec_id") =!= col("q.q_id"))
      .select(col("q.q_id").as("q_id"), col("q.bucket").as("bucket"),
        col("c.vec_id").as("n_id"),
        (expr(dot) / (col("q.norm") * col("c.norm"))).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("bucket"), col("rank").cast("int").as("rank"),
        col("n_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  val queries: Map[String, Q] = Map(
    "ext06_sim_topk_bruteforce" -> bruteForceTopK,
    "ext07_sim_topk_ivf" -> ivfTopK,
    "ext16_sim_native_expr" -> bruteForceNativeExpr,
    "ext17_sim_topk_lsh" -> lshTopK)

  private val vSql =
    """v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |        sqrt(list_sum([x * x for x in embedding::DOUBLE[]])) AS norm
      |      FROM embeddings)""".stripMargin

  private val bruteForceOracle =
      s"""WITH $vSql,
         |scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    list_sum([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)])
         |      / (q.norm * c.norm) AS cosine
         |  FROM v q JOIN v c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id % 50 = 0)
         |SELECT q_id,
         |  CAST(row_number() OVER w AS INT) AS rank, n_id, cosine
         |FROM scored
         |WINDOW w AS (PARTITION BY q_id ORDER BY cosine DESC, n_id)
         |QUALIFY row_number() OVER w <= 5
         |ORDER BY q_id, rank""".stripMargin

  // DuckDB lists are 1-indexed (Spark arrays 0-indexed): plane component
  // for list position i is computed from (i-1)
  private val bucketSqlExpr: String = (0 until 8).map { k =>
    s"""(CASE WHEN list_sum([v[i] * (CAST(((i-1) * 2654435761 + $k * 40503) % 1000 AS DOUBLE) / 1000 - 0.5)
       |  for i in range(1, 65)]) > 0 THEN ${1 << k} ELSE 0 END)""".stripMargin
  }.mkString(" + ")

  val oracleSql: Map[String, String] = Map(
    "ext06_sim_topk_bruteforce" -> bruteForceOracle,
    "ext16_sim_native_expr" -> bruteForceOracle,
    "ext17_sim_topk_lsh" ->
      s"""WITH $vSql,
         |b AS (SELECT vec_id, v, norm, CAST($bucketSqlExpr AS INT) AS bucket FROM v),
         |scored AS (
         |  SELECT q.vec_id AS q_id, q.bucket AS bucket, c.vec_id AS n_id,
         |    list_sum([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)])
         |      / (q.norm * c.norm) AS cosine
         |  FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id % 50 = 0)
         |SELECT q_id, bucket,
         |  CAST(row_number() OVER w AS INT) AS rank, n_id, cosine
         |FROM scored
         |WINDOW w AS (PARTITION BY q_id ORDER BY cosine DESC, n_id)
         |QUALIFY row_number() OVER w <= 3
         |ORDER BY q_id, rank""".stripMargin,
    "ext07_sim_topk_ivf" ->
      s"""WITH $vSql,
         |scored AS (
         |  SELECT q.vec_id AS q_id, q.label AS cell, c.vec_id AS n_id,
         |    list_sum([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)])
         |      / (q.norm * c.norm) AS cosine
         |  FROM v q JOIN v c ON q.label = c.label AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id % 50 = 0)
         |SELECT q_id, cell,
         |  CAST(row_number() OVER w AS INT) AS rank, n_id, cosine
         |FROM scored
         |WINDOW w AS (PARTITION BY q_id ORDER BY cosine DESC, n_id)
         |QUALIFY row_number() OVER w <= 3
         |ORDER BY q_id, rank""".stripMargin)
}
