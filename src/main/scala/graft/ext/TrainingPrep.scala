package graft.ext

import graft.ops.{table, Q}
import org.apache.spark.sql.functions._

/** Training-set assembly operators — the last mile of an LLM/multimodal
  * data pipeline, after curation (TextAnalysis) and dedup (Dedup): pair
  * construction for contrastive training, sequence packing to a token
  * budget, per-class capping, and deterministic dataset splits.
  *
  * Everything is hash- or arithmetic-deterministic (no RNG): the same row
  * always lands in the same pair/bin/split regardless of partitioning,
  * cluster size or rerun — the property that makes 100 TB pipelines
  * resumable and their experiments reproducible. All built-ins, no UDFs.
  */
object TrainingPrep {

  /** Contrastive caption-pair construction (the CLIP-style prep step):
    * each caption (documents row) joins its positive image embedding on
    * the shared id, and a deterministic pseudo-random NEGATIVE is drawn
    * with a multiplicative hash over the corpus size — collision with the
    * anchor bumps to the next id, so anchor != negative always. The
    * `hard` flag marks negatives from the same coarse class (same IVF
    * label) — the pairs a contrastive loss learns most from.
    *
    * Scale: corpus size enters the plan as a 1-row crossJoin (broadcast
    * NestedLoop over a scalar — free), then two shuffle equi-joins on id;
    * nothing driver-side, nothing all-pairs. */
  val captionPairs: Q = (s, d) => {
    val docs = table(s, d, "documents")
      .select(col("doc_id"), col("lang"))
    val embs = table(s, d, "embeddings")
      .select(col("vec_id"), col("label"))
    val cnt = embs.agg(count(lit(1)).as("cnt"))
    val withNeg = docs
      .join(embs, col("doc_id") === col("vec_id"))
      .withColumnRenamed("label", "pos_label")
      .drop("vec_id")
      .crossJoin(cnt)
      .withColumn("neg_raw", (col("doc_id") * 2654435761L + 17L) % col("cnt"))
      .withColumn("neg_id",
        when(col("neg_raw") === col("doc_id"),
          (col("neg_raw") + 1L) % col("cnt")).otherwise(col("neg_raw")))
    withNeg
      .join(embs.withColumnRenamed("vec_id", "nv")
        .withColumnRenamed("label", "neg_label"), col("neg_id") === col("nv"))
      .select(col("doc_id"), col("lang"), col("pos_label"),
        col("neg_id"), col("neg_label"),
        (col("pos_label") === col("neg_label")).cast("int").as("hard"))
      .orderBy("doc_id")
  }

  /** Sequence packing: stream documents (per source shard, in id order)
    * into fixed token-budget bins — the step that turns ragged documents
    * into dense training sequences. The bin of a document is the number
    * of full budgets its PRECEDING cumulative token count fills
    * (`(cum - own) DIV budget`), a pure running-sum window — greedy
    * contiguous packing, deterministic and O(n log n).
    *
    * Scale: the window partitions by source shard, so no global sort;
    * shard count bounds the parallelism, which is why real pipelines key
    * packing by (shard, worker) — the per-shard stream here is that unit. */
  val sequencePacking: Q = (s, d) => {
    val budget = 512L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    table(s, d, "documents")
      .select(col("doc_id"), col("source"),
        size(expr("filter(split(text, ' '), t -> t <> '')")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - n_tokens) DIV $budget"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
      .orderBy("source", "bin")
  }

  /** Per-class cap (balanced subsampling): keep at most K=40 documents
    * per language, chosen by md5-hash order — deterministic, unbiased by
    * ingestion order, and stable under reruns. The window partitions by
    * class, so state is K rows per class; Spark plans a WindowGroupLimit
    * (partial top-K on the map side) rather than a full per-class sort
    * at scale. */
  val groupCap: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    table(s, d, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 40)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy("lang", "rk")
  }

  /** Deterministic train/val/test split on the md5 of the document id:
    * first hex nibble < 'd' → train (13/16), 'd'/'e' → val (2/16), 'f' →
    * test (1/16). A pure map-side label — the same document lands in the
    * same split on any engine, any partitioning, any day; splits stay
    * disjoint under incremental ingestion (the property RNG splits lose).
    * Output is the per-split manifest summary. */
  val hashSplit: Q = (s, d) =>
    table(s, d, "documents")
      .withColumn("nib", substring(md5(col("doc_id").cast("string")), 1, 1))
      .withColumn("split",
        when(col("nib") < "d", "train")
          .when(col("nib") < "f", "val")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("split")

  /** The assembled training-data pipeline — every stage a verified
    * primitive, composed into ONE lazy plan: quality gate (ext09's
    * thresholds) → exact near-dup removal (ext01's md5 keep-min) → hash
    * split (ext50's md5 nibble) → per-(split, source) sequence-packing
    * stats (ext48's budget bins). Catalyst sees the whole chain, so
    * column pruning and predicate pushdown cross stage boundaries — the
    * gate's filter reaches the scan, and only the surviving rows pay the
    * dedup shuffle. Two keyed exchanges total (dedup hash, packing
    * window); everything else is map-side. This is the end-to-end shape a
    * 100 TB corpus actually runs nightly. */
  val fullPipeline: Q = (s, d) => {
    val budget = 512L
    val scored = table(s, d, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        length(col("text")).as("n_chars"),
        size(expr("filter(split(text, ' '), t -> t <> '')")).cast("long").as("n_tokens"),
        size(expr("filter(split(lower(text), ' '), t -> t in ('the', 'a', 'of', 'and', 'is'))"))
          .as("en_hits"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("h"))
    val kept = scored
      .filter(col("n_tokens") >= 10 && col("n_chars") >= 50 && col("en_hits") >= 1)
      .withColumn("keeper", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("doc_id") === col("keeper"))
    val split = kept.withColumn("nib", substring(md5(col("doc_id").cast("string")), 1, 1))
      .withColumn("split",
        when(col("nib") < "d", "train").when(col("nib") < "f", "val")
          .otherwise("test"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("split", "source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    split
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - n_tokens) DIV $budget"))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("bin")).as("n_bins"))
      .orderBy("split", "source")
  }

  /** Class-balanced oversampling to the majority-class count — the
    * deterministic up-sampler a multilingual/multiclass training mix
    * uses instead of RNG resampling: every class is brought to exactly
    * `t = max(n)` rows by floor(t/n) full copies of each row plus the
    * `t - floor(t/n)*n` lowest-id rows once more. Same row set on every
    * rerun at any parallelism.
    *
    * Scale: per-class counts broadcast as scalars; full copies are a
    * row-local `sequence` explode (no shuffle); the remainder is a
    * per-class top-k by id — a WindowGroupLimit pushdown, not a global
    * sort. Output is the per-class audit (counts + id checksum), bytes-
    * sized at any corpus scale. */
  val balancedOversample: Q = (s, d) => {
    val docs = table(s, d, "documents").select(col("lang"), col("doc_id"))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val target = counts.agg(max("n").as("t"))
    val rep = docs.join(broadcast(counts), "lang").crossJoin(broadcast(target))
      .withColumn("reps", floor(col("t") / col("n")))
    val fullCopies = rep
      .withColumn("i", explode(expr("sequence(1, reps)")))
      .select("lang", "doc_id")
    val extra = rep
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang").orderBy("doc_id")))
      .filter(col("rk") <= col("t") - col("reps") * col("n"))
      .select("lang", "doc_id")
    fullCopies.unionByName(extra)
      .join(broadcast(counts), "lang").crossJoin(broadcast(target))
      .groupBy("lang")
      .agg(min("n").as("n_orig"), min("t").as("n_target"),
        count(lit(1)).as("n_sampled"), sum("doc_id").as("id_sum"))
      .orderBy("lang")
  }

  /** SFT chat-sample assembly with loss-mask spans: each user's first 6
    * events (by time) become alternating user/assistant turns; the turn
    * texts are concatenated into a chat-template string and each turn's
    * CHARACTER SPAN [start, end) in that string is emitted with its
    * loss flag (assistant turns train, user turns are masked out) — the
    * exact artifact an SFT data loader consumes to build label masks.
    *
    * Determinism: turn order is a (ts, event_id) total order; texts are
    * integer-formatted ASCII, so length() agrees across engines; span
    * arithmetic is a cumulative window sum of exact integers.
    *
    * Scale: one shuffle — both windows (turn numbering, cumulative
    * offsets) share the user_id partitioning, so Spark plans a single
    * exchange + sort and pipelines the second window over the first.
    * Per-user state is the 6-turn cap, never the corpus.
    */
  val sftAssembly: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id")
    val turns = table(s, d, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("turn_idx", row_number().over(
        byUser.orderBy(col("ts"), col("event_id"))))
      .filter(col("turn_idx") <= 6)
      .withColumn("role",
        when(col("turn_idx") % 2 === 1, lit("user")).otherwise(lit("assistant")))
      .withColumn("text", concat(lit("<|"), col("role"), lit("|>"),
        col("event_type"), lit("#"), col("event_id").cast("string")))
      .withColumn("len", length(col("text")).cast("long"))
    turns
      .withColumn("end", sum("len").over(byUser.orderBy("turn_idx")))
      .select(col("user_id"), col("turn_idx").cast("int").as("turn_idx"),
        col("role"), (col("end") - col("len")).as("start"), col("end"),
        (col("role") === "assistant").cast("int").as("loss"))
      .orderBy("user_id", "turn_idx")
  }

  val queries: Map[String, Q] = Map(
    "ext87_balanced_oversample" -> balancedOversample,
    "ext56_full_training_pipeline" -> fullPipeline,
    "ext47_caption_pairs" -> captionPairs,
    "ext48_sequence_packing" -> sequencePacking,
    "ext49_group_cap" -> groupCap,
    "ext50_hash_split" -> hashSplit,
    "ext116_sft_assembly" -> sftAssembly)

  val oracleSql: Map[String, String] = Map(
    // identical turn order, texts, and cumulative-length spans
    "ext116_sft_assembly" ->
      """WITH turns AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS turn_idx
        |  FROM events),
        |capped AS (
        |  SELECT *, CASE WHEN turn_idx % 2 = 1 THEN 'user'
        |                 ELSE 'assistant' END AS role
        |  FROM turns WHERE turn_idx <= 6),
        |texts AS (
        |  SELECT user_id, turn_idx, role,
        |    '<|' || role || '|>' || event_type || '#' ||
        |      CAST(event_id AS VARCHAR) AS text
        |  FROM capped),
        |spans AS (
        |  SELECT user_id, turn_idx, role,
        |    CAST(length(text) AS BIGINT) AS len,
        |    CAST(SUM(CAST(length(text) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY turn_idx) AS BIGINT) AS "end"
        |  FROM texts)
        |SELECT user_id, CAST(turn_idx AS INT) AS turn_idx, role,
        |  "end" - len AS start, "end",
        |  CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS loss
        |FROM spans
        |ORDER BY user_id, turn_idx""".stripMargin,
    // floor(t/n) is a true-division double floor in BOTH engines; the
    // unnest(range(reps)) duplicates each row reps times, the window
    // picks the remainder
    "ext87_balanced_oversample" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |t AS (SELECT MAX(n) AS t FROM c),
        |rep AS (
        |  SELECT d.lang, d.doc_id, c.n, t.t,
        |    CAST(floor(CAST(t.t AS DOUBLE) / c.n) AS BIGINT) AS reps
        |  FROM documents d JOIN c USING (lang) CROSS JOIN t),
        |fullc AS (
        |  SELECT lang, doc_id FROM (
        |    SELECT lang, doc_id, unnest(range(reps)) AS i FROM rep)),
        |extra AS (
        |  SELECT lang, doc_id FROM (
        |    SELECT lang, doc_id, t - reps * n AS r,
        |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
        |    FROM rep)
        |  WHERE rk <= r),
        |sampled AS (
        |  SELECT lang, doc_id FROM fullc
        |  UNION ALL SELECT lang, doc_id FROM extra)
        |SELECT s.lang, MIN(c.n) AS n_orig, MIN(t.t) AS n_target,
        |  COUNT(*) AS n_sampled, CAST(SUM(s.doc_id) AS BIGINT) AS id_sum
        |FROM sampled s JOIN c ON c.lang = s.lang CROSS JOIN t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ext56_full_training_pipeline" ->
      """WITH scored AS (
        |  SELECT doc_id, source, text,
        |    length(text) AS n_chars,
        |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
        |    len(list_filter(string_split(lower(text), ' '),
        |        t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS en_hits,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
        |  FROM documents),
        |kept AS (
        |  SELECT * FROM (
        |    SELECT *, MIN(doc_id) OVER (PARTITION BY h) AS keeper
        |    FROM scored
        |    WHERE n_tokens >= 10 AND n_chars >= 50 AND en_hits >= 1)
        |  WHERE doc_id = keeper),
        |labeled AS (
        |  SELECT *,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd' THEN 'train'
        |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'f' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM kept),
        |binned AS (
        |  SELECT split, source, n_tokens,
        |    CAST((SUM(n_tokens) OVER (PARTITION BY split, source ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 512
        |      AS BIGINT) AS bin
        |  FROM labeled)
        |SELECT split, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  COUNT(DISTINCT bin) AS n_bins
        |FROM binned GROUP BY 1, 2 ORDER BY split, source""".stripMargin,
    "ext47_caption_pairs" ->
      """WITH cnt AS (SELECT COUNT(*) AS cnt FROM embeddings),
        |pos AS (
        |  SELECT d.doc_id, d.lang, e.label AS pos_label, c.cnt
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |  CROSS JOIN cnt c),
        |neg AS (
        |  SELECT doc_id, lang, pos_label,
        |    CASE WHEN (doc_id * 2654435761 + 17) % cnt = doc_id
        |         THEN ((doc_id * 2654435761 + 17) % cnt + 1) % cnt
        |         ELSE (doc_id * 2654435761 + 17) % cnt END AS neg_id
        |  FROM pos)
        |SELECT n.doc_id, n.lang, n.pos_label, n.neg_id, e.label AS neg_label,
        |  CAST(n.pos_label = e.label AS INT) AS hard
        |FROM neg n JOIN embeddings e ON n.neg_id = e.vec_id
        |ORDER BY n.doc_id""".stripMargin,
    "ext48_sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT source, CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,
    "ext49_group_cap" ->
      """SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
        |FROM documents
        |QUALIFY rk <= 40
        |ORDER BY lang, rk""".stripMargin,
    "ext50_hash_split" ->
      """WITH t AS (
        |  SELECT n_chars,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd' THEN 'train'
        |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'f' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM t GROUP BY 1 ORDER BY split""".stripMargin)
}
