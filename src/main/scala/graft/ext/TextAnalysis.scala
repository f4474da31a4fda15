package graft.ext

import graft.ops.{table, Q}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over `documents`:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Everything is built from codegen'd string/regexp/array built-ins — one
  * narrow projection per document, no shuffle at all except the final
  * oracle sort. At 100 TB these are embarrassingly parallel map stages;
  * the regexp count idiom (length minus length-of-removed) avoids any UDF.
  */
object TextAnalysis {

  private val langWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "de", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "est"))

  private def inSet(tok: org.apache.spark.sql.Column, words: Seq[String]) =
    tok.isin(words: _*)

  /** Stopword-profile language ID: count tokens per language stopword set,
    * argmax with fixed tie order en > es > de > fr. */
  val langId: Q = (s, d) => {
    val toks = table(s, d, "documents")
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), " ")).as("tok"))
    val scored = toks.groupBy("doc_id").agg(
      sum(when(inSet(col("tok"), langWords("en")), 1).otherwise(0)).as("en_score"),
      sum(when(inSet(col("tok"), langWords("es")), 1).otherwise(0)).as("es_score"),
      sum(when(inSet(col("tok"), langWords("de")), 1).otherwise(0)).as("de_score"),
      sum(when(inSet(col("tok"), langWords("fr")), 1).otherwise(0)).as("fr_score"))
    val g = greatest(col("en_score"), col("es_score"), col("de_score"), col("fr_score"))
    scored
      .withColumn("detected_lang",
        when(col("en_score") === g, "en").when(col("es_score") === g, "es")
          .when(col("de_score") === g, "de").otherwise("fr"))
      .select("doc_id", "en_score", "es_score", "de_score", "fr_score", "detected_lang")
      .orderBy("doc_id")
  }

  /** Quality scoring: length, token stats, punctuation + stopword ratios,
    * and a keep/drop flag — the standard heuristic pre-filter. */
  val quality: Q = (s, d) =>
    table(s, d, "documents")
      .select(col("doc_id"), col("text"),
        length(col("text")).as("n_chars"),
        size(expr("filter(split(text, ' '), t -> t <> '')")).as("n_tokens"))
      .withColumn("punct_chars",
        length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
      .withColumn("stop_tokens",
        size(expr("filter(split(lower(text), ' '), t -> t in ('the', 'a', 'of', 'and', 'is'))")))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        (col("punct_chars").cast("double") / col("n_chars")).as("punct_ratio"),
        (col("stop_tokens").cast("double") / col("n_tokens")).as("stopword_ratio"),
        when(col("n_tokens") >= 10 && col("n_chars") >= 50, "keep")
          .otherwise("drop").as("quality_flag"))
      .orderBy("doc_id")

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single symbols). */
  val tokenCount: Q = (s, d) =>
    table(s, d, "documents")
      .select(col("doc_id"),
        size(expr("filter(split(text, ' '), t -> t <> '')")).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("bpe_ish_tokens"),
        length(col("text")).as("n_chars"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("bpe_ish_tokens"))
      .orderBy("doc_id")

  /** Document fingerprinting: whole-text digest, min-shingle digest (the
    * 1-hash minhash, robust to suffix edits), and a polynomial rolling
    * hash (base-31 mod 1e9+7 — the classic Rabin-Karp-style content
    * signature). The rolling hash is the native codegen'd
    * graft.functions.RollingHash — one O(len) pass per document; the HOF
    * fold it replaces re-seeks the string per character (O(len²)) and is
    * kept bit-identical in NativeExprSpec. */
  val fingerprint: Q = (s, d) => {
    graft.functions.RollingHash.register(s)
    table(s, d, "documents")
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .select(col("doc_id"),
        md5(col("t")).as("full_md5"),
        expr("array_min(transform(sequence(1, greatest(length(t) - 7, 1)), i -> md5(substring(t, i, 8))))")
          .as("min_shingle_md5"),
        expr("graft_rolling_hash(t)").as("rolling_hash"))
      .orderBy("doc_id")
  }

  /** End-to-end curation pipeline — the composite shape a training-data
    * run executes: quality gate → exact dedup (keep min doc_id per md5
    * group) → language gate → per-source corpus stats. One narrow scan,
    * one dedup shuffle, one stats shuffle; at 100 TB each stage stays a
    * map except the two keyed exchanges. */
  val curationPipeline: Q = (s, d) => {
    val scored = table(s, d, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        length(col("text")).as("n_chars"),
        size(expr("filter(split(text, ' '), t -> t <> '')")).as("n_tokens"),
        size(expr("filter(split(lower(text), ' '), t -> t in ('the', 'a', 'of', 'and', 'is'))"))
          .as("en_hits"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("h"))
    val kept = scored
      .filter(col("n_tokens") >= 10 && col("n_chars") >= 50 && col("en_hits") >= 1)
      .withColumn("keeper", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("doc_id") === col("keeper"))
    kept.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("source")
  }

  /** Deterministic stratified sampling for language rebalancing: keep-rate
    * per stratum is a threshold on md5(doc_id)'s hex prefix (en 75 %,
    * de/fr 50 %, es 25 %, others 12.5 %). Unlike RNG-based TABLESAMPLE
    * this is a pure map filter — reproducible across reruns, engines and
    * partitionings, joinable (the same doc always samples the same way),
    * and shuffle-free at any scale, which is why hash sampling is the
    * training-pipeline standard. */
  val sampleStratified: Q = (s, d) =>
    table(s, d, "documents")
      .withColumn("h", md5(col("doc_id").cast("string")))
      .filter(col("h") < when(col("lang") === "en", "c")
        .when(col("lang").isin("de", "fr"), "8")
        .when(col("lang") === "es", "4")
        .otherwise("2"))
      .select(col("doc_id"), col("lang"), col("h"))
      .orderBy("doc_id")

  /** Bottom-k (KMV) sketch per corpus shard via the custom typed
    * Aggregator [[graft.functions.BottomKAgg]] — O(k) state per group
    * through partial/final aggregation instead of a per-group sort (see
    * the Aggregator's doc for why this beats the window formulation at
    * scale). The oracle restates the semantics with the window (k smallest
    * distinct token hashes, sorted, '|'-joined) — identical output, very
    * different physical cost. */
  val bottomKSketch: Q = (s, d) => {
    val bk = udaf(new graft.functions.BottomKAgg(8),
      org.apache.spark.sql.Encoders.STRING)
    table(s, d, "documents")
      .select((col("doc_id") % 8).as("shard"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("shard"), md5(col("tok")).as("h"))
      .distinct()
      .groupBy("shard").agg(bk(col("h")).as("bottomk"))
      .orderBy("shard")
  }

  /** Exact heavy hitters by two-pass Misra-Gries — "which keys dominate
    * the stream" without a full-vocabulary groupBy. Pass 1 runs
    * [[graft.functions.MisraGriesAgg]] (k=64 counters) over the items:
    * map-side partial sketches of ≤ k entries merge to ONE candidate row
    * (every item with freq > N/(k+1) is guaranteed present — see the
    * Aggregator's doc). Pass 2 broadcast-semi-joins the ≤ k candidates
    * back onto the stream and exact-counts ONLY them, so the final
    * filter cnt·32 > N is exact — sketch nondeterminism below the
    * guarantee line never reaches the output. Threshold 1/32 > 1/65
    * keeps the guarantee with a 2× margin.
    *
    * The fixtures are uniform by construction, so the stream is made
    * skewed deterministically (same move as ext43's seeded PII): even
    * event_ids contribute their bare event_type (5 hot keys sharing
    * half the stream at ~10% each), odd ones contribute
    * event_type#user_id (~750 cold keys sharing the rest at ~0.07%
    * each). Vocabulary ≈ 755 ≫ k = 64, so the sketch's eviction path
    * genuinely churns — this is the regime MG exists for.
    *
    * Scale: two scans, zero wide exchanges. Pass 1's aggregation ships
    * ≤ k counters per task; pass 2's groupBy carries ≤ k distinct keys
    * after the broadcast filter. A direct groupBy(item) instead would
    * shuffle one row per distinct key — vocabulary-sized, unbounded. */
  /** ext139 — COUNT-MIN SKETCH (the mergeable frequency sketch the
    * family still lacked next to HLL/KMV distinct counts, Misra-Gries
    * heavy hitters, and Bloom membership): a d=4 × w=256 counter matrix
    * over the token stream, built as ONE relational aggregate —
    * explode tokens × 4 hash rows, group by (row, cell), count. Point
    * estimates are the min over the key's 4 cells; CMS guarantees
    * est ≥ true (spec-pinned per key). Everything is codegen'd
    * expressions; the matrix is d×w counters regardless of corpus size,
    * and counter matrices ADD, so partial sketches from any partitioning
    * (or day-by-day increments) merge exactly — the property that makes
    * CMS the 100 TB frequency primitive. Hashes use the engine-portable
    * 60-bit md5 prefix (q109's discipline), so DuckDB rebuilds the
    * identical matrix and the oracle hash-matches estimates exactly. */
  val countMinSketch: Q = (s, d) => {
    val cellOf = (src: String) =>
      s"pmod(CAST(conv(substring(md5(concat($src, '#', j)), 1, 15), 16, 10) AS BIGINT), 256)"
    val toks = table(s, d, "documents")
      .select(explode(expr("filter(split(lower(text), ' '), t -> t <> '')"))
        .as("tok"))
    val matrix = toks
      .select(col("tok"), explode(expr("sequence(0, 3)")).as("j"))
      .select(col("j"), expr(cellOf("tok")).as("cell"))
      .groupBy("j", "cell").agg(count(lit(1)).as("c"))
    val keys = s.range(1).select(explode(
      lit(Array("spark", "merge", "vector", "data", "the"))).as("kname"))
    val kCells = keys
      .select(col("kname"), explode(expr("sequence(0, 3)")).as("j"))
      .select(col("kname"), col("j"), expr(cellOf("kname")).as("cell"))
    val est = kCells.join(matrix, Seq("j", "cell"), "left")
      .groupBy("kname")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
    val tru = keys.join(
        toks.groupBy(col("tok").as("kname")).agg(count(lit(1)).as("tc")),
        Seq("kname"), "left")
      .select(col("kname"), coalesce(col("tc"), lit(0L)).as("true_cnt"))
    est.join(tru, Seq("kname"))
      .select(col("kname"), col("est"), col("true_cnt"))
      .orderBy("kname")
  }

  val heavyHitters: Q = (s, d) => {
    val mg = udaf(new graft.functions.MisraGriesAgg(64),
      org.apache.spark.sql.Encoders.STRING)
    val items = table(s, d, "events").select(
      when(col("event_id") % 2 === 0, col("event_type"))
        .otherwise(concat(col("event_type"), lit("#"), col("user_id")))
        .as("item"))
    val sketch = items.agg(mg(col("item")).as("cands"),
      count(lit(1)).as("n_items"))
    val cands = sketch.select(explode(col("cands")).as("item"), col("n_items"))
    items.join(broadcast(cands), Seq("item"))
      .groupBy("item", "n_items").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 32 > col("n_items"))
      .select(col("item"), col("cnt"),
        (col("cnt").cast("double") / col("n_items")).as("freq"))
      .orderBy("item")
  }

  /** PII scrubbing — the redaction pass every training corpus runs:
    * email-shaped and long-digit-run tokens are replaced with fixed
    * sentinels. Pure map stage (no shuffle; the aggregate below is only
    * the oracle-visible summary). The regexes stay in the dialect subset
    * Java and RE2 share (character classes, +, alternation — no
    * backrefs/lookarounds), so both engines redact identically. The
    * fixture text is clean, so deterministic synthetic PII is appended
    * to every 5th document first — the redaction itself is what's under
    * test. */
  val piiRedaction: Q = (s, d) => {
    val emailRe = "[a-z0-9._-]+@[a-z0-9.-]+"
    val digitsRe = "[0-9][0-9][0-9][0-9]+"
    val seeded = table(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or call 555123"), col("doc_id")))
          .otherwise(col("text")).as("text"))
    seeded
      .select(col("doc_id"), col("lang"),
        regexp_replace(regexp_replace(lower(col("text")), emailRe, "<EMAIL>"),
          digitsRe, "<NUM>").as("clean"))
      .select(col("doc_id"), col("lang"),
        md5(col("clean")).as("clean_digest"),
        (size(split(col("clean"), "<EMAIL>", -1)) - 1).as("n_emails"),
        (size(split(col("clean"), "<NUM>", -1)) - 1).as("n_nums"))
      .orderBy("doc_id")
  }

  /** Per-document top-3 TF-IDF terms — the classic relevance weighting a
    * retrieval/curation pipeline derives per corpus (BM25's ext70 cousin
    * with the simpler rational idf = N/df). The document-frequency table
    * is computed over the WHOLE corpus, then the scored join is filtered
    * to the sampled docs — df must never be computed on the sample.
    *
    * Determinism: tfidf = (tf * N) / df as an IEEE double division of two
    * exactly-representable integers — correctly rounded, hence identical,
    * in both engines (the same trick as ext70's rational idf; libm logs
    * are NOT bit-portable). Ties rank by term text.
    *
    * Scale: tf is one (doc, term)-keyed shuffle, df one term-keyed
    * map-side-combining agg on the already-aggregated tf table, N a
    * broadcast scalar; the per-doc top-3 is a WindowGroupLimit pushdown,
    * never a full sort of the scored table.
    */
  val tfidfTopTerms: Q = (s, d) => {
    val tf = table(s, d, "documents")
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = table(s, d, "documents").agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("tok"))
    tf.filter(col("doc_id") % 10 === 0)
      .join(df, Seq("tok")).crossJoin(broadcast(n))
      .withColumn("tfidf", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("doc_id", "tok", "tf", "df", "tfidf", "rk")
      .orderBy("doc_id", "rk")
  }

  /** ext109 — distributed BPE merge induction (tokenizer TRAINING, the
    * piece the counting-side `bpe_ish_tokens` of ext10 doesn't do): the
    * classic byte-pair-encoding loop — count adjacent symbol pairs over
    * the corpus, merge the most frequent, repeat — run exactly the way
    * production tokenizer trainers run it at corpus scale: the ONE
    * corpus-sized pass is the word count (map-side-combining groupBy);
    * every subsequent round works on the VOCABULARY (≪ corpus, the
    * standard HuggingFace-trainer factorization), so 4 rounds cost 4
    * vocab-sized jobs plus a 1-row argmax collect each (4 driver rows
    * total, never data).
    *
    * Determinism: the argmax tie-breaks (count DESC, pair ASC) and the
    * merge application is TWO left-to-right non-overlapping `replace`
    * passes on the space-delimited segmentation (pass 2 catches
    * occurrences a pass-1 replacement exposed; both engines' `replace`
    * scans identically, so the greedy result is identical — documented
    * operator semantics rather than a fixpoint loop). The oracle
    * re-runs the full 4-round induction in chained CTEs. */
  val bpeMerges: Q = (s, d) => {
    import s.implicits._
    bpeLearn(s, d).toDF("merge_rank", "pair", "weight").orderBy("merge_rank")
  }

  /** The 4-round induction shared by ext109 (emits the merge table) and
    * ext117 (applies it): 4 driver rows total, never data. */
  private def bpeLearn(s: org.apache.spark.sql.SparkSession,
      d: String): Seq[(Long, String, Long)] = {
    val words = table(s, d, "documents")
      .select(explode(split(lower(trim(col("text"))), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var seg = words.withColumn("seg",
      expr("trim(regexp_replace(w, '(.)', '$1 '))"))
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    for (r <- 1 to 4) {
      val best = seg
        .select(col("cnt"), split(col("seg"), " ").as("p"))
        .select(col("cnt"), explode(expr(
          "if(size(p) < 2, array()," +
            " transform(sequence(1, size(p) - 1)," +
            "           i -> concat(element_at(p, i), ' ', element_at(p, i + 1))))"))
          .as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1)
        .head()
      val (bp, bc) = (best.getString(0), best.getLong(1))
      merges += ((r.toLong, bp, bc))
      val pat = s" $bp "
      val rep = " " + bp.replace(" ", "") + " "
      seg = seg.withColumn("seg", expr(
        s"trim(replace(replace(concat(' ', seg, ' '), '$pat', '$rep'), '$pat', '$rep'))"))
    }
    merges.toSeq
  }

  /** ext117 — BPE ENCODE with the learned merges (tokenizer
    * APPLICATION, ext109's other half): every document's words are
    * char-split and the 4 learned merges replayed in rank order — the
    * exact greedy double-replace semantics the trainer used — then
    * per-document token statistics are emitted (words, characters,
    * post-merge tokens; chars − tokens = merges applied). This is the
    * production tokenize-the-corpus pass: the merge table is a DRIVER
    * constant (vocabulary-sized, here 4 rows) compiled INTO the row
    * expression, so encoding is one embarrassingly-parallel map-side
    * pass over the corpus — no join, no shuffle until the per-doc sum.
    * The oracle re-learns the merges in chained CTEs and re-applies
    * them with the same replace chain, so the counts are the full
    * train+apply loop cross-checked end to end. */
  val bpeEncode: Q = (s, d) => {
    val merges = bpeLearn(s, d).map(_._2)
    def q(x: String) = x.replace("'", "''")
    val chain = merges.foldLeft("concat(' ', seg, ' ')") { (acc, bp) =>
      val pat = q(s" $bp ")
      val rep = q(" " + bp.replace(" ", "") + " ")
      s"replace(replace($acc, '$pat', '$rep'), '$pat', '$rep')"
    }
    table(s, d, "documents")
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), " ")).as("w"))
      .filter(col("w") =!= "")
      .withColumn("seg", expr("trim(regexp_replace(w, '(.)', '$1 '))"))
      .withColumn("enc", expr(s"trim($chain)"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(size(split(col("enc"), " "))).cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** ext119 — privacy release census: k-anonymity and l-diversity over
    * the publishable metadata (the pre-release audit a curated-corpus
    * distribution runs). Quasi-identifier = (source, 1000-char size
    * bucket) — the attributes a release would expose; sensitive
    * attribute = language. A cell is safe to release when at least
    * k=10 documents share the quasi-identifier (k-anonymity: no
    * document is re-identifiable within its cell) AND the cell spans
    * at least l=2 sensitive values (l-diversity: membership reveals no
    * sensitive value). Complements ext43's content-side PII redaction
    * with the metadata-side disclosure audit.
    *
    * Scale: one map-side-combined keyed agg over the corpus — the
    * census is cell-count-sized, never data-sized. */
  val privacyCensus: Q = (s, d) =>
    table(s, d, "documents")
      .groupBy(col("source"), expr("n_chars DIV 1000").as("size_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"))
      .withColumn("k_ok", (col("n_docs") >= 10).cast("int"))
      .withColumn("l_ok", (col("n_langs") >= 2).cast("int"))
      .orderBy("source", "size_bucket")

  val queries: Map[String, Q] = Map(
    "ext139_count_min_sketch" -> countMinSketch,
    "ext109_bpe_merges" -> bpeMerges,
    "ext117_bpe_encode" -> bpeEncode,
    "ext119_privacy_census" -> privacyCensus,
    "ext84_tfidf_topterms" -> tfidfTopTerms,
    "ext43_pii_redaction" -> piiRedaction,
    "ext33_bottomk_sketch" -> bottomKSketch,
    "ext94_heavy_hitters" -> heavyHitters,
    "ext08_text_langid" -> langId,
    "ext09_text_quality" -> quality,
    "ext10_text_tokens" -> tokenCount,
    "ext11_text_fingerprint" -> fingerprint,
    "ext19_curation_pipeline" -> curationPipeline,
    "ext28_sample_stratified" -> sampleStratified)

  /** The 4-round BPE induction as DuckDB CTEs (words .. b4) — shared by
    * the ext109 (merge table) and ext117 (encode) oracles. */
  private val bpeCtesSql: String =
    """words AS (
      |  SELECT w, COUNT(*) AS cnt FROM (
      |    SELECT unnest(string_split(lower(trim(text)), ' ')) AS w FROM documents)
      |  WHERE w <> '' GROUP BY w),
      |seg0 AS (
      |  SELECT w, cnt, trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS seg FROM words),
      |p1 AS (
      |  SELECT pr, SUM(cnt) AS c FROM (
      |    SELECT cnt, unnest(list_transform(range(2, len(sp) + 1),
      |      i -> sp[i - 1] || ' ' || sp[i])) AS pr
      |    FROM (SELECT cnt, string_split(seg, ' ') AS sp FROM seg0))
      |  GROUP BY pr),
      |b1 AS (SELECT pr, c FROM p1 ORDER BY c DESC, pr LIMIT 1),
      |seg1 AS (
      |  SELECT w, cnt, trim(replace(replace(' ' || seg || ' ', ' ' || b1.pr || ' ', ' ' || replace(b1.pr, ' ', '') || ' '), ' ' || b1.pr || ' ', ' ' || replace(b1.pr, ' ', '') || ' ')) AS seg
      |  FROM seg0, b1),
      |p2 AS (
      |  SELECT pr, SUM(cnt) AS c FROM (
      |    SELECT cnt, unnest(list_transform(range(2, len(sp) + 1),
      |      i -> sp[i - 1] || ' ' || sp[i])) AS pr
      |    FROM (SELECT cnt, string_split(seg, ' ') AS sp FROM seg1))
      |  GROUP BY pr),
      |b2 AS (SELECT pr, c FROM p2 ORDER BY c DESC, pr LIMIT 1),
      |seg2 AS (
      |  SELECT w, cnt, trim(replace(replace(' ' || seg || ' ', ' ' || b2.pr || ' ', ' ' || replace(b2.pr, ' ', '') || ' '), ' ' || b2.pr || ' ', ' ' || replace(b2.pr, ' ', '') || ' ')) AS seg
      |  FROM seg1, b2),
      |p3 AS (
      |  SELECT pr, SUM(cnt) AS c FROM (
      |    SELECT cnt, unnest(list_transform(range(2, len(sp) + 1),
      |      i -> sp[i - 1] || ' ' || sp[i])) AS pr
      |    FROM (SELECT cnt, string_split(seg, ' ') AS sp FROM seg2))
      |  GROUP BY pr),
      |b3 AS (SELECT pr, c FROM p3 ORDER BY c DESC, pr LIMIT 1),
      |seg3 AS (
      |  SELECT w, cnt, trim(replace(replace(' ' || seg || ' ', ' ' || b3.pr || ' ', ' ' || replace(b3.pr, ' ', '') || ' '), ' ' || b3.pr || ' ', ' ' || replace(b3.pr, ' ', '') || ' ')) AS seg
      |  FROM seg2, b3),
      |p4 AS (
      |  SELECT pr, SUM(cnt) AS c FROM (
      |    SELECT cnt, unnest(list_transform(range(2, len(sp) + 1),
      |      i -> sp[i - 1] || ' ' || sp[i])) AS pr
      |    FROM (SELECT cnt, string_split(seg, ' ') AS sp FROM seg3))
      |  GROUP BY pr),
      |b4 AS (SELECT pr, c FROM p4 ORDER BY c DESC, pr LIMIT 1)""".stripMargin

  /** The encode replace chain over b1..b4 in rank order — the DuckDB
    * text twin of [[bpeEncode]]'s folded Spark expression. */
  private val bpeDuckEncChain: String =
    (1 to 4).foldLeft("""' ' || trim(regexp_replace(w, '(.)', '\1 ', 'g')) || ' '""") {
      (acc, i) =>
        val pat = s"' ' || b$i.pr || ' '"
        val rep = s"' ' || replace(b$i.pr, ' ', '') || ' '"
        s"replace(replace($acc, $pat, $rep), $pat, $rep)"
    }

  val oracleSql: Map[String, String] = Map(
    "ext119_privacy_census" ->
      """SELECT source, n_chars // 1000 AS size_bucket,
        |  COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
        |  CASE WHEN COUNT(*) >= 10 THEN 1 ELSE 0 END AS k_ok,
        |  CASE WHEN COUNT(DISTINCT lang) >= 2 THEN 1 ELSE 0 END AS l_ok
        |FROM documents GROUP BY 1, 2
        |ORDER BY source, size_bucket""".stripMargin,
    "ext117_bpe_encode" ->
      s"""WITH $bpeCtesSql,
         |dw AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS w
         |    FROM documents)
         |  WHERE w <> ''),
         |enc AS (
         |  SELECT doc_id, w, trim($bpeDuckEncChain) AS e
         |  FROM dw, b1, b2, b3, b4)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(length(w)) AS BIGINT) AS n_chars,
         |  CAST(SUM(len(string_split(e, ' '))) AS BIGINT) AS n_tokens
         |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "ext109_bpe_merges" ->
      """WITH words AS (
        |  SELECT w, COUNT(*) AS cnt FROM (
        |    SELECT unnest(string_split(lower(trim(text)), ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w),
        |seg0 AS (
        |  SELECT w, cnt, trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS seg FROM words),
        |p1 AS (
        |  SELECT pr, SUM(cnt) AS c FROM (
        |    SELECT cnt, unnest(list_transform(range(2, len(sp) + 1),
        |      i -> sp[i - 1] || ' ' || sp[i])) AS pr
        |    FROM (SELECT cnt, string_split(seg, ' ') AS sp FROM seg0))
        |  GROUP BY pr),
        |b1 AS (SELECT pr, c FROM p1 ORDER BY c DESC, pr LIMIT 1),
        |seg1 AS (
        |  SELECT w, cnt, trim(replace(replace(' ' || seg || ' ', ' ' || b1.pr || ' ', ' ' || replace(b1.pr, ' ', '') || ' '), ' ' || b1.pr || ' ', ' ' || replace(b1.pr, ' ', '') || ' ')) AS seg
        |  FROM seg0, b1),
        |p2 AS (
        |  SELECT pr, SUM(cnt) AS c FROM (
        |    SELECT cnt, unnest(list_transform(range(2, len(sp) + 1),
        |      i -> sp[i - 1] || ' ' || sp[i])) AS pr
        |    FROM (SELECT cnt, string_split(seg, ' ') AS sp FROM seg1))
        |  GROUP BY pr),
        |b2 AS (SELECT pr, c FROM p2 ORDER BY c DESC, pr LIMIT 1),
        |seg2 AS (
        |  SELECT w, cnt, trim(replace(replace(' ' || seg || ' ', ' ' || b2.pr || ' ', ' ' || replace(b2.pr, ' ', '') || ' '), ' ' || b2.pr || ' ', ' ' || replace(b2.pr, ' ', '') || ' ')) AS seg
        |  FROM seg1, b2),
        |p3 AS (
        |  SELECT pr, SUM(cnt) AS c FROM (
        |    SELECT cnt, unnest(list_transform(range(2, len(sp) + 1),
        |      i -> sp[i - 1] || ' ' || sp[i])) AS pr
        |    FROM (SELECT cnt, string_split(seg, ' ') AS sp FROM seg2))
        |  GROUP BY pr),
        |b3 AS (SELECT pr, c FROM p3 ORDER BY c DESC, pr LIMIT 1),
        |seg3 AS (
        |  SELECT w, cnt, trim(replace(replace(' ' || seg || ' ', ' ' || b3.pr || ' ', ' ' || replace(b3.pr, ' ', '') || ' '), ' ' || b3.pr || ' ', ' ' || replace(b3.pr, ' ', '') || ' ')) AS seg
        |  FROM seg2, b3),
        |p4 AS (
        |  SELECT pr, SUM(cnt) AS c FROM (
        |    SELECT cnt, unnest(list_transform(range(2, len(sp) + 1),
        |      i -> sp[i - 1] || ' ' || sp[i])) AS pr
        |    FROM (SELECT cnt, string_split(seg, ' ') AS sp FROM seg3))
        |  GROUP BY pr),
        |b4 AS (SELECT pr, c FROM p4 ORDER BY c DESC, pr LIMIT 1)
        |SELECT merge_rank, pair, weight FROM (
        |  SELECT CAST(1 AS BIGINT) AS merge_rank, pr AS pair,
        |    CAST(c AS BIGINT) AS weight FROM b1
        |  UNION ALL SELECT 2, pr, CAST(c AS BIGINT) FROM b2
        |  UNION ALL SELECT 3, pr, CAST(c AS BIGINT) FROM b3
        |  UNION ALL SELECT 4, pr, CAST(c AS BIGINT) FROM b4)
        |ORDER BY merge_rank""".stripMargin,
    "ext84_tfidf_topterms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        |       WHERE tok <> '' GROUP BY 1, 2),
        |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.tok, t.tf, d.df,
        |    CAST(t.tf * n.n_docs AS DOUBLE) / d.df AS tfidf
        |  FROM tf t JOIN df d USING (tok), n
        |  WHERE t.doc_id % 10 = 0),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |                 ORDER BY tfidf DESC, tok) AS rk FROM scored)
        |SELECT doc_id, tok, tf, df, tfidf, CAST(rk AS BIGINT) AS rk
        |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "ext43_pii_redaction" ->
      """WITH seeded AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 5 = 0
        |      THEN text || ' contact user' || doc_id ||
        |           '@example.com or call 555123' || doc_id
        |      ELSE text END AS text
        |  FROM documents),
        |cleaned AS (
        |  SELECT doc_id, lang,
        |    regexp_replace(
        |      regexp_replace(lower(text), '[a-z0-9._-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
        |      '[0-9][0-9][0-9][0-9]+', '<NUM>', 'g') AS clean
        |  FROM seeded)
        |SELECT doc_id, lang, md5(clean) AS clean_digest,
        |  CAST(len(string_split(clean, '<EMAIL>')) - 1 AS INT) AS n_emails,
        |  CAST(len(string_split(clean, '<NUM>')) - 1 AS INT) AS n_nums
        |FROM cleaned ORDER BY doc_id""".stripMargin,
    "ext33_bottomk_sketch" ->
      """WITH t AS (
        |  SELECT DISTINCT doc_id % 8 AS shard, md5(tok) AS h
        |  FROM (SELECT doc_id,
        |          unnest(string_split(lower(trim(text)), ' ')) AS tok
        |        FROM documents)
        |  WHERE tok <> ''),
        |r AS (
        |  SELECT shard, h,
        |    row_number() OVER (PARTITION BY shard ORDER BY h) AS rk
        |  FROM t)
        |SELECT shard, string_agg(h, '|' ORDER BY h) AS bottomk
        |FROM r WHERE rk <= 8
        |GROUP BY shard ORDER BY shard""".stripMargin,
    // the CMS matrix is deterministic (portable 60-bit md5 prefix
    // hashes), so DuckDB rebuilds the identical d×w counters and the
    // min-over-cells estimates hash-match exactly
    "ext139_count_min_sketch" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split(lower(text), ' '),
        |                t -> t <> '')) AS tok
        |  FROM documents),
        |m AS (
        |  SELECT j,
        |    CAST(concat('0x', substr(md5(tok || '#' || j), 1, 15))
        |      AS BIGINT) % 256 AS cell,
        |    COUNT(*) AS c
        |  FROM toks, range(4) r(j) GROUP BY 1, 2),
        |keys AS (
        |  SELECT unnest(['spark', 'merge', 'vector', 'data', 'the'])
        |    AS kname),
        |kc AS (
        |  SELECT kname, j,
        |    CAST(concat('0x', substr(md5(kname || '#' || j), 1, 15))
        |      AS BIGINT) % 256 AS cell
        |  FROM keys, range(4) r(j)),
        |est AS (
        |  SELECT kname, CAST(MIN(COALESCE(c, 0)) AS BIGINT) AS est
        |  FROM kc LEFT JOIN m USING (j, cell) GROUP BY kname),
        |tru AS (
        |  SELECT kname,
        |    CAST(COUNT(t.tok) AS BIGINT) AS true_cnt
        |  FROM keys LEFT JOIN toks t ON t.tok = kname GROUP BY kname)
        |SELECT kname, est, true_cnt
        |FROM est JOIN tru USING (kname)
        |ORDER BY kname""".stripMargin,
    // exact heavy hitters: the sketch is a pass-1 pruning device only,
    // so the oracle is the plain exact formulation
    "ext94_heavy_hitters" ->
      """WITH items AS (
        |  SELECT CASE WHEN event_id % 2 = 0 THEN event_type
        |              ELSE event_type || '#' || user_id END AS item
        |  FROM events),
        |n AS (SELECT COUNT(*) AS n_items FROM items),
        |c AS (SELECT item, COUNT(*) AS cnt FROM items GROUP BY item)
        |SELECT c.item, c.cnt, CAST(c.cnt AS DOUBLE) / n.n_items AS freq
        |FROM c, n WHERE c.cnt * 32 > n.n_items
        |ORDER BY item""".stripMargin,
    "ext28_sample_stratified" ->
      """SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h
        |FROM documents
        |WHERE md5(CAST(doc_id AS VARCHAR)) <
        |  CASE WHEN lang = 'en' THEN 'c'
        |       WHEN lang IN ('de', 'fr') THEN '8'
        |       WHEN lang = 'es' THEN '4'
        |       ELSE '2' END
        |ORDER BY doc_id""".stripMargin,
    "ext08_text_langid" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN tok IN ('the','a','of','and','is') THEN 1 ELSE 0 END) AS BIGINT) AS en_score,
        |    CAST(SUM(CASE WHEN tok IN ('el','la','los','de','es') THEN 1 ELSE 0 END) AS BIGINT) AS es_score,
        |    CAST(SUM(CASE WHEN tok IN ('der','die','das','und','ist') THEN 1 ELSE 0 END) AS BIGINT) AS de_score,
        |    CAST(SUM(CASE WHEN tok IN ('le','les','des','et','est') THEN 1 ELSE 0 END) AS BIGINT) AS fr_score
        |  FROM toks GROUP BY doc_id)
        |SELECT doc_id, en_score, es_score, de_score, fr_score,
        |  CASE WHEN en_score >= greatest(en_score, es_score, de_score, fr_score) THEN 'en'
        |       WHEN es_score >= greatest(en_score, es_score, de_score, fr_score) THEN 'es'
        |       WHEN de_score >= greatest(en_score, es_score, de_score, fr_score) THEN 'de'
        |       ELSE 'fr' END AS detected_lang
        |FROM scored ORDER BY doc_id""".stripMargin,
    "ext09_text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
        |    / length(text) AS punct_ratio,
        |  CAST(len(list_filter(string_split(lower(text), ' '),
        |       t -> t IN ('the','a','of','and','is'))) AS DOUBLE)
        |    / len(list_filter(string_split(text, ' '), t -> t <> '')) AS stopword_ratio,
        |  CASE WHEN len(list_filter(string_split(text, ' '), t -> t <> '')) >= 10
        |            AND length(text) >= 50 THEN 'keep' ELSE 'drop' END AS quality_flag
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ext10_text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS bpe_ish_tokens,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(length(text) AS DOUBLE)
        |    / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ext11_text_fingerprint" ->
      """SELECT doc_id, md5(t) AS full_md5,
        |  list_min([md5(substr(t, i, 8)) for i in range(1, greatest(length(t) - 6, 2))]) AS min_shingle_md5,
        |  CAST(CASE WHEN length(t) = 0 THEN 0 ELSE
        |    list_reduce([CAST(ascii(substr(t, i, 1)) AS BIGINT) for i in range(1, length(t) + 1)],
        |                (acc, x) -> (acc * 31 + x) % 1000000007) END AS BIGINT) AS rolling_hash
        |FROM (SELECT doc_id, lower(trim(text)) AS t FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "ext19_curation_pipeline" ->
      """WITH scored AS (
        |  SELECT doc_id, source,
        |    length(text) AS n_chars,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
        |    len(list_filter(string_split(lower(text), ' '),
        |        t -> t IN ('the','a','of','and','is'))) AS en_hits,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
        |  FROM documents),
        |gated AS (
        |  SELECT * FROM scored
        |  WHERE n_tokens >= 10 AND n_chars >= 50 AND en_hits >= 1),
        |kept AS (
        |  SELECT * FROM gated
        |  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY h))
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM kept GROUP BY source ORDER BY source""".stripMargin)
}
