package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale rehearsal for the LLM-pipeline tier (round-6 ADVICE item):
  * synthesizes an ~sf1-equivalent documents/embeddings/events fixture
  * from the sf0.1 driver fixture and times the scale-critical queries at
  * both SFs, printing per-query runtime ratios. The claim under test is
  * the 100 TB design story — banding/bucketing keeps every dedup/ANN
  * query near-linear in corpus size — and a 10× step is the largest
  * rehearsal this box can hold, so "ratio ≈ 10×, not 100×" is the
  * pass condition recorded in SURVEY.md §10.
  *
  * Fixture synthesis (deterministic, no RNG):
  *   - documents ×K: ids offset per copy; copies > 0 get a 2-token
  *     suffix, so cross-copy pairs are NEAR-duplicates (high Jaccard,
  *     not 1.0) — the worst case for LSH banding, which must still
  *     bucket them, while exact-hash dedup keeps only within-copy
  *     groups. Shingle-set size grows ~K× like a real corpus.
  *   - embeddings ×K: ids offset; per-element additive noise keyed on
  *     (vec_id, position) — NOT a scalar multiple (cosine is
  *     scale-invariant; a scaled copy would be a degenerate exact
  *     neighbor), so ANN quality structure survives the blow-up.
  *   - events ×K: ids offset, timestamps shifted a day per copy.
  *
  * Usage: runMain graft.ScaleRehearsal [srcSfDir] [fixtureDir] [K]
  * Prints one JSON line per query:
  *   {"q":"…","base_s":…,"scaled_s":…,"ratio":…}
  */
object ScaleRehearsal {
  private val Queries = Seq(
    "ext02_dedup_ngram_jaccard", "ext03_dedup_minhash_lsh",
    "ext38_dedup_components", "ext75_sim_topk_ivfpq",
    "ext77_label_noise_knn", "ext86_dedup_containment",
    "ext56_full_training_pipeline",
    // round-6 late adds: cell-restricted semantic dedup and the two-pass
    // sketch (ext95 recall eval is excluded like ext06: its exact
    // brute-force leg is quadratic BY DESIGN — production evaluates a
    // fixed-size query sample, not a corpus-proportional one)
    "ext93_semantic_dedup", "ext94_heavy_hitters",
    // sketch-rollup and basket-local pair mining: both designed to be
    // scan-bound (ext96) / basket-bounded (ext97) — rehearsed to prove it
    "ext96_bitmap_distinct", "ext97_basket_pairs",
    "ext98_repeat_customers", "ext99_incremental_bitmap",
    "ext101_markov_transitions",
    // round-7 adds: window-pass interpolation and the one-exchange CUPED
    "ext104_interpolate_gaps", "ext105_cuped")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_scale_sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.configure(spark)
    // orders.parquet is the newest fixture table — its absence means the
    // fixture predates the ext96-98 adds and must be regenerated
    if (!new java.io.File(s"$out/orders.parquet").exists())
      generate(spark, src, out, k)

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once (JIT/codegen/footers), then time
    Queries.foreach { q => time(q, src) }
    val rows = Queries.map { q =>
      val base = time(q, src)
      val scaled = time(q, out)
      val r = scaled / base
      println(f"""{"q":"$q","base_s":$base%.2f,"scaled_s":$scaled%.2f,"ratio":$r%.1f}""")
      (q, base, scaled, r)
    }
    val worst = rows.maxBy(_._4)
    println(f"""{"k":$k,"worst":"${worst._1}","worst_ratio":${worst._4}%.1f}""")
    spark.stop()
  }

  private def generate(spark: SparkSession, src: String, out: String,
      k: Int): Unit = {
    def copies(base: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => f(base, i)).reduce(_ unionByName _)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    copies(docs) { (d, i) =>
      val t = if (i == 0) col("text")
      else concat(col("text"), lit(s" copy $i"))
      d.select((col("doc_id") + lit(i * maxDoc)).as("doc_id"), t.as("text"),
        col("lang"), col("source"), length(t).cast("long").as("n_chars"))
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = embs.agg(max("vec_id")).head().getLong(0) + 1
    copies(embs) { (e, i) =>
      val vec = if (i == 0) col("embedding")
      else expr(s"transform(embedding, (x, j) -> " +
        s"cast(x + (pmod(vec_id * 31 + j * 7 + $i, 13) - 6) * 0.002 as float))")
      e.select((col("vec_id") + lit(i * maxVec)).as("vec_id"),
        vec.as("embedding"), col("label"))
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    // orders/lineitem ×K for the sketch-rollup and basket tiers: key
    // spaces (order, customer, part) all grow K× — months keep their
    // calendar but hold K× the customers (bitmap width must scale),
    // baskets keep their size (pair work must stay linear), cross-copy
    // baskets never share parts (pair cardinality grows K×, not K²)
    val ords = spark.read.parquet(s"$src/orders.parquet")
    val maxOrd = ords.agg(max("o_orderkey")).head().getLong(0) + 1
    val maxCust = ords.agg(max("o_custkey")).head().getLong(0) + 1
    copies(ords) { (o, i) =>
      o.withColumn("o_orderkey", col("o_orderkey") + lit(i * maxOrd))
        .withColumn("o_custkey", col("o_custkey") + lit(i * maxCust))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val maxPart = li.agg(max("l_partkey")).head().getLong(0) + 1
    copies(li) { (l, i) =>
      l.withColumn("l_orderkey", col("l_orderkey") + lit(i * maxOrd))
        .withColumn("l_partkey", col("l_partkey") + lit(i * maxPart))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    val maxEv = ev.agg(max("event_id")).head().getLong(0) + 1
    val maxUser = ev.agg(max("user_id")).head().getLong(0) + 1
    // day-shift per copy; ts is nanos-as-long in older testdata
    // generations, native timestamp in newer ones (cf. ops.events)
    val tsShifted: Int => org.apache.spark.sql.Column =
      ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          i => col("ts") + lit(i * 86400L * 1000000000L)
        case _ =>
          i => expr(s"timestampadd(DAY, $i, ts)")
      }
    copies(ev) { (e, i) =>
      e.select((col("event_id") + lit(i * maxEv)).as("event_id"),
        tsShifted(i).as("ts"),
        (col("user_id") + lit(i * maxUser)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/events.parquet")
  }
}
