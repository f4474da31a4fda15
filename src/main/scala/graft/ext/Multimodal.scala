package graft.ext

import graft.ops.{table, Q}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary media + typed metadata, with
  * a decode/feature-extract stage as a distributed partition-wise map.
  *
  * Real pipelines carry image/audio/video as parquet `binary` columns and
  * decode inside `mapPartitions` (Scala) / `mapInPandas` (Python) so the
  * codec runs data-parallel next to the bytes, never on the driver. No
  * image/audio codecs exist in this environment, so the decode body is a
  * clearly-marked DETERMINISTIC STUB over the bytes — the Spark-side
  * plumbing (binary column, typed row batches through an iterator,
  * repartition-for-decode, typed output schema) is the real, tested part.
  * The stub's arithmetic is also expressible in SQL, which is what makes
  * the pipeline oracle-checkable end to end.
  */
object Multimodal {

  /** Input: binary payload + typed metadata. */
  final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)

  /** Output of the decode stub. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, fake_width: Int,
      fake_height: Int, frames: Int)

  /** STUB decoder — stands in for a real image/video codec. Pure function
    * of the bytes, so results are deterministic and oracle-checkable.
    */
  private def decodeStub(m: MediaRow): MediaFeatures = {
    val n = m.media.length
    val first = if (n > 0) m.media(0) & 0xff else 0
    MediaFeatures(m.doc_id, n, 32 + n % 64, 32 + first % 64, 1 + n % 8)
  }

  /** Binary ingestion + partition-wise decode: documents' text bytes stand
    * in for media payloads. */
  val mediaDecode: Q = (s, d) => {
    import s.implicits._
    val media = table(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
        lit("image").as("kind"))
      .as[MediaRow]
    media
      .repartition(col("doc_id")) // decode runs where the bytes live
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling shape: expand each media row into its (fake) frames
    * and fingerprint each — the video-frame-sample access pattern as a
    * pure Generate plan (no shuffle). */
  val frameSample: Q = (s, d) => {
    import s.implicits._
    val features = table(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
        lit("image").as("kind"))
      .as[MediaRow]
      .mapPartitions(_.map(decodeStub))
      .toDF()
    features
      .select(col("doc_id"), col("frames"),
        explode(expr("sequence(1, frames)")).as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        md5(concat(col("doc_id"), lit(":"), col("frame_no"))).as("frame_digest"))
      .orderBy("doc_id", "frame_no")
  }

  /** Output of the resize stub. */
  final case class ResizedMedia(doc_id: Long, orig_width: Int, orig_height: Int,
      target_width: Int, target_height: Int, resized_digest: String)

  /** Resize shape: decode → scale dims to a fixed target → re-encode
    * digest of the (stub-)resampled payload. The real pipeline would call
    * an image library inside the same partition-wise map; the stub keeps
    * every output a pure function of the input bytes. */
  val resize: Q = (s, d) => {
    import s.implicits._
    table(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
        lit("image").as("kind"))
      .as[MediaRow]
      .mapPartitions(_.map { m =>
        val f = decodeStub(m)
        // STUB resample: digest of the truncated payload stands in for the
        // resized pixel buffer
        val truncated = m.media.take(256)
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(truncated).map("%02x".format(_)).mkString
        ResizedMedia(m.doc_id, f.fake_width, f.fake_height, 16, 16, digest)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** One analysis window over the (stub) sample stream. */
  final case class AudioWindow(doc_id: Long, window_no: Int, n_samples: Int,
      sum_amp: Long, peak_amp: Int)

  /** Audio windowing shape: the byte payload is treated as a PCM-ish
    * sample stream and segmented into overlapping analysis windows
    * (100 samples, hop 50 — the spectrogram/feature-frame access pattern),
    * each reduced to per-window statistics inside the same partition-wise
    * map a real DSP library would run in. Windows never cross rows, so the
    * stage is a pure flatMap — no shuffle until a downstream aggregate. */
  val audioWindows: Q = (s, d) => {
    import s.implicits._
    table(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
        lit("audio").as("kind"))
      .as[MediaRow]
      .mapPartitions(_.flatMap { m =>
        val n = m.media.length
        (0 until math.max(n, 1) by 50).takeWhile(_ < n).zipWithIndex.map {
          case (st, w) =>
            val len = math.min(100, n - st)
            val seg = m.media.slice(st, st + len)
            AudioWindow(m.doc_id, w, len,
              seg.map(b => (b & 0xff).toLong).sum, seg.map(_ & 0xff).max)
        }
      })
      .toDF()
      .orderBy("doc_id", "window_no")
  }

  /** Perceptual-hash near-dup for media — aHash over the decoded pixel
    * stream: 64 evenly-sampled "pixels" from the payload, bit i set when
    * pixel_i is above the mean (spelled integer-exact as px*64 > sum so
    * both engines compare without division), then the same chunk-LSH
    * shape as SimHash: 8-bit chunks bucket candidates (pigeonhole:
    * hamming<=7 pairs share at least one of 8 chunks), hamming verified
    * inside the join.
    * The hash runs in the partition-wise decode map where a real codec
    * would sit; only (doc_id, 64-bit hash) leaves it — at 100 TB the
    * media bytes never shuffle. */
  val phashNearDup: Q = (s, d) => {
    import s.implicits._
    val hashes = table(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
        lit("image").as("kind"))
      .as[MediaRow]
      .mapPartitions(_.map { m =>
        val n = m.media.length
        val px = Array.tabulate(64)(i =>
          if (n == 0) 0 else m.media((i * n) / 64) & 0xff)
        val sum = px.sum
        var h = 0L
        var i = 0
        while (i < 64) { if (px(i) * 64 > sum) h |= 1L << i; i += 1 }
        (m.doc_id, h)
      })
      .toDF("doc_id", "phash")
      .persist()
    val chunks = hashes
      .select(col("doc_id"), col("phash"), explode(expr("sequence(0, 7)")).as("c"))
      .withColumn("chunk_val", expr("shiftright(phash, c * 8) & 255"))
    chunks.as("x").join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id") &&
          expr("bit_count(x.phash ^ y.phash) <= 7"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        expr("CAST(bit_count(x.phash ^ y.phash) AS INT)").as("hamming"))
      .distinct()
      .orderBy("hamming", "a_id", "b_id")
  }

  /** Training-batch assembly — the collate step that turns curated
    * (media, caption) rows into fixed-size padded batches: items are
    * keyed to a deterministic batch (`doc_id DIV 8`), and each batch's
    * members meet in ONE `mapGroups` call that computes the padded
    * tensor shape (max caption length × items), padding waste, and
    * payload bytes — exactly where a real collator would build the
    * tensors. Typed groupByKey → one shuffle on batch_id, per-batch
    * state only; the oracle restates the shape arithmetic relationally. */
  val batchAssembly: Q = (s, d) => {
    import s.implicits._
    val items = table(s, d, "documents")
      .select(col("doc_id"),
        size(expr("filter(split(text, ' '), t -> t <> '')")).as("n_tokens"),
        length(col("text")).as("n_chars"))
      .as[(Long, Int, Int)]
    items.groupByKey(_._1 / 8).mapGroups { (bid, it) =>
      val xs = it.toArray.sortBy(_._1)
      val maxLen = xs.map(_._2).max
      val total = xs.map(_._2.toLong).sum
      (bid, xs.length, maxLen, total,
        xs.length.toLong * maxLen - total, xs.map(_._3.toLong).sum)
    }.toDF("batch_id", "n_items", "max_len", "total_tokens",
      "pad_tokens", "total_chars")
      .orderBy("batch_id")
  }

  val queries: Map[String, Q] = Map(
    "ext40_multimodal_phash" -> phashNearDup,
    "ext12_multimodal_decode" -> mediaDecode,
    "ext13_multimodal_frames" -> frameSample,
    "ext18_multimodal_resize" -> resize,
    "ext27_multimodal_audio_windows" -> audioWindows,
    "ext54_multimodal_batch_assembly" -> batchAssembly)

  // The oracle re-states the stub arithmetic over the source text (ASCII
  // fixture: chars == bytes; strlen() counts bytes in DuckDB).
  val oracleSql: Map[String, String] = Map(
    // bit 63's term is negative in signed-64; DuckDB sums in int128 and
    // the mathematical total equals the signed interpretation, so the
    // BIGINT cast is exact. Arithmetic >> plus & 65535 extracts the same
    // 16 bits in both engines regardless of sign.
    "ext40_multimodal_phash" ->
      """WITH t AS (SELECT doc_id, text, strlen(text) AS n FROM documents),
        |px AS (
        |  SELECT doc_id, i, ascii(substring(text, 1 + (i * n) // 64, 1)) AS p
        |  FROM t, range(0, 64) r(i)),
        |hs AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN p * 64 <= s THEN 0
        |             WHEN i = 63 THEN (-9223372036854775807 - 1)
        |             ELSE (CAST(1 AS BIGINT) << i) END) AS BIGINT) AS phash
        |  FROM (SELECT doc_id, i, p,
        |          SUM(p) OVER (PARTITION BY doc_id) AS s FROM px)
        |  GROUP BY doc_id),
        |chunks AS (
        |  SELECT doc_id, phash, c, (phash >> (c * 8)) & 255 AS cv
        |  FROM hs, range(8) r(c)),
        |pairs AS (
        |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
        |    x.phash AS pa, y.phash AS pb
        |  FROM chunks x JOIN chunks y
        |    ON x.c = y.c AND x.cv = y.cv AND x.doc_id < y.doc_id)
        |SELECT a_id, b_id, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
        |FROM pairs WHERE bit_count(xor(pa, pb)) <= 7
        |ORDER BY hamming, a_id, b_id""".stripMargin,
    "ext54_multimodal_batch_assembly" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id // 8 AS batch_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT)
        |      AS n_tokens,
        |    CAST(length(text) AS INT) AS n_chars
        |  FROM documents)
        |SELECT batch_id,
        |  CAST(COUNT(*) AS INT) AS n_items,
        |  CAST(MAX(n_tokens) AS INT) AS max_len,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS pad_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM t GROUP BY 1 ORDER BY batch_id""".stripMargin,
    "ext12_multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS INT) AS n_bytes,
        |  CAST(32 + strlen(text) % 64 AS INT) AS fake_width,
        |  CAST(32 + ascii(substr(text, 1, 1)) % 64 AS INT) AS fake_height,
        |  CAST(1 + strlen(text) % 8 AS INT) AS frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ext13_multimodal_frames" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_no,
        |  md5(doc_id || ':' || f) AS frame_digest
        |FROM (SELECT doc_id, unnest([i for i in range(1, (1 + strlen(text) % 8) + 1)]) AS f
        |      FROM documents)
        |ORDER BY doc_id, frame_no""".stripMargin,
    "ext18_multimodal_resize" ->
      """SELECT doc_id,
        |  CAST(32 + strlen(text) % 64 AS INT) AS orig_width,
        |  CAST(32 + ascii(substr(text, 1, 1)) % 64 AS INT) AS orig_height,
        |  CAST(16 AS INT) AS target_width,
        |  CAST(16 AS INT) AS target_height,
        |  md5(substr(text, 1, 256)) AS resized_digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ext27_multimodal_audio_windows" ->
      """WITH w AS (
        |  SELECT doc_id, text, strlen(text) AS n,
        |    unnest([i for i in range(0, (strlen(text) - 1) // 50 + 1)]) AS wno
        |  FROM documents WHERE strlen(text) > 0)
        |SELECT doc_id, CAST(wno AS INT) AS window_no,
        |  CAST(least(100, n - wno * 50) AS INT) AS n_samples,
        |  CAST(list_sum([ascii(substr(text, j, 1))
        |        for j in range(wno * 50 + 1, wno * 50 + least(100, n - wno * 50) + 1)]) AS BIGINT) AS sum_amp,
        |  CAST(list_max([ascii(substr(text, j, 1))
        |        for j in range(wno * 50 + 1, wno * 50 + least(100, n - wno * 50) + 1)]) AS INT) AS peak_amp
        |FROM w ORDER BY doc_id, window_no""".stripMargin)
}
