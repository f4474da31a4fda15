package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 SINK — the write half of the connector surface,
  * with the real two-phase commit protocol a transactional sink needs:
  *
  *   - each task's `DataWriter` streams NDJSON lines to a task-private
  *     temp file (`_temp_p<part>_a<attempt>`), so concurrent speculative
  *     attempts never collide;
  *   - task `commit()` atomically renames the temp file to its final
  *     `part-<N>.json` name and reports it in a `WriterCommitMessage`;
  *     task `abort()` deletes the temp — a failed/straggler attempt
  *     leaves nothing visible;
  *   - driver `commit(messages)` writes a `_MANIFEST` listing exactly the
  *     committed files — the reader-visible unit of atomicity (exactly
  *     how warehouse table formats expose snapshots).
  *
  * Serialization covers the fixture types (long/double/string, ASCII
  * strings quote-escaped) — a production sink would swap in a real JSON
  * writer; the protocol is the point.
  */
class NdjsonSinkProvider extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  // write-only source: reads go through spark.read.json on the output
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NdjsonTable(schema, properties.get("path"),
      clusterBy = Option(properties.get("clusterBy")).filter(_.nonEmpty),
      sortBy = Option(properties.get("sortBy")).filter(_.nonEmpty),
      numParts = Option(properties.get("numParts")).map(_.toInt).getOrElse(0))
}

class NdjsonTable(writeSchema: StructType, path: String,
    clusterBy: Option[String] = None, sortBy: Option[String] = None,
    numParts: Int = 0)
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "ndjson sink needs a path option")

  override def name(): String = s"graft_ndjson_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write =
        if (clusterBy.isEmpty && sortBy.isEmpty) new Write {
          override def toBatch: BatchWrite =
            new NdjsonBatchWrite(path, info.schema(), truncateFirst)
          override def toStreaming: StreamingWrite =
            new NdjsonStreamingWrite(path, info.schema())
        } else
          /** `RequiresDistributionAndOrdering` — the write-side layout
            * contract: the SINK declares how incoming data must be
            * clustered and ordered, and SPARK plans the exchange + sort
            * before the write (exactly how table formats get bucketed /
            * sorted files without the user hand-repartitioning). Here:
            * clustered on `clusterBy` (each key's rows land wholly in one
            * task → one file), sorted by `sortBy` within tasks, optional
            * exact partition count. At 100 TB this is what makes the
            * written layout joinable/skippable downstream — the sort and
            * shuffle happen once, at write time, declared by the sink. */
          new Write with RequiresDistributionAndOrdering {
            import org.apache.spark.sql.connector.distributions.{Distribution => WDist, Distributions}
            import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => WSort}
            override def requiredDistribution(): WDist =
              clusterBy.map(c => Distributions.clustered(
                Array(Expressions.column(c): org.apache.spark.sql.connector.expressions.Expression)))
                .getOrElse(Distributions.unspecified())
            override def requiredOrdering(): Array[WSort] =
              sortBy.toArray.map(c =>
                Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
            override def requiredNumPartitions(): Int = numParts
            override def toBatch: BatchWrite =
              new NdjsonBatchWrite(path, info.schema(), truncateFirst)
            override def toStreaming: StreamingWrite =
              new NdjsonStreamingWrite(path, info.schema())
          }
    }
}

/** Streaming face of the sink (`StreamingWrite`) — the epoch-aware commit
  * protocol a streaming table sink implements:
  *
  *   - files carry the epoch in their name (`part-e<epoch>-p<part>.json`),
  *     so concurrent epochs and retried tasks never collide;
  *   - driver `commit(epochId, messages)` APPENDS the epoch's committed
  *     files to the `_MANIFEST`, tagged `e<epoch>:` — the reader-visible
  *     snapshot grows atomically per micro-batch (rewrite + atomic move);
  *   - the commit is IDEMPOTENT per epoch: a replayed micro-batch (crash
  *     between sink-commit and offset-log-commit — the failure window
  *     Structured Streaming's exactly-once contract covers) finds its
  *     epoch already in the manifest and drops the duplicate attempt's
  *     files instead of double-publishing them.
  *
  * State is one manifest file; no driver memory grows with stream length.
  */
class NdjsonStreamingWrite(path: String, schema: StructType)
    extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    Files.createDirectories(Paths.get(path))
    new NdjsonStreamingWriterFactory(path, schema)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val manifest = Paths.get(path, "_MANIFEST")
    val existing: Seq[String] =
      if (Files.exists(manifest))
        Files.readAllLines(manifest).toArray(Array.empty[String])
          .toSeq.filter(_.nonEmpty)
      else Nil
    val tag = s"e$epochId:"
    val names = messages.collect { case NdjsonCommit(f) => f }.sorted
    if (existing.exists(_.startsWith(tag))) {
      // epoch replay: the snapshot already includes this epoch. The
      // re-attempt's files carry the SAME (epoch, partition) names, so
      // their renames already replaced the published files byte-for-byte
      // (deterministic re-execution) — the manifest must not change, and
      // nothing may be deleted. Commit is a no-op.
      ()
    } else {
      val next = existing ++ names.map(tag + _)
      val tmp = Paths.get(path, s"_MANIFEST.tmp$epochId")
      Files.write(tmp, (next.mkString("\n") + "\n").getBytes("UTF-8"))
      Files.move(tmp, manifest, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** Failed epoch: remove its task-committed files — but never one the
    * manifest already lists (an aborted REPLAY of a committed epoch uses
    * the same file names; deleting them would destroy published data). */
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val manifest = Paths.get(path, "_MANIFEST")
    val published: Set[String] =
      if (Files.exists(manifest))
        Files.readAllLines(manifest).toArray(Array.empty[String])
          .toSeq.filter(_.nonEmpty)
          .map(l => l.substring(l.indexOf(':') + 1)).toSet
      else Set.empty
    messages.collect { case NdjsonCommit(f) => f }
      .filterNot(published)
      .foreach(f => Files.deleteIfExists(Paths.get(path, f)))
  }
}

class NdjsonStreamingWriterFactory(path: String, schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    NdjsonWriters.create(path, schema,
      tempName = s"_temp_e${epochId}_p${partitionId}_a$taskId",
      finalName = f"part-e$epochId%d-p$partitionId%05d.json")
}

/** Manifest-aware read-back helper shared by the batch and streaming
  * round-trip queries: lists exactly the committed files (stripping any
  * `e<epoch>:` tags), never stale or aborted parts. */
object NdjsonManifest {
  def committedFiles(path: String): Seq[String] = committedFiles(path, None)

  /** Snapshot (time-travel) listing: with `asOfEpoch = Some(e)`, only
    * files committed by epochs <= e are visible — the append-only,
    * epoch-tagged manifest doubles as the snapshot log a table format
    * keeps, so any historical micro-batch boundary is a consistent
    * readable state. Untagged (batch-write) lines count as epoch 0. */
  def committedFiles(path: String, asOfEpoch: Option[Long]): Seq[String] =
    Files.readAllLines(Paths.get(path, "_MANIFEST"))
      .toArray(Array.empty[String]).toSeq
      .filter(_.nonEmpty)
      .map { l =>
        val i = l.indexOf(':')
        if (i > 0 && l.startsWith("e")) (l.substring(1, i).toLong, l.substring(i + 1))
        else (0L, l)
      }
      .filter { case (ep, _) => asOfEpoch.forall(ep <= _) }
      .map { case (_, f) => s"$path/$f" }
}

case class NdjsonCommit(fileName: String) extends WriterCommitMessage

class NdjsonBatchWrite(path: String, schema: StructType, truncateFirst: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (truncateFirst) {
      // overwrite semantics: stale part files from a previous (possibly
      // wider) write must not survive next to the new ones
      val old = dir.toFile.listFiles()
      if (old != null) old.filter(f =>
        f.getName.startsWith("part-") || f.getName == "_MANIFEST")
        .foreach(_.delete())
    }
    new NdjsonWriterFactory(path, schema)
  }

  /** Driver-side atomic publish: the manifest names exactly the files
    * whose tasks committed. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val names = messages.collect { case NdjsonCommit(f) => f }.sorted
    Files.write(Paths.get(path, "_MANIFEST"),
      (names.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class NdjsonWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    NdjsonWriters.create(path, schema,
      tempName = s"_temp_p${partitionId}_a$taskId",
      finalName = f"part-$partitionId%05d.json")
}

/** The task-side writer shared by the batch and streaming factories:
  * stream to a task-private temp file, `commit()` atomically renames it
  * to its final name, `abort()` leaves nothing behind. */
object NdjsonWriters {

  def create(path: String, schema: StructType,
      tempName: String, finalName: String): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val tempPath = Paths.get(path, tempName)
      // executor-side too: in any deployment where the writer does not
      // share the driver's filesystem, the factory's mkdir didn't happen
      // here (a shared/object store is what a real deployment points at)
      Files.createDirectories(tempPath.getParent)
      private val out = Files.newBufferedWriter(tempPath)
      private val fields = schema.fields

      override def write(row: InternalRow): Unit = {
        val sb = new StringBuilder("{")
        var i = 0
        while (i < fields.length) {
          if (i > 0) sb.append(',')
          sb.append('"').append(fields(i).name).append("\":")
          if (row.isNullAt(i)) sb.append("null")
          else fields(i).dataType match {
            case LongType => sb.append(row.getLong(i))
            case DoubleType => sb.append(row.getDouble(i))
            case StringType =>
              sb.append('"')
                .append(row.getUTF8String(i).toString
                  .replace("\\", "\\\\").replace("\"", "\\\""))
                .append('"')
            case dt => throw new IllegalArgumentException(
              s"ndjson sink demo does not serialize $dt")
          }
          i += 1
        }
        out.write(sb.append("}\n").toString)
      }

      override def commit(): WriterCommitMessage = {
        out.close()
        Files.move(tempPath, Paths.get(path, finalName),
          StandardCopyOption.REPLACE_EXISTING)
        NdjsonCommit(finalName)
      }

      override def abort(): Unit = { out.close(); Files.deleteIfExists(tempPath) }

      override def close(): Unit = ()
    }
}
