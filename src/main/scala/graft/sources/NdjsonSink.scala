package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
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
    new NdjsonTable(schema, properties.get("path"))
}

class NdjsonTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "ndjson sink needs a path option")

  override def name(): String = s"graft_ndjson_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new NdjsonBatchWrite(path, info.schema(), truncateFirst)
      }
    }
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
    new DataWriter[InternalRow] {
      private val tempPath = Paths.get(path, s"_temp_p${partitionId}_a$taskId")
      private val finalName = f"part-$partitionId%05d.json"
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
