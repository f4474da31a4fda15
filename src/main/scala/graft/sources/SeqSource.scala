package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 connector — the source-extension tier: everything
  * a real connector (Kafka, JDBC, a bespoke storage engine) implements,
  * on a deterministic generated relation so the whole path is
  * oracle-checkable:
  *
  *   - `TableProvider` → `Table` → `ScanBuilder` → `Scan`/`Batch` →
  *     `InputPartition`s → `PartitionReader`: the full DSv2 read lifecycle;
  *   - `SupportsPushDownRequiredColumns`: Catalyst's column pruning
  *     reaches the source, and the reader materializes ONLY the pruned
  *     schema (asserted in SourcesSpec via the scan description);
  *   - explicit split planning: `parts` input partitions, each an
  *     independent range — exactly how a connector exposes parallelism to
  *     the scheduler (one task per split, no driver materialization).
  *
  * The relation: rows 0..rows-1 with `id` and `v = (id * 2654435761) %
  * 1000` — pure integer arithmetic any engine reproduces.
  *
  * Usage: `spark.read.format("graft.sources.SeqSourceProvider")
  * .option("rows", n).option("parts", p).load()`.
  */
class SeqSourceProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("parts")).map(_.toInt).getOrElse(4))
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  def valueOf(id: Long): Long = (id * 2654435761L) % 1000L
}

class SeqTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, parts)
}

class SeqScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = SeqSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(rows, parts, required)
}

class SeqScan(rows: Long, parts: Int, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft_seq rows=$rows parts=$parts pruned=[${required.fieldNames.mkString(",")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0L until rows by per).map(st =>
      SeqInputPartition(st, math.min(st + per, rows)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

case class SeqInputPartition(start: Long, end: Long) extends InputPartition

class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqInputPartition]
    // one writer per pruned column — a column the query never asked for
    // is never computed, which is what pushed-down pruning means
    val writers: Array[Long => Long] = required.fieldNames.map {
      case "id" => (id: Long) => id
      case "v" => (id: Long) => SeqSource.valueOf(id)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(writers.map(w => w(cur)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
