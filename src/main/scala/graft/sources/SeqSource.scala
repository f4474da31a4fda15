package graft.sources

import java.util
import java.util.OptionalLong
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
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
    SeqSource.schemaFor(options.getInt("buckets", 0))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("parts")).map(_.toInt).getOrElse(4),
      Option(properties.get("batchRows")).map(_.toLong).getOrElse(0L),
      Option(properties.get("buckets")).map(_.toInt).getOrElse(0))
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  /** Bucketed layout exposes the bucket id as a real column `b = id %
    * buckets` — the portable (Hive-partition-column) flavor of storage
    * partitioning, resolvable without a FunctionCatalog. */
  def schemaFor(buckets: Int): StructType =
    if (buckets > 0) schema.add(StructField("b", LongType, nullable = false))
    else schema

  def valueOf(id: Long): Long = (id * 2654435761L) % 1000L

  /** Driver-side trace of the last runtime-filter application:
    * (bounds lo, bounds hi, planned splits). `SupportsRuntimeV2Filtering
    * .filter` runs on the driver when the DPP subquery's result arrives,
    * so a plain static slot is enough for tests to observe that split
    * elimination actually happened (it is NOT part of query semantics —
    * pushed runtime filters are re-checked by the join itself). */
  val lastRuntimeFilter =
    new java.util.concurrent.atomic.AtomicReference[(Long, Long, Int)](null)
}

class SeqTable(rows: Long, parts: Int, batchRows: Long, buckets: Int = 0)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.schemaFor(buckets)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, parts, batchRows, buckets)

  /** Metadata column (`SupportsMetadataColumns`): `_split` is the ordinal
    * of the split a row came from — the connector analog of the file
    * sources' `_metadata.file_path` lineage column. Only materialized
    * when a query references it (it arrives through column pruning like
    * any other column). */
  override def metadataColumns():
      Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_split"
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = "ordinal of the planned split"
    })
}

class SeqScanBuilder(rows: Long, parts: Int, batchRows: Long = 0L, buckets: Int = 0)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var required: StructType = SeqSource.schemaFor(buckets)
  private var lo: Long = 0L
  private var hi: Long = rows // [lo, hi)
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var aggValues: Option[Seq[Long]] = None

  /** COUNT(*)/MIN(id)/MAX(id) with no grouping are pure metadata on an
    * ordered range — answered WITHOUT scanning (the parquet-footer-count
    * trick, source-side). Declined whenever filters were pushed (they are
    * re-evaluated above the scan, so scan-level answers would overcount)
    * or any other aggregate/grouping appears. Complete pushdown: the scan
    * returns ONE pre-aggregated row and Spark plans no aggregate at all.
    */
  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    pushAggregation(aggregation)

  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (aggValues.isDefined) return true // idempotent re-offer
    if (pushed.nonEmpty || aggregation.groupByExpressions.nonEmpty ||
      buckets > 0 || hi <= lo) return false
    def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case n: NamedReference => n.fieldNames.toSeq == Seq("id")
        case _ => false
      }
    val values = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(hi - lo)
      case m: Min if isId(m.column) => Some(lo)
      case m: Max if isId(m.column) => Some(hi - 1)
      case _ => None
    }
    if (values.forall(_.isDefined)) {
      aggValues = Some(values.flatten)
      true
    } else false
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Range predicates on the ordered `id` column narrow the planned
    * splits — the DSv2 analog of partition elimination / zone-map
    * skipping. Conservative contract: every filter is ALSO returned for
    * Spark-side re-evaluation (like parquet row-group skipping), so the
    * bounds only have to be sound, not exact. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    // the exclusive/inclusive conversions need v±1 — saturate at the Long
    // extremes or the bound wraps and soundness ("never drop a matching
    // row") breaks for id <= Long.MaxValue / id > Long.MinValue
    def incl2excl(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    filters.foreach {
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, incl2excl(v))
      case GreaterThan("id", v: Long) => lo = math.max(lo, incl2excl(v))
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, incl2excl(v))
      case _ => ()
    }
    pushed = filters.filter {
      case LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    filters // all re-evaluated by Spark — pruning is an optimization only
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  /** LIMIT n truncates the scan to the first n ids — but ONLY when no
    * filter bounds were pushed: our pushed filters are re-evaluated by
    * Spark, so rows admitted by the scan may still be dropped above it,
    * and a pre-filter limit would under-produce. (Spark only offers the
    * limit when it sits directly on the scan, but the no-filters guard
    * keeps the source safe regardless of planner behavior.) */
  override def pushLimit(limit: Int): Boolean =
    if (pushed.isEmpty && buckets == 0 && lo == 0L && hi == rows) {
      hi = math.min(hi, limit.toLong)
      true // fully handled: exactly the first `limit` rows are produced
    } else false // bucketed scans emit in bucket order, not id order

  override def build(): Scan = aggValues match {
    case Some(vals) => new SeqAggScan(vals)
    case None =>
      new SeqScan(rows, parts, required, lo, math.max(lo, hi), batchRows, buckets)
  }
}

/** Scan for a completely-pushed aggregation: one split, one row, the
  * metadata-derived values — zero data rows ever read. */
class SeqAggScan(values: Seq[Long]) extends Scan with Batch {

  override def readSchema(): StructType =
    StructType(values.indices.map(i =>
      StructField(s"agg_$i", LongType, nullable = false)))

  override def description(): String =
    s"graft_seq AGG-PUSHED values=[${values.mkString(",")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqInputPartition(0L, 1L))

  override def createReaderFactory(): PartitionReaderFactory = {
    val vals = values.toArray
    (_: InputPartition) => new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(vals.toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}

class SeqScan(rows: Long, parts: Int, required: StructType, lo0: Long, hi0: Long,
    batchRows: Long = 0L, buckets: Int = 0)
    extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeV2Filtering
    with SupportsReportPartitioning with SupportsReportOrdering {

  // planned bounds [lo, hi): start at the compile-time pushed-filter
  // bounds, further narrowed at execution time by runtime filtering
  private var lo: Long = lo0
  private var hi: Long = hi0

  override def readSchema(): StructType = required

  /** Post-pushdown statistics (`SupportsReportStatistics`): row count and
    * byte size of exactly the range this scan will produce. This is what
    * lets Catalyst make the broadcast-vs-shuffle join decision for a v2
    * source: without it the relation defaults to
    * `spark.sql.defaultSizeInBytes` (Long.MaxValue) and a small custom
    * source still forces a shuffle join. The parquet analog is footer
    * row-count/size stats; every serious connector reports these. */
  override def estimateStatistics(): Statistics = {
    val n = math.max(0L, hi - lo)
    new Statistics {
      // two non-null longs per row, UnsafeRow-ish: 8B each + null bitmap
      override def sizeInBytes(): OptionalLong = OptionalLong.of(n * 16L + 16L)
      override def numRows(): OptionalLong = OptionalLong.of(n)
    }
  }

  /** Runtime filtering (`SupportsRuntimeV2Filtering`) — the DSv2 analog of
    * dynamic partition pruning: when this scan feeds a join whose other
    * side carries a selective filter, Spark executes that side first
    * (reusing its broadcast exchange), collects the distinct join keys,
    * and hands them here as an IN predicate *before* this scan plans its
    * splits. We narrow the id range to [min, max+1) — sound, never drops
    * a matching row — and whole splits outside it are never even planned
    * (no task, no read). The join above re-checks exact membership, so
    * range-narrowing (a zone-map, not a hash set) is all a source needs.
    * At 100 TB this is the difference between scanning a fact table and
    * scanning the 0.1 % of it a filtered dimension actually touches. */
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  override def filter(predicates: Array[Predicate]): Unit = {
    val vals = predicates.toSeq.flatMap(inValues)
    if (vals.nonEmpty) {
      lo = math.max(lo, vals.min)
      hi = math.min(hi,
        if (vals.max == Long.MaxValue) Long.MaxValue else vals.max + 1L)
      SeqSource.lastRuntimeFilter.set((lo, hi, planInputPartitions().length))
    }
  }

  /** Extract the candidate id values from a runtime IN/= predicate; other
    * predicate shapes are ignored (filtering is optional, never required
    * for correctness). */
  private def inValues(p: Predicate): Seq[Long] = {
    import org.apache.spark.sql.connector.expressions.{Expression, Literal}
    def isId(e: Expression): Boolean = e match {
      case n: NamedReference => n.fieldNames.toSeq == Seq("id")
      case _ => false
    }
    def longOf(e: Expression): Option[Long] = e match {
      case l: Literal[_] => l.value match {
        case v: java.lang.Long => Some(v.longValue())
        case v: java.lang.Integer => Some(v.longValue())
        case _ => None
      }
      case _ => None
    }
    p.name() match {
      case "IN" if p.children().nonEmpty && isId(p.children()(0)) =>
        val lits = p.children().drop(1).toSeq.map(longOf)
        if (lits.forall(_.isDefined)) lits.flatten else Nil
      case "=" if p.children().length == 2 =>
        (p.children()(0), p.children()(1)) match {
          case (r, l) if isId(r) => longOf(l).toSeq
          case (l, r) if isId(r) => longOf(l).toSeq
          case _ => Nil
        }
      case _ => Nil
    }
  }

  override def description(): String =
    s"graft_seq rows=$rows parts=$parts bounds=[$lo,$hi) " +
      s"pruned=[${required.fieldNames.mkString(",")}]"

  override def toBatch: Batch = this

  /** Storage-partitioned layout (`SupportsReportPartitioning`): when
    * bucketed, the scan reports `KeyGroupedPartitioning([b], buckets)`
    * and every split carries its bucket value (`HasPartitionKey`). Two
    * such sources joined with `b` among the join keys (and
    * `spark.sql.sources.v2.bucketing.enabled=true`) get the
    * storage-partitioned join: Spark aligns equal bucket keys and plans
    * NO exchange on either side — the DSv2 form of the co-located
    * bucket join (what Iceberg does with its bucket transform; the
    * explicit bucket COLUMN here is the portable flavor that needs no
    * FunctionCatalog). At 100 TB this turns the nightly fact-fact join
    * into a shuffle-free zip of bucket pairs. */
  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (buckets > 0)
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(Expressions.identity("b")), buckets)
    else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(parts)

  /** Per-partition ordering (`SupportsReportOrdering`): every split —
    * range or bucket — emits ids ascending, so a sort-merge join on id
    * (bucketed: on (id, b), where b is constant per split, so id order
    * IS (id, b) order) needs no Sort operator either: with the reported
    * partitioning above, the bucketed join is scan → merge, nothing
    * else. */
  override def outputOrdering(): Array[
      org.apache.spark.sql.connector.expressions.SortOrder] =
    Array(Expressions.sort(Expressions.column("id"),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))

  override def planInputPartitions(): Array[InputPartition] =
    if (buckets > 0)
      // one split per bucket, ALL buckets always planned (empty ones
      // included) — the reported partitioning must match the planned
      // splits or the co-partition alignment breaks
      (0 until buckets).map(b =>
        SeqBucketPartition(b, buckets, lo, math.min(rows, hi)): InputPartition)
        .toArray
    else {
      // split the ORIGINAL range, then clip to the pushed bounds — splits
      // entirely outside the bounds are never planned (no task, no read).
      // `_split` ordinals stay those of the ORIGINAL layout, so lineage
      // is stable under pushed filters (like file names under pruning)
      val per = math.max(1L, (rows + parts - 1) / parts)
      (0L until rows by per).zipWithIndex.flatMap { case (st, ord) =>
        val s0 = math.max(st, lo)
        val e0 = math.min(st + per, math.min(rows, hi))
        if (s0 < e0) Some(SeqInputPartition(s0, e0, ord): InputPartition) else None
      }.toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)

  /** Streaming face of the same relation — a custom `MicroBatchStream`:
    * offsets are row positions, each trigger admits the next `batchRows`
    * chunk (latestOffset advances until the relation is exhausted, so
    * `processAllAvailable` drives a REAL multi-batch run), and
    * `planInputPartitions(start, end)` splits each admitted range — the
    * offset-tracked, replayable contract every streaming connector
    * (Kafka, queue, CDC feed) implements. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SeqMicroBatchStream(rows, parts,
      if (batchRows > 0) batchRows else math.max(1L, rows / 4), required)
}

case class SeqOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

class SeqMicroBatchStream(rows: Long, parts: Int, batchRows: Long,
    required: StructType) extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  private var available = 0L
  // set by prepareForTriggerAvailableNow: the end-of-data fixed at query
  // start — Trigger.AvailableNow drains up to here in rate-limited
  // batches, then the query terminates on its own
  private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = SeqOffset(0L)

  override def latestOffset(): Offset = {
    available = math.min(rows, available + batchRows)
    SeqOffset(available)
  }

  /** Trigger.AvailableNow contract (`SupportsTriggerAvailableNow` —
    * admission control + a fixed end): the engine asks the source to pin
    * "all data as of now", then drives rate-limited batches
    * (`latestOffset(start, limit)`) until `reportLatestOffset` is
    * reached and shuts the query down — the run-to-completion batch mode
    * every backfill pipeline wants from a streaming source. */
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(rows)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cap = availableNowTarget.getOrElse(rows)
    val step = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => batchRows
    }
    available = math.min(cap, start.asInstanceOf[SeqOffset].pos + step)
    SeqOffset(available)
  }

  override def reportLatestOffset(): Offset =
    SeqOffset(availableNowTarget.getOrElse(available))

  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[SeqOffset].pos
    val e0 = end.asInstanceOf[SeqOffset].pos
    val per = math.max(1L, (e0 - s0 + parts - 1) / math.max(1, parts))
    (s0 until e0 by per).map(st =>
      SeqInputPartition(st, math.min(st + per, e0)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class SeqInputPartition(start: Long, end: Long, ordinal: Int = 0)
    extends InputPartition

/** One bucket's split: ids in [lo, hi) with id % buckets == bucket. The
  * partition key is the bucket value — what the SPJ alignment groups on. */
case class SeqBucketPartition(bucket: Int, buckets: Int, lo: Long, hi: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket.toLong)
}

class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {

  // one writer per pruned column — a column the query never asked for
  // is never computed, which is what pushed-down pruning means; `_split`
  // (the metadata column) is a per-partition constant
  private def writers(buckets: Int, ordinal: Int): Array[Long => Long] =
    required.fieldNames.map {
      case "id" => (id: Long) => id
      case "v" => (id: Long) => SeqSource.valueOf(id)
      case "b" => (id: Long) => id % math.max(1, buckets)
      case "_split" => (_: Long) => ordinal.toLong
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: SeqInputPartition =>
        val ws = writers(0, p.ordinal)
        new PartitionReader[InternalRow] {
          private var cur = p.start - 1
          override def next(): Boolean = { cur += 1; cur < p.end }
          override def get(): InternalRow =
            InternalRow.fromSeq(ws.map(w => w(cur)).toIndexedSeq)
          override def close(): Unit = ()
        }
      case p: SeqBucketPartition =>
        val ws = writers(p.buckets, p.bucket)
        // first id >= lo in this bucket's residue class, then stride by
        // the bucket count — contiguous in key space, zero wasted reads
        val first = p.lo + ((p.bucket - p.lo % p.buckets + p.buckets) % p.buckets)
        new PartitionReader[InternalRow] {
          private var cur = first - p.buckets
          override def next(): Boolean = { cur += p.buckets; cur < p.hi }
          override def get(): InternalRow =
            InternalRow.fromSeq(ws.map(w => w(cur)).toIndexedSeq)
          override def close(): Unit = ()
        }
    }
}
