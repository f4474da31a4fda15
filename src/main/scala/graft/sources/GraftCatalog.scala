package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.{AlwaysTrue, And, Not, Or, Predicate}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom catalog plugin (`TableCatalog` + `SupportsNamespaces`) — the
  * catalog tier of the DSv2 ladder: SQL DDL/DML runs against OUR
  * metadata and storage with no Hive/session-catalog involvement:
  *
  *   spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
  *   CREATE TABLE graft_cat.db.t (id BIGINT, v BIGINT)
  *   INSERT INTO graft_cat.db.t SELECT ...
  *   DELETE FROM graft_cat.db.t WHERE id >= 500   -- pushed to the table
  *   SELECT ... FROM graft_cat.db.t
  *
  * Tables are driver-memory row stores (the standard demo/test backing —
  * a real deployment swaps the store for files/object storage; the
  * catalog/analysis surface is identical): reads ship the rows inside the
  * InputPartition, writes collect per-task rows into commit messages and
  * publish atomically on driver commit, and DELETE evaluates the pushed
  * predicate tree (=, <>, <, <=, >, >=, AND, OR, NOT on long columns)
  * row by row — the `SupportsDeleteV2` metadata-delete contract.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog {

  private var catalogName: String = "graft_cat"
  private val tables = new ConcurrentHashMap[Identifier, MemTable]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  /** v2 FunctionCatalog: SQL resolves `graft_cat.db.mulmod(x)` through
    * the catalog to a connector-defined `ScalarFunction` — how a storage
    * engine exposes ITS functions (bucket transforms, partition hashes)
    * to Spark SQL without any session-level registration. `mulmod` is the
    * same multiplicative hash the generated relation uses for `v`, so
    * `mulmod(id) = v` — oracle-checkable by construction. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "mulmod"))

  override def loadFunction(ident: Identifier):
      org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name() match {
      case "mulmod" => MulModFunction
      case _ =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
    }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    tables.keySet().asScala.filter(_.namespace().sameElements(namespace)).toArray

  override def loadTable(ident: Identifier): Table = {
    val t = tables.get(ident)
    if (t == null) throw new NoSuchTableException(ident)
    t
  }

  /** Catalog time travel (`VERSION AS OF v`): every committed write bumps
    * the table version and archives the pre-image, so any historical
    * version is a consistent frozen read — the catalog-level twin of the
    * streaming sink's epoch-manifest snapshots (ext51). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = tables.get(ident)
    if (t == null) throw new NoSuchTableException(ident)
    t.versionAt(version.toLong)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val t = new MemTable(ident.toString, schema)
    if (tables.putIfAbsent(ident, t) != null)
      throw new TableAlreadyExistsException(ident)
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft_cat tables are not alterable")

  override def dropTable(ident: Identifier): Boolean = tables.remove(ident) != null

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val t = tables.remove(oldIdent)
    if (t == null) throw new NoSuchTableException(oldIdent)
    if (tables.putIfAbsent(newIdent, t) != null) {
      tables.put(oldIdent, t)
      throw new TableAlreadyExistsException(newIdent)
    }
  }

  // single-level namespaces, implicitly existing once referenced
  override def listNamespaces(): Array[Array[String]] =
    tables.keySet().asScala.map(_.namespace().toSeq).toSet
      .map((ns: Seq[String]) => ns.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    new util.HashMap[String, String]()

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = ()

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = ()

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val doomed = tables.keySet().asScala.filter(_.namespace().sameElements(namespace))
    // contract: `false` is reserved for "namespace did not exist";
    // a non-empty namespace without CASCADE is an error, not a false
    if (doomed.nonEmpty && !cascade)
      throw new NonEmptyNamespaceException(namespace,
        s"${doomed.size} table(s) exist; use DROP NAMESPACE ... CASCADE", None)
    doomed.foreach(tables.remove)
    true
  }

  override def namespaceExists(namespace: Array[String]): Boolean = true
}

/** Driver-memory table: append/truncate/delete-where, rows replayed to
  * executors through the planned split. */
class MemTable(tableName: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite with SupportsDeleteV2
    with SupportsRowLevelOperations {

  // rows are UnsafeRow copies (self-contained buffers, serializable)
  private val rows = ArrayBuffer.empty[InternalRow]
  // version v = state after the v-th committed mutation; 0 = creation
  // (named `ver` — Table itself has a default version() method)
  private var ver = 0L
  private val history =
    scala.collection.mutable.Map[Long, Array[InternalRow]](0L -> Array.empty)

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  private[sources] def snapshot(): Array[InternalRow] =
    synchronized { rows.toArray }

  /** Every committed mutation archives its post-image under a new
    * version — the time-travel log. */
  private def bumpVersion(): Unit = {
    ver += 1
    history(ver) = rows.toArray
  }

  private[sources] def currentVersion: Long = synchronized { ver }

  private[sources] def versionAt(v: Long): Table = synchronized {
    val snap = history.getOrElse(v,
      throw new IllegalArgumentException(
        s"$tableName has no version $v (latest: $ver)"))
    new MemSnapshotTable(s"$tableName@v$v", tableSchema, snap)
  }

  /** Apply one mutation atomically and archive its post-image. */
  private[sources] def mutate(f: ArrayBuffer[InternalRow] => Unit): Unit =
    synchronized { f(rows); bumpVersion() }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    MemTable.scanBuilder(tableName, tableSchema, () => snapshot())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              pwInfo: PhysicalWriteInfo): DataWriterFactory =
            MemTable.collectingWriterFactory(tableSchema)
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            // atomic publish on the driver: nothing visible until here,
            // and truncate+load is ONE version step
            mutate { b =>
              if (truncateFirst) b.clear()
              b ++= MemTable.rowsOf(messages)
            }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }

  /** Row-level operations (`SupportsRowLevelOperations`, group-based):
    * UPDATE / MERGE INTO rewrite "groups" of rows — Spark scans the
    * affected groups through the operation's scan, computes each group's
    * REPLACEMENT rows (updated ∪ untouched, or merged ∪ inserted), and
    * hands them to the operation's write. This table is one group (no
    * partitions), so the commit atomically replaces the whole content —
    * the copy-on-write strategy every file-format v2 source uses at
    * file/partition granularity, here at table granularity. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def description(): String =
        s"graft_cat group-based ${info.command()} on $tableName"
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        MemTable.scanBuilder(tableName, tableSchema, () => snapshot())
      override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder =
        new WriteBuilder {
          override def build(): Write = new Write {
            override def toBatch: BatchWrite = new BatchWrite {
              override def createBatchWriterFactory(
                  pinfo: PhysicalWriteInfo): DataWriterFactory =
                MemTable.collectingWriterFactory(tableSchema)
              override def commit(messages: Array[WriterCommitMessage]): Unit =
                // the scanned group = the whole table → the replacement
                // set IS the new table content
                mutate { b =>
                  b.clear()
                  b ++= MemTable.rowsOf(messages)
                }
              override def abort(messages: Array[WriterCommitMessage]): Unit = ()
            }
          }
        }
    }

  /** Pushed metadata delete: evaluate the predicate tree over the stored
    * rows. Only claim it (canDeleteWhere) when every leaf is a supported
    * comparison on a long column — anything else must fail analysis, not
    * silently delete the wrong rows. */
  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    predicates.forall(p => MemTable.compile(p, tableSchema).isDefined)

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    val fns = predicates.flatMap(p => MemTable.compile(p, tableSchema))
    require(fns.length == predicates.length, "unsupported delete predicate")
    // predicates are implicitly AND-ed; keep rows where any is false
    mutate { b =>
      val keep = b.filterNot(r => fns.forall(f => f(r)))
      b.clear()
      b ++= keep
    }
  }

  override def truncateTable(): Boolean = { mutate(_.clear()); true }
}

case class MemRowsPartition(rows: Array[InternalRow]) extends InputPartition
case class MemRowsCommit(rows: Array[InternalRow]) extends WriterCommitMessage

/** `(x * 2654435761) % 1000` as a connector-defined scalar function: the
  * `invoke(Long)` magic method gives Spark the direct (codegen-friendly)
  * call path; `produceResult` is the interpreted fallback the contract
  * requires. */
object MulModFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {

  override def name(): String = "mulmod"
  override def description(): String =
    "mulmod(x BIGINT): (x * 2654435761) % 1000"

  override def bind(inputType: StructType):
      org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == LongType,
      s"mulmod takes one BIGINT argument, got $inputType")
    Bound
  }

  object Bound extends org.apache.spark.sql.connector.catalog.functions
      .ScalarFunction[java.lang.Long] {
    override def name(): String = "mulmod"
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(LongType)
    override def resultType(): org.apache.spark.sql.types.DataType = LongType
    override def isResultNullable: Boolean = false
    def invoke(x: Long): Long = (x * 2654435761L) % 1000L
    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(input.getLong(0))
  }
}

/** A frozen historical version of a [[MemTable]] — read-only by
  * construction (no SupportsWrite, no delete). */
class MemSnapshotTable(snapName: String, snapSchema: StructType,
    snap: Array[InternalRow]) extends Table with SupportsRead {
  override def name(): String = snapName
  override def schema(): StructType = snapSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    MemTable.scanBuilder(snapName, snapSchema, () => snap)
}

object MemTable {

  /** Task-side writer collecting rows into the commit message — shared by
    * the append write and the row-level replacement write. ReplaceData
    * PREPENDS an operation-marker column (`__row_operation`) to the
    * physical rows without surfacing it in `LogicalWriteInfo.schema()`,
    * so the table columns are taken from the TAIL of each incoming row
    * (offset = row arity − table arity, decided on the first row). */
  private[sources] def collectingWriterFactory(
      tableSchema: StructType): DataWriterFactory =
    (_: Int, _: Long) => new DataWriter[InternalRow] {
      private var proj: UnsafeProjection = _
      private val buf = ArrayBuffer.empty[InternalRow]
      override def write(row: InternalRow): Unit = {
        if (proj == null) {
          val offset = row.numFields - tableSchema.length
          require(offset >= 0,
            s"write row has ${row.numFields} fields for ${tableSchema.length} columns")
          val refs = tableSchema.fields.zipWithIndex.map { case (f, i) =>
            org.apache.spark.sql.catalyst.expressions
              .BoundReference(offset + i, f.dataType, f.nullable)
              : org.apache.spark.sql.catalyst.expressions.Expression
          }
          proj = UnsafeProjection.create(refs.toSeq)
        }
        buf += proj(row).copy() // detach from the reused buffer
      }
      override def commit(): WriterCommitMessage = MemRowsCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }

  private[sources] def rowsOf(messages: Array[WriterCommitMessage]): Seq[InternalRow] =
    messages.toSeq.flatMap {
      case MemRowsCommit(rs) => rs.toSeq
      case _ => Nil
    }

  /** Scan over a row snapshot, shared by the live table and its frozen
    * versions. */
  private[sources] def scanBuilder(tableName: String, tableSchema: StructType,
      rowsNow: () => Array[InternalRow]): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = this
        override def description(): String = s"graft_cat mem table $tableName"
        override def planInputPartitions(): Array[InputPartition] =
          Array(MemRowsPartition(rowsNow()))
        override def createReaderFactory(): PartitionReaderFactory =
          (partition: InputPartition) => {
            val data = partition.asInstanceOf[MemRowsPartition].rows
            new PartitionReader[InternalRow] {
              private var i = -1
              override def next(): Boolean = { i += 1; i < data.length }
              override def get(): InternalRow = data(i)
              override def close(): Unit = ()
            }
          }
      }
    }

  /** Compile a v2 Predicate to a row filter; None = unsupported shape.
    * The returned function answers "predicate IS TRUE" — the DELETE
    * semantics — but the evaluation inside is THREE-VALUED: a comparison
    * on a NULL column is UNKNOWN (not false), so `NOT (x = 1)` over a
    * NULL x stays not-true and the row is KEPT, exactly as SQL requires.
    * (Two-valued compilation here silently deleted NULL-keyed rows under
    * NOT — the classic 3VL trap.) */
  private[sources] def compile(p: Predicate,
      schema: StructType): Option[InternalRow => Boolean] =
    compile3(p, schema).map(f => (row: InternalRow) => f(row).contains(true))

  /** Kleene-logic evaluator: Some(true/false) = known, None = UNKNOWN. */
  private def compile3(p: Predicate,
      schema: StructType): Option[InternalRow => Option[Boolean]] = {
    def ordinalOf(e: org.apache.spark.sql.connector.expressions.Expression):
        Option[Int] = e match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        // unknown / case-mismatched field => refuse (None), never throw:
        // canDeleteWhere's contract is a boolean answer
        Some(schema.fields.indexWhere(_.name == f.fieldNames.head))
          .filter(_ >= 0)
          .filter(i => schema.fields(i).dataType == LongType)
      case _ => None
    }
    def longOf(e: org.apache.spark.sql.connector.expressions.Expression):
        Option[Long] = e match {
      case l: Literal[_] => l.value match {
        case v: java.lang.Long => Some(v.longValue())
        case v: java.lang.Integer => Some(v.longValue())
        case _ => None
      }
      case _ => None
    }
    def cmp(children: Array[org.apache.spark.sql.connector.expressions.Expression],
        f: (Long, Long) => Boolean): Option[InternalRow => Option[Boolean]] =
      (ordinalOf(children(0)), longOf(children(1))) match {
        case (Some(i), Some(v)) =>
          Some(r => if (r.isNullAt(i)) None else Some(f(r.getLong(i), v)))
        case _ => (longOf(children(0)), ordinalOf(children(1))) match {
          case (Some(v), Some(i)) =>
            Some(r => if (r.isNullAt(i)) None else Some(f(v, r.getLong(i))))
          case _ => None
        }
      }
    p match {
      case _: AlwaysTrue => Some(_ => Some(true))
      case a: And =>
        for (l <- compile3(a.left(), schema); r <- compile3(a.right(), schema))
          yield (row: InternalRow) => (l(row), r(row)) match {
            case (Some(false), _) | (_, Some(false)) => Some(false)
            case (Some(true), Some(true)) => Some(true)
            case _ => None
          }
      case o: Or =>
        for (l <- compile3(o.left(), schema); r <- compile3(o.right(), schema))
          yield (row: InternalRow) => (l(row), r(row)) match {
            case (Some(true), _) | (_, Some(true)) => Some(true)
            case (Some(false), Some(false)) => Some(false)
            case _ => None
          }
      case n: Not =>
        compile3(n.child(), schema).map(f => (row: InternalRow) => f(row).map(!_))
      case _ if p.children().length == 2 =>
        val c = p.children()
        p.name() match {
          case "=" => cmp(c, _ == _)
          case "<>" => cmp(c, _ != _)
          case "<" => cmp(c, _ < _)
          case "<=" => cmp(c, _ <= _)
          case ">" => cmp(c, _ > _)
          case ">=" => cmp(c, _ >= _)
          case _ => None
        }
      case _ => None
    }
  }
}
