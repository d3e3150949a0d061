package graft.sources

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A minimal DataSource V2 catalog whose tables support GROUP-BASED
  * row-level operations — the connector contract `MERGE INTO` /
  * `UPDATE` / `DELETE` compile against
  * (`SupportsRowLevelOperations` → `RowLevelOperation` → scan +
  * replacement write). This is the test double that lets the REAL SQL
  * surface run end-to-end with zero external dependencies: Spark's
  * analyzer rewrites the MERGE into a `ReplaceData` plan (`MergeRows`
  * over a full-group scan) exactly as it would against a
  * copy-on-write lakehouse table (Delta/Iceberg); only the storage
  * behind the scan/write is an in-JVM row store. The merge join,
  * matched/not-matched routing, and the commit protocol
  * (per-task buffered `DataWriter`s → `WriterCommitMessage`s →
  * driver-side atomic replace) are all Spark's own machinery —
  * `q_sql_merge` hash-checks the result against the composed
  * semi/anti-join twin (`cdc_scd2`), the q_sql_* identical-result
  * pattern.
  *
  * Rows are stored as catalyst values (`Array[Any]`), one deep-copied
  * array per row, keyed by `namespace.table`. Single-JVM by design —
  * the local[n] test posture; at 100 TB the same plans run against a
  * real table format, which is exactly the point of exercising the
  * connector API rather than a private rewrite.
  */
object MemTableStore {
  private val tables = TrieMap[String, (StructType, Vector[Array[Any]])]()

  def create(key: String, schema: StructType): Unit =
    tables.put(key, (schema, Vector.empty))

  def drop(key: String): Boolean = tables.remove(key).isDefined

  def exists(key: String): Boolean = tables.contains(key)

  def schemaOf(key: String): StructType = tables(key)._1

  def rowsOf(key: String): Vector[Array[Any]] = tables(key)._2

  def keys: Seq[String] = tables.keys.toSeq

  def append(key: String, rows: Array[Array[Any]]): Unit = synchronized {
    val (sch, cur) = tables(key)
    tables.put(key, (sch, cur ++ rows))
  }

  def replace(key: String, rows: Array[Array[Any]]): Unit = synchronized {
    val (sch, _) = tables(key)
    tables.put(key, (sch, rows.toVector))
  }
}

class MemRowLevelCatalog extends TableCatalog {
  private var catName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val pre = namespace.mkString(".") + "."
    MemTableStore.keys.filter(_.startsWith(pre))
      .map(k => Identifier.of(namespace, k.stripPrefix(pre))).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val k = key(ident)
    if (!MemTableStore.exists(k)) throw new NoSuchTableException(ident)
    new MemTable(k)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    MemTableStore.create(key(ident), schema)
    new MemTable(key(ident))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("alterTable")

  override def dropTable(ident: Identifier): Boolean =
    MemTableStore.drop(key(ident))

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("renameTable")
}

class MemTable(key: String) extends Table
    with SupportsRead with SupportsWrite with SupportsRowLevelOperations
    with SupportsMetadataColumns {
  override def name(): String = key
  override def schema(): StructType = MemTableStore.schemaOf(key)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE).asJava

  // One metadata column marking the storage group a row belongs to
  // (a single group here). Row-level operations REQUIRE it (below):
  // per ReplaceDataExec.writingTask, only a write with a metadata
  // projection takes the projecting path that strips MergeRows'
  // __row_operation column and restores table column order — the
  // same contract every group-based lakehouse connector relies on.
  override def metadataColumns(): Array[MetadataColumn] =
    Array(MemTable.ShardCol)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(key)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(key, info.schema(), replace = false)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new MemRowLevelOperation(key, info.command())
}

object MemTable {
  val ShardName = "_shard"
  val ShardCol: MetadataColumn = new MetadataColumn {
    override def name(): String = ShardName
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.IntegerType
    override def isNullable(): Boolean = false
  }
}

/** Group-based operation: the scan reads every group (the whole
  * table — no group pruning is reported), so the replacement write
  * atomically swaps the full contents on commit, the copy-on-write
  * contract `ReplaceData` expects.
  */
class MemRowLevelOperation(key: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(key)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(key, info.schema(), replace = true)
  override def requiredMetadataAttributes():
      Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      MemTable.ShardName))
}

case class MemPartition(rows: Array[Array[Any]], srcIdx: Array[Int])
    extends InputPartition

class MemScanBuilder(key: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = MemTableStore.schemaOf(key)
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new MemScan(key, required)
}

/** Serves exactly the pruned schema; data columns come from the
  * stored row by table ordinal, the `_shard` metadata column is the
  * constant single group (index -1).
  */
class MemScan(key: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val table = MemTableStore.schemaOf(key)
    val srcIdx = required.fields.map { f =>
      if (f.name == MemTable.ShardName) -1 else table.fieldIndex(f.name)
    }
    Array(MemPartition(MemTableStore.rowsOf(key).toArray, srcIdx))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[MemPartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < p.rows.length }
        override def get(): InternalRow = new GenericInternalRow(
          p.srcIdx.map(j => if (j < 0) Int.box(0) else p.rows(i)(j)))
        override def close(): Unit = ()
      }
    }
}

class MemWriteBuilder(key: String, querySchema: StructType, replace: Boolean)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(key, querySchema, replace)
  }
}

case class MemCommit(rows: Array[Array[Any]]) extends WriterCommitMessage

class MemBatchWrite(key: String, querySchema: StructType, replace: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    // Incoming rows follow the QUERY schema (LogicalWriteInfo), which
    // for a row-level-operation replacement write can carry extra
    // metadata columns ahead of the data columns — never assume the
    // table layout. Project to table columns by NAME.
    val table = MemTableStore.schemaOf(key)
    val srcIdx = table.map { f =>
      val i = querySchema.fieldIndex(f.name)
      (i, querySchema(i).dataType)
    }.toArray
    MemWriterFactory(srcIdx)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.flatMap(_.asInstanceOf[MemCommit].rows)
    if (replace) MemTableStore.replace(key, rows)
    else MemTableStore.append(key, rows)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class MemWriterFactory(srcIdx: Array[(Int, org.apache.spark.sql.types.DataType)])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer[Array[Any]]()
      override def write(row: InternalRow): Unit = {
        buf += srcIdx.map { case (i, dt) =>
          if (row.isNullAt(i)) null
          else row.get(i, dt) match {
            // the incoming row may be a reused buffer — deep-copy
            // buffer-backed values before retaining them
            case u: UTF8String => u.copy()
            case v => v
          }
        }
      }
      override def commit(): WriterCommitMessage = MemCommit(buf.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
