package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 connector for the reference's duels TSV layout
  * (`challenger \t challenged \t score \t duration`, no header —
  * emulator.py:8,176-181): the custom-source extension surface
  * (SURVEY §4.3) exercised end-to-end.
  *
  * What makes it scale-shaped rather than a toy:
  *
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): the reader
  *    parses ONLY the union of projected and filter-referenced fields of
  *    each line — a projection of one unfiltered column runs one
  *    `toLong` per row, not four — and emits just the pruned schema.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): =, <, <=, >, >=
  *    comparisons against the long columns are evaluated inside the
  *    reader, BEFORE a row object exists; Catalyst is told they are
  *    fully handled (pushedFilters), so no post-scan Filter remains.
  *  - **One input partition per file**: a directory of shards
  *    parallelizes exactly like any file source; a single file is one
  *    task (the reference fixture is 518 rows — splitting within a file
  *    would be the standard byte-range extension and changes nothing
  *    structurally).
  *
  * Usage: `spark.read.format(classOf[TsvTableProvider].getName)
  * .load(dir)`; [[graft.ops.Duels.readOriginV2]] wires it to the origin
  * fixture, and SourcesSpec proves rows ≡ the csv reader, the pruned
  * read schema, and the absence of a post-scan Filter for pushed
  * predicates. */
class TsvTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TsvSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TsvTable(properties.get("path"))
  // The table's layout is fixed by the file format; a caller-supplied
  // schema (`.schema(...)`) would be silently ignored by getTable, so
  // honestly refuse external metadata and let Catalyst error instead.
  override def supportsExternalMetadata(): Boolean = false
}

object TsvSource {
  val schema: StructType = StructType(Seq(
    StructField("challenger", LongType), StructField("challenged", LongType),
    StructField("score", LongType), StructField("duration", LongType)))

  /** Column index in the physical line for each schema field. */
  val colIndex: Map[String, Int] =
    schema.fields.map(_.name).zipWithIndex.toMap

  /** Files under `path` (or `path` itself), sorted for determinism. */
  def listFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.isFile).map(_.getAbsolutePath).sorted.toSeq
    else Seq(f.getAbsolutePath)
  }

  /** Compile a pushed filter into a predicate over the parsed line's
    * four raw columns. Only called for filters [[pushable]] accepted. */
  def compile(f: Filter): Array[Long] => Boolean = f match {
    case EqualTo(a, v: Long)            => r => r(colIndex(a)) == v
    case GreaterThan(a, v: Long)        => r => r(colIndex(a)) > v
    case GreaterThanOrEqual(a, v: Long) => r => r(colIndex(a)) >= v
    case LessThan(a, v: Long)           => r => r(colIndex(a)) < v
    case LessThanOrEqual(a, v: Long)    => r => r(colIndex(a)) <= v
    case IsNotNull(_)                   => _ => true // parsed longs are never null
    case _ => _ => true
  }

  def pushable(f: Filter): Boolean = f match {
    case EqualTo(a, _: Long) => colIndex.contains(a)
    case GreaterThan(a, _: Long) => colIndex.contains(a)
    case GreaterThanOrEqual(a, _: Long) => colIndex.contains(a)
    case LessThan(a, _: Long) => colIndex.contains(a)
    case LessThanOrEqual(a, _: Long) => colIndex.contains(a)
    case IsNotNull(a) => colIndex.contains(a)
    case _ => false
  }
}

class TsvTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-tsv:$path"
  override def schema(): StructType = TsvSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(path)
}

class TsvScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = TsvSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accept, reject) = filters.partition(TsvSource.pushable)
    pushed = accept
    reject // residual filters Catalyst must still evaluate
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new TsvScan(path, required, pushed)
}

case class TsvFilePartition(file: String) extends InputPartition

class TsvScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftTsv path=$path, ReadSchema=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters=[${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    TsvSource.listFiles(path).map(TsvFilePartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new TsvReaderFactory(required.fieldNames, pushed)
}

class TsvReaderFactory(requiredCols: Array[String], pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TsvFilePartition].file
    val idxs = requiredCols.map(TsvSource.colIndex)
    val preds = pushed.map(TsvSource.compile)
    // Parse only the union of projected and filter-referenced columns:
    // the other slots of `raw` stay 0 and are never read.
    val needed: Array[Int] =
      (idxs ++ pushed.flatMap(_.references.map(TsvSource.colIndex))).distinct.sorted
    new PartitionReader[InternalRow] {
      private val lines = scala.io.Source.fromFile(file)
      private val it = lines.getLines().flatMap { line =>
        val parts = line.split("\t", -1)
        val raw = new Array[Long](4)
        needed.foreach(i => raw(i) = parts(i).trim.toLong)
        // pushed predicates run HERE, before any row object exists
        if (preds.forall(_(raw))) Some(InternalRow.fromSeq(idxs.map(raw(_)).toSeq))
        else None
      }
      // PartitionReader contract: get() must return the SAME row until
      // next() advances — buffer the current row rather than draining
      // the iterator from get()
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (it.hasNext) { current = it.next(); true } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = lines.close()
    }
  }
}
