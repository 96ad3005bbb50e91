package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownLimit,
  SupportsPushDownOffset, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 connector with REAL pushdown — the source-side
  * architecture piece: a deterministic synthetic-sequence table
  * (`id, bucket, vq, tag` derived from integer formulas, so the DuckDB
  * oracle replicates it with generate_series) whose ScanBuilder
  * implements `SupportsPushDownFilters` (range/equality predicates on
  * `id` NARROW the generated range inside the source — the reader never
  * materializes a filtered-out row, the same contract JDBC pushdown and
  * Delta file skipping ride) and `SupportsPushDownRequiredColumns`
  * (pruned columns are never computed).
  *
  * At 100 TB the mechanism is the point, not the generator: a query
  * over a pushdown-capable source pays for the rows and columns it
  * needs, and `.explain` shows exactly what reached the source
  * (PushedFilters / ReadSchema — PlanSpec-locked). Residual predicates
  * (on derived columns like `vq`) correctly STAY in Spark: pushFilters
  * only accepts what the source can honor.
  *
  * Options: `rows` (sequence length, ids 0..rows-1), `slices` (input
  * partitions, default 8). Registered under the short name `graftseq`
  * (META-INF/services) and usable by class name.
  */
class GraftSeqSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graftseq"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSeqSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftSeqTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object GraftSeqSource {
  val Schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("bucket", LongType, nullable = false)
    .add("vq", LongType, nullable = false)
    .add("tag", StringType, nullable = false)

  /** The row formulas — shared by the reader and the oracle text. */
  def bucketOf(id: Long): Long = id % 64
  def vqOf(id: Long): Long = (id * 2654435761L) % 100000
  def tagOf(id: Long): String = "t" + (id % 7)
}

class GraftSeqTable(rows: Long, slices: Int) extends Table
    with SupportsRead {
  override def name(): String = s"graftseq($rows)"
  override def schema(): StructType = GraftSeqSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new GraftSeqScanBuilder(rows, slices)
}

class GraftSeqScanBuilder(rows: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownOffset {

  private var lo = 0L          // inclusive
  private var hi = rows        // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = GraftSeqSource.Schema

  // LIMIT/OFFSET compose with the filter-narrowed range: the sequence
  // is generated in id order, so OFFSET advances lo and LIMIT caps hi —
  // the source never materializes a skipped or post-limit row. Spark
  // only offers these pushdowns when the plan shape is safe (no
  // intervening residual filter), so accepting them is exact.
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    true // fully handled: the source emits exactly the limited range
  }

  override def pushOffset(offset: Int): Boolean = {
    lo = math.min(hi, lo + offset)
    true
  }

  /** Accept range/equality predicates on `id` — they narrow [lo, hi)
    * INSIDE the source; everything else is a residual for Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftSeqScan(lo, hi, slices, required)
}

class GraftSeqScan(lo: Long, hi: Long, slices: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftSeqScan(range=[$lo, $hi), cols=${required.fieldNames.mkString(",")})"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    val per = math.max(1L, (n + slices - 1) / slices)
    (0 until slices).iterator
      .map(i => (lo + i * per, math.min(lo + (i + 1) * per, hi)))
      .filter { case (a, b) => a < b }
      .map { case (a, b) => GraftSeqPartition(a, b): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSeqReaderFactory(required.fieldNames)
}

case class GraftSeqPartition(from: Long, until: Long)
  extends InputPartition

class GraftSeqReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftSeqPartition]
    new PartitionReader[InternalRow] {
      private var id = gp.from - 1
      override def next(): Boolean = { id += 1; id < gp.until }
      override def get(): InternalRow = {
        val vals = cols.map {
          case "id"     => java.lang.Long.valueOf(id)
          case "bucket" => java.lang.Long.valueOf(GraftSeqSource.bucketOf(id))
          case "vq"     => java.lang.Long.valueOf(GraftSeqSource.vqOf(id))
          case "tag"    => UTF8String.fromString(GraftSeqSource.tagOf(id))
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
