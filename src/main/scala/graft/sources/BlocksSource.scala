package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSourceV2 TABLE PROVIDER for a deterministic synthetic
  * block chain — the reference's block feed re-expressed as a
  * first-class Spark connector rather than a file read
  * (SURVEY §2's O1 source tier, connector form). The point at 100 TB
  * is not the generator; it is that the connector implements the two
  * contracts that keep a scan cheap, and the spec PROVES both:
  *
  *  - **filter pushdown** ([[SupportsPushDownFilters]]): height
  *    range/equality predicates are consumed by the source — whole
  *    input partitions whose height range cannot match are never
  *    planned (the `partitions.size` assertion), and surviving
  *    partitions narrow their generation loop to the pushed bounds.
  *    Non-height filters stay residual (returned back to Spark) — the
  *    honest split every real connector must make;
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *    reader materializes ONLY the pruned schema; a projection of two
  *    columns never pays for the miner string.
  *
  * Rows are a pure formula of the height (`ts = genesis + 12·h`,
  * `n_tx = 1 + (h·7919) mod 50`, `fee_cents = (h·104729) mod 100000`,
  * `miner = "m" ++ (h mod 97)`), which is what lets a query over this
  * CONNECTOR sit under a DuckDB oracle (q234 rebuilds the same rows
  * from range()) — connector plumbing and query semantics are checked
  * end-to-end, not mocked.
  *
  * Options: `blocks` (total height count, default 10000), `shards`
  * (planned partitions before pruning, default 8).
  */
class BlocksSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlocksSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BlocksTable(
      Option(properties.get("blocks")).map(_.toLong).getOrElse(10000L),
      Option(properties.get("shards")).map(_.toInt).getOrElse(8))
}

object BlocksSource {
  val schema: StructType = StructType(Seq(
    StructField("height", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("n_tx", LongType, nullable = false),
    StructField("fee_cents", LongType, nullable = false),
    StructField("miner", StringType, nullable = false)))

  val GENESIS = 1600000000L

  def nTx(h: Long): Long = 1L + (h * 7919L) % 50L
  def feeCents(h: Long): Long = (h * 104729L) % 100000L
  def miner(h: Long): String = "m" + (h % 97L)
}

private class BlocksTable(blocks: Long, shards: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_blocks($blocks)"
  override def schema(): StructType = BlocksSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new BlocksScanBuilder(blocks, shards,
    Option(options.get("perTrigger")).map(_.toLong).getOrElse(1000L))
}

private class BlocksScanBuilder(blocks: Long, shards: Int,
                                perTrigger: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L            // inclusive height bound
  private var hi = blocks        // exclusive height bound
  private var pushed = Array.empty[Filter]
  private var required: StructType = BlocksSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case GreaterThan("height", _: Long) => true
      case GreaterThanOrEqual("height", _: Long) => true
      case LessThan("height", _: Long) => true
      case LessThanOrEqual("height", _: Long) => true
      case EqualTo("height", _: Long) => true
      case _ => false
    }
    handled.foreach {
      case GreaterThan("height", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("height", v: Long) => lo = math.max(lo, v)
      case LessThan("height", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("height", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("height", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = handled
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new BlocksScan(blocks, shards, lo, hi,
    required, perTrigger)
}

private case class BlocksPartition(lo: Long, hi: Long)
    extends InputPartition

private class BlocksScan(blocks: Long, shards: Int, lo: Long, hi: Long,
                         required: StructType, perTrigger: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** STREAMING read path: the block feed as a rate-limited
    * micro-batch source (the reference's O1 source + O2 micro-batch
    * boundary in connector form). Offsets are plain heights; each
    * trigger admits `perTrigger` more blocks ([[SupportsAdmissionControl]]
    * — without it a bounded source drains in ONE batch and the
    * boundary semantics go untested). Exactly-once coverage across
    * batches and checkpoint-restart behavior are spec-pinned. */
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new BlocksMicroBatchStream(blocks, shards, required, perTrigger)

  /** Shards cover [0, blocks); a shard is PLANNED only if its height
    * range intersects the pushed [lo, hi) — partition-level pruning,
    * observable as `partitions.size` in the physical plan. */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (blocks + shards - 1) / shards)
    (0 until shards).iterator
      .map(i => BlocksPartition(math.max(i * per, lo),
        math.min((i + 1) * per, math.min(hi, blocks))))
      .filter(p => p.lo < p.hi)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BlocksReaderFactory(required)
}

/** Height-watermark offset: "how many blocks have been admitted". */
private case class BlocksOffset(height: Long) extends Offset {
  override def json(): String = height.toString
}

private class BlocksMicroBatchStream(blocks: Long, shards: Int,
                                     required: StructType,
                                     perTrigger: Long)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = BlocksOffset(0L)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(perTrigger)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[BlocksOffset].height
    val step = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        r.maxRows()
      case _ => perTrigger
    }
    BlocksOffset(math.min(blocks, s + step))
  }

  // plain MicroBatchStream latestOffset: unreached when admission
  // control is in play, but the contract requires it total
  override def latestOffset(): Offset = BlocksOffset(blocks)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[BlocksOffset].height
    val hi = end.asInstanceOf[BlocksOffset].height
    val per = math.max(1L, (hi - lo + shards - 1) / shards)
    (0 until shards).iterator
      .map(i => BlocksPartition(lo + i * per,
        math.min(lo + (i + 1) * per, hi)))
      .filter(p => p.lo < p.hi)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BlocksReaderFactory(required)

  override def deserializeOffset(json: String): Offset =
    BlocksOffset(json.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private class BlocksReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BlocksPartition]
    new PartitionReader[InternalRow] {
      private var h = p.lo - 1
      // column generators resolved ONCE from the pruned schema: a
      // 2-column projection never computes or allocates the others
      private val gens: Array[Long => Any] = required.fields.map {
        f => f.name match {
          case "height" => (x: Long) => x
          case "ts" => (x: Long) => BlocksSource.GENESIS + 12L * x
          case "n_tx" => (x: Long) => BlocksSource.nTx(x)
          case "fee_cents" => (x: Long) => BlocksSource.feeCents(x)
          case "miner" =>
            (x: Long) => UTF8String.fromString(BlocksSource.miner(x))
          case other => throw new IllegalArgumentException(other)
        }
      }
      override def next(): Boolean = { h += 1; h < p.hi }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.map(g => g(h)).toSeq)
      override def close(): Unit = ()
    }
  }
}
