package graft.sources

import java.util
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * True streaming fvecs/bvecs source (S1 as a `MicroBatchStream`, the
 * optional polish SURVEY blesses batch pre-convert for): tails a
 * directory (or single file) of SIFT-format vector files the way the
 * reference's HDFS source tails a growing file
 * (HDFSVectorSourceBuilder.java:40-125 — poll, read new records, assign
 * sequential ids), re-expressed as a Spark DataSource-v2 micro-batch
 * stream so the engine plans record-aligned splits per trigger and the
 * checkpoint carries exactly-once offsets.
 *
 * Id assignment matches the reference's sequential scheme: each file gets
 * a base equal to the cumulative record count when it is FIRST seen, and
 * a record's id is `base + recordIndex` — dense, deterministic, stable
 * across restarts because bases ride the checkpointed offset. Growth is
 * tracked for the newest file only (log-rotation semantics: a file is
 * frozen once a later-named file appears; Spark's own FileStreamSource
 * assumes full immutability, this is strictly more lenient). A
 * `maxRecordsPerTrigger` option bounds each micro-batch — the admission
 * analog of the reference's throttled source (S4 rate control composes
 * downstream via [[StagedRate]]).
 *
 * Scale: the driver only lists files and reads 4-byte dim headers;
 * record ranges are chunked into `recordsPerSplit` input partitions read
 * in parallel by executors — no single-reader bottleneck (the reference
 * reads at source-parallelism 1).
 */
object FvecsStream {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** `spark.readStream` entry point. `elem`: f32 (fvecs) or u8 (bvecs). */
  def readStream(spark: SparkSession, path: String, elem: String = "f32",
      recordsPerSplit: Long = 262144,
      maxRecordsPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format(classOf[FvecsDataSource].getName)
      .option("path", path).option("elem", elem)
      .option("recordsPerSplit", recordsPerSplit.toString)
    maxRecordsPerTrigger.foreach(m => r.option("maxRecordsPerTrigger", m.toString))
    r.load()
  }

  /** One file's slice of the stream frontier: id base (fixed at first
   * sight) and the record count consumed so far. */
  final case class FileState(path: String, base: Long, records: Long)

  /** Serialized one file per ';' as `base:records:path` (the offset log
   * is line-oriented, so newlines are out; paths containing ';' are
   * rejected at source construction). */
  final case class FvecsOffset(files: Seq[FileState]) extends Offset {
    override def json(): String =
      files.map(f => s"${f.base}:${f.records}:${f.path}").mkString(";")
  }

  object FvecsOffset {
    def fromJson(s: String): FvecsOffset =
      if (s == null || s.isEmpty) FvecsOffset(Nil)
      else FvecsOffset(s.split(";").toSeq.map { part =>
        val Array(b, r, p) = part.split(":", 3)
        FileState(p, b.toLong, r.toLong)
      })
  }

  final case class FvecsInputPartition(path: String, idBase: Long,
      startRecord: Long, numRecords: Long, dim: Int, elem: String)
    extends InputPartition
}

class FvecsDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FvecsStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FvecsTable(
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("fvecs stream requires a 'path' option")),
      Option(properties.get("elem")).getOrElse("f32"),
      Option(properties.get("recordsPerSplit")).map(_.toLong).getOrElse(262144L),
      Option(properties.get("maxRecordsPerTrigger")).map(_.toLong))
}

class FvecsTable(path: String, elem: String, recordsPerSplit: Long,
    maxRecordsPerTrigger: Option[Long]) extends Table with SupportsRead {
  require(!path.contains(";"), s"path must not contain ';': $path")
  override def name(): String = s"fvecs:$path"
  override def schema(): StructType = FvecsStream.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = FvecsStream.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new FvecsMicroBatchStream(path, elem, recordsPerSplit, maxRecordsPerTrigger)
    }
}

class FvecsMicroBatchStream(path: String, elemName: String,
    recordsPerSplit: Long, maxRecordsPerTrigger: Option[Long])
  extends MicroBatchStream {
  import FvecsStream._

  private val elem: VectorFiles.ElementType = elemName match {
    case "f32" => VectorFiles.F32
    case "u8" => VectorFiles.U8
    case other => throw new IllegalArgumentException(s"unknown elem $other")
  }

  /** The richest frontier seen so far (from latestOffset or the
   * checkpoint via deserializeOffset) — bases are immutable once
   * assigned, so "richest" is simply the offset knowing the most files /
   * the longest tail. */
  @volatile private var known: FvecsOffset = FvecsOffset(Nil)

  private def absorb(o: FvecsOffset): Unit = synchronized {
    val k = known
    if (o.files.length > k.files.length ||
        (o.files.length == k.files.length && o.files.nonEmpty &&
          o.files.last.records > k.files.last.records))
      known = o
  }

  private def recordSize(dim: Int): Long = 4L + dim.toLong * elem.bytes

  private def diskRecords(p: String): Long = {
    val f = new java.io.File(p)
    if (!f.isFile || f.length() < 4) 0L
    else f.length() / recordSize(VectorFiles.dimOf(p))
  }

  private def listFiles(): Seq[String] = {
    val f = new java.io.File(path)
    val all =
      if (f.isFile) Array(f)
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(x => x.isFile && !x.getName.startsWith(".") &&
          !x.getName.startsWith("_"))
    all.sortBy(_.getName).map(_.getAbsolutePath).toSeq
  }

  override def initialOffset(): Offset = FvecsOffset(Nil)

  override def deserializeOffset(json: String): Offset = {
    val o = FvecsOffset.fromJson(json)
    absorb(o)
    o
  }

  override def latestOffset(): Offset = synchronized {
    val prev = known
    var budget = maxRecordsPerTrigger.getOrElse(Long.MaxValue)
    val out = ArrayBuffer(prev.files: _*)
    // 1. grow the tail file (earlier files are frozen)
    var tailCaughtUp = true
    if (out.nonEmpty) {
      val tail = out.last
      val cur = diskRecords(tail.path)
      if (cur > tail.records) {
        val grow = math.min(cur - tail.records, budget)
        budget -= grow
        out(out.length - 1) = tail.copy(records = tail.records + grow)
        tailCaughtUp = tail.records + grow >= cur
      }
    }
    // 2. admit new files in name order, but only once the tail is fully
    // consumed — a new file freezes the tail, so its unread records would
    // otherwise be lost
    if (tailCaughtUp) {
      val seen = out.map(_.path).toSet
      var nextBase = out.lastOption.map(f => f.base + f.records).getOrElse(0L)
      listFiles().filterNot(seen).foreach { p =>
        val take = math.min(diskRecords(p), budget)
        if (take > 0) {
          out += FileState(p, nextBase, take)
          nextBase += take
          budget -= take
        }
      }
    }
    val next = FvecsOffset(out.toSeq)
    known = next
    next
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FvecsOffset]
    val e = end.asInstanceOf[FvecsOffset]
    val from = s.files.map(f => f.path -> f.records).toMap
    e.files.flatMap { f =>
      val lo = from.getOrElse(f.path, 0L)
      if (f.records <= lo) Nil
      else {
        val dim = VectorFiles.dimOf(f.path)
        (lo until f.records by recordsPerSplit).map { startRec =>
          FvecsInputPartition(f.path, f.base, startRec,
            math.min(recordsPerSplit, f.records - startRec), dim, elemName)
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[FvecsInputPartition]
        new PartitionReader[InternalRow] {
          private val it = VectorFiles.readSplit(VectorFiles.Split(
            p.path, p.startRecord, p.numRecords, p.dim, p.elem))
          private var cur: (Long, Array[Float]) = _
          override def next(): Boolean =
            if (it.hasNext) { cur = it.next(); true } else false
          override def get(): InternalRow =
            InternalRow(cur._1 + p.idBase, ArrayData.toArrayData(cur._2))
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
