package graft.sources

import java.io.{DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/**
 * SIFT-format vector file sources (reference: data/source/format/
 * FloatVectorBinaryInputFormat.java:25-345 — record layout
 * `[dim:int32 LE][dim x payload]` read at 283-341; IvecIterator.java /
 * FvecIterator.java for ground truth).
 *
 * Scale design: records are fixed-size once dim is known, so a file is
 * split into record-aligned byte ranges planned on the driver and read in
 * parallel by executors — no single-reader bottleneck (the reference reads
 * at source-parallelism 1). Ids are assigned by global record index
 * (deterministic, split-independent), mirroring the reference's
 * sequential id assignment.
 */
object VectorFiles {

  sealed trait ElementType { def bytes: Int }
  case object F32 extends ElementType { val bytes = 4 } // fvecs
  case object U8 extends ElementType { val bytes = 1 }  // bvecs
  case object I32 extends ElementType { val bytes = 4 } // ivecs

  final case class Split(path: String, startRecord: Long, numRecords: Long,
      dim: Int, elem: String)

  private def dimOf(path: String): Int = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val b = new Array[Byte](4)
      raf.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
    } finally raf.close()
  }

  private def planSplits(path: String, elem: ElementType,
      targetRecordsPerSplit: Long): (Int, Seq[Split]) = {
    val dim = dimOf(path)
    val recordSize = 4L + dim.toLong * elem.bytes
    val fileLen = new java.io.File(path).length()
    require(fileLen % recordSize == 0,
      s"$path length $fileLen not a multiple of record size $recordSize (dim=$dim)")
    val total = fileLen / recordSize
    val elemName = elem match { case F32 => "f32"; case U8 => "u8"; case I32 => "i32" }
    val splits = (0L until total by targetRecordsPerSplit).map { start =>
      Split(path, start, math.min(targetRecordsPerSplit, total - start), dim, elemName)
    }
    (dim, splits)
  }

  private def readSplit(s: Split): Iterator[(Long, Array[Float])] = {
    val elem = s.elem match { case "f32" => F32; case "u8" => U8; case "i32" => I32 }
    val recordSize = 4L + s.dim.toLong * elem.bytes
    val raf = new RandomAccessFile(s.path, "r")
    raf.seek(s.startRecord * recordSize)
    val buf = new Array[Byte](recordSize.toInt)
    new Iterator[(Long, Array[Float])] {
      private var i = 0L
      override def hasNext: Boolean = {
        val more = i < s.numRecords
        if (!more) raf.close()
        more
      }
      override def next(): (Long, Array[Float]) = {
        raf.readFully(buf)
        val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
        val d = bb.getInt
        require(d == s.dim, s"dim changed mid-file: $d != ${s.dim}")
        val out = new Array[Float](d)
        var j = 0
        elem match {
          case F32 => while (j < d) { out(j) = bb.getFloat; j += 1 }
          case U8 => while (j < d) { out(j) = (bb.get() & 0xff).toFloat; j += 1 }
          case I32 => while (j < d) { out(j) = bb.getInt.toFloat; j += 1 }
        }
        val id = s.startRecord + i
        i += 1
        (id, out)
      }
    }
  }

  /** Read a SIFT-format file -> (id LONG, vec ARRAY<FLOAT>). */
  def read(spark: SparkSession, path: String, elem: ElementType,
      recordsPerSplit: Long = 262144): DataFrame = {
    import spark.implicits._
    val (_, splits) = planSplits(path, elem, recordsPerSplit)
    spark.sparkContext.parallelize(splits, math.max(1, splits.size))
      .flatMap(readSplit)
      .toDF("id", "vec")
  }

  def readFvecs(spark: SparkSession, path: String): DataFrame = read(spark, path, F32)
  def readBvecs(spark: SparkSession, path: String): DataFrame = read(spark, path, U8)

  /** Ground-truth ivecs -> (qid LONG, ids ARRAY<LONG>) (reference
   * GroundTruthResultIterator.java). */
  def readIvecs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val (_, splits) = planSplits(path, I32, 262144)
    spark.sparkContext.parallelize(splits, math.max(1, splits.size))
      .flatMap(readSplit)
      .map { case (qid, vec) => (qid, vec.map(_.toLong)) }
      .toDF("qid", "ids")
  }

  /** Test/fixture writer (little-endian, same layout). */
  def write(path: String, vectors: Iterator[Array[Float]], elem: ElementType): Unit = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(new FileOutputStream(path)))
    try vectors.foreach { v =>
      val bb = ByteBuffer.allocate(4 + v.length * elem.bytes).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length)
      elem match {
        case F32 => v.foreach(bb.putFloat)
        case U8 => v.foreach(x => bb.put(x.toInt.toByte))
        case I32 => v.foreach(x => bb.putInt(x.toInt))
      }
      out.write(bb.array())
    } finally out.close()
  }

  /** Deterministic synthetic delete injection (reference S2:
   * FloatVectorBinaryInputFormat.java:228-247 — with probability
   * deleteRatio emit a deletion of a previously inserted id instead of the
   * next vector; delete buffer = last 1000 ids). Requires dense sequential
   * ids (true for file sources). Output adds (eventTime, ttl, isDeletion).
   */
  def withDeletes(vectors: DataFrame, deleteRatio: Double, seed: Long,
      bufferSize: Int = 1000): DataFrame = {
    import org.apache.spark.sql.functions._
    // decision and victim-offset are pure functions of (seed, id) so the
    // transform is distributed and reproducible
    val decide = abs(xxhash64(lit(seed), col("id"))).cast("double") /
      lit(Long.MaxValue.toDouble)
    val victimOff = (abs(xxhash64(lit(seed + 1), col("id"))) %
      least(col("id"), lit(bufferSize.toLong))) + 1L
    vectors
      .withColumn("isDeletion", col("id") > 0 && decide < deleteRatio)
      .withColumn("delId", when(col("isDeletion"), col("id") - victimOff))
      .select(
        when(col("isDeletion"), col("delId")).otherwise(col("id")).as("id"),
        when(col("isDeletion"), lit(null)).otherwise(col("vec")).as("vec"),
        col("id").as("eventTime"),
        lit(Long.MaxValue).as("ttl"),
        col("isDeletion"))
  }
}
