package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, FieldVector, Float4Vector, Float8Vector, IntVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.types._

/** Arrow IPC egress/ingest — the reference's entire reason to exist is
  * serving query results as Arrow record batches (S9 getStream,
  * Producer.java:86-284) and accepting Arrow streams as input (S5
  * acceptPut, Producer.java:440-510). Spark-first, both ends are
  * per-partition `mapPartitions` kernels: every partition independently
  * becomes one self-contained Arrow IPC stream (schema header + batches of
  * ≤ batchSize rows), so egress scales with partition parallelism and
  * nothing is collected to the driver. Partition streams interleave freely,
  * matching the reference's unordered-stream contract
  * (MANIFESTO.md:230-235).
  *
  * Type envelope mirrors the reference's (§1.2, GdsActionHandler.java:
  * 165-245): int32/int64/float32/float64/utf8 scalars and lists of
  * int64/float32/float64. Default batch size 1024 rows = the reference's
  * ARROW_BATCH_SIZE (Config.java:58-61).
  */
object ArrowIpc {

  val DefaultBatchSize = 1024

  private[sources] def toArrowField(f: StructField): Field = {
    def leaf(name: String, t: ArrowType): Field =
      new Field(name, FieldType.nullable(t), null)
    f.dataType match {
      case IntegerType => leaf(f.name, new ArrowType.Int(32, true))
      case LongType    => leaf(f.name, new ArrowType.Int(64, true))
      case FloatType   =>
        leaf(f.name, new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))
      case DoubleType  =>
        leaf(f.name, new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))
      case StringType  => leaf(f.name, ArrowType.Utf8.INSTANCE)
      case ArrayType(et, _) =>
        val child = et match {
          case LongType   => leaf("int64", new ArrowType.Int(64, true))
          case FloatType  =>
            leaf("float32", new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))
          case DoubleType =>
            leaf("float64", new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))
          case StringType => leaf("utf8", ArrowType.Utf8.INSTANCE)
          case other => throw new IllegalArgumentException(
            s"unsupported Arrow list element type: $other")
        }
        new Field(f.name, FieldType.nullable(ArrowType.List.INSTANCE),
          Seq(child).asJava)
      case other => throw new IllegalArgumentException(
        s"unsupported Arrow egress type: $other (reference envelope is " +
          "int/long/float/double/string and lists thereof)")
    }
  }

  def arrowSchema(schema: StructType): Schema =
    new Schema(schema.fields.map(toArrowField).toSeq.asJava)

  /** S9 — serialize each partition as one Arrow IPC stream (byte blob).
    * The row→vector transposition is the Spark analog of the reference's
    * WorkBuffer.convert (WorkBuffer.java:88-201), but lossless: no
    * backpressure drops (Producer.java:202-230 documents the reference
    * dropping rows under pressure; a mapPartitions kernel cannot lose
    * rows). */
  def toIpcStreams(df: DataFrame,
                   batchSize: Int = DefaultBatchSize): Dataset[Array[Byte]] = {
    val sparkSchema = df.schema
    val spark = df.sparkSession
    import spark.implicits._
    df.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val allocator = new RootAllocator(Long.MaxValue)
        val root = VectorSchemaRoot.create(arrowSchema(sparkSchema), allocator)
        val out = new ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, out)
        writer.start()
        val vectors = root.getFieldVectors.asScala.toArray
        var n = 0
        def flush(): Unit = if (n > 0) {
          root.setRowCount(n)
          writer.writeBatch()
          root.allocateNew()
          n = 0
        }
        rows.foreach { row =>
          var c = 0
          while (c < vectors.length) {
            appendCell(vectors(c), n, row, c, sparkSchema.fields(c).dataType)
            c += 1
          }
          n += 1
          if (n >= batchSize) flush()
        }
        flush()
        writer.end()
        root.close()
        allocator.close()
        Iterator(out.toByteArray)
      }
    }
  }

  private def appendCell(v: FieldVector, idx: Int, row: Row, col: Int,
                         dt: DataType): Unit = {
    if (row.isNullAt(col)) {
      v match {
        case lv: ListVector => lv.setNull(idx)
        case iv: IntVector => iv.setNull(idx)
        case bv: BigIntVector => bv.setNull(idx)
        case fv: Float4Vector => fv.setNull(idx)
        case dv: Float8Vector => dv.setNull(idx)
        case sv: VarCharVector => sv.setNull(idx)
        case other => throw new IllegalStateException(s"vector $other")
      }
    } else (v, dt) match {
      case (iv: IntVector, IntegerType) =>
        iv.setSafe(idx, row.getInt(col))
      case (bv: BigIntVector, LongType) =>
        bv.setSafe(idx, row.getLong(col))
      case (fv: Float4Vector, FloatType) =>
        fv.setSafe(idx, row.getFloat(col))
      case (dv: Float8Vector, DoubleType) =>
        dv.setSafe(idx, row.getDouble(col))
      case (sv: VarCharVector, StringType) =>
        sv.setSafe(idx, row.getString(col).getBytes("UTF-8"))
      case (lv: ListVector, ArrayType(et, _)) =>
        val seq = row.getSeq[Any](col)
        val start = lv.startNewValue(idx)
        val child = lv.getDataVector
        var i = 0
        seq.foreach { e =>
          (child, et) match {
            case (cb: BigIntVector, LongType) =>
              cb.setSafe(start + i, e.asInstanceOf[Long])
            case (cf: Float4Vector, FloatType) =>
              cf.setSafe(start + i, e.asInstanceOf[Float])
            case (cd: Float8Vector, DoubleType) =>
              cd.setSafe(start + i, e.asInstanceOf[Double])
            case (cs: VarCharVector, StringType) =>
              cs.setSafe(start + i, e.asInstanceOf[String].getBytes("UTF-8"))
            case (c, t) => throw new IllegalStateException(s"list $c / $t")
          }
          i += 1
        }
        lv.endValue(idx, seq.length)
      case (vec, t) =>
        throw new IllegalStateException(s"cell $vec / $t")
    }
  }

  /** Persist each partition's IPC stream as one `.arrow` file under `dir`
    * — the on-disk layout [[ArrowIpcSource]] reads back with one input
    * partition per file. */
  def writeIpcFiles(df: DataFrame, dir: String,
                    batchSize: Int = DefaultBatchSize): Unit = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.{FileSystem, Path}
    toIpcStreams(df, batchSize).rdd.mapPartitionsWithIndex { (pid, it) =>
      it.zipWithIndex.foreach { case (bytes, i) =>
        val p = new Path(s"$dir/part-$pid-$i.arrow")
        val fs = FileSystem.get(p.toUri, new Configuration())
        val out = fs.create(p, true)
        try out.write(bytes) finally out.close()
      }
      Iterator.empty[Int]
    }.count()
  }

  /** S5 — ingest Arrow IPC streams (one blob per element) back into rows.
    * The expected Spark schema must match the streams' Arrow schema (the
    * reference carries the schema in the put-stream itself,
    * BulkImportJob.java:49-51; here the caller states it and we validate
    * per stream). */
  def fromIpcStreams(blobs: Dataset[Array[Byte]],
                     schema: StructType): DataFrame = {
    val spark = blobs.sparkSession
    val expected = arrowSchema(schema).toJson
    val rows = blobs.rdd.flatMap { bytes =>
      val allocator = new RootAllocator(Long.MaxValue)
      val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes),
        allocator)
      val root = reader.getVectorSchemaRoot
      require(root.getSchema.toJson == expected,
        s"stream schema ${root.getSchema} != expected")
      val out = Iterator.unfold(()) { _ =>
        if (reader.loadNextBatch()) {
          val fields = root.getFieldVectors.asScala.toSeq
          val batch = (0 until root.getRowCount).map { i =>
            Row.fromSeq(fields.map(readCell(_, i)))
          }
          Some((batch, ()))
        } else {
          reader.close()
          allocator.close()
          None
        }
      }
      out.flatten
    }
    spark.createDataFrame(rows, schema)
  }

  private def readCell(v: FieldVector, i: Int): Any = {
    if (v.isNull(i)) null
    else v match {
      case iv: IntVector => iv.get(i)
      case bv: BigIntVector => bv.get(i)
      case fv: Float4Vector => fv.get(i)
      case dv: Float8Vector => dv.get(i)
      case sv: VarCharVector => new String(sv.get(i), "UTF-8")
      case lv: ListVector =>
        val child = lv.getDataVector
        (lv.getElementStartIndex(i) until lv.getElementEndIndex(i))
          .map(j => readCell(child.asInstanceOf[FieldVector], j))
      case other => throw new IllegalStateException(s"vector $other")
    }
  }
}
