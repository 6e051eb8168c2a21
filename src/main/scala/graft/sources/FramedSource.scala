package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Binary codec for the framed sequential format the [[FramedSource]]
  * connector reads — the i3cols R1–R3 "extract" story re-expressed for
  * Spark: a row-oriented stream of self-describing frames (the `.i3`
  * analog `[public-repo: i3cols/extract.py]`), each carrying named,
  * typed keys, which the DataSource V2 reader extracts into columns —
  * including the ragged `array<long>` key whose Arrow/Parquet list
  * offsets are i3cols' `index.npy` offsets `[public-repo:
  * i3cols/cols.py]`.
  *
  * Frame layout (big-endian, java.io.Data{Input,Output}Stream):
  * {{{
  *   frame   := int32 bodyLen, body
  *   body    := int32 nKeys, key*
  *   key     := uint16 nameLen, name utf8, int8 typeTag, payload
  *   payload := long(8) | double(8) | int32 len + utf8 | int32 n + n*long(8)
  *              (tag 0)   (tag 1)     (tag 2)            (tag 3)
  * }}}
  * Files are NOT splittable mid-stream (frames carry no sync marker) —
  * parallelism is per file, exactly i3cols' multiprocessing-per-file
  * model; at 100 TB the writer sizes files to the target split size.
  */
object FramedFormat {
  val TagLong: Byte = 0
  val TagDouble: Byte = 1
  val TagString: Byte = 2
  val TagLongArray: Byte = 3

  def sparkType(tag: Byte): DataType = tag match {
    case TagLong => LongType
    case TagDouble => DoubleType
    case TagString => StringType
    case TagLongArray => ArrayType(LongType, containsNull = false)
    case t => throw new IllegalArgumentException(s"unknown frame type tag $t")
  }

  /** Write one frame. Values must match the declared tags. */
  def writeFrame(out: DataOutputStream, keys: Seq[(String, Byte, Any)]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeInt(keys.length)
    keys.foreach { case (name, tag, value) =>
      val nb = name.getBytes("UTF-8")
      b.writeShort(nb.length)
      b.write(nb)
      b.writeByte(tag)
      (tag, value) match {
        case (TagLong, v: Long)      => b.writeLong(v)
        case (TagDouble, v: Double)  => b.writeDouble(v)
        case (TagString, v: String)  =>
          val sb = v.getBytes("UTF-8"); b.writeInt(sb.length); b.write(sb)
        case (TagLongArray, v: Array[Long]) =>
          b.writeInt(v.length); v.foreach(b.writeLong)
        case other => throw new IllegalArgumentException(s"bad key $name: $other")
      }
    }
    b.flush()
    out.writeInt(body.size())
    body.writeTo(out)
  }
}

/** DataSource V2 reader over the framed format: schema inference from
  * the first frame, one input partition per file, and COLUMN PRUNING
  * pushed into the frame parser — unrequested keys are skipped with
  * `skipBytes`, never decoded or allocated, the sequential-format
  * equivalent of i3cols extracting only the requested frame keys into
  * per-key column dirs. Usage:
  * `spark.read.format("graft.sources.FramedSource").load(dir)`. */
class FramedSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-framed"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FramedSource.infer(FramedSource.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    FramedTable(schema, properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

object FramedSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft.sources.FramedSource requires a path")
    p
  }

  def frameFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".frames"))
      .sortBy(_.getPath.getName)
      .map(_.getPath.toString)
  }

  /** Schema discovery = read ONE frame's key directory (the G-frame
    * analog): name + type tag per key, in frame order. */
  def infer(dir: String): StructType = {
    val files = frameFiles(dir)
    require(files.nonEmpty, s"no .frames files under $dir")
    val p = new Path(files.head)
    val in = new DataInputStream(p.getFileSystem(new Configuration()).open(p))
    try {
      val bodyLen = in.readInt()
      require(bodyLen > 0, s"empty first frame in ${files.head}")
      val nKeys = in.readInt()
      StructType((0 until nKeys).map { _ =>
        val nameLen = in.readUnsignedShort()
        val nb = new Array[Byte](nameLen); in.readFully(nb)
        val tag = in.readByte()
        // skip this key's payload to reach the next key header
        tag match {
          case FramedFormat.TagLong | FramedFormat.TagDouble => in.skipBytes(8)
          case FramedFormat.TagString => in.skipBytes(in.readInt())
          case FramedFormat.TagLongArray => in.skipBytes(in.readInt() * 8)
        }
        StructField(new String(nb, "UTF-8"), FramedFormat.sparkType(tag), nullable = false)
      })
    } finally in.close()
  }
}

/** `_file` metadata column: which frame file a row came from — the
  * i3cols run/season-discovery surface (run ids parse out of file
  * names), exposed the Spark-native way so it participates in
  * projection and aggregation without living in the data schema. */
case class FramedTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def schema(): StructType = tableSchema
  override def name(): String = s"framed($path)"
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FramedScanBuilder(schema, FramedSource.pathOf(options))
  override def metadataColumns():
      Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_file"
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "frame file this row was extracted from"
    })
}

/** Column pruning AND filter pushdown reach the parser: `pruneColumns`
  * receives exactly the columns the query needs, and `pushFilters`
  * hands the reader simple comparison predicates to evaluate DURING
  * frame parsing — a failing frame is dropped before its row
  * materializes. Pushdown here is best-effort: every filter is also
  * returned as a residual so Spark re-applies it above the scan (the
  * same contract parquet's row-group filtering uses), which keeps
  * correctness trivially safe while the scan sheds the bulk early. */
class FramedScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(FramedFilters.supported)
    filters // all residual: Spark re-applies, we pre-drop
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = FramedScan(full, required, path, pushed.toSeq)
}

/** The predicate subset the frame parser evaluates: comparisons and IN
  * over long/double/string keys. Anything else stays Spark-side. A
  * pushed filter can only ever DROP rows (residual evaluation cannot
  * restore one), so admission is conservative: null comparison values
  * are rejected (Spark's null semantics stay Spark-side) and string
  * ordering uses UTF8String — byte/code-point order, exactly Spark's
  * binary collation — never Java's UTF-16 code-unit compareTo, which
  * disagrees on supplementary characters. */
object FramedFilters {
  import org.apache.spark.sql.sources._
  def supported(f: Filter): Boolean = f match {
    case EqualTo(_, v)            => v != null
    case GreaterThan(_, v)        => v != null
    case GreaterThanOrEqual(_, v) => v != null
    case LessThan(_, v)           => v != null
    case LessThanOrEqual(_, v)    => v != null
    case In(_, vs)                => vs != null && vs.forall(_ != null)
    case _ => false
  }

  /** Evaluate one pushed filter against decoded frame values (keyed by
    * column name). Unknown columns (not decoded) pass — residual
    * evaluation catches them. */
  def eval(f: Filter, v: Map[String, Any]): Boolean = {
    def cmp(attr: String, value: Any)(op: Int => Boolean): Boolean =
      v.get(attr) match {
        case Some(x: Long)   => op(x.compareTo(value.asInstanceOf[Number].longValue))
        case Some(x: Double) => op(x.compareTo(value.asInstanceOf[Number].doubleValue))
        case Some(x: String) => op(UTF8String.fromString(x)
          .compareTo(UTF8String.fromString(value.toString)))
        case _ => true
      }
    f match {
      case EqualTo(a, value)            => cmp(a, value)(_ == 0)
      case GreaterThan(a, value)        => cmp(a, value)(_ > 0)
      case GreaterThanOrEqual(a, value) => cmp(a, value)(_ >= 0)
      case LessThan(a, value)           => cmp(a, value)(_ < 0)
      case LessThanOrEqual(a, value)    => cmp(a, value)(_ <= 0)
      case In(a, values)                => values.exists(value => cmp(a, value)(_ == 0))
      case _ => true
    }
  }
}

case class FramedScan(full: StructType, required: StructType, path: String,
                      pushed: Seq[org.apache.spark.sql.sources.Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"FramedScan path=$path, ReadSchema: ${required.simpleString}, " +
    s"PushedFilters: [${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    FramedSource.frameFiles(path).map(f => FramedPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    FramedReaderFactory(full, required, pushed)
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new FramedMicroBatchStream(full, required, pushed, path)
}

/** Streaming extraction — "tail the DAQ output directory": frame files
  * land append-only (a written file is immutable, the `.i3` contract),
  * and the offset is the SET of processed file names — a landed file's
  * name may sort anywhere (a count-into-sorted-list offset would both
  * re-deliver and permanently skip files whose names sort before
  * already-processed ones), so the set is the only checkpoint state
  * that gives exactly-once under arbitrary naming. Each micro-batch
  * claims the set difference, one input partition per new file,
  * reusing the exact batch reader — pruning and filter pushdown
  * included. This is the same contract as Spark's FileStreamSource
  * seen-files map; at production file counts the set is compacted
  * exactly as its compact log is. */
class FramedMicroBatchStream(full: StructType, required: StructType,
                             pushed: Seq[org.apache.spark.sql.sources.Filter],
                             path: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  case class FileSetOffset(files: Set[String]) extends Offset {
    // single-line JSON array (the engine's offset log is line-oriented,
    // so the serialized form must never contain a raw newline)
    override def json(): String = {
      implicit val fmt: org.json4s.Formats =
        org.json4s.jackson.Serialization.formats(org.json4s.NoTypeHints)
      org.json4s.jackson.Serialization.write(files.toSeq.sorted)
    }
  }

  override def initialOffset(): Offset = FileSetOffset(Set.empty)
  override def latestOffset(): Offset =
    FileSetOffset(FramedSource.frameFiles(path).toSet)
  override def deserializeOffset(json: String): Offset = {
    implicit val fmt: org.json4s.Formats =
      org.json4s.jackson.Serialization.formats(org.json4s.NoTypeHints)
    FileSetOffset(org.json4s.jackson.Serialization.read[Seq[String]](json).toSet)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileSetOffset].files
    val e = end.asInstanceOf[FileSetOffset].files
    (e -- s).toSeq.sorted
      .map(f => FramedPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    FramedReaderFactory(full, required, pushed)
}

case class FramedPartition(file: String) extends InputPartition

case class FramedReaderFactory(full: StructType, required: StructType,
                               pushed: Seq[org.apache.spark.sql.sources.Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FramedReader(partition.asInstanceOf[FramedPartition].file, required, pushed)
}

/** Streams frames out of one file: per frame, walks the key directory,
  * decodes required keys into their output ordinals, `skipBytes` past
  * everything else, and drops the frame before materializing a row if
  * any pushed filter fails (filter columns are always decoded: every
  * pushed filter is also residual, so Catalyst keeps its columns in
  * the required schema). */
class FramedReader(file: String, required: StructType,
                   pushed: Seq[org.apache.spark.sql.sources.Filter])
    extends PartitionReader[InternalRow] {
  private val ordinals: Map[String, Int] =
    required.fieldNames.zipWithIndex.toMap
  // `_file` metadata column: constant per partition, filled post-parse
  private val fileOrd: Int = ordinals.getOrElse("_file", -1)
  private val fileUtf8 = UTF8String.fromString(file)
  private val filterAttrs: Set[String] = pushed.flatMap(_.references).toSet
  private val p = new Path(file)
  private val in = new DataInputStream(p.getFileSystem(new Configuration()).open(p))
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      val bodyLen =
        try in.readInt()
        catch { case _: EOFException => return false }
      require(bodyLen >= 4, s"corrupt frame (bodyLen=$bodyLen) in $file")
      val nKeys = in.readInt()
      val values = new Array[Any](required.length)
      // scala-typed copies of filter-referenced keys for predicate eval
      var fvals = Map.empty[String, Any]
      var i = 0
      while (i < nKeys) {
        val nameLen = in.readUnsignedShort()
        val nb = new Array[Byte](nameLen); in.readFully(nb)
        val name = new String(nb, "UTF-8")
        val tag = in.readByte()
        val ord = ordinals.getOrElse(name, -1)
        val wantF = filterAttrs.contains(name)
        tag match {
          case FramedFormat.TagLong =>
            if (ord >= 0 || wantF) {
              val v = in.readLong()
              if (ord >= 0) values(ord) = v
              if (wantF) fvals += name -> v
            } else in.skipBytes(8)
          case FramedFormat.TagDouble =>
            if (ord >= 0 || wantF) {
              val v = in.readDouble()
              if (ord >= 0) values(ord) = v
              if (wantF) fvals += name -> v
            } else in.skipBytes(8)
          case FramedFormat.TagString =>
            val len = in.readInt()
            if (ord >= 0 || wantF) {
              val sb = new Array[Byte](len); in.readFully(sb)
              if (ord >= 0) values(ord) = UTF8String.fromBytes(sb)
              if (wantF) fvals += name -> new String(sb, "UTF-8")
            } else in.skipBytes(len)
          case FramedFormat.TagLongArray =>
            val n = in.readInt()
            if (ord >= 0) {
              val arr = new Array[Long](n)
              var j = 0
              while (j < n) { arr(j) = in.readLong(); j += 1 }
              values(ord) = new GenericArrayData(arr)
            } else in.skipBytes(n * 8)
          case t => throw new IllegalStateException(s"unknown type tag $t in $file")
        }
        i += 1
      }
      if (pushed.forall(FramedFilters.eval(_, fvals))) {
        if (fileOrd >= 0) values(fileOrd) = fileUtf8
        row = new GenericInternalRow(values)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
