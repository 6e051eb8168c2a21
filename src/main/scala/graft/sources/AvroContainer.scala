package graft.sources

/** General-purpose hand-rolled Avro OBJECT CONTAINER FILE codec
  * (VERDICT r18 Missing #1 — the [[AvroManifest]] writer generalized
  * from its 2-string manifest record to arbitrary flat records, so
  * the engine has a real Avro source/sink lane; Avro is the most
  * common event-log interchange format a pipeline ingests, and
  * zero-egress ships no Avro *writer* dependency).
  *
  * WRITE side: byte-by-byte from the public Avro 1.x spec —
  *   - primitives: long = zigzag + base-128 varint; double = the 8
  *     doubleToLongBits bytes little-endian; string/bytes = varint
  *     length + raw bytes; a ["null", T] union = varint branch index
  *     (0 = null) then the value
  *   - container: magic `Obj\x01`, the avro.schema/avro.codec
  *     metadata map, a 16-byte deterministic sync marker (md5 of a
  *     caller seed — repeated exports stay byte-stable), then data
  *     blocks of (record count, byte size, records, sync)
  *
  * READ side goes through the OFFICIAL `org.apache.avro` decoder
  * (already on every Spark classpath), which makes each read an
  * independent conformance check of the hand-rolled bytes — but only
  * after [[validateContainer]] proves the frame whole: the official
  * reader treats a mid-block EOF as a normal end-of-stream and would
  * silently serve a torn container as a shorter file (the
  * [[AvroManifest]] bee425c discipline, shared here as the one
  * definition both lanes call). */
object AvroContainer {

  sealed trait AvroType { def json: String }
  case object ALong extends AvroType { val json = "\"long\"" }
  /** Avro int: the same zigzag varint wire format as long, declared
    * 32-bit in the schema (the Iceberg spec's count/id fields). */
  case object AInt extends AvroType { val json = "\"int\"" }
  /** Avro boolean: one byte, 0 or 1. */
  case object ABool extends AvroType { val json = "\"boolean\"" }
  case object ADouble extends AvroType { val json = "\"double\"" }
  case object AString extends AvroType { val json = "\"string\"" }
  case object ABytes extends AvroType { val json = "\"bytes\"" }
  /** The standard ["null", T] union — branch 0 is null by convention
    * so a missing value costs one varint byte. */
  final case class ANullable(inner: AvroType) extends AvroType {
    def json: String = s"""["null",${inner.json}]"""
  }
  /** An Avro LOGICAL TYPE annotation over a base type — same wire
    * format as the base (the spec's rule: logical types only annotate
    * the schema), extra props land in the type object. The two
    * event-log staples: timestampMicros (long) and decimal (bytes =
    * minimal two's-complement big-endian unscaled value). */
  final case class ALogical(base: AvroType, props: String) extends AvroType {
    def json: String = {
      val b = base.json
      // "long" → {"type":"long",...props}; a complex base keeps its object
      if (b.startsWith("\"")) s"""{"type":$b,$props}"""
      else b.dropRight(1) + s",$props}"
    }
  }
  val ATimestampMicros: ALogical =
    ALogical(ALong, """"logicalType":"timestamp-micros"""")
  def ADecimal(precision: Int, scale: Int): ALogical =
    ALogical(ABytes,
      s""""logicalType":"decimal","precision":$precision,"scale":$scale""")
  /** A nested record — encoded as the plain concatenation of its
    * fields (the Avro spec's record rule); the value side is a
    * Seq[Any] in field order. An EMPTY field list is legal (Iceberg's
    * partition struct for an unpartitioned spec) and encodes to zero
    * bytes. [[schemaJson]] delegates here — ONE record-schema
    * serializer (review r19). */
  final case class ARecord(name: String, fields: Seq[Field]) extends AvroType {
    def json: String =
      s"""{"type":"record","name":"$name","fields":[""" +
        fields.map(_.json).mkString(",") + "]}"
  }
  /** An Avro array — encoded as blocks of (count, items…) closed by a
    * 0 count; the value side is a Seq[Any]. `attrs` lands extra
    * schema properties (Iceberg's "element-id"). */
  final case class AArray(item: AvroType, attrs: String = "") extends AvroType {
    def json: String =
      s"""{"type":"array","items":${item.json}""" +
        (if (attrs.isEmpty) "" else s",$attrs") + "}"
  }
  /** `attrs` lands extra field properties verbatim in the schema —
    * Iceberg readers resolve manifest fields by the "field-id"
    * property, not by name (review r19). */
  final case class Field(name: String, tpe: AvroType, attrs: String = "") {
    def json: String =
      s"""{"name":"$name","type":${tpe.json}""" +
        (if (attrs.isEmpty) "" else s",$attrs") + "}"
  }

  def schemaJson(recordName: String, fields: Seq[Field]): String =
    ARecord(recordName, fields).json

  private[sources] val Magic =
    Array[Byte]('O'.toByte, 'b'.toByte, 'j'.toByte, 1)

  /** Avro long: zigzag then base-128 varint, low group first,
    * high bit = continuation. */
  private[sources] def vlong(n: Long): Array[Byte] = {
    var v = (n << 1) ^ (n >> 63)
    val out = new java.io.ByteArrayOutputStream(10)
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
    out.toByteArray
  }

  /** Avro string/bytes: varint byte length + raw bytes. */
  private[sources] def vbytes(b: Array[Byte]): Array[Byte] =
    vlong(b.length.toLong) ++ b
  private[sources] def vstr(s: String): Array[Byte] =
    vbytes(s.getBytes("UTF-8"))

  /** One value in Avro binary encoding. Accepts boxed numerics for
    * the primitive types; null only under [[ANullable]]. */
  private def encodeValue(t: AvroType, v: Any,
                          out: java.io.ByteArrayOutputStream): Unit = t match {
    case ANullable(inner) =>
      if (v == null) out.write(vlong(0))
      else { out.write(vlong(1)); encodeValue(inner, v, out) }
    case ARecord(_, fields) =>
      val vs = v.asInstanceOf[Seq[Any]]
      require(vs.length == fields.length,
        s"record arity ${vs.length} != schema arity ${fields.length}")
      fields.zip(vs).foreach { case (f, fv) => encodeValue(f.tpe, fv, out) }
    case AArray(item, _) =>
      val vs = v.asInstanceOf[Seq[Any]]
      if (vs.nonEmpty) {
        out.write(vlong(vs.length.toLong))
        vs.foreach(encodeValue(item, _, out))
      }
      out.write(vlong(0))
    case ALogical(base, _) => encodeValue(base, v, out)
    case ABool =>
      out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
    case ALong | AInt => out.write(vlong(v.asInstanceOf[Number].longValue))
    case ADouble =>
      val bits = java.lang.Double.doubleToLongBits(
        v.asInstanceOf[Number].doubleValue)
      (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xff).toInt))
    case AString => out.write(vstr(v.asInstanceOf[String]))
    case ABytes => out.write(vbytes(v.asInstanceOf[Array[Byte]]))
  }

  /** The container bytes for a flat-record file. `syncSeed` determines
    * the sync marker so identical inputs re-encode byte-identically;
    * `blockRecords` caps records per data block (the spec allows any
    * split — multiple blocks keep per-block buffers bounded for large
    * partitions). */
  def encode(recordName: String, fields: Seq[Field],
             rows: Iterator[Seq[Any]], syncSeed: String,
             blockRecords: Int = 4096): Array[Byte] = {
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest(syncSeed.getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    out.write(vlong(2))
    out.write(vstr("avro.schema"))
    out.write(vstr(schemaJson(recordName, fields)))
    out.write(vstr("avro.codec")); out.write(vstr("null"))
    out.write(vlong(0))
    out.write(sync)
    rows.grouped(blockRecords).foreach { block =>
      val body = new java.io.ByteArrayOutputStream()
      block.foreach { row =>
        require(row.length == fields.length,
          s"row arity ${row.length} != schema arity ${fields.length}")
        fields.zip(row).foreach { case (f, v) => encodeValue(f.tpe, v, body) }
      }
      val payload = body.toByteArray
      out.write(vlong(block.size.toLong))
      out.write(vlong(payload.length.toLong))
      out.write(payload)
      out.write(sync)
    }
    out.toByteArray
  }

  /** Strict container-frame validation BEFORE decoding (see the
    * object scaladoc): magic, metadata map, sync, then per block
    * (count, size, size bytes, the SAME sync) landing exactly on EOF
    * — throws on any violation. */
  def validateContainer(bytes: Array[Byte]): Unit = {
    var pos = 0
    def fail(msg: String): Nothing =
      sys.error(s"invalid Avro container ($msg at byte $pos of ${bytes.length})")
    def take(n: Int): Array[Byte] = {
      if (pos + n > bytes.length) fail(s"truncated: need $n more bytes")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; out
    }
    def readVlong(): Long = {
      var shift = 0; var acc = 0L; var b = 0
      do {
        if (pos >= bytes.length) fail("truncated varint")
        b = bytes(pos) & 0xff; pos += 1
        acc |= (b & 0x7fL) << shift; shift += 7
        if (shift > 70) fail("varint too long")
      } while ((b & 0x80) != 0)
      (acc >>> 1) ^ -(acc & 1) // un-zigzag
    }
    if (!take(4).sameElements(Magic)) fail("bad magic")
    // metadata map: (count, pairs)* until a 0 count
    var n = readVlong()
    while (n != 0) {
      if (n < 0) { readVlong() } // negative count carries a block size
      (1L to math.abs(n)).foreach { _ =>
        take(readVlong().toInt); take(readVlong().toInt)
      }
      n = readVlong()
    }
    val sync = take(16)
    while (pos < bytes.length) {
      val cnt = readVlong()
      if (cnt < 0) fail("negative record count")
      val size = readVlong()
      if (size < 0) fail("negative block size")
      take(size.toInt)
      if (!take(16).sameElements(sync)) fail("sync marker mismatch")
    }
  }

  /** Decode a container's records through the OFFICIAL Avro decoder
    * (after [[validateContainer]]), one Array[Any] per record in the
    * embedded schema's field order — Utf8 normalized to String,
    * ByteBuffer to Array[Byte], null branches to null. Runs fine on
    * executors (the avro jars ship with Spark), so a DataFrame lane
    * is binaryFile → flatMap(decodeRows). */
  def decodeRows(bytes: Array[Byte]): Seq[Array[Any]] = {
    validateContainer(bytes)
    val reader = new org.apache.avro.file.DataFileStream(
      new java.io.ByteArrayInputStream(bytes),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try {
      val fieldCount = reader.getSchema.getFields.size
      val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      def norm(x: Any): Any = x match {
        case u: org.apache.avro.util.Utf8 => u.toString
        case b: java.nio.ByteBuffer =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
        case r: org.apache.avro.generic.GenericRecord =>
          Array.tabulate[Any](r.getSchema.getFields.size)(i => norm(r.get(i)))
        case l: java.util.Collection[_] =>
          import scala.jdk.CollectionConverters._
          l.asScala.toSeq.map(norm)
        case other => other
      }
      while (reader.hasNext) {
        val rec = reader.next()
        buf += Array.tabulate[Any](fieldCount)(i => norm(rec.get(i)))
      }
      buf.toSeq
    } finally reader.close()
  }
}
