package graft.sources

/** Hand-rolled Avro OBJECT CONTAINER FILE writer for the Iceberg
  * export's manifest lists (VERDICT r17 Missing #3 — real Iceberg
  * manifest lists are Avro, and zero-egress ships no Avro writer
  * dependency, so the container is encoded byte by byte from the
  * public spec):
  *
  *   - magic `Obj\x01`
  *   - file metadata map (`avro.schema` = the record schema JSON,
  *     `avro.codec` = `null`), encoded as an Avro map<bytes>: a
  *     zigzag-varint pair count, length-prefixed keys/values, a 0
  *     terminator
  *   - a 16-byte sync marker (md5 of a caller seed — deterministic,
  *     so repeated exports stay byte-stable, the table-uuid
  *     discipline)
  *   - one data block per write: zigzag-varint record count + byte
  *     size, the binary-encoded records, the sync marker again
  *
  * Records follow Iceberg's manifest-list entry down to the two
  * fields the importer consumes (`file_path`, `file_format`), each an
  * Avro string (zigzag-varint length + UTF-8). Everything here is the
  * public Avro 1.x container spec — no library on the WRITE side; the
  * READ side goes through `org.apache.avro`'s DataFileReader (already
  * on every Spark classpath), which makes each read an independent
  * conformance check of the hand-rolled bytes: a wrong varint, a
  * mis-declared codec or a torn block fails loudly in the official
  * decoder, not in code that shares assumptions with the writer.
  */
object AvroManifest {

  /** The manifest-list entry schema, shared by writer and reader. */
  val SchemaJson: String =
    """{"type":"record","name":"manifest_entry","fields":[""" +
    """{"name":"file_path","type":"string"},""" +
    """{"name":"file_format","type":"string"}]}"""

  private val Magic = Array[Byte]('O'.toByte, 'b'.toByte, 'j'.toByte, 1)

  /** Avro long: zigzag then base-128 varint, low group first,
    * high bit = continuation. */
  private def vlong(n: Long): Array[Byte] = {
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
  private def vbytes(b: Array[Byte]): Array[Byte] = vlong(b.length.toLong) ++ b
  private def vstr(s: String): Array[Byte] = vbytes(s.getBytes("UTF-8"))

  /** The container bytes for one manifest list. `syncSeed` determines
    * the sync marker (md5, 16 bytes) so identical inputs re-export
    * byte-identically. */
  def encode(entries: Seq[(String, String)], syncSeed: String): Array[Byte] = {
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest(syncSeed.getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    // file metadata: 2 entries, then the 0 block terminator
    out.write(vlong(2))
    out.write(vstr("avro.schema")); out.write(vstr(SchemaJson))
    out.write(vstr("avro.codec")); out.write(vstr("null"))
    out.write(vlong(0))
    out.write(sync)
    if (entries.nonEmpty) {
      val body = new java.io.ByteArrayOutputStream()
      entries.foreach { case (path, fmt) =>
        body.write(vstr(path)); body.write(vstr(fmt))
      }
      val payload = body.toByteArray
      out.write(vlong(entries.size.toLong))
      out.write(vlong(payload.length.toLong))
      out.write(payload)
      out.write(sync)
    }
    out.toByteArray
  }

  /** Write a manifest list — temp file + atomic move, the pointer-
    * write discipline every catalog file in the repo follows. */
  def write(path: java.nio.file.Path, entries: Seq[(String, String)],
            syncSeed: String): Unit = {
    import java.nio.file.{Files, StandardCopyOption => C}
    val tmp = Files.createTempFile(path.getParent, "." + path.getFileName, ".tmp")
    Files.write(tmp, encode(entries, syncSeed))
    Files.move(tmp, path, C.ATOMIC_MOVE, C.REPLACE_EXISTING)
  }

  /** Strict container-frame validation BEFORE decoding. Probed: the
    * official DataFileReader's `hasNext` treats a mid-block EOF as a
    * normal end-of-stream and silently returns the records read so
    * far — for a manifest list that means a TORN container serves a
    * PARTIAL (or empty) file list as if it were whole, and an
    * importer would quietly scan a half table. This walk enforces the
    * container grammar end to end — magic, metadata map, sync, then
    * per block (count, size, size bytes, the SAME sync) landing
    * exactly on EOF — and throws on any violation. Record DECODE
    * still goes through the official reader afterwards. */
  private def validateContainer(bytes: Array[Byte]): Unit = {
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

  /** Read the entries back through the OFFICIAL Avro decoder — the
    * independent half of the round-trip (see the object scaladoc) —
    * after [[validateContainer]] proves the frame is whole (the
    * official reader alone swallows torn blocks; see its scaladoc). */
  def readEntries(path: String): Seq[(String, String)] = {
    validateContainer(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    val reader = org.apache.avro.file.DataFileReader.openReader(
      new java.io.File(path),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (reader.hasNext) {
        val rec = reader.next()
        buf += ((rec.get("file_path").toString, rec.get("file_format").toString))
      }
      buf.toSeq
    } finally reader.close()
  }

  /** Just the file paths — what the Iceberg importers consume. */
  def readFilePaths(path: String): Seq[String] =
    readEntries(path).map(_._1)
}
