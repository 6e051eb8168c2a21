package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL media codecs for the multimodal lane — pure-JVM, zero new
  * dependencies: PNG encode/decode via `javax.imageio` (the standard
  * library's PNG plugin is pure Java and headless-safe) and canonical
  * RIFF/WAVE PCM encode/parse by direct byte layout. These replace the
  * byte-arithmetic STUBS (`multimodal_decode`'s ByteMean fake) for the
  * queries that need an actual container round-trip: the encoder
  * plants real image/audio files whose planted parameters are pure
  * functions of doc_id, and the decoder re-derives those parameters
  * from nothing but the container bytes — so a DuckDB oracle that
  * computes the SAME parameters from doc_id arithmetic hash-matches
  * iff the decode is real and correct.
  *
  * All kernels are native Catalyst expressions (the DeflateLen
  * pattern): interpreted eval and whole-stage codegen share one
  * imperative impl via a static call. */
object MediaCodecsImpl {

  /** Encode a REAL PNG: w×h 8-bit grayscale, constant fill `gray`.
    * Constant fill keeps every pixel statistic closed-form for the
    * oracle (mean = gray, sum = w·h·gray) while the bytes are a fully
    * real PNG container (signature, IHDR, IDAT zlib stream, CRCs). */
  def encodePngGray(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, gray); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode REAL image bytes: container format name (from the
    * registered ImageIO reader that recognizes the byte signature),
    * header dimensions, and the mean of raster band 0 over the actual
    * decoded pixels. Returns null for undecodable payloads (the
    * quarantine posture — bad assets surface as nulls, not task
    * failures). */
  def decodeImageMeta(bytes: Array[Byte]): InternalRow = {
    // memory-backed input stream: the default file-cache variant holds
    // an open handle on a /tmp temp file per decode until finalization
    // — tens of thousands of decodes per query would exhaust the fd
    // ulimit (round-17 self-review); close in finally regardless
    val iis = try javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)) catch { case _: Exception => null }
    if (iis == null) return null
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val reader = readers.next()
      val fmt = reader.getFormatName.toLowerCase
      reader.setInput(iis)
      val img = reader.read(0)
      reader.dispose()
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      new GenericInternalRow(Array[Any](
        w, h, UTF8String.fromString(fmt),
        sum.toDouble / (w.toLong * h)))
    } catch { case _: Exception => null }
    finally { try iis.close() catch { case _: Exception => } }
  }

  /** Encode a REAL PNG with a deterministic GRADIENT fill:
    * pixel(x, y) = (a·x + b·y + c) mod 256 — non-constant content so
    * pixel-order-sensitive features (phash, resize) carry signal,
    * while every pixel stays a closed-form doc_id function the oracle
    * can replicate. */
  def encodePngGradient(w: Int, h: Int, a: Int, b: Int, c: Int): Array[Byte] =
    encodeImageGradient(w, h, a, b, c, "png")

  /** The same gradient through ANY lossless ImageIO container (png /
    * bmp / gif — all three round-trip 8-bit gray pixel-exact, probed:
    * the gif writer emits an identity-ordered gray palette, so raster
    * band 0 returns the original values for all three). JPEG is lossy
    * and deliberately unsupported here. */
  def encodeImageGradient(w: Int, h: Int, a: Int, b: Int, c: Int,
                          fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, java.lang.Math.floorMod(a * x + b * y + c, 256))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  /** 60-bit average-hash over REAL decoded pixels (the pixel-space
    * twin of multimodal_phash's byte-space signature, same bit rule):
    * 60 raster samples at evenly strided row-major positions
    * idx_i = ⌊i·w·h/60⌋; bit i set iff 60·sample_i ≥ Σ samples —
    * all-integer arithmetic, so the oracle reproduces it bit-for-bit
    * from the planted gradient formula. Null if undecodable. */
  def imagePhash60(bytes: Array[Byte]): Any = {
    val m = decodeImageForPixels(bytes)
    if (m == null) return null
    val (raster, w, h) = m
    val n = w * h
    val samples = Array.tabulate(60) { i =>
      val idx = (i.toLong * n / 60).toInt
      raster.getSample(idx % w, idx / w, 0)
    }
    val tot = samples.sum
    var sig = 0L
    var i = 0
    while (i < 60) {
      if (60L * samples(i) >= tot) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Nearest-neighbor resize statistics over REAL decoded pixels:
    * target pixel (x2, y2) samples source (⌊x2·w/w2⌋, ⌊y2·h/h2⌋);
    * returns (px_sum, px_mean) of the resized grid — the decode +
    * downsample stage of an image-embedding pipeline, with the
    * resample rule simple enough to replay in closed form. */
  def imageResizeStats(bytes: Array[Byte], w2: Int, h2: Int): InternalRow = {
    val m = decodeImageForPixels(bytes)
    if (m == null) return null
    val (raster, w, h) = m
    var sum = 0L
    var y2 = 0
    while (y2 < h2) {
      var x2 = 0
      while (x2 < w2) {
        sum += raster.getSample(x2 * w / w2, y2 * h / h2, 0)
        x2 += 1
      }
      y2 += 1
    }
    new GenericInternalRow(Array[Any](
      sum, sum.toDouble / (w2.toLong * h2)))
  }

  private def decodeImageForPixels(bytes: Array[Byte])
      : (java.awt.image.Raster, Int, Int) =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) null else (img.getRaster, img.getWidth, img.getHeight)
    } catch { case _: Exception => null }

  /** Encode a REAL canonical 44-byte-header RIFF/WAVE file: 16-bit
    * PCM mono at `sampleRate`, samples from `amps` (one Int per
    * sample, clamped to short range), little-endian. */
  def encodeWavPcm16(sampleRate: Int, amps: ArrayData): Array[Byte] = {
    val n = amps.numElements()
    val dataSize = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) {
      val a = amps.getInt(i)
      buf.putShort(math.max(Short.MinValue.toInt,
        math.min(Short.MaxValue.toInt, a)).toShort)
      i += 1
    }
    buf.array()
  }

  /** Encode a REAL stereo RIFF/WAVE file: 16-bit PCM, TWO interleaved
    * channels (L first — the RIFF channel order), canonical 44-byte
    * header with channels=2 / blockAlign=4 / byteRate=rate·4. Frame
    * count is min(|left|, |right|) — an encoder must never invent
    * samples for the shorter lane. */
  def encodeWavPcm16Stereo(sampleRate: Int, left: ArrayData,
                           right: ArrayData): Array[Byte] = {
    val n = math.min(left.numElements(), right.numElements())
    val dataSize = n * 4
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(2)                       // stereo
      .putInt(sampleRate)
      .putInt(sampleRate * 4)            // byte rate
      .putShort(4)                       // block align (2 ch × 2 B)
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    def clamp(a: Int): Short = math.max(Short.MinValue.toInt,
      math.min(Short.MaxValue.toInt, a)).toShort
    var i = 0
    while (i < n) {
      buf.putShort(clamp(left.getInt(i)))
      buf.putShort(clamp(right.getInt(i)))
      i += 1
    }
    buf.array()
  }

  /** Stereo decode + DOWNMIX — the multi-channel path
    * [[wavFrameEnergies]] deliberately refuses (round-17 self-review:
    * framing interleaved stereo as mono silently doubles frame
    * counts): walks the RIFF chunk list, de-interleaves the two
    * 16-bit lanes, and reports per-channel RMS plus the RMS of the
    * standard (L+R)/2 mono downmix. Null for anything that is not
    * 16-bit 2-channel PCM — mono payloads belong to [[decodeWavMeta]].
    * Returns (sample_rate, n_frames, rms_l, rms_r, rms_mix). */
  def decodeWavStereo(bytes: Array[Byte]): InternalRow = {
    try {
      if (bytes.length < 12) return null
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      if (fourcc() != "RIFF") return null
      buf.getInt
      if (fourcc() != "WAVE") return null
      var sampleRate = 0; var channels = 0; var bits = 0; var fmtTag = 0
      var dataOff = -1; var dataLen = 0
      while (buf.remaining() >= 8) {
        val id = fourcc(); val sz = buf.getInt
        if (id == "fmt ") {
          val p = buf.position()
          fmtTag = buf.getShort.toInt
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt; buf.getShort
          bits = buf.getShort.toInt
          buf.position(p)
        } else if (id == "data") {
          dataOff = buf.position(); dataLen = sz
        }
        buf.position(buf.position() + sz + (sz & 1))
      }
      // fmtTag == 1 is WAVE_FORMAT_PCM — anything else (float 0x3,
      // EXTENSIBLE 0xFFFE, the common real-world multi-channel
      // container) is NOT raw 16-bit PCM even when bits/channels
      // read 16/2, and decoding it as such yields garbage RMS;
      // honor the scaladoc contract and refuse (r17 ADVICE)
      if (dataOff < 0 || fmtTag != 1 || bits != 16 || channels != 2)
        return null
      val nFrames = dataLen / 4
      val pcm = java.nio.ByteBuffer.wrap(bytes, dataOff, dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var sqL = 0.0; var sqR = 0.0; var sqM = 0.0
      var f = 0
      while (f < nFrames) {
        val l = pcm.getShort.toDouble
        val r = pcm.getShort.toDouble
        val m = (l + r) / 2.0
        sqL += l * l; sqR += r * r; sqM += m * m
        f += 1
      }
      def rms(sq: Double): Double =
        if (nFrames == 0) 0.0
        else math.rint(math.sqrt(sq / nFrames) * 10000) / 10000
      new GenericInternalRow(Array[Any](
        sampleRate, nFrames.toLong, rms(sqL), rms(sqR), rms(sqM)))
    } catch { case _: Exception => null }
  }

  /** Parse REAL WAV bytes by walking the RIFF chunk list (not fixed
    * offsets — real-world files carry LIST/fact chunks before data):
    * format fields from `fmt `, sample count from the data chunk
    * size, and the exact RMS over the actual PCM samples. Null for
    * non-RIFF payloads. */
  def decodeWavMeta(bytes: Array[Byte]): InternalRow = {
    try {
      if (bytes.length < 12) return null
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      if (fourcc() != "RIFF") return null
      buf.getInt // riff size
      if (fourcc() != "WAVE") return null
      var sampleRate = 0; var channels = 0; var bits = 0; var fmtTag = 0
      var dataOff = -1; var dataLen = 0
      while (buf.remaining() >= 8) {
        val id = fourcc(); val sz = buf.getInt
        if (id == "fmt ") {
          val p = buf.position()
          fmtTag = buf.getShort.toInt
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt; buf.getShort
          bits = buf.getShort.toInt
          buf.position(p)
        } else if (id == "data") {
          dataOff = buf.position(); dataLen = sz
        }
        buf.position(buf.position() + sz + (sz & 1)) // word-aligned
      }
      // PCM only (tag 1) — the RMS loop below reads raw 16-bit
      // samples, so a float/EXTENSIBLE payload must be refused, not
      // decoded as garbage (same gate as decodeWavStereo, r17 ADVICE)
      if (dataOff < 0 || fmtTag != 1 || bits != 16 || channels < 1)
        return null
      val nSamples = dataLen / 2 / channels
      var sumSq = 0.0
      var i = 0
      val pcm = java.nio.ByteBuffer.wrap(bytes, dataOff, dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      while (i < nSamples * channels) {
        val s = pcm.getShort.toDouble; sumSq += s * s; i += 1
      }
      val rms =
        if (nSamples == 0) 0.0
        else math.sqrt(sumSq / (nSamples.toLong * channels))
      new GenericInternalRow(Array[Any](
        sampleRate, channels, bits, nSamples.toLong,
        math.rint(rms * 10000) / 10000))
    } catch { case _: Exception => null }
  }

  /** Per-frame mean-absolute-amplitude energies over REAL WAV PCM:
    * the decode front-end of the VAD segmentation (the existing
    * multimodal_vad HOF algebra consumes this array). Frames of
    * `frameSamples`; a short tail frame is dropped (same rule as the
    * byte-stub VAD's DIV framing). Null for non-WAV payloads. */
  def wavFrameEnergies(bytes: Array[Byte], frameSamples: Int): ArrayData = {
    try {
      val meta = decodeWavMeta(bytes)
      if (meta == null) return null
      // MONO ONLY (round-17 self-review): framing interleaved stereo
      // samples as mono would silently double the frame count and mix
      // channels — refuse multi-channel like any undecodable payload
      if (meta.getInt(1) != 1) return null
      // re-locate the data chunk (decodeWavMeta validated the layout)
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.position(12)
      var dataOff = -1; var dataLen = 0
      while (buf.remaining() >= 8 && dataOff < 0) {
        val b4 = new Array[Byte](4); buf.get(b4)
        val id = new String(b4, "US-ASCII"); val sz = buf.getInt
        if (id == "data") { dataOff = buf.position(); dataLen = sz }
        else buf.position(buf.position() + sz + (sz & 1))
      }
      val nSamples = dataLen / 2
      val nFrames = nSamples / frameSamples
      val pcm = java.nio.ByteBuffer.wrap(bytes, dataOff, dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Any](nFrames)
      var f = 0
      while (f < nFrames) {
        var sum = 0.0
        var i = 0
        while (i < frameSamples) { sum += math.abs(pcm.getShort.toDouble); i += 1 }
        out(f) = math.rint(sum / frameSamples * 10000) / 10000
        f += 1
      }
      new GenericArrayData(out)
    } catch { case _: Exception => null }
  }
}

/** Real-PNG encoder expression: (width, height, gray) → PNG bytes. */
case class PngEncodeGray(w: Expression, h: Expression, gray: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(w, h, gray)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_png_encode_gray"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (int, int, int)")
  override def eval(input: InternalRow): Any = {
    val (a, b, c) = (w.eval(input), h.eval(input), gray.eval(input))
    if (a == null || b == null || c == null) null
    else MediaCodecsImpl.encodePngGray(
      a.asInstanceOf[Int], b.asInstanceOf[Int], c.asInstanceOf[Int])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (we, he, ge) = (w.genCode(ctx), h.genCode(ctx), gray.genCode(ctx))
    val code =
      code"""
        ${we.code}
        ${he.code}
        ${ge.code}
        boolean ${ev.isNull} = ${we.isNull} || ${he.isNull} || ${ge.isNull};
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.MediaCodecsImpl.encodePngGray(
            ${we.value}, ${he.value}, ${ge.value});
        }
      """
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PngEncodeGray =
    copy(w = newChildren(0), h = newChildren(1), gray = newChildren(2))
}

object PngEncodeGray {
  def apply(w: Column, h: Column, gray: Column): Column =
    shims.column(PngEncodeGray(
      shims.expression(w), shims.expression(h), shims.expression(gray)))
}

/** Real-image decoder expression: container bytes → struct(width,
  * height, format, px_mean) via ImageIO, null if undecodable. */
case class ImageMeta(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("format", StringType), StructField("px_mean", DoubleType)))
  override def prettyName: String = "graft_image_meta"
  override def nullSafeEval(input: Any): Any =
    MediaCodecsImpl.decodeImageMeta(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaCodecsImpl.decodeImageMeta($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageMeta {
  def apply(c: Column): Column = shims.column(ImageMeta(shims.expression(c)))
}

/** Real-WAV encoder expression: (sample_rate, amps array<int>) →
  * canonical RIFF/WAVE 16-bit PCM mono bytes. */
case class WavEncodePcm16(rate: Expression, amps: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(rate, amps)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_wav_encode_pcm16"
  override def checkInputDataTypes(): TypeCheckResult =
    (rate.dataType, amps.dataType) match {
      case (IntegerType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, array<int>)")
    }
  override def eval(input: InternalRow): Any = {
    val (r, a) = (rate.eval(input), amps.eval(input))
    if (r == null || a == null) null
    else MediaCodecsImpl.encodeWavPcm16(
      r.asInstanceOf[Int], a.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (re, ae) = (rate.genCode(ctx), amps.genCode(ctx))
    val code =
      code"""
        ${re.code}
        ${ae.code}
        boolean ${ev.isNull} = ${re.isNull} || ${ae.isNull};
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.MediaCodecsImpl.encodeWavPcm16(
            ${re.value}, ${ae.value});
        }
      """
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WavEncodePcm16 =
    copy(rate = newChildren(0), amps = newChildren(1))
}

object WavEncodePcm16 {
  def apply(rate: Column, amps: Column): Column =
    shims.column(WavEncodePcm16(shims.expression(rate), shims.expression(amps)))
}

/** Real stereo-WAV encoder expression: (sample_rate, left array<int>,
  * right array<int>) → RIFF/WAVE 16-bit 2-channel PCM bytes. */
case class WavEncodeStereo(rate: Expression, left: Expression,
                           right: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(rate, left, right)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_wav_encode_stereo"
  override def checkInputDataTypes(): TypeCheckResult =
    (rate.dataType, left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, array<int>, array<int>)")
    }
  override def eval(input: InternalRow): Any = {
    val (r, l, rr) = (rate.eval(input), left.eval(input), right.eval(input))
    if (r == null || l == null || rr == null) null
    else MediaCodecsImpl.encodeWavPcm16Stereo(r.asInstanceOf[Int],
      l.asInstanceOf[ArrayData], rr.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (re, le, rre) = (rate.genCode(ctx), left.genCode(ctx), right.genCode(ctx))
    val code =
      code"""
        ${re.code}
        ${le.code}
        ${rre.code}
        boolean ${ev.isNull} = ${re.isNull} || ${le.isNull} || ${rre.isNull};
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.MediaCodecsImpl.encodeWavPcm16Stereo(
            ${re.value}, ${le.value}, ${rre.value});
        }
      """
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WavEncodeStereo =
    copy(rate = newChildren(0), left = newChildren(1), right = newChildren(2))
}

object WavEncodeStereo {
  def apply(rate: Column, left: Column, right: Column): Column =
    shims.column(WavEncodeStereo(shims.expression(rate),
      shims.expression(left), shims.expression(right)))
}

/** Stereo-WAV decode + downmix: bytes → struct(sample_rate, n_frames,
  * rms_l, rms_r, rms_mix), null unless 16-bit 2-channel PCM. */
case class WavStereoMeta(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType), StructField("n_frames", LongType),
    StructField("rms_l", DoubleType), StructField("rms_r", DoubleType),
    StructField("rms_mix", DoubleType)))
  override def prettyName: String = "graft_wav_stereo_meta"
  override def nullSafeEval(input: Any): Any =
    MediaCodecsImpl.decodeWavStereo(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaCodecsImpl.decodeWavStereo($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): WavStereoMeta =
    copy(child = newChild)
}

object WavStereoMeta {
  def apply(c: Column): Column = shims.column(WavStereoMeta(shims.expression(c)))
}

/** Real-WAV header/PCM parser: bytes → struct(sample_rate, channels,
  * bits, n_samples, rms), null for non-RIFF payloads. */
case class WavMeta(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
    StructField("bits", IntegerType), StructField("n_samples", LongType),
    StructField("rms", DoubleType)))
  override def prettyName: String = "graft_wav_meta"
  override def nullSafeEval(input: Any): Any =
    MediaCodecsImpl.decodeWavMeta(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaCodecsImpl.decodeWavMeta($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): WavMeta =
    copy(child = newChild)
}

object WavMeta {
  def apply(c: Column): Column = shims.column(WavMeta(shims.expression(c)))
}

/** Per-frame VAD energies over real WAV PCM: bytes → array<double>
  * of mean |amplitude| per `frameSamples` window. */
case class WavFrameEnergies(child: Expression, frameSamples: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_wav_frame_energies"
  override def nullSafeEval(input: Any): Any =
    MediaCodecsImpl.wavFrameEnergies(input.asInstanceOf[Array[Byte]], frameSamples)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaCodecsImpl.wavFrameEnergies($c, $frameSamples);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): WavFrameEnergies =
    copy(child = newChild)
}

object WavFrameEnergies {
  def apply(c: Column, frameSamples: Int): Column =
    shims.column(WavFrameEnergies(shims.expression(c), frameSamples))
}

/** Gradient-fill image encoder: (w, h, a, b, c) → real container bytes
  * (`fmt` ∈ png/bmp/gif) with pixel(x,y) = (a·x + b·y + c) mod 256. */
case class PngEncodeGradient(children: Seq[Expression], fmt: String = "png")
    extends Expression {
  require(children.size == 5, s"$prettyName takes (w, h, a, b, c)")
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_png_encode_gradient"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires five ints")
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      val Seq(w, h, a, b, c) = vs.map(_.asInstanceOf[Int])
      MediaCodecsImpl.encodeImageGradient(w, h, a, b, c, fmt)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gs = children.map(_.genCode(ctx))
    val anyNull = gs.map(_.isNull).mkString(" || ")
    val argv = gs.map(_.value).mkString(", ")
    val code =
      code"""
        ${gs.map(_.code).reduce(_ + _)}
        boolean ${ev.isNull} = $anyNull;
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.MediaCodecsImpl.encodeImageGradient($argv, "$fmt");
        }
      """
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PngEncodeGradient =
    copy(children = newChildren)
}

object PngEncodeGradient {
  def apply(w: Column, h: Column, a: Column, b: Column, c: Column): Column =
    apply(w, h, a, b, c, "png")
  def apply(w: Column, h: Column, a: Column, b: Column, c: Column,
            fmt: String): Column =
    shims.column(PngEncodeGradient(
      Seq(w, h, a, b, c).map(shims.expression), fmt))
}

/** Pixel-space 60-bit average-hash over real decoded image bytes. */
case class ImagePhash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_image_phash60"
  override def nullSafeEval(input: Any): Any =
    MediaCodecsImpl.imagePhash60(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // fresh local: a fixed name would collide when two ImagePhash60
      // calls land in one codegen scope (round-17 self-review)
      val r = ctx.freshName("phashRes")
      s"""
      Object $r = graft.functions.MediaCodecsImpl.imagePhash60($c);
      ${ev.isNull} = $r == null;
      ${ev.value} = ${ev.isNull} ? -1L : ((Long) $r).longValue();
    """
    })
  override protected def withNewChildInternal(newChild: Expression): ImagePhash60 =
    copy(child = newChild)
}

object ImagePhash60 {
  def apply(c: Column): Column = shims.column(ImagePhash60(shims.expression(c)))
}

/** Nearest-neighbor resize stats (px_sum, px_mean) over real pixels. */
case class ImageResizeStats(child: Expression, w2: Int, h2: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("px_sum", LongType), StructField("px_mean", DoubleType)))
  override def prettyName: String = "graft_image_resize_stats"
  override def nullSafeEval(input: Any): Any =
    MediaCodecsImpl.imageResizeStats(input.asInstanceOf[Array[Byte]], w2, h2)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaCodecsImpl.imageResizeStats($c, $w2, $h2);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): ImageResizeStats =
    copy(child = newChild)
}

object ImageResizeStats {
  def apply(c: Column, w2: Int, h2: Int): Column =
    shims.column(ImageResizeStats(shims.expression(c), w2, h2))
}
