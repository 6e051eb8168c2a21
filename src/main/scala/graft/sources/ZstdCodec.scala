package graft.sources

import java.io.{InputStream, OutputStream}

import org.apache.hadoop.io.compress.{
  CompressionCodec, CompressionInputStream, CompressionOutputStream,
  Compressor, Decompressor}

/** Hadoop codec for `.zst` backed by the PURE-JVM-loadable zstd-jni
  * library Spark itself ships for shuffle/event-log compression
  * (`com.github.luben.zstd`), so framed `.frames.zst` archives read
  * and write in ANY Spark runtime — Hadoop's own `ZStandardCodec`
  * needs a libhadoop built against libzstd, which most container
  * images (this one included) don't carry. i3cols reads `.i3.zst`
  * transparently `[public-repo: i3cols/extract.py]`; this codec is
  * what makes the framed connector's extension-resolved codec path
  * (`FramedSource.openFramesAt`) cover it.
  *
  * Registered by [[FramedSource.sessionHadoopConf]] via
  * `io.compression.codecs` (replacing the native-only
  * `ZStandardCodec` for the `.zst` extension). Only the streaming
  * half of the codec contract is implemented — the framed reader and
  * writer (and the write-build `concatMemberSafe` probe) use
  * `createInputStream(in)` / `createOutputStream(out)` exclusively;
  * the pooled Compressor/Decompressor surface returns null so
  * `CodecPool` callers fall back to the stream path. zstd frames
  * concatenate into a valid stream and `ZstdInputStream` decodes
  * across frame boundaries, so the probe admits BLOCK compression:
  * engine-written `.frames.zst` splits on member boundaries exactly
  * like `.frames.gz`. */
final class ZstdCodec extends CompressionCodec {

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new CompressionOutputStream(out) {
      private val z = new com.github.luben.zstd.ZstdOutputStream(out)
      override def write(b: Int): Unit = z.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        z.write(b, off, len)
      // a zstd frame only seals on close; flush pushes what it can
      override def finish(): Unit = z.flush()
      override def resetState(): Unit = ()
      override def flush(): Unit = z.flush()
      override def close(): Unit = z.close()
    }

  override def createOutputStream(out: OutputStream,
                                  c: Compressor): CompressionOutputStream =
    createOutputStream(out) // stream-only codec: pooled compressor unused

  override def createInputStream(in: InputStream): CompressionInputStream =
    new CompressionInputStream(in) {
      // setContinuous(false) keeps underlying-EOF = stream end;
      // concatenated frames within the stream decode seamlessly
      private val z = new com.github.luben.zstd.ZstdInputStream(in)
      override def read(): Int = z.read()
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        z.read(b, off, len)
      override def resetState(): Unit = ()
      override def available(): Int = z.available()
      override def close(): Unit = z.close()
    }

  override def createInputStream(in: InputStream,
                                 d: Decompressor): CompressionInputStream =
    createInputStream(in)

  override def getCompressorType: Class[_ <: Compressor] = null
  override def createCompressor(): Compressor = null
  override def getDecompressorType: Class[_ <: Decompressor] = null
  override def createDecompressor(): Decompressor = null
  override def getDefaultExtension: String = ".zst"
}
