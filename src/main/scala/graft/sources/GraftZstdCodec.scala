package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream, OutputStream}

import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream,
  CompressionOutputStream, Compressor, Decompressor}

/** zstd codec for Hadoop containers, backed by zstd-jni — the PURE-JVM
  * leg the reference's own codec lacks: hadoop's ZStandardCodec
  * (hadoop-common-project/hadoop-common/src/main/java/org/apache/
  * hadoop/io/compress/ZStandardCodec.java:1) binds to libhadoop's
  * native zstd, which this container ships without (probed r18:
  * "native zStandard library not available"), exactly the pre-3.3
  * situation snappy and lz4 were in before HADOOP-17125/17292 gave
  * them java-library backends. This class is that same move for zstd,
  * ~a decade of warehouse default later: zstd-jni (shipped with Spark
  * for parquet/shuffle) provides the frames; this adapter speaks
  * hadoop's codec SPI so SequenceFile's BLOCK writer/reader use it
  * like any built-in codec, and the header records the codec class
  * for any reader with this jar on the classpath.
  *
  * STREAM-BASED, NULL COMPRESSOR TYPES — deliberately: the
  * Compressor/Decompressor half of the SPI exists for native codecs
  * with reusable direct-buffer state. SequenceFile null-guards the
  * pooled compressor end to end (CodecPool.getCompressor returns the
  * createCompressor() null, returnCompressor(null) no-ops) and hands
  * it to createOutputStream, which here ignores it — the pre-native
  * BZip2Codec shipped for years on exactly this contract. Zstd frames
  * are SELF-DELIMITING with the content size in the frame header, so
  * each SequenceFile block (the codec sees one buffer per
  * resetState/finish cycle; SequenceFile itself VInt-frames the
  * compressed length) round-trips as one frame with no out-of-band
  * state.
  *
  * Scale posture: identical to the snappy/lz4 cells — BLOCK
  * compression amortizes the codec across records, sync markers
  * between blocks keep the container splittable, and the per-block
  * buffer the one-shot frame holds is bounded by
  * io.seqfile.compress.blocksize (1 MB default), not file size. */
final class GraftZstdCodec extends CompressionCodec {

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new GraftZstdCodec.ZstdFrameOutputStream(out)

  override def createOutputStream(out: OutputStream,
      compressor: Compressor): CompressionOutputStream =
    new GraftZstdCodec.ZstdFrameOutputStream(out) // stream-based: pooled compressor unused

  override def getCompressorType: Class[_ <: Compressor] = null

  override def createCompressor(): Compressor = null

  override def createInputStream(in: InputStream): CompressionInputStream =
    new GraftZstdCodec.ZstdFrameInputStream(in)

  override def createInputStream(in: InputStream,
      decompressor: Decompressor): CompressionInputStream =
    new GraftZstdCodec.ZstdFrameInputStream(in)

  override def getDecompressorType: Class[_ <: Decompressor] = null

  override def createDecompressor(): Decompressor = null

  override def getDefaultExtension: String = ".zst"
}

object GraftZstdCodec {

  /** One zstd frame per finish() cycle: bytes buffer until finish()
    * (SequenceFile writes a whole block, then flush+finish — the frame
    * is emitted complete, with content size in its header), and
    * resetState() arms the stream for the next block over the same
    * underlying buffer. Level 3 — zstd's own default, the
    * ratio/speed point warehouses pick it for. */
  private final class ZstdFrameOutputStream(out: OutputStream)
      extends CompressionOutputStream(out) {
    private val buf = new ByteArrayOutputStream()
    private var finished = false

    override def write(b: Int): Unit = buf.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      buf.write(b, off, len)

    override def finish(): Unit = if (!finished) {
      val framed = new ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(framed, 3)
      try z.write(buf.toByteArray) finally z.close()
      framed.writeTo(out)
      finished = true
    }

    override def resetState(): Unit = { buf.reset(); finished = false }

    override def flush(): Unit = () // finish() emits the frame whole
  }

  /** Reads the WHOLE underlying buffer as one zstd frame on first
    * read after resetState() — SequenceFile resets the backing
    * DataInputBuffer to exactly one block's compressed bytes before
    * calling resetState(), so "until EOF" is "this block". */
  private final class ZstdFrameInputStream(in: InputStream)
      extends CompressionInputStream(in) {
    private var decoded: ByteArrayInputStream = null

    private def ensure(): Unit = if (decoded == null) {
      val z = new com.github.luben.zstd.ZstdInputStream(
        new ByteArrayInputStream(in.readAllBytes()))
      try decoded = new ByteArrayInputStream(z.readAllBytes()) finally z.close()
    }

    override def read(): Int = { ensure(); decoded.read() }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      ensure(); decoded.read(b, off, len)
    }

    override def resetState(): Unit = decoded = null
  }
}
