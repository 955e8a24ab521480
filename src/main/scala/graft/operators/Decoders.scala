package graft.operators

import java.io.{ByteArrayInputStream, InputStream}
import scala.util.control.NonFatal

/** The formal codec seam for the multimodal operators.
  *
  * The Spark-side plumbing in [[Multimodal]] — bounded-batch
  * `mapPartitions`, decompression-bomb guards, fixed-point statistics over
  * decoded pixels/samples — is codec-agnostic. What varies per corpus is
  * the bytes→decoded-representation step: the container's JDK-built-in
  * codecs cover PNG/JPEG/BMP/GIF and 16-bit PCM WAV, while entropy-coded
  * formats (H.264, AAC, MP3, WebP) need an external native library that is
  * deliberately NOT bundled here. These traits pin the swap-in point so a
  * deployment plugs a real codec WITHOUT touching operator code:
  * `decodeImages(ds, decoder = MyJniH264Decoder)`.
  *
  * Contract notes shared by both traits:
  *   - `open()` runs once per Spark partition BEFORE any decode — the
  *     place for native-lib load / codec-context allocation that must not
  *     happen per record (the image path uses it to disable ImageIO's
  *     file-backed stream cache: one temp file per payload otherwise).
  *   - `decode` returns `None` for any payload the codec does not handle
  *     or refuses (bomb claims, implausible headers). Operators map `None`
  *     to their marker rows; a decoder must NEVER throw for malformed
  *     bytes — crawl corpora are adversarial and a poison payload must
  *     cost one marker row, not a task retry storm.
  *   - Implementations must be `Serializable` (they ship inside the
  *     `mapPartitions` closure) and thread-safe across partitions — one
  *     instance is shared by all tasks in the JVM, so per-decode state
  *     belongs in locals or in `open()`-initialized ThreadLocals.
  */
object Decoders {

  /** Decoded-audio handoff: interleaved 16-bit signed little-endian PCM.
    * `data` streams raw sample bytes (2 bytes per sample, channels
    * interleaved per frame) — a streaming contract, not an array, so a
    * decoder never materializes a whole clip and the operator's stats
    * loop reads through one per-partition buffer with zero per-record
    * allocation (the r8 q102 variance fix, preserved across the seam).
    */
  final class PcmStream(val channels: Int, val sampleRate: Int,
                        val data: InputStream) extends java.io.Closeable {
    override def close(): Unit = data.close()
  }

  /** bytes → decoded raster. A `BufferedImage` is the handoff type: plain
    * JDK, codec-neutral, and what any native decoder's RGB/gray output
    * wraps in a few lines. `maxPixels` is the allocation bound the decoder
    * must enforce BEFORE decoding (from header claims, not decoded size).
    */
  trait ImageDecoder extends Serializable {
    def open(): Unit = ()
    def decode(bytes: Array[Byte], maxPixels: Long): Option[java.awt.image.BufferedImage]
  }

  /** bytes → decoded PCM. The returned stream is owned by the caller
    * (operators close it after the stats loop). Gates on header claims
    * (encoding, bit depth, channel/rate plausibility) belong HERE — the
    * operator trusts `channels`/`sampleRate` for its fixed-point math.
    */
  trait AudioDecoder extends Serializable {
    def open(): Unit = ()
    def decode(bytes: Array[Byte]): Option[PcmStream]
  }

  /** Default image path: `javax.imageio` (PNG/JPEG/BMP/GIF — JDK
    * built-in, no external codec). Bomb guard via
    * [[Multimodal.claimedPixels]]: reads what ImageIO would ALLOCATE for
    * every format it decodes BEFORE any decode, so a few-hundred-byte
    * payload claiming 10⁹×10⁹ degrades to `None` instead of an executor
    * OOM.
    */
  object JdkImageDecoder extends ImageDecoder {
    // ImageIO's default ImageInputStream cache is FILE-backed: one temp
    // file created and deleted per payload (q82 at sf0.1: 3.85 s file-
    // cached vs 0.65 s memory-backed). JVM-global + idempotent.
    override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)
    override def decode(bytes: Array[Byte], maxPixels: Long)
        : Option[java.awt.image.BufferedImage] =
      if (Multimodal.claimedPixels(bytes) > maxPixels) None
      else try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case NonFatal(_) => None }
  }

  /** Default audio path: RIFF/WAVE 16-bit signed PCM via
    * `javax.sound.sampled` (JDK built-in). Cheap container sniff runs
    * BEFORE the `AudioSystem` SPI provider search — the provider loop
    * constructs (and swallows) an exception per non-matching reader, pure
    * allocation/GC pressure at corpus scale (r8 q102 variance item).
    * Output-identical short-circuit: the only non-RIFF containers the JDK
    * readers decode (AU, AIFF) are big-endian and were already gated out.
    */
  object JdkWavDecoder extends AudioDecoder {
    private def isRiffWave(b: Array[Byte]): Boolean =
      b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    override def decode(bytes: Array[Byte]): Option[PcmStream] = {
      if (!isRiffWave(bytes)) return None
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
        catch { case NonFatal(_) => return None }
      val fmt = ais.getFormat
      val channels = fmt.getChannels
      val rate = math.round(fmt.getSampleRate)
      // plausibility gate on header CLAIMS before touching sample data:
      // only 16-bit signed little-endian PCM is in scope (the
      // near-universal WAV payload), and channel/rate claims outside any
      // real recording mark the payload undecodable instead of poisoning
      // downstream stats (0 channels would divide by zero; a 2^31 rate
      // makes every duration 0). AudioInputStream already truncates a
      // lying data-chunk size at the real payload end, and nothing is
      // ever allocated at claimed size — the audio analog of the image
      // bomb guard.
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
        channels < 1 || channels > 64 || rate < 1 || rate > 4000000) {
        try ais.close() catch { case NonFatal(_) => () }
        None
      } else Some(new PcmStream(channels, rate, ais))
    }
  }
}
