package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
import graft.operators.{MediaHeaders, Multimodal}

/** Header parsers against REAL container bytes produced by the JDK's own
  * encoders (ImageIO, AudioSystem) — independent implementations of the
  * same public formats — plus the HeaderDecoder end-to-end in Spark. */
class MediaHeadersSpec extends SparkSpec {

  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos), s"JDK has no $format writer")
    bos.toByteArray
  }

  /** 16-bit mono PCM WAV: `frames` frames at `hz` → duration frames/hz. */
  private def wavBytes(hz: Int, frames: Int): Array[Byte] = {
    val fmt = new AudioFormat(hz.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](frames * 2)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("PNG dimensions parse from real ImageIO output") {
    assert(MediaHeaders.imageDims(imageBytes(12, 7, "png")) === Some((12, 7)))
    assert(MediaHeaders.pngDims(imageBytes(640, 480, "png")) === Some((640, 480)))
  }

  test("JPEG dimensions parse from real ImageIO output") {
    assert(MediaHeaders.imageDims(imageBytes(33, 21, "jpg")) === Some((33, 21)))
    assert(MediaHeaders.jpegDims(imageBytes(1024, 3, "jpg")) === Some((1024, 3)))
  }

  test("GIF dimensions parse from real ImageIO output") {
    assert(MediaHeaders.imageDims(imageBytes(9, 5, "gif")) === Some((9, 5)))
  }

  test("WAV duration parses from real AudioSystem output") {
    // 8000 frames at 8 kHz = exactly 1 s; 4000 = 500 ms
    assert(MediaHeaders.wavDurationMs(wavBytes(8000, 8000)) === Some(1000L))
    assert(MediaHeaders.wavDurationMs(wavBytes(8000, 4000)) === Some(500L))
  }

  test("foreign, truncated, and hostile bytes are None, never a throw") {
    assert(MediaHeaders.imageDims("not an image at all".getBytes("UTF-8")) === None)
    assert(MediaHeaders.imageDims(Array.empty[Byte]) === None)
    assert(MediaHeaders.wavDurationMs("RIFFxxxx".getBytes("UTF-8")) === None)
    // real headers truncated mid-structure
    assert(MediaHeaders.imageDims(imageBytes(12, 7, "png").take(15)) === None)
    assert(MediaHeaders.imageDims(imageBytes(12, 7, "jpg").take(3)) === None)
    // WAV with a size field that would overflow the chunk walk
    val hostile = "RIFFÿÿÿÿWAVE".getBytes("ISO-8859-1") ++
      "fmt ".getBytes("UTF-8") ++ Array[Byte](-1, -1, -1, 127)
    assert(MediaHeaders.wavDurationMs(hostile) === None)
    // chunk sizes crafted so a 32-bit-truncating walk would CYCLE between
    // positive offsets (12 -> 252 -> 12 -> …) instead of terminating: the
    // parser must return None in finite time, never hang the task
    val cyclic = new Array[Byte](300)
    def put(off: Int, s: String): Unit =
      s.getBytes("ISO-8859-1").zipWithIndex.foreach { case (b, i) => cyclic(off + i) = b }
    def putLe32(off: Int, v: Long): Unit =
      (0 until 4).foreach(i => cyclic(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    put(0, "RIFF"); putLe32(4, 292); put(8, "WAVE")
    put(12, "JUNK"); putLe32(16, 232) // -> next chunk at 252
    put(252, "JUNK"); putLe32(256, 0xFFFFFF08L) // Int-truncated: back to 12
    assert(MediaHeaders.wavDurationMs(cyclic) === None)
  }

  test("HeaderDecoder reports real metadata in the Spark pipeline, stub otherwise") {
    val s = spark; import s.implicits._
    val items = Seq(
      Multimodal.MediaItem(1L, "image", imageBytes(120, 45, "png"), "image/png", "a"),
      Multimodal.MediaItem(2L, "image", imageBytes(64, 32, "jpg"), "image/jpeg", "b"),
      Multimodal.MediaItem(3L, "audio", wavBytes(16000, 8000), "audio/wav", "c"),
      Multimodal.MediaItem(4L, "image", "definitely text".getBytes("UTF-8"),
        "application/octet-stream", "d")).toDS()
    val dec = new Multimodal.HeaderDecoder()
    val got = Multimodal.extractFeatures(items, dec)
      .collect().map(f => f.item_id -> f).toMap
    assert((got(1L).width, got(1L).height) === ((120, 45)))
    assert((got(2L).width, got(2L).height) === ((64, 32)))
    assert(got(3L).duration_ms === 500L)
    // unparseable payload → the stub's md5-derived dimensions, not a crash
    val stub = new Multimodal.StubDecoder().decode(
      Multimodal.MediaItem(4L, "image", "definitely text".getBytes("UTF-8"),
        "application/octet-stream", "d"))
    assert((got(4L).width, got(4L).height) === ((stub.width, stub.height)))
  }

  test("probeDuration reads the WAV header without the stub fallback") {
    val item = Multimodal.MediaItem(9L, "audio", wavBytes(22050, 22050), "audio/wav", "x")
    assert(new Multimodal.HeaderDecoder().probeDuration(item) === 1000L)
  }
}
