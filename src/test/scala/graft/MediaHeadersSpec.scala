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

  // ---------------------------------------------------------- MP4 / mvhd

  /** Minimal hand-built ISO-BMFF boxes (ISO/IEC 14496-12 public layout). */
  private def box(boxType: String, payload: Array[Byte],
      largesize: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit =
      (24 to 0 by -8).foreach(s => bos.write(((v >> s) & 0xff).toInt))
    if (largesize) {
      be32(1L); bos.write(boxType.getBytes("US-ASCII"))
      (56 to 0 by -8).foreach(s =>
        bos.write((((16L + payload.length) >> s) & 0xff).toInt))
    } else {
      be32(8L + payload.length); bos.write(boxType.getBytes("US-ASCII"))
    }
    bos.write(payload); bos.toByteArray
  }

  private def mvhdV0(timescale: Long, duration: Long): Array[Byte] = {
    val p = new Array[Byte](100) // version 0 mvhd body is 100 bytes
    def be32(off: Int, v: Long): Unit =
      (0 until 4).foreach(i => p(off + i) = ((v >> (24 - 8 * i)) & 0xff).toByte)
    be32(12, timescale); be32(16, duration)
    p
  }

  private def mvhdV1(timescale: Long, duration: Long): Array[Byte] = {
    val p = new Array[Byte](112) // version 1 body
    p(0) = 1
    def be32(off: Int, v: Long): Unit =
      (0 until 4).foreach(i => p(off + i) = ((v >> (24 - 8 * i)) & 0xff).toByte)
    def be64(off: Int, v: Long): Unit =
      (0 until 8).foreach(i => p(off + i) = ((v >> (56 - 8 * i)) & 0xff).toByte)
    be32(20, timescale); be64(24, duration)
    p
  }

  private val ftyp = box("ftyp", "isom0000isom".getBytes("US-ASCII"))

  test("MP4 mvhd duration parses: version 0, version 1, mdat-before-moov, largesize") {
    val v0 = ftyp ++ box("moov", box("mvhd", mvhdV0(1000, 7500)))
    assert(MediaHeaders.mp4DurationMs(v0) === Some(7500L))
    val v1 = ftyp ++ box("moov", box("mvhd", mvhdV1(90000, 90000L * 61)))
    assert(MediaHeaders.mp4DurationMs(v1) === Some(61000L))
    // moov after a large mdat (the common streaming-unfriendly layout)
    val tail = ftyp ++ box("mdat", new Array[Byte](5000)) ++
      box("moov", box("mvhd", mvhdV0(600, 1200)))
    assert(MediaHeaders.mp4DurationMs(tail) === Some(2000L))
    // 64-bit largesize mdat, then moov
    val ls = ftyp ++ box("mdat", new Array[Byte](64), largesize = true) ++
      box("moov", box("mvhd", mvhdV0(1000, 250)))
    assert(MediaHeaders.mp4DurationMs(ls) === Some(250L))
  }

  test("MP4 parser is total on hostile bytes") {
    assert(MediaHeaders.mp4DurationMs("no mp4 here at all".getBytes) === None)
    assert(MediaHeaders.mp4DurationMs(Array.emptyByteArray) === None)
    // truncated mid-moov
    val good = ftyp ++ box("moov", box("mvhd", mvhdV0(1000, 7500)))
    assert(MediaHeaders.mp4DurationMs(good.take(good.length - 40)) === None)
    // hostile size: a box claiming to extend past EOF
    val hostile = ftyp.clone()
    hostile(0) = 0x7f // ftyp size becomes enormous
    assert(MediaHeaders.mp4DurationMs(hostile) === None)
    // size < header (cycle bait)
    val tiny = ftyp ++ Array[Byte](0, 0, 0, 4) ++ "moov".getBytes("US-ASCII")
    assert(MediaHeaders.mp4DurationMs(tiny) === None)
    // zero timescale must not divide
    assert(MediaHeaders.mp4DurationMs(
      ftyp ++ box("moov", box("mvhd", mvhdV0(0, 7500)))) === None)
    // all-ones "duration unknown" sentinel (ISO 14496-12), both versions
    assert(MediaHeaders.mp4DurationMs(
      ftyp ++ box("moov", box("mvhd", mvhdV0(1000, 0xFFFFFFFFL)))) === None)
    assert(MediaHeaders.mp4DurationMs(
      ftyp ++ box("moov", box("mvhd", mvhdV1(1000, -1L)))) === None) // u64 all-ones
    // hostile u64 duration whose *1000 would overflow Long → None, not garbage
    assert(MediaHeaders.mp4DurationMs(
      ftyp ++ box("moov",
        box("mvhd", mvhdV1(1000, Long.MaxValue / 1000L + 1L)))) === None)
    // the largest representable duration still parses (boundary of the guard)
    assert(MediaHeaders.mp4DurationMs(
      ftyp ++ box("moov",
        box("mvhd", mvhdV1(1000, Long.MaxValue / 1000L)))).isDefined)
  }

  test("sampleFrames midpoint timestamps are real over an MP4 mvhd duration") {
    val s = spark; import s.implicits._
    val mp4 = ftyp ++ box("moov", box("mvhd", mvhdV0(1000, 6000))) // 6s
    val items = Seq(
      Multimodal.MediaItem(1L, "video", mp4, "video/mp4", "v")).toDS()
    val frames = Multimodal.sampleFrames(items, 3, new Multimodal.HeaderDecoder())
      .collect().sortBy(_.frame_index)
    // midpoint rule: frame i at (2i+1)/(2n) of 6000ms → 1000, 3000, 5000
    assert(frames.map(_.ts_ms).toSeq === Seq(1000L, 3000L, 5000L))
  }
}
