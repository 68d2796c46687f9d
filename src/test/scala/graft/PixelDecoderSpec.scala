package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaItem, PixelDecoder, StubDecoder}

/** Real raster decode through JDK ImageIO: content features computed from
  * actual pixels for the formats the JDK ships codecs for, per-item
  * fallback for everything else. */
class PixelDecoderSpec extends SparkSpec {

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  private def solid(w: Int, h: Int, r: Int, g: Int, b: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  test("solid-color PNG/BMP/GIF decode to exact channel means and a one-hot luminance bin") {
    val dec = new PixelDecoder()
    for (fmt <- Seq("png", "bmp", "gif")) {
      // (200, 40, 10): luma = 0.299*200 + 0.587*40 + 0.114*10 = 84.42 → bin 2
      val feats = dec.decode(MediaItem(1L, "image", encode(solid(7, 5, 200, 40, 10), fmt), "", ""))
      assert(feats.width === 7 && feats.height === 5, fmt)
      assert(feats.feature.length === 3 + Multimodal.LumBins, fmt)
      assert(feats.feature(0) === 200.0f, fmt)
      assert(feats.feature(1) === 40.0f, fmt)
      assert(feats.feature(2) === 10.0f, fmt)
      val hist = feats.feature.drop(3)
      assert(hist(2) === 1.0f, fmt)
      assert(hist.sum === 1.0f, fmt)
    }
  }

  test("gradient PNG: means and histogram match a direct raster computation") {
    val w = 16; val h = 4
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 60) << 8) | 128)
    val feats = new PixelDecoder().decode(MediaItem(2L, "image", encode(img, "png"), "", ""))
    val pixels = for (y <- 0 until h; x <- 0 until w) yield (x * 16, y * 60, 128)
    val n = (w * h).toDouble
    assert(feats.feature(0) === (pixels.map(_._1).sum / n).toFloat)
    assert(feats.feature(1) === (pixels.map(_._2).sum / n).toFloat)
    assert(feats.feature(2) === (pixels.map(_._3).sum / n).toFloat)
    val bins = new Array[Long](Multimodal.LumBins)
    pixels.foreach { case (r, g, b) =>
      val lum = 0.299 * r + 0.587 * g + 0.114 * b
      bins(math.min(Multimodal.LumBins - 1, (lum / 32.0).toInt)) += 1
    }
    assert(feats.feature.drop(3).toSeq === bins.map(c => (c / n).toFloat).toSeq)
  }

  test("solid-color JPEG decodes near-exact (lossy codec, tight tolerance)") {
    val feats = new PixelDecoder().decode(
      MediaItem(3L, "image", encode(solid(32, 32, 100, 150, 50), "jpg"), "", ""))
    assert(feats.width === 32 && feats.height === 32)
    assert(math.abs(feats.feature(0) - 100.0f) < 3.0f)
    assert(math.abs(feats.feature(1) - 150.0f) < 3.0f)
    assert(math.abs(feats.feature(2) - 50.0f) < 3.0f)
  }

  test("undecodable bytes and non-image kinds fall back per item, never throw") {
    val stub = new StubDecoder(4)
    val dec = new PixelDecoder(stub)
    // Array fields break case-class equality — compare a field view
    def view(f: Multimodal.MediaFeatures) =
      (f.item_id, f.kind, f.n_bytes, f.width, f.height, f.duration_ms, f.feature.toSeq)
    val garbage = MediaItem(4L, "image", Array[Byte](1, 2, 3, 4, 5), "", "")
    assert(view(dec.decode(garbage)) === view(stub.decode(garbage)))
    val audio = MediaItem(5L, "audio", encode(solid(2, 2, 1, 2, 3), "png"), "", "")
    assert(view(dec.decode(audio)) === view(stub.decode(audio))) // kind gate, not byte sniffing
    val empty = MediaItem(6L, "image", Array.empty[Byte], "", "")
    assert(view(dec.decode(empty)) === view(stub.decode(empty)))
  }

  test("distributed: executors generate PNGs, PixelDecoder recovers the exact colors") {
    val s = spark; import s.implicits._
    val items = s.range(0, 40).as[Long].mapPartitions(_.map { i =>
      val r = (i * 37 % 256).toInt; val g = (i * 59 % 256).toInt; val b = (i * 83 % 256).toInt
      val img = new BufferedImage(4 + (i % 5).toInt, 3, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      MediaItem(i, "image", bos.toByteArray, "image/png", s"synth://$i")
    })
    val feats = Multimodal.extractFeatures(items, new PixelDecoder()).collect()
    assert(feats.length === 40)
    feats.foreach { f =>
      assert(f.feature(0) === (f.item_id * 37 % 256).toFloat)
      assert(f.feature(1) === (f.item_id * 59 % 256).toFloat)
      assert(f.feature(2) === (f.item_id * 83 % 256).toFloat)
      assert(f.width === 4 + (f.item_id % 5).toInt)
    }
  }
}
