package graft

import java.nio.file.{Files, Paths}
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaItem, StubDecoder}

class MultimodalSpec extends SparkSpec {

  test("binaryFile read → partition-local decode → features, deterministic") {
    val dir = tmpDir("media")
    Files.write(Paths.get(dir, "a.bin"), Array[Byte](1, 2, 3, 4))
    Files.write(Paths.get(dir, "b.bin"), Array[Byte](9, 8, 7))
    val items = Multimodal.readMediaDir(spark, dir, "image")
    assert(items.count() === 2)

    val feats = Multimodal.extractFeatures(items, new StubDecoder(4)).collect()
    assert(feats.length === 2)
    assert(feats.forall(_.feature.length === 4))
    assert(feats.forall(f => f.width > 0 && f.height > 0)) // image kind
    assert(feats.forall(_.duration_ms === -1L)) // not a timed medium
    assert(feats.map(f => f.item_id -> f.n_bytes).toMap.values.toSet === Set(4L, 3L))

    // decode is a pure function of the payload: re-running gives identical rows
    val again = Multimodal.extractFeatures(items, new StubDecoder(4)).collect()
    assert(feats.map(_.feature.toSeq).toSet === again.map(_.feature.toSeq).toSet)
  }

  test("audio/video kinds populate duration, not dimensions") {
    val s = spark; import s.implicits._
    val items = Seq(
      MediaItem(1L, "audio", Array[Byte](5, 5), "audio/wav", "x"),
      MediaItem(2L, "video", Array[Byte](6, 6), "video/mp4", "y")).toDS()
    val byKind = Multimodal.extractFeatures(items, new StubDecoder(2))
      .collect().map(f => f.kind -> f).toMap
    assert(byKind("audio").duration_ms >= 0 && byKind("audio").width === -1)
    assert(byKind("video").duration_ms >= 0 && byKind("video").width > 0)
  }

  test("frame sampling: one video row fans out to n image frames, deterministically") {
    val s = spark; import s.implicits._
    val items = Seq(
      MediaItem(7L, "video", Array[Byte](1, 2, 3), "video/mp4", "v"),
      MediaItem(8L, "image", Array[Byte](4, 5), "image/png", "i")) // ignored
      .toDS()
    val frames = Multimodal.sampleFrames(items, n = 4, new StubDecoder(2))
      .collect().sortBy(_.frame_index)
    assert(frames.length === 4) // only the video fans out
    assert(frames.map(_.item_id).toSeq === Seq(7000L, 7001L, 7002L, 7003L))
    assert(frames.forall(_.parent_id === 7L))
    assert(frames.forall(_.kind === "image"))
    // midpoint sampling: timestamps strictly increasing within the duration
    val duration = Multimodal.extractFeatures(items.filter(_.kind == "video"),
      new StubDecoder(2)).collect().head.duration_ms
    assert(frames.map(_.ts_ms).toSeq === frames.map(_.ts_ms).toSeq.sorted)
    assert(frames.forall(f => f.ts_ms >= 0 && f.ts_ms < duration))
    // deterministic payloads
    val again = Multimodal.sampleFrames(items, n = 4, new StubDecoder(2))
      .collect().sortBy(_.frame_index)
    assert(frames.map(_.content.toSeq) === again.map(_.content.toSeq))
  }

  test("frame sampling probes duration instead of full-decoding every video") {
    val s = spark; import s.implicits._
    val decodes = spark.sparkContext.longAccumulator("decodes")
    val probes = spark.sparkContext.longAccumulator("probes")
    // a real codec's decode is O(payload) while the header probe is O(KB) —
    // count invocations to pin that sampleFrames never takes the slow path
    class CountingDecoder extends Multimodal.Decoder {
      private val inner = new StubDecoder(2)
      override def decode(item: MediaItem): Multimodal.MediaFeatures = {
        decodes.add(1); inner.decode(item)
      }
      override def probeDuration(item: MediaItem): Long = {
        probes.add(1); inner.probeDuration(item)
      }
    }
    val items = Seq(
      MediaItem(1L, "video", Array[Byte](1, 2), "video/mp4", "a"),
      MediaItem(2L, "video", Array[Byte](3, 4), "video/mp4", "b")).toDS()
    val frames = Multimodal.sampleFrames(items, n = 3, new CountingDecoder).collect()
    assert(frames.length === 6)
    assert(decodes.value === 0L, "sampleFrames must not full-decode")
    assert(probes.value === 2L, "one header probe per video")
  }

  test("resize: visual items get target dims and area-proportional stub payloads") {
    val s = spark; import s.implicits._
    val items = Seq(
      MediaItem(1L, "image", Array[Byte](1, 2, 3), "image/png", "a"),
      MediaItem(2L, "audio", Array[Byte](9), "audio/wav", "b")) // skipped
      .toDS()
    val resized = Multimodal.resizeImages(items, width = 64, height = 32).collect()
    assert(resized.length === 1)
    assert(resized.head.width === 64 && resized.head.height === 32)
    assert(resized.head.content.length === 64 * 32 / 64)
    // deterministic
    val again = Multimodal.resizeImages(items, 64, 32).collect()
    assert(resized.head.content.toSeq === again.head.content.toSeq)
  }

  test("metadata-only projection prunes the payload column from the scan") {
    val dir = tmpDir("media2")
    Files.write(Paths.get(dir, "c.bin"), Array.fill[Byte](1024)(7))
    val items = Multimodal.readMediaDir(spark, dir, "image")
    val meta = Multimodal.metadataOnly(items)
    assert(meta.collect().head.getAs[Long]("n_bytes") === 1024L)
    // column pruning is visible in the physical scan's ReadSchema — a
    // metadata-only projection must not read the payload bytes
    val plan = meta.select("item_id", "kind", "mime", "source")
      .queryExecution.executedPlan.toString
    val readSchema = plan.split("ReadSchema: ").last.takeWhile(_ != '\n')
    assert(!readSchema.contains("content"),
      s"payload column not pruned from scan: $readSchema")
  }
}
