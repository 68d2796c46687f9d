package graft.operators

/** Pure-JVM media container header parsing — dimensions and duration from
  * the first bytes of a payload, no codec libraries. This is the real
  * implementation of the "header probe is O(KB) while decode is
  * O(payload)" contract in [[Multimodal.Decoder.probeDuration]]: all five
  * formats carry the queried fields in fixed, public container structures
  * (PNG IHDR, JPEG SOFn, GIF logical screen descriptor, RIFF/WAVE fmt +
  * data chunks, ISO-BMFF/MP4 moov/mvhd). Pixel/sample decode stays
  * stubbed — parsing stops at the header.
  *
  * Every parser is total: malformed or foreign bytes return None, never
  * throw — the decoder falls back to its stub, so a mixed/dirty corpus
  * (the normal case at scale) degrades per item instead of failing the
  * task. */
object MediaHeaders {

  /** (width, height) from a PNG, JPEG, or GIF payload; None if the bytes
    * are none of those (or too truncated to carry the header). */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] =
    pngDims(bytes).orElse(jpegDims(bytes)).orElse(gifDims(bytes))

  private def u8(b: Byte): Int = b & 0xff

  private def be16(b: Array[Byte], off: Int): Int =
    (u8(b(off)) << 8) | u8(b(off + 1))

  private def be32(b: Array[Byte], off: Int): Long =
    (u8(b(off)).toLong << 24) | (u8(b(off + 1)) << 16) |
      (u8(b(off + 2)) << 8) | u8(b(off + 3))

  private def le16(b: Array[Byte], off: Int): Int =
    u8(b(off)) | (u8(b(off + 1)) << 8)

  private def le32(b: Array[Byte], off: Int): Long =
    u8(b(off)).toLong | (u8(b(off + 1)).toLong << 8) |
      (u8(b(off + 2)).toLong << 16) | (u8(b(off + 3)).toLong << 24)

  private def tagAt(b: Array[Byte], off: Int, tag: String): Boolean =
    off + tag.length <= b.length &&
      tag.indices.forall(i => u8(b(off + i)) == tag.charAt(i).toInt)

  /** PNG: 8-byte signature, then the IHDR chunk (always first): 4-byte
    * length, "IHDR", width/height as big-endian u32 at offsets 16/20. */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 &&
      u8(b(0)) == 0x89 && tagAt(b, 1, "PNG") &&
      u8(b(4)) == 0x0d && u8(b(5)) == 0x0a && u8(b(6)) == 0x1a && u8(b(7)) == 0x0a &&
      tagAt(b, 12, "IHDR"))
      Some((be32(b, 16).toInt, be32(b, 20).toInt))
    else None

  /** GIF: "GIF87a"/"GIF89a", then the logical screen descriptor —
    * width/height as little-endian u16 at offsets 6/8. */
  def gifDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 10 && tagAt(b, 0, "GIF8") &&
      (u8(b(4)) == '7' || u8(b(4)) == '9') && u8(b(5)) == 'a')
      Some((le16(b, 6), le16(b, 8)))
    else None

  /** JPEG: SOI (FFD8), then marker segments `FF <marker> <len16> …`; the
    * frame header SOFn (C0–CF minus DHT C4, JPGn C8, DAC CC) carries
    * `precision(1) height(2) width(2)` right after its length. */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || u8(b(0)) != 0xff || u8(b(1)) != 0xd8) return None
    var pos = 2
    while (pos + 3 < b.length) {
      if (u8(b(pos)) != 0xff) return None // desynchronized — not a marker
      // fill bytes: consecutive FFs pad before a marker
      var p = pos
      while (p < b.length && u8(b(p)) == 0xff) p += 1
      if (p >= b.length) return None
      val marker = u8(b(p))
      p += 1
      marker match {
        case 0xd9 => return None // EOI before any SOF
        case m if m >= 0xd0 && m <= 0xd7 => pos = p // RSTn: no length field
        case 0x01 => pos = p // TEM: no length field
        case m =>
          if (p + 1 >= b.length) return None
          val len = be16(b, p)
          if (len < 2) return None
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (p + 6 >= b.length) return None
            return Some((be16(b, p + 5), be16(b, p + 3))) // (width, height)
          }
          pos = p + len
      }
    }
    None
  }

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  /** MP4 (ISO-BMFF) duration in ms: the `moov`/`mvhd` movie header's
    * `duration / timescale` — the dominant video container's real probe,
    * so [[Multimodal.sampleFrames]]' midpoint timestamps are real for
    * MP4 payloads. Box walk over the public structure (ISO/IEC 14496-12):
    * each box is `size32 type`, `size == 1` → 64-bit largesize follows,
    * `size == 0` → box runs to EOF; `mvhd` version 0 carries
    * `timescale u32, duration u32` after two u32 timestamps, version 1
    * the same after two u64 timestamps. The payload must lead with
    * `ftyp` (the MP4 file magic). Offsets walk in Long and every size is
    * bounds-checked — hostile/truncated boxes return None, never throw
    * or hang (the totality contract of every parser here). */
  def mp4DurationMs(b: Array[Byte]): Option[Long] = {
    if (b.length < 16 || !tagAt(b, 4, "ftyp")) return None
    // (payload start, payload end) of each box in [from, until), walked
    // with hostile-size guards; finds the first box of the given type
    def findBox(from: Long, until: Long, boxType: String): Option[(Long, Long)] = {
      var pos = from
      while (pos + 8 <= until) {
        val p = pos.toInt // pos < until <= b.length, so it fits
        val size32 = be32(b, p)
        val (header, size) =
          if (size32 == 1L) {
            if (pos + 16 > until) return None
            (16L, be64(b, p + 8))
          } else if (size32 == 0L) (8L, until - pos) // runs to EOF
          else (8L, size32)
        if (size < header || pos + size > until) return None // hostile/truncated
        if (tagAt(b, p + 4, boxType)) return Some((pos + header, pos + size))
        pos += size
      }
      None
    }
    for {
      (moovFrom, moovUntil) <- findBox(0L, b.length.toLong, "moov")
      (mvhdFrom, mvhdUntil) <- findBox(moovFrom, moovUntil, "mvhd")
      dur <- {
        val p = mvhdFrom.toInt
        if (mvhdFrom + 4 > mvhdUntil) None
        else u8(b(p)) match { // version byte
          // all-ones duration is ISO 14496-12's "duration unknown"
          // sentinel in both versions; and v1's u64 can be hostile —
          // guard the *1000 so a huge value yields None, never a
          // garbage/negative timeline (the totality contract)
          case 0 if mvhdFrom + 4 + 4 + 4 + 4 + 4 <= mvhdUntil =>
            val timescale = be32(b, p + 12)
            val duration = be32(b, p + 16)
            if (timescale > 0 && duration != 0xFFFFFFFFL)
              Some(duration * 1000L / timescale)
            else None
          case 1 if mvhdFrom + 4 + 8 + 8 + 4 + 8 <= mvhdUntil =>
            val timescale = be32(b, p + 20)
            val duration = be64(b, p + 24) // u64 read as Long: top bit set → negative
            if (timescale > 0 && duration >= 0 && duration <= Long.MaxValue / 1000L)
              Some(duration * 1000L / timescale)
            else None
          case _ => None
        }
      }
    } yield dur
  }

  /** WAV duration in ms: RIFF/WAVE container, `fmt ` chunk's byte rate +
    * `data` chunk's payload size → floor(dataBytes * 1000 / byteRate).
    * Chunks are walked in order (sizes pad to even offsets). */
  def wavDurationMs(b: Array[Byte]): Option[Long] = {
    if (b.length < 12 || !tagAt(b, 0, "RIFF") || !tagAt(b, 8, "WAVE")) return None
    var pos = 12
    var byteRate = -1L
    var dataSize = -1L
    while (pos + 8 <= b.length && (byteRate < 0 || dataSize < 0)) {
      val size = le32(b, pos + 4)
      if (tagAt(b, pos, "fmt ")) {
        if (pos + 8 + 12 > b.length) return None
        byteRate = le32(b, pos + 8 + 8)
      } else if (tagAt(b, pos, "data")) {
        dataSize = size
      }
      // strict forward progress: a hostile size field whose Int cast goes
      // negative could otherwise cycle pos between positive offsets forever
      // (totality contract — a dirty corpus must never hang a task)
      val next = pos + 8 + size + (size & 1L) // chunks pad to even length
      if (next <= pos || next > Int.MaxValue) return None
      pos = next.toInt
    }
    if (byteRate > 0 && dataSize >= 0) Some(dataSize * 1000L / byteRate) else None
  }
}
