package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** REAL ISO BMFF (MP4) box-structure parser — the container level of the
  * last multimodal format, from the public ISO/IEC 14496-12 spec. With
  * this, every format behind the multimodal surface decodes for real
  * (BMP, PNG, WAV, JPEG pixels/samples; MP4 container metadata, frame
  * sampling, AND compressed-video pixel decode via [[mjpegFrames]] —
  * MJPEG frames are complete baseline JPEGs, decoded by the repo's own
  * pipeline). Only INTER-frame codecs (H.264 et al.) stay behind the
  * external-codec seam.
  *
  * Parsed: box walk (32-bit and 64-bit largesize forms), `ftyp` major
  * brand, `moov/mvhd` timescale+duration (versions 0 and 1),
  * `trak/tkhd` presentation width/height (16.16 fixed point),
  * `trak/mdia/hdlr` handler type (video/audio track classification).
  *
  * Hostile-input posture matches the other decoders: every size is
  * bounds-checked against the blob, nesting depth is capped, a size-0
  * ("to end of file") or truncated box terminates cleanly — None, never
  * a crash or unbounded loop.
  */
private[graft] object Mp4 {

  val mp4MetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("has_video", BooleanType, nullable = false),
    StructField("has_audio", BooleanType, nullable = false),
    StructField("major_brand", StringType, nullable = false)))

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** One parsed box: (type, payloadStart, payloadEnd). */
  private final case class Box(typ: String, start: Int, end: Int)

  /** Walk sibling boxes in [from, to). Malformed sizing stops the walk
    * (the boxes seen so far are returned — truncation-tolerant like real
    * demuxers, but never reads past the buffer).
    */
  private def boxes(b: Array[Byte], from: Int, to: Int): Seq[Box] = {
    val out = Seq.newBuilder[Box]
    var pos = from
    var guard = 0
    while (pos + 8 <= to && guard < 10000) {
      val size32 = be32(b, pos)
      val typ = fourcc(b, pos + 4)
      var payload = pos + 8
      val size: Long =
        if (size32 == 1) {
          if (pos + 16 > to) return out.result()
          payload = pos + 16
          be64(b, pos + 8)
        } else if (size32 == 0) (to - pos).toLong // box extends to end
        else size32
      if (size < (payload - pos) || pos + size > to) return out.result()
      out += Box(typ, payload, pos + size.toInt)
      pos += size.toInt
      guard += 1
    }
    out.result()
  }

  private def child(b: Array[Byte], parent: Box, typ: String): Option[Box] =
    boxes(b, parent.start, parent.end).find(_.typ == typ)

  /** Parse container metadata; None when the blob is not an ISO BMFF
    * stream with a moov/mvhd (the minimal "is an MP4" bar).
    */
  private[graft] def parseMeta(id: Long, bytes: Array[Byte]): Option[Row] = {
    if (bytes.length < 16) return None
    val top = boxes(bytes, 0, bytes.length)
    val ftyp = top.find(_.typ == "ftyp").getOrElse(return None)
    if (ftyp.end - ftyp.start < 4) return None
    val brand = fourcc(bytes, ftyp.start)
    val moov = top.find(_.typ == "moov").getOrElse(return None)
    val mvhd = child(bytes, moov, "mvhd").getOrElse(return None)
    // mvhd: version(1) flags(3), then v0: ctime(4) mtime(4) timescale(4)
    // duration(4); v1: ctime(8) mtime(8) timescale(4) duration(8).
    // Payload length is checked BEFORE the version byte: boxes() legally
    // yields a payload-less box at buffer end
    if (mvhd.end - mvhd.start < 20) return None
    val v = bytes(mvhd.start) & 0xff
    val (timescale, duration) =
      if (v == 0) (be32(bytes, mvhd.start + 12), be32(bytes, mvhd.start + 16))
      else if (v == 1) {
        if (mvhd.end - mvhd.start < 32) return None
        (be32(bytes, mvhd.start + 20), be64(bytes, mvhd.start + 24))
      } else return None
    // duration is validated, not trusted: a negative be64 (top bit set)
    // or one whose ms conversion would overflow Long yields None, never
    // a silently-wrapped garbage duration
    if (timescale <= 0 || duration < 0 || duration > Long.MaxValue / 1000L) return None
    val durationMs = duration * 1000L / timescale
    var nTracks = 0
    var width = 0; var height = 0
    var hasVideo = false; var hasAudio = false
    boxes(bytes, moov.start, moov.end).filter(_.typ == "trak").foreach { trak =>
      nTracks += 1
      val handler = for {
        mdia <- child(bytes, trak, "mdia")
        hdlr <- child(bytes, mdia, "hdlr")
        if hdlr.end - hdlr.start >= 12
      } yield fourcc(bytes, hdlr.start + 8)
      handler match {
        case Some("vide") =>
          hasVideo = true
          // tkhd: version(1) flags(3) + v0: 76 bytes to width; v1: 88.
          // width/height are 16.16 fixed point at payload end.
          child(bytes, trak, "tkhd").foreach { tk =>
            if (tk.end > tk.start) { // payload-less tkhd: no version byte
              val tv = bytes(tk.start) & 0xff
              val wOff = if (tv == 1) tk.start + 88 else tk.start + 76
              if (wOff + 8 <= tk.end) {
                width = (be32(bytes, wOff) >> 16).toInt
                height = (be32(bytes, wOff + 4) >> 16).toInt
              }
            }
          }
        case Some("soun") => hasAudio = true
        case _            => ()
      }
    }
    if (nTracks == 0) return None
    Some(Row(id, durationMs, nTracks, width, height, hasVideo, hasAudio, brand))
  }

  // ------------------------------------------ frame sampling (sample tables)

  val mp4FrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("pts_ms", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("byte_sum", LongType, nullable = false)))

  private val MaxSamples = 1000000
  private val MaxTableEntries = 100000

  /** The demuxer core shared by [[sampleFrames]] and [[mjpegFrames]]:
    * walk the first video track's sample tables (stts/stsz/stsc/stco)
    * into (timescale, per-sample sizes, decode times, absolute mdat
    * offsets). None for non-BMFF, missing/inconsistent tables.
    */
  private def videoSampleTable(
      bytes: Array[Byte]): Option[(Long, Array[Long], Array[Long], Array[Long])] = {
    if (bytes.length < 16) return None
    val top = boxes(bytes, 0, bytes.length)
    val moov = top.find(_.typ == "moov").getOrElse(return None)
    // first VIDEO track's stbl (+ its mdhd timescale)
    val video = boxes(bytes, moov.start, moov.end).filter(_.typ == "trak")
      .flatMap { trak =>
        for {
          mdia <- child(bytes, trak, "mdia")
          hdlr <- child(bytes, mdia, "hdlr")
          if hdlr.end - hdlr.start >= 12 && fourcc(bytes, hdlr.start + 8) == "vide"
          minf <- child(bytes, mdia, "minf")
          stbl <- child(bytes, minf, "stbl")
        } yield (mdia, stbl)
      }.headOption.getOrElse(return None)
    val (mdia, stbl) = video
    val timescale = child(bytes, mdia, "mdhd") match {
      case Some(m) if m.end - m.start >= 24 && (bytes(m.start) & 0xff) == 0 =>
        be32(bytes, m.start + 12)
      case _ => return None
    }
    if (timescale <= 0) return None
    // ---- stsz: per-sample sizes
    val stsz = child(bytes, stbl, "stsz").getOrElse(return None)
    if (stsz.end - stsz.start < 12) return None
    val fixedSize = be32(bytes, stsz.start + 4)
    val nSamples = be32(bytes, stsz.start + 8)
    if (nSamples <= 0 || nSamples > MaxSamples) return None
    val n = nSamples.toInt
    val sizes = new Array[Long](n)
    if (fixedSize != 0) java.util.Arrays.fill(sizes, fixedSize)
    else {
      if (stsz.start + 12 + 4L * n > stsz.end) return None
      var i = 0
      while (i < n) { sizes(i) = be32(bytes, stsz.start + 12 + 4 * i); i += 1 }
    }
    // ---- stts: decode times (cumulative deltas)
    val stts = child(bytes, stbl, "stts").getOrElse(return None)
    if (stts.end - stts.start < 8) return None
    val nStts = be32(bytes, stts.start + 4)
    if (nStts < 0 || nStts > MaxTableEntries ||
      stts.start + 8 + 8L * nStts > stts.end) return None
    val pts = new Array[Long](n)
    var si = 0
    var t = 0L
    var e = 0
    while (e < nStts.toInt && si < n) {
      val cnt = be32(bytes, stts.start + 8 + 8 * e)
      val delta = be32(bytes, stts.start + 12 + 8 * e)
      if (cnt < 0 || delta < 0) return None
      var k = 0L
      while (k < cnt && si < n) { pts(si) = t; t += delta; si += 1; k += 1 }
      e += 1
    }
    if (si < n) return None // stts covers fewer samples than stsz claims
    // ---- stsc + stco: chunk layout → absolute offsets
    val stsc = child(bytes, stbl, "stsc").getOrElse(return None)
    val stco = child(bytes, stbl, "stco").getOrElse(return None)
    if (stsc.end - stsc.start < 8 || stco.end - stco.start < 8) return None
    val nStsc = be32(bytes, stsc.start + 4)
    val nStco = be32(bytes, stco.start + 4)
    if (nStsc <= 0 || nStsc > MaxTableEntries || nStco <= 0 ||
      nStco > MaxTableEntries ||
      stsc.start + 8 + 12L * nStsc > stsc.end ||
      stco.start + 8 + 4L * nStco > stco.end) return None
    val offsets = new Array[Long](n)
    var sample = 0
    var c = 0
    // stsc first_chunk is non-decreasing per spec: a forward pointer
    // makes the chunk walk O(nStco + nStsc); rescanning the table per
    // chunk would hand a crafted blob an O(nStco × nStsc) CPU pin
    var spc = 0L
    var j = 0
    while (c < nStco.toInt && sample < n) {
      while (j < nStsc.toInt &&
        be32(bytes, stsc.start + 8 + 12 * j) <= c + 1) {
        spc = be32(bytes, stsc.start + 12 + 12 * j)
        j += 1
      }
      if (spc <= 0) return None
      var off = be32(bytes, stco.start + 8 + 4 * c)
      var k = 0L
      while (k < spc && sample < n) {
        offsets(sample) = off
        off += sizes(sample)
        sample += 1
        k += 1
      }
      c += 1
    }
    if (sample < n) return None
    Some((timescale, sizes, pts, offsets))
  }

  /** REAL frame sampling off the sample tables (`stbl`): stts gives each
    * sample's decode time, stsz its size, stsc+stco its byte range in
    * mdat — exactly what a demuxer hands a video decoder. Every `everyN`th
    * frame's (pts, size, byte sum over its ACTUAL mdat range) is emitted.
    * None for non-BMFF, missing/inconsistent tables, or ranges outside
    * the blob.
    */
  private[graft] def sampleFrames(
      id: Long, bytes: Array[Byte], everyN: Int): Option[Seq[Row]] = {
    if (everyN <= 0) return None
    val (timescale, sizes, pts, offsets) = videoSampleTable(bytes).getOrElse(return None)
    val n = sizes.length
    val out = Seq.newBuilder[Row]
    var f = 0
    while (f < n) {
      val off = offsets(f)
      val sz = sizes(f)
      if (off < 0 || sz < 0 || off + sz > bytes.length) return None
      var sum = 0L
      var b = off.toInt
      val endB = (off + sz).toInt
      while (b < endB) { sum += (bytes(b) & 0xff); b += 1 }
      out += Row(id, f, pts(f) * 1000L / timescale, sz, sum)
      f += everyN
    }
    Some(out.result())
  }

  val mjpegFrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("pts_ms", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false),
    StructField("weighted_r", LongType, nullable = false)))

  /** REAL compressed-video PIXEL decode — MJPEG: each sampled frame's
    * mdat byte range (located by the same demuxed tables as
    * [[sampleFrames]]) is a complete baseline JPEG, decoded through the
    * repo's own entropy/IDCT pipeline ([[Jpeg.decodeStats]]) with ZERO
    * external codecs. This closes the last multimodal stub: the
    * remaining [[Multimodal.decodeFeaturesStub]] is only the seam for
    * inter-frame codecs (H.264-class) that genuinely need external
    * libraries. A frame that is not a decodable JPEG DROPS (corrupt
    * frame ≠ corrupt document); a document without video tables is None.
    */
  private[graft] def mjpegFrames(
      id: Long, bytes: Array[Byte], everyN: Int): Option[Seq[Row]] = {
    if (everyN <= 0) return None
    val (timescale, sizes, pts, offsets) = videoSampleTable(bytes).getOrElse(return None)
    val n = sizes.length
    val out = Seq.newBuilder[Row]
    var f = 0
    while (f < n) {
      val off = offsets(f)
      val sz = sizes(f)
      if (off < 0 || sz < 0 || off + sz > bytes.length) return None
      val frame = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
      // per-FRAME guard: the documented contract is "corrupt frame ≠
      // corrupt document" — a decoder exception on one hostile frame
      // must not drop the document's other frames (the wrapper's Try is
      // per document)
      scala.util.Try(Jpeg.decodeStats(id, frame)).toOption.flatten.foreach { st =>
        out += Row(id, f, pts(f) * 1000L / timescale, st.getInt(1), st.getInt(2),
          st.getLong(3), st.getDouble(4), st.getDouble(5), st.getDouble(6),
          st.getLong(7))
      }
      f += everyN
    }
    Some(out.result())
  }

  // ------------------------------------------------------------- encode

  // ONE copy of the fixture byte builders (the r7 advisory: fixture
  // encoders must not grow into a parallel library — a table-layout fix
  // must land in exactly one place)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    val size = out.length
    out(0) = ((size >> 24) & 0xff).toByte; out(1) = ((size >> 16) & 0xff).toByte
    out(2) = ((size >> 8) & 0xff).toByte; out(3) = (size & 0xff).toByte
    typ.getBytes("US-ASCII").copyToArray(out, 4)
    payload.copyToArray(out, 8)
    out
  }

  private def u32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def ftypBox: Array[Byte] = box("ftyp",
    "isom".getBytes("US-ASCII") ++ u32(0x200) ++ "isomiso2".getBytes("US-ASCII"))

  /** The shared framed-stream assembly: ftyp + mdat (FIRST, so chunk
    * offsets are layout-independent of the moov size) + moov with full
    * video sample tables (stsd `sampleEntry`, stts 100-tick deltas at
    * timescale 1000, one chunk, per-frame stsz, stco at the mdat
    * payload). Both framed fixtures ([[encodeSyntheticFrames]],
    * [[encodeSyntheticMjpeg]]) differ ONLY in their frame payloads,
    * sample-entry fourcc, and tkhd dims.
    */
  private def buildFramedMp4(
      frames: Array[Array[Byte]], sampleEntry: String, w: Int, h: Int): Array[Byte] = {
    val nF = frames.length
    val sizes = frames.map(_.length)
    val ftyp = ftypBox
    val mdat = box("mdat", frames.flatten)
    val mdatPayloadStart = ftyp.length + 8
    val durTicks = nF * 100L
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++
      u32(1000) ++ u32(durTicks) ++ u32(0x00010000) ++ new Array[Byte](100 - 24))
    val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++
      u32(1000) ++ u32(durTicks) ++ u32(0x55c40000L)) // lang 'und' + pre
    val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0) ++ u32(0) ++
      "vide".getBytes("US-ASCII") ++ new Array[Byte](12) ++ Array[Byte](0))
    val stsd = box("stsd", Array[Byte](0, 0, 0, 0) ++ u32(1) ++
      box(sampleEntry, new Array[Byte](78)))
    val stts = box("stts", Array[Byte](0, 0, 0, 0) ++ u32(1) ++
      u32(nF) ++ u32(100))
    val stsc = box("stsc", Array[Byte](0, 0, 0, 0) ++ u32(1) ++
      u32(1) ++ u32(nF) ++ u32(1))
    val stsz = box("stsz", Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(nF) ++
      sizes.flatMap(s => u32(s)))
    val stco = box("stco", Array[Byte](0, 0, 0, 0) ++ u32(1) ++
      u32(mdatPayloadStart))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", stbl)
    val tkhd = box("tkhd",
      Array[Byte](0, 0, 0, 7) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++
        u32(durTicks) ++ new Array[Byte](76 - 24) ++
        u32(w.toLong << 16) ++ u32(h.toLong << 16))
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ mdat ++ moov
  }

  /** Build a minimal REAL ISO BMFF stream: ftyp + moov(mvhd + video trak
    * (tkhd + mdia/hdlr) [+ audio trak]). No mdat — metadata-only, which
    * is exactly the surface the parser owns. Deterministic from the
    * parameters, so an oracle predicts the parsed metadata by formula.
    */
  private[graft] def encodeSynthetic(
      durationMs: Long, w: Int, h: Int, withAudio: Boolean): Array[Byte] = {
    val ftyp = ftypBox
    // mvhd v0: timescale 1000 → duration ticks = durationMs
    // mvhd v0 is 100 payload bytes: ver/flags 4, ctime 4, mtime 4,
    // timescale 4, duration 4, rate 4, then volume/reserved/matrix/
    // predefined/next_track_ID padding to 100
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++
      u32(1000) ++ u32(durationMs) ++ u32(0x00010000) ++
      new Array[Byte](100 - 24))
    def hdlr(handler: String) = box("hdlr", Array[Byte](0, 0, 0, 0) ++ u32(0) ++
      handler.getBytes("US-ASCII") ++ new Array[Byte](12) ++ Array[Byte](0))
    // tkhd v0 is 84 payload bytes: ver/flags 4 + times/id/reserved/
    // duration 20 + reserved/layer/group/volume 16 + matrix 36 = 76,
    // then width/height as 16.16 fixed point
    def tkhd(trackId: Int, tw: Int, th: Int) = box("tkhd",
      Array[Byte](0, 0, 0, 7) ++ u32(0) ++ u32(0) ++ u32(trackId) ++ u32(0) ++
        u32(durationMs) ++ new Array[Byte](76 - 24) ++
        u32(tw.toLong << 16) ++ u32(th.toLong << 16))
    val videoTrak = box("trak", tkhd(1, w, h) ++ box("mdia", hdlr("vide")))
    val audioTrak =
      if (withAudio) box("trak", tkhd(2, 0, 0) ++ box("mdia", hdlr("soun")))
      else Array.emptyByteArray
    val moov = box("moov", mvhd ++ videoTrak ++ audioTrak)
    ftyp ++ moov
  }

  /** Build a REAL framed ISO BMFF stream: ftyp + mdat (mdat FIRST, so
    * chunk offsets are layout-independent of the moov size) + moov with
    * full video sample tables (stsd/stts/stsc/stsz/stco). Frame i of
    * nF = 5 + id mod 6: size 50 + (id + 17·i) mod 100 bytes, constant
    * fill (id + 7·i) mod 256, decode delta 100 at timescale 1000 — every
    * parsed field is formula-predictable while the parser works purely
    * off the tables.
    */
  private[graft] def encodeSyntheticFrames(id: Long): Array[Byte] = {
    val nF = (5 + id % 6).toInt
    val sizes = Array.tabulate(nF)(i => 50 + ((id + 17L * i) % 100).toInt)
    val frames = Array.tabulate(nF) { i =>
      Array.fill[Byte](sizes(i))(((id + 7L * i) % 256).toByte)
    }
    buildFramedMp4(frames, "mp4v", 320, 240)
  }

  /** Build a REAL MJPEG-in-MP4 stream: every mdat frame is a complete
    * baseline JPEG from the repo's own encoder (the q133 DC-only-exact
    * family: constant 8×8 blocks v = (5·seed + 11·b) mod 256 with
    * seed = id + 13·frame, dims 8·(1 + id mod 5) × 8·(1 + id mod 3)),
    * stsd sample entry 'jpeg', full stts/stsc/stsz/stco tables, mdat
    * first so chunk offsets are moov-size-independent. nF = 3 + id mod 4
    * frames at 100 ms cadence — every decoded pixel stat is
    * formula-predictable by a DuckDB oracle while the decode path runs
    * the FULL demux + entropy + IDCT machinery.
    */
  private[graft] def encodeSyntheticMjpeg(id: Long): Array[Byte] = {
    val nF = (3 + id % 4).toInt
    val w = 8 * (1 + (id % 5).toInt)
    val h = 8 * (1 + (id % 3).toInt)
    val frames = Array.tabulate(nF)(i =>
      Multimodal.encodeSyntheticJpeg(id + 13L * i, w, h))
    buildFramedMp4(frames, "jpeg", w, h)
  }
}
