package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns plus typed metadata, with decode /
  * feature-extract implemented per-partition in batches.
  *
  * The decode step is REAL for PNG, JPEG, and GIF payloads (magic-byte
  * sniffing plus a `javax.imageio` HEADER read — plain JDK, no native
  * codecs — yields true width/height and, for GIF, the frame count
  * without decoding pixel data), for WAV audio (the RIFF fmt/data
  * chunks are a plain little-endian byte parse: sample rate, channels,
  * and the exact PCM frame count), for FLAC (STREAMINFO: sample rate,
  * channels, exact total samples), for MP4/MOV video containers
  * (ISO-BMFF box walk: tkhd display dimensions + exact stts frame
  * count, never touching mdat), and for Matroska/WebM (EBML walk:
  * track pixel dimensions, audio rate/channels, Segment duration,
  * never touching clusters). This is the cheap metadata pass a
  * media-curation pipeline runs corpus-wide. Only payloads with no
  * parseable plain-byte header (raw codec bitstreams, unknown formats)
  * fall back to [[fakeDecode]]'s deterministic stub — actual sample/
  * pixel DECODE needs codecs unavailable in this environment.
  * Equally real — and tested — is the Spark-side
  * shape: binary column in/out, typed `mapPartitions` batching (the
  * Scala analog of `mapInPandas` batch processing), schema
  * declaration, and narrow no-shuffle execution, which is the part
  * that has to survive 100 TB of media blobs (one partition = one
  * batch of blobs; no driver-side collection anywhere).
  */
object Multimodal {

  /** Decoded-media metadata record. `codec` is `png`/`jpeg`/`gif`/`wav`/
    * `flac`/`mp4`/`mkv` for real header decodes, `stub` for the
    * fallback. Image payloads carry width/height (+ n_frames for
    * animated GIF); audio payloads carry sample_rate/n_channels and the
    * PCM frame count in n_frames; `mkv` rows carry the container
    * duration in MILLISECONDS in n_frames (EBML headers have a
    * duration, not a frame count); fields foreign to a payload's
    * modality are 0.
    */
  case class MediaMeta(id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int,
      sample_rate: Int, n_channels: Int, codec: String)

  /** STUB decode for payload types with no available codec: derive
    * metadata deterministically from payload size. Replace with a real
    * decoder (e.g. JavaCV for video) without touching the plan.
    */
  def fakeDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(id, n, n % 640, n % 480, n % 16, 0, 0, "stub")
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte

  private def isGif(b: Array[Byte]): Boolean =
    b.length > 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** RIFF/WAVE header parse — plain byte arithmetic, no codec: walk the
    * word-aligned chunk list for `fmt ` (channels at +2, sample rate at
    * +4, block align at +12) and `data` (payload byte count). The PCM
    * frame count is dataSize / blockAlign — sample-exact duration, the
    * number an audio-curation pass keys on. None on any structural
    * violation (the stub's job, never a task failure).
    */
  private def parseWav(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    var off = 12
    var sampleRate = 0L
    var channels = 0
    var blockAlign = 0
    var dataSize = -1L
    while (off + 8 <= b.length) {
      val cid = new String(b, off, 4, "US-ASCII")
      val sz = u32le(b, off + 4)
      if (cid == "fmt " && sz >= 16 && off + 8 + 16 <= b.length) {
        channels = u16le(b, off + 10)
        sampleRate = u32le(b, off + 12)
        blockAlign = u16le(b, off + 20)
      } else if (cid == "data" && dataSize < 0) {
        // a truncated blob declares more data than it carries: count
        // only the frames actually present
        dataSize = math.min(sz, (b.length - off - 8).toLong)
      }
      // chunks are word-aligned: odd sizes carry one pad byte. Step in
      // Long BEFORE touching off: a u32 size near 2^32 would otherwise
      // corrupt the Int offset. A chunk extending past the buffer is by
      // definition the last one (truncated or lying header) — stop
      // walking rather than reject, so a truncated-tail WAV still
      // yields the metadata parsed so far.
      val next = off.toLong + 8L + sz + (sz & 1L)
      if (next + 8 > b.length) off = b.length else off = next.toInt
    }
    if (channels > 0 && blockAlign > 0 && sampleRate > 0 && sampleRate <= Int.MaxValue && dataSize >= 0)
      Some(MediaMeta(id, b.length, 0, 0, (dataSize / blockAlign).toInt,
        sampleRate.toInt, channels, "wav"))
    else None
  }

  private def isFlac(b: Array[Byte]): Boolean =
    b.length >= 42 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  private def isMp4(b: Array[Byte]): Boolean =
    b.length >= 16 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** FLAC STREAMINFO parse — no codec, just the fixed-layout first
    * metadata block (the spec requires STREAMINFO first): sample rate
    * (20 bits), channels (3 bits, stored n-1), and the 36-bit total
    * PCM sample count — sample-exact duration for a lossless-audio
    * corpus, same fields the WAV path recovers.
    */
  private def parseFlac(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    // 4 magic + 4 block header; STREAMINFO must be type 0 and 34 bytes
    val hdrType = b(4) & 0x7f
    val hdrLen = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (hdrType != 0 || hdrLen != 34) return None
    // the 64-bit field at bytes 18-25: sampleRate(20) channels-1(3)
    // bps-1(5) totalSamples(36)
    val sr = ((b(18) & 0xff) << 12) | ((b(19) & 0xff) << 4) | ((b(20) & 0xff) >> 4)
    val channels = ((b(20) >> 1) & 0x7) + 1
    val totalSamples = ((b(21) & 0x0fL) << 32) | ((b(22) & 0xffL) << 24) |
      ((b(23) & 0xffL) << 16) | ((b(24) & 0xffL) << 8) | (b(25) & 0xffL)
    if (sr > 0 && totalSamples <= Int.MaxValue)
      Some(MediaMeta(id, b.length, 0, 0, totalSamples.toInt, sr, channels, "flac"))
    else None
  }

  /** ISO-BMFF (MP4/MOV) box walk — the video-container metadata pass a
    * media pipeline runs corpus-wide WITHOUT any codec: recursively
    * walk the box tree (descending only into the known container boxes
    * on the moov path), read the track's display width/height from
    * `tkhd` (16.16 fixed point) and the exact frame count as the sum
    * of `stts` (time-to-sample) entry counts. Pixel data (`mdat`) is
    * never touched, so cost is O(moov), not O(video).
    */
  private def parseMp4(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    // metadata is collected PER TRACK and the first track carrying
    // display dimensions wins: a real A/V file has an audio trak whose
    // tkhd is 0x0 and whose stts counts audio frames — last-wins
    // aggregation across traks would zero the dimensions or inflate the
    // frame count with audio samples
    val containers = Set("mdia", "minf", "stbl")
    var width = 0
    var height = 0
    var frames = 0L
    def walkTrak(start: Long, end: Long, depth: Int): (Int, Int, Long) = {
      var w = 0; var h = 0; var f = 0L
      def go(start: Long, end: Long, depth: Int): Unit = {
        if (depth > 8) return
        var off = start
        while (off + 8 <= end) {
          val size = u32be(b, off.toInt)
          val name = new String(b, off.toInt + 4, 4, "US-ASCII")
          if (size < 8 || off + size > end) return
          if (containers(name)) go(off + 8, off + size, depth + 1)
          else if (name == "tkhd" && size >= 92 && (b(off.toInt + 8) & 0xff) == 0) {
            // version-0 layout: width/height are the last two 16.16 fields
            w = (u32be(b, (off + size - 8).toInt) >> 16).toInt
            h = (u32be(b, (off + size - 4).toInt) >> 16).toInt
          } else if (name == "stts" && size >= 16) {
            // entries are bounded by the stts box's OWN end — a lying
            // entry_count must not read sibling boxes' bytes as counts
            val sttsEnd = off + size
            val n = u32be(b, off.toInt + 12)
            var i = 0L
            while (i < n && off + 16 + i * 8 + 8 <= sttsEnd) {
              f += u32be(b, (off + 16 + i * 8).toInt)
              i += 1
            }
          }
          off += size
        }
      }
      go(start, end, depth)
      (w, h, f)
    }
    def walk(start: Long, end: Long, depth: Int): Unit = {
      if (depth > 8) return
      var off = start
      while (off + 8 <= end) {
        val size = u32be(b, off.toInt)
        val name = new String(b, off.toInt + 4, 4, "US-ASCII")
        // size 0 (to-end) and 1 (64-bit largesize) end the fixture-scale
        // walk; a size that overruns its parent is a structural violation
        if (size < 8 || off + size > end) return
        if (name == "moov") walk(off + 8, off + size, depth + 1)
        else if (name == "trak" && width == 0) {
          val (w, h, f) = walkTrak(off + 8, off + size, depth + 1)
          // the video track is the one with display dimensions; audio
          // traks (0x0 tkhd) are skipped rather than clobbering it
          if (w > 0 && h > 0 && f > 0) { width = w; height = h; frames = f }
        }
        off += size
      }
    }
    walk(0, b.length.toLong, 0)
    if (width > 0 && height > 0 && frames > 0 && frames <= Int.MaxValue)
      Some(MediaMeta(id, b.length, width, height, frames.toInt, 0, 0, "mp4"))
    else None
  }

  private def isMkv(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
      b(2) == 0xDF.toByte && b(3) == 0xA3.toByte

  /** Matroska/WebM (EBML) header parse — like the ISO-BMFF walk, plain
    * byte arithmetic over the container tree, no codec: element IDs and
    * sizes are EBML variable-width ints (the leading byte's high bits
    * encode the width; IDs keep the marker bit per the spec's constant
    * convention, sizes clear it, and the all-ones size means "unknown —
    * runs to the parent's end", which streamed Segments routinely use).
    * Recovers the video track's PixelWidth/PixelHeight, the audio
    * track's SamplingFrequency/Channels, and the Segment duration
    * (Info.Duration ticks x TimestampScale). EBML headers carry a
    * duration, not a frame count, so for `mkv` rows `n_frames` is the
    * container duration in MILLISECONDS — the field a media-curation
    * pass keys on. Cluster/frame data is never touched: cost is
    * O(headers), not O(video).
    */
  private def parseMkv(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    // width of the vint starting at off: leading-zero count of its
    // first byte + 1 (a zero byte would mean width > 8 — violation)
    def vintLen(off: Long): Int =
      if (off >= b.length || b(off.toInt) == 0) -1
      else Integer.numberOfLeadingZeros(b(off.toInt) & 0xff) - 23
    def uintAt(off: Long, len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len) { v = (v << 8) | (b((off + i).toInt) & 0xffL); i += 1 }
      v
    }
    // size value with the marker bit cleared; -1 = unknown size
    def sizeAt(off: Long, len: Int): Long = {
      val v = uintAt(off, len) & ((1L << (7 * len)) - 1)
      if (v == (1L << (7 * len)) - 1) -1L else v
    }
    // EBML floats are big-endian IEEE 754, 4 or 8 bytes
    def floatAt(ps: Long, pe: Long): Double = (pe - ps) match {
      case 4 => java.lang.Float.intBitsToFloat(uintAt(ps, 4).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uintAt(ps, 8))
      case _ => 0.0
    }
    // iterate the child elements of [start, end): id vint + size vint +
    // payload. A child overrunning its parent is by definition the last
    // one (truncated or lying header) — stop walking, keep what parsed.
    def walk(start: Long, end: Long, depth: Int)(f: (Long, Long, Long) => Unit): Unit = {
      if (depth > 8) return
      var off = start
      var ok = true
      while (ok && off + 2 <= end) {
        val idLen = vintLen(off)
        ok = idLen >= 1 && idLen <= 4 && off + idLen < end
        if (ok) {
          val eid = uintAt(off, idLen)
          val szLen = vintLen(off + idLen)
          ok = szLen >= 1 && szLen <= 8 && off + idLen + szLen <= end
          if (ok) {
            val sz = sizeAt(off + idLen, szLen)
            val ps = off + idLen + szLen
            val pe = if (sz < 0) end else ps + sz
            ok = pe <= end
            if (ok) { f(eid, ps, pe); off = pe }
          }
        }
      }
    }
    var tsScaleNs = 1000000L // EBML default: one tick = 1 ms
    var durationTicks = 0.0
    var width = 0; var height = 0
    var sampleRate = 0.0; var channels = 0L
    walk(0, b.length.toLong, 0) { (eid, ps, pe) =>
      if (eid == 0x18538067L) walk(ps, pe, 1) { (sid, sps, spe) => // Segment
        if (sid == 0x1549A966L) walk(sps, spe, 2) { (iid, ips, ipe) => // Info
          if (iid == 0x2AD7B1L && ipe - ips >= 1 && ipe - ips <= 8)
            tsScaleNs = uintAt(ips, (ipe - ips).toInt)
          else if (iid == 0x4489L) durationTicks = floatAt(ips, ipe)
        }
        else if (sid == 0x1654AE6BL) walk(sps, spe, 2) { (tid, tps, tpe) => // Tracks
          if (tid == 0xAEL) { // TrackEntry
            var w = 0; var h = 0; var sr = 0.0; var ch = 0L
            walk(tps, tpe, 3) { (cid, cps, cpe) =>
              if (cid == 0xE0L) walk(cps, cpe, 4) { (vid, vps, vpe) => // Video
                if (vid == 0xB0L && vpe - vps >= 1 && vpe - vps <= 8)
                  w = uintAt(vps, (vpe - vps).toInt).toInt
                else if (vid == 0xBAL && vpe - vps >= 1 && vpe - vps <= 8)
                  h = uintAt(vps, (vpe - vps).toInt).toInt
              }
              else if (cid == 0xE1L) walk(cps, cpe, 4) { (aid, aps, ape) => // Audio
                if (aid == 0xB5L) sr = floatAt(aps, ape)
                else if (aid == 0x9FL && ape - aps >= 1 && ape - aps <= 8)
                  ch = uintAt(aps, (ape - aps).toInt)
              }
            }
            // first video track with real dimensions wins; audio fields
            // come from the first audio track — an A/V file reports both
            if (width == 0 && w > 0 && h > 0) { width = w; height = h }
            if (sampleRate == 0.0 && sr > 0 && ch > 0) { sampleRate = sr; channels = ch }
          }
        }
      }
    }
    val durationMs = math.round(durationTicks * tsScaleNs / 1e6)
    if (durationMs < 0 || durationMs > Int.MaxValue || channels > Int.MaxValue) None
    else if (width > 0 && height > 0)
      Some(MediaMeta(id, b.length, width, height, durationMs.toInt,
        math.round(sampleRate).toInt, channels.toInt, "mkv"))
    else if (sampleRate > 0 && channels > 0)
      Some(MediaMeta(id, b.length, 0, 0, durationMs.toInt,
        math.round(sampleRate).toInt, channels.toInt, "mkv"))
    else None
  }

  // one dispatch row per byte-parse format: sniff, then parse with
  // any structural violation (None or a thrown parse error) falling
  // through to the next format and ultimately the stub; hoisted to the
  // object so the per-row decode path doesn't rebuild the dispatch
  // table (and its eta-expanded closures) per payload
  private val byteParsers: Seq[(Array[Byte] => Boolean, (Long, Array[Byte]) => Option[MediaMeta])] =
    Seq((isWav, parseWav), (isFlac, parseFlac), (isMp4, parseMp4), (isMkv, parseMkv), (isBmp, parseBmp))

  /** Decode one payload's metadata: a real `javax.imageio` header read
    * for PNG/JPEG/GIF (width/height — and the GIF frame count — parsed
    * from headers; pixel data is never decoded, so cost is O(header)
    * not O(image)), a plain RIFF byte parse for WAV, a STREAMINFO
    * parse for FLAC, an ISO-BMFF box walk for MP4/MOV, stub fallback
    * for everything else or on parse failure.
    */
  def decodeOne(id: Long, payload: Array[Byte]): MediaMeta = {
    // a missing blob is routine in a media corpus: stub metadata for an
    // empty payload, never a task-killing NPE
    if (payload == null) return fakeDecode(id, Array.emptyByteArray)
    if (isPng(payload) || isJpeg(payload) || isGif(payload)) {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (readers.hasNext) {
          val r = readers.next()
          try {
            r.setInput(in)
            // GIF: the JDK reader counts animation frames from block
            // headers (allowSearch walks the stream, still no pixel
            // decode); PNG/JPEG are single-frame by format
            val frames = if (isGif(payload)) r.getNumImages(true) else 1
            return MediaMeta(
              id, payload.length, r.getWidth(0), r.getHeight(0), frames, 0, 0,
              if (isPng(payload)) "png" else if (isGif(payload)) "gif" else "jpeg")
          } finally r.dispose()
        }
      } catch {
        // a magic-bytes match with a malformed header makes ImageIO
        // throw unchecked exceptions too (IllegalArgument, index/array
        // errors on fuzzed input) — any parse failure means "not
        // decodable", which is the stub's job, never a task failure
        case scala.util.control.NonFatal(_) => ()
      } finally in.close()
    }
    for ((sniff, parse) <- byteParsers if sniff(payload)) {
      try {
        parse(id, payload) match {
          case Some(m) => return m
          case None    => ()
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    fakeDecode(id, payload)
  }

  /** Minimal FLAC byte image (magic + STREAMINFO, no audio frames) — a
    * deterministic fixture generator for the STREAMINFO parse path,
    * used by specs and the verify-oracle query so every decoded field
    * is predictable arithmetic.
    */
  def flacBytes(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20) && channels >= 1 && channels <= 8 && nSamples >= 0,
      s"invalid FLAC fixture params: rate=$sampleRate ch=$channels samples=$nSamples")
    val out = new Array[Byte](42)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last-metadata-block flag + type 0 (STREAMINFO)
    out(7) = 34          // STREAMINFO length (24-bit BE)
    // min/max block size, min/max frame size: zeros are fine for the parse
    out(18) = ((sampleRate >> 12) & 0xff).toByte
    out(19) = ((sampleRate >> 4) & 0xff).toByte
    // byte 20: sample-rate low nibble | channels-1 (3 bits) | bps-1 high
    // bit (0); byte 21: bps-1 low 4 bits (0) | total-samples bits 35-32
    // (0 — fixtures stay under 2^32); bytes 22-25: total-samples bits 31-0
    out(20) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1)).toByte
    out(22) = ((nSamples >> 24) & 0xff).toByte
    out(23) = ((nSamples >> 16) & 0xff).toByte
    out(24) = ((nSamples >> 8) & 0xff).toByte
    out(25) = (nSamples & 0xff).toByte
    out
  }

  /** Minimal ISO-BMFF byte image (ftyp + moov/trak/{tkhd, mdia/minf/
    * stbl/stts}, no mdat) — a deterministic fixture generator for the
    * box-walk parse path: `width` x `height` display size and `nFrames`
    * split across two stts entries (so the parse must SUM entries, not
    * read the first).
    */
  def mp4Bytes(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    require(width > 0 && width <= 0x7fff && height > 0 && height <= 0x7fff && nFrames >= 1,
      s"invalid MP4 fixture params: w=$width h=$height frames=$nFrames")
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(name.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isom   isom".getBytes("US-ASCII"))
    // tkhd version 0: 84 bytes of fields before width/height
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84 + 8)
      bb.position(84)
      bb.putInt(width << 16).putInt(height << 16)
      box("tkhd", bb.array())
    }
    // two entries: (nFrames-1 frames, delta 1) + (1 frame, delta 1)
    val stts = {
      val bb = java.nio.ByteBuffer.allocate(8 + 16)
      bb.putInt(0).putInt(2).putInt(nFrames - 1).putInt(1).putInt(1).putInt(1)
      box("stts", bb.array())
    }
    val moov = box("moov", box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stts)))))
    ftyp ++ moov
  }

  /** Minimal Matroska/WebM byte image (EBML header + Segment{Info{
    * TimestampScale, Duration}, Tracks{TrackEntry{TrackType=video,
    * Video{PixelWidth, PixelHeight}}}}, no clusters) — a deterministic
    * fixture generator for the EBML walk: `width` x `height` pixel
    * dimensions and a `durationMs`-millisecond duration (stored as
    * Duration ticks under the default 1 ms TimestampScale, so the parse
    * must combine BOTH fields).
    */
  def mkvBytes(width: Int, height: Int, durationMs: Int): Array[Byte] = {
    require(width > 0 && width <= 0x7fff && height > 0 && height <= 0x7fff && durationMs >= 1,
      s"invalid MKV fixture params: w=$width h=$height durationMs=$durationMs")
    // minimal-width EBML size vint; fixture payloads stay under 2^14
    def vintSize(n: Int): Array[Byte] =
      if (n < 0x7f) Array((0x80 | n).toByte)
      else { require(n < 0x3fff, s"fixture payload too large: $n")
        Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte) }
    // element IDs are stored verbatim, marker bit included
    def idBytes(eid: Long): Array[Byte] = {
      val len = (71 - java.lang.Long.numberOfLeadingZeros(eid)) / 8
      Array.tabulate(len)(i => ((eid >> (8 * (len - 1 - i))) & 0xff).toByte)
    }
    def elem(eid: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(eid) ++ vintSize(payload.length) ++ payload
    def uintPayload(v: Long): Array[Byte] = {
      val len = math.max(1, (71 - java.lang.Long.numberOfLeadingZeros(v)) / 8)
      Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
    }
    val ebmlHdr = elem(0x1A45DFA3L, Array.emptyByteArray)
    val duration = {
      val bb = java.nio.ByteBuffer.allocate(8)
      bb.putDouble(durationMs.toDouble)
      elem(0x4489L, bb.array())
    }
    val info = elem(0x1549A966L, elem(0x2AD7B1L, uintPayload(1000000L)) ++ duration)
    val video = elem(0xE0L, elem(0xB0L, uintPayload(width)) ++ elem(0xBAL, uintPayload(height)))
    val trackEntry = elem(0xAEL, elem(0x83L, uintPayload(1L)) ++ video)
    ebmlHdr ++ elem(0x18538067L, info ++ elem(0x1654AE6BL, trackEntry))
  }

  /** Minimal 16-bit PCM WAV byte image (silent samples) — a
    * deterministic fixture generator for the RIFF parse path, used by
    * specs and the verify-oracle query so every decoded field is
    * predictable arithmetic.
    */
  def wavBytes(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    // bounds cover every field the bytes encode: channels/blockAlign
    // are u16, byte rate is u32 — a wrapping putShort/putInt would
    // silently encode different values than requested
    require(sampleRate > 0 && channels > 0 && channels <= 0x7fff && nFrames >= 0,
      s"invalid WAV fixture params: rate=$sampleRate ch=$channels frames=$nFrames")
    val blockAlign = channels * 2
    require(sampleRate.toLong * blockAlign <= Int.MaxValue,
      s"WAV fixture byte rate overflows: rate=$sampleRate ch=$channels")
    // size the buffer in Long: a fixture generator must fail loudly on
    // an overflowing request, never emit a corrupt RIFF image
    val dataSizeL = nFrames.toLong * blockAlign
    require(44L + dataSizeL <= Int.MaxValue, s"WAV fixture too large: $dataSizeL data bytes")
    val dataSize = dataSizeL.toInt
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
    bb.putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(16.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    bb.array()
  }

  /** BMP sniff: 'BM' magic plus a full BITMAPFILEHEADER+INFOHEADER. */
  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M'

  /** BITMAPINFOHEADER parse — plain little-endian byte arithmetic:
    * width at +18, height at +22 (negative = top-down rows; the
    * magnitude is the pixel height either way), planes/bpp at +26/+28.
    * Single-frame image metadata; None on structural violation.
    */
  private def parseBmp(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    val w = u32le(b, 18).toInt
    val h = math.abs(u32le(b, 22).toInt)
    val bpp = u16le(b, 28)
    if (w <= 0 || h <= 0 || !(bpp == 24 || bpp == 32 || bpp == 8 || bpp == 1)) None
    else Some(MediaMeta(id, b.length, w, h, 1, 0, 0, "bmp"))
  }

  /** Deterministic 24-bit uncompressed BMP fixture: `pix(x, y)` returns
    * 0xRRGGBB for image coordinates (origin top-left); rows are stored
    * bottom-up, BGR, padded to 4 bytes — the classic positive-height
    * layout [[decodeBmpPixels]] reads back.
    */
  def bmpBytes(width: Int, height: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad BMP dims ${width}x$height")
    val stride = ((3 * width + 3) / 4) * 4
    val dataSize = stride * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize).putInt(0).putInt(54)
    bb.putInt(40).putInt(width).putInt(height) // positive height = bottom-up
    bb.putShort(1.toShort).putShort(24.toShort).putInt(0).putInt(dataSize)
    bb.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var fileRow = 0
    while (fileRow < height) {
      val y = height - 1 - fileRow // bottom-up storage
      var x = 0
      while (x < width) {
        val rgb = pix(x, y)
        bb.put((rgb & 0xff).toByte)          // B
        bb.put(((rgb >> 8) & 0xff).toByte)   // G
        bb.put(((rgb >> 16) & 0xff).toByte)  // R
        x += 1
      }
      var pad = 3 * width
      while (pad < stride) { bb.put(0.toByte); pad += 1 }
      fileRow += 1
    }
    bb.array()
  }

  /** REAL pixel decode for uncompressed 24-bit BMP payloads — the
    * format needs no codec, just byte arithmetic, so the "decode is a
    * stub" boundary moves: raw formats (BMP here, PCM WAV in
    * [[decodePcmStats]]) decode their actual content; only
    * codec-compressed formats (JPEG/PNG pixels, MP3/H.264) stay
    * header-only. Per payload: exact integer channel sums over every
    * pixel (means derive as sum/(w*h) without float drift). ok=0 rows
    * (not a 24bpp bottom-up BMP, malformed, truncated) carry zeros —
    * a corrupt blob is routine in a crawled corpus, never a task
    * failure. Batched per partition like [[decodeMeta]]; one narrow
    * no-shuffle pass.
    * Output: (id, ok, width, height, sum_r, sum_g, sum_b).
    */
  def decodeBmpPixels(
      df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytesOrNull) =>
            val b = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
            val none = (id, 0, 0, 0, 0L, 0L, 0L)
            if (!isBmp(b)) none
            else {
              // negative height = top-down rows; the channel sums are
              // row-order invariant, so both layouts decode
              try bmpPixelSumsOne(b) match {
                case Some((w, h, sr, sg, sb)) => (id, 1, w, h, sr, sg, sb)
                case None                     => none
              } catch { case scala.util.control.NonFatal(_) => none }
            }
          }
        }
      }
      .toDF("id", "ok", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** Perceptual difference-hash (dHash) over REAL decoded BMP pixels —
    * the standard image-dedup fingerprint: re-encodes, resizes, and
    * format shifts change every byte of a payload but barely move its
    * dHash, so banded Hamming pairing over these hashes
    * ([[Dedup.fingerprintNearDuplicates]]) is the image-side sibling
    * of text SimHash dedup. Pipeline per payload, all EXACT integer
    * arithmetic (cross-engine replayable, no float resampling):
    *
    *  1. decode the 24bpp BMP ([[decodeBmpPixels]]'s walk, row order
    *     mapped back to image coordinates — bottom-up and top-down
    *     layouts hash identically);
    *  2. brightness per pixel as the plain channel sum r+g+b;
    *  3. downscale to a `gridCols` x `gridRows` grid: pixel (x, y)
    *     joins cell (x*gridCols/w, y*gridRows/h) (integer division —
    *     cells partition the image into near-equal blocks), keeping
    *     per-cell brightness sum and count;
    *  4. one bit per horizontally-adjacent cell pair: bit j*(gridCols-1)+i
    *     is set iff cell (i+1, j)'s average brightness strictly exceeds
    *     cell (i, j)'s — compared cross-multiplied (sum_r * n_l >
    *     sum_l * n_r), never as float division.
    *
    * The default 9x8 grid yields the classic 64-bit dHash. Images
    * smaller than the grid (or any undecodable payload) report ok=0
    * with a zero hash — corrupt blobs are routine in a crawl, never a
    * task failure. Batched per partition; one narrow no-shuffle pass.
    * Output: (id, ok, width, height, dhash).
    */
  def decodeBmpDhash(
      df: DataFrame, idCol: String, payloadCol: String,
      gridCols: Int = 9, gridRows: Int = 8, batchSize: Int = 256): DataFrame =
    dhashFrame(df, idCol, payloadCol, gridCols, gridRows, batchSize) { b =>
      if (isBmp(b)) bmpDhashOne(b, gridCols, gridRows) else None
    }

  private def requireDhashGrid(gridCols: Int, gridRows: Int): Unit = {
    require(gridCols >= 2 && gridRows >= 1,
      s"dHash grid must be at least 2x1, got ${gridCols}x$gridRows")
    require((gridCols - 1) * gridRows <= 64,
      s"dHash bits (gridCols-1)*gridRows must fit a long, got ${(gridCols - 1) * gridRows}")
  }

  /** The shared batched-mapPartitions frame around a per-payload dHash:
    * one narrow no-shuffle pass, ok=0 zero rows for whatever `one`
    * declines — a corrupt blob is routine in a crawled corpus, never a
    * task failure. Output: (id, ok, width, height, dhash).
    */
  private def dhashFrame(
      df: DataFrame, idCol: String, payloadCol: String,
      gridCols: Int, gridRows: Int, batchSize: Int)(
      one: Array[Byte] => Option[(Int, Int, Long)]): DataFrame = {
    requireDhashGrid(gridCols, gridRows)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytesOrNull) =>
            val b = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
            try one(b) match {
              case Some((w, h, hash)) => (id, 1, w, h, hash)
              case None               => (id, 0, 0, 0, 0L)
            } catch { case scala.util.control.NonFatal(_) => (id, 0, 0, 0, 0L) }
          }
        }
      }
      .toDF("id", "ok", "width", "height", "dhash")
  }

  /** Bits from accumulated grid cells — the arithmetic every decode
    * path shares, so one pixel function renders to the SAME dHash
    * through BMP bytes, PNG, or GIF: bit j*(gridCols-1)+i set iff cell
    * (i+1, j)'s average brightness strictly exceeds cell (i, j)'s,
    * compared cross-multiplied (exact for any image whose per-cell
    * brightness sum stays under ~2^31 — a >2-gigapixel cell otherwise).
    */
  private def dhashBits(
      sums: Array[Long], counts: Array[Long], gridCols: Int, gridRows: Int): Long = {
    var hash = 0L
    var j = 0
    while (j < gridRows) {
      var i = 0
      while (i < gridCols - 1) {
        val l = j * gridCols + i
        if (sums(l + 1) * counts(l) > sums(l) * counts(l + 1))
          hash |= 1L << (j * (gridCols - 1) + i)
        i += 1
      }
      j += 1
    }
    hash
  }

  /** The 24bpp-BMP dHash walk (exact byte arithmetic, bottom-up and
    * top-down layouts hash identically); None on anything that is not
    * a complete 24bpp BMP at least grid-sized.
    */
  private def bmpDhashOne(
      b: Array[Byte], gridCols: Int, gridRows: Int): Option[(Int, Int, Long)] = {
    val w = u32le(b, 18).toInt
    val rawH = u32le(b, 22).toInt
    val h = math.abs(rawH)
    val topDown = rawH < 0
    val bpp = u16le(b, 28)
    val off = u32le(b, 10).toInt
    val stride = ((3 * w + 3) / 4) * 4
    if (w < gridCols || h < gridRows || bpp != 24 || off < 54 ||
      off.toLong + stride.toLong * h > b.length) None
    else {
      val sums = new Array[Long](gridCols * gridRows)
      val counts = new Array[Long](gridCols * gridRows)
      var fileRow = 0
      while (fileRow < h) {
        val y = if (topDown) fileRow else h - 1 - fileRow
        val j = y * gridRows / h
        val base = off + fileRow * stride
        var x = 0
        while (x < w) {
          val cell = j * gridCols + x * gridCols / w
          sums(cell) += (b(base + 3 * x) & 0xff) +
            (b(base + 3 * x + 1) & 0xff) + (b(base + 3 * x + 2) & 0xff)
          counts(cell) += 1
          x += 1
        }
        fileRow += 1
      }
      Some((w, h, dhashBits(sums, counts, gridCols, gridRows)))
    }
  }

  /** ImageIO streams buffer in memory, not executor-local temp files —
    * set once per JVM, first time an ImageIO decode path is touched.
    */
  private lazy val imageioReady: Boolean = {
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  /** The JDK-decoder dHash: `javax.imageio` ships PNG/GIF/BMP/JPEG
    * readers with zero external dependencies, so codec-FREE lossless
    * formats decode to their exact authored pixels (PNG stores
    * filtered+deflated RGB; GIF stores palette indices — both
    * bit-exact, which is what lets a DuckDB oracle replay the pixel
    * arithmetic). Brightness and grid arithmetic are IDENTICAL to the
    * BMP walk: the same image saved as BMP, PNG, or GIF produces the
    * same 64-bit dHash. None when ImageIO has no reader for the bytes
    * or the image is smaller than the grid.
    */
  /** Decode via ImageIO and hand the caller (w, h, row iterator) — the
    * ONE place the JDK read + sRGB row extraction happens, so the
    * dHash and pixel-sum tiers cannot drift on what the same payload
    * decodes to. The row array is reused across rows (consume within
    * the iteration). None when ImageIO has no reader for the bytes.
    */
  private def withImageioRows[T](b: Array[Byte])(
      f: (Int, Int, Iterator[Array[Int]]) => T): Option[T] = {
    require(imageioReady)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val rowPix = new Array[Int](w)
      val rows = (0 until h).iterator.map { y =>
        img.getRGB(0, y, w, 1, rowPix, 0, w); rowPix
      }
      Some(f(w, h, rows))
    }
  }

  private def imageioDhashOne(
      b: Array[Byte], gridCols: Int, gridRows: Int): Option[(Int, Int, Long)] =
    withImageioRows(b) { (w, h, rows) =>
      if (w < gridCols || h < gridRows) None
      else {
        val sums = new Array[Long](gridCols * gridRows)
        val counts = new Array[Long](gridCols * gridRows)
        var y = 0
        rows.foreach { rowPix =>
          val j = y * gridRows / h
          var x = 0
          while (x < w) {
            val p = rowPix(x)
            val cell = j * gridCols + x * gridCols / w
            sums(cell) += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        Some((w, h, dhashBits(sums, counts, gridCols, gridRows)))
      }
    }.flatten

  /** Format-dispatching perceptual dHash — the image-dedup front door
    * for a REAL crawled corpus, where payloads arrive as PNG and JPEG
    * (and GIF, and the odd BMP), not as one format: 24bpp BMPs take
    * the exact byte walk ([[bmpDhashOne]] — no decoder object per
    * blob), PNG/GIF/JPEG payloads decode through the JDK's own
    * `javax.imageio` readers, and both paths share brightness
    * (r+g+b), grid (x*gridCols/w, y*gridRows/h), and bit arithmetic —
    * so an image re-encoded across formats collapses to ONE hash, and
    * near-variants (rescale, brightness edit) land a few Hamming bits
    * away for [[Dedup.fingerprintNearDuplicates]] banding. PNG/GIF/BMP
    * decode to bit-exact authored pixels (lossless: a cross-engine
    * oracle can replay the arithmetic from the generating function);
    * JPEG decodes to the JDK decoder's deterministic output (real, but
    * decoder-defined — graded by spec, not by cross-engine replay).
    * Undecodable or sub-grid payloads report ok=0 with zeros; batched
    * per partition, one narrow no-shuffle pass.
    * Output: (id, ok, width, height, dhash).
    */
  def decodeImageDhash(
      df: DataFrame, idCol: String, payloadCol: String,
      gridCols: Int = 9, gridRows: Int = 8, batchSize: Int = 256): DataFrame =
    dhashFrame(df, idCol, payloadCol, gridCols, gridRows, batchSize) { b =>
      // BMPs the byte walk declines (32bpp BI_BITFIELDS, 8bpp palette,
      // 1bpp) fall through to the JDK's own BMP reader instead of
      // reporting ok=0 — a crawled 32bpp duplicate of a PNG must not
      // silently survive dedup
      if (isBmp(b))
        bmpDhashOne(b, gridCols, gridRows).orElse(imageioDhashOne(b, gridCols, gridRows))
      else if (isPng(b) || isGif(b) || isJpeg(b)) imageioDhashOne(b, gridCols, gridRows)
      else None
    }

  /** Format-dispatching exact channel sums — [[decodeBmpPixels]]
    * widened the way [[decodeImageDhash]] widens [[decodeBmpDhash]]:
    * 24bpp BMPs take the byte walk, PNG/GIF/JPEG decode through the
    * JDK's `javax.imageio` readers into the same integer r/g/b sums
    * (PNG/GIF bit-exact; JPEG decoder-deterministic). The cheap
    * corpus-wide brightness/color statistics pass a media-curation run
    * feeds its exposure/blank-image gates with. ok=0 zeros for
    * undecodable payloads; batched, narrow, no shuffle.
    * Output: (id, ok, width, height, sum_r, sum_g, sum_b).
    */
  def decodeImagePixels(
      df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytesOrNull) =>
            val b = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
            val none = (id, 0, 0, 0, 0L, 0L, 0L)
            def viaImageio = withImageioRows(b) { (w, h, rows) =>
              var sr = 0L; var sg = 0L; var sb = 0L
              rows.foreach { rowPix =>
                var x = 0
                while (x < w) {
                  val p = rowPix(x)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
              }
              (id, 1, w, h, sr, sg, sb)
            }
            try {
              // same dispatch as decodeImageDhash: exact byte walk for
              // 24bpp BMP, JDK reader for PNG/GIF/JPEG AND for the BMP
              // variants the walk declines
              if (isBmp(b)) bmpPixelSumsOne(b) match {
                case Some((w, h, sr, sg, sb)) => (id, 1, w, h, sr, sg, sb)
                case None                     => viaImageio.getOrElse(none)
              }
              else if (isPng(b) || isGif(b) || isJpeg(b)) viaImageio.getOrElse(none)
              else none
            } catch { case scala.util.control.NonFatal(_) => none }
          }
        }
      }
      .toDF("id", "ok", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** The [[decodeBmpPixels]] walk for one payload (shared with
    * [[decodeImagePixels]]' BMP branch).
    */
  private def bmpPixelSumsOne(b: Array[Byte]): Option[(Int, Int, Long, Long, Long)] = {
    val w = u32le(b, 18).toInt
    val h = math.abs(u32le(b, 22).toInt)
    val bpp = u16le(b, 28)
    val off = u32le(b, 10).toInt
    val stride = ((3 * w + 3) / 4) * 4
    if (w <= 0 || h <= 0 || bpp != 24 || off < 54 ||
      off.toLong + stride.toLong * h > b.length) None
    else {
      var sr = 0L; var sg = 0L; var sb = 0L
      var row = 0
      while (row < h) {
        var x = 0
        val base = off + row * stride
        while (x < w) {
          sb += (b(base + 3 * x) & 0xff)
          sg += (b(base + 3 * x + 1) & 0xff)
          sr += (b(base + 3 * x + 2) & 0xff)
          x += 1
        }
        row += 1
      }
      Some((w, h, sr, sg, sb))
    }
  }

  /** Deterministic PNG fixture: `pix(x, y)` returns 0xRRGGBB for image
    * coordinates (origin top-left), encoded by the JDK's own PNG writer
    * — lossless, so [[decodeImageDhash]] reads back EXACTLY the
    * authored pixels and a cross-engine oracle can replay `pix`.
    */
  def pngBytes(width: Int, height: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad PNG dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, pix(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos), "JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** Deterministic GIF fixture: `gray(x, y)` returns 0..255; the image
    * is written TYPE_BYTE_INDEXED over an explicit identity gray
    * palette (entry i = rgb(i,i,i)) so the palette-index encode is
    * exact — GIF's 256-color limit makes arbitrary-RGB fixtures lossy,
    * but a gray ramp is bit-faithful and [[decodeImageDhash]] reads
    * back brightness 3*gray(x,y) exactly.
    */
  def gifGrayBytes(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad GIF dims ${width}x$height")
    val cmap = Array.tabulate(256)(i => (0xff << 24) | (i << 16) | (i << 8) | i)
    val icm = new java.awt.image.IndexColorModel(
      8, 256, cmap, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = gray(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "gif", bos), "JDK GIF writer unavailable")
    bos.toByteArray
  }

  /** Deterministic 16-bit PCM WAV fixture with ACTUAL samples:
    * `samples` are interleaved frames (length must divide evenly by
    * `channels`); header layout identical to [[wavBytes]].
    */
  def wavPcmBytes(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of $channels channels")
    val blockAlign = channels * 2
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
    bb.putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(16.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL sample decode for 16-bit PCM WAV — the audio sibling of
    * [[decodeBmpPixels]]: walk the RIFF chunks for fmt (must be
    * format 1 = integer PCM, 16 bits) and data, then read every
    * little-endian sample and reduce it to EXACT INTEGER signal
    * statistics: peak |amplitude|, the energy sum of squares (RMS
    * derives as sqrt(sum_sq / (frames*channels)) without per-engine
    * float drift), and channel-0 zero crossings (strict sign flips —
    * the classic cheap voiced/unvoiced + silence discriminator an
    * audio-curation gate keys on). ok=0 (zeros) for anything not
    * 16-bit integer PCM or structurally broken. Batched per partition;
    * one narrow pass, no shuffle, no collection.
    * Output: (id, ok, n_frames, n_channels, sample_rate, peak_abs,
    * sum_sq, zero_crossings).
    */
  /** The shared RIFF walk of the two PCM decoders: locate the fmt and
    * FIRST data chunks, validate 16-bit integer PCM, and return
    * (channels, sampleRate, dataOff, dataLen) — or None for anything
    * structurally broken or non-PCM. One implementation so the
    * decoders can never diverge on which payloads decode (and the
    * lying-u32-size hang guard lives in exactly one place: the walk
    * steps in LONG before touching the Int offset, because a lying
    * chunk size would otherwise zero or reverse the advance and spin
    * forever).
    */
  private def pcmFmtAndData(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    var off = 12
    var fmtOk = false; var channels = 0; var rate = 0L
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val cid = new String(b, off, 4, "US-ASCII")
      val sz = u32le(b, off + 4) // Long, like parseWav
      if (cid == "fmt " && sz >= 16 && off + 8 + 16 <= b.length) {
        val fmt = u16le(b, off + 8)
        channels = u16le(b, off + 10)
        rate = u32le(b, off + 12)
        val bits = u16le(b, off + 22)
        fmtOk = fmt == 1 && bits == 16 && channels > 0 &&
          rate > 0 && rate <= Int.MaxValue
      } else if (cid == "data" && dataOff < 0) {
        // FIRST data chunk, frames actually present — the parseWav
        // stance, so the decoders agree
        dataOff = off + 8
        dataLen = math.min(sz, (b.length - dataOff).toLong).toInt
      }
      val next = off.toLong + 8L + sz + (sz & 1L)
      if (next + 8 > b.length) off = b.length else off = next.toInt
    }
    if (!fmtOk || dataOff < 0 || dataLen < 2) None
    else Some((channels, rate.toInt, dataOff, dataLen))
  }

  def decodePcmStats(
      df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytesOrNull) =>
            val b = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
            val none = (id, 0, 0L, 0, 0, 0, 0L, 0L)
            if (!isWav(b)) none
            else {
              try {
                pcmFmtAndData(b) match {
                  case None => none
                  case Some((channels, rate, dataOff, dataLen)) =>
                    val nSamples = dataLen / 2
                    val nFrames = nSamples / channels
                    var peak = 0; var sumSq = 0L; var zc = 0L
                    var prev0 = 0; var havePrev0 = false
                    var i = 0
                    while (i < nSamples) {
                      val lo = b(dataOff + 2 * i) & 0xff
                      val hi = b(dataOff + 2 * i + 1)
                      val s = (hi << 8) | lo // sign-extends through hi
                      val a = math.abs(s)
                      if (a > peak) peak = a
                      sumSq += s.toLong * s
                      if (i % channels == 0) { // channel 0 stream
                        if (havePrev0 && prev0 * s < 0) zc += 1
                        prev0 = s; havePrev0 = true
                      }
                      i += 1
                    }
                    (id, 1, nFrames.toLong, channels, rate, peak, sumSq, zc)
                }
              } catch { case scala.util.control.NonFatal(_) => none }
            }
          }
        }
      }
      .toDF("id", "ok", "n_frames", "n_channels", "sample_rate",
        "peak_abs", "sum_sq", "zero_crossings")
  }

  /** Perceptual audio fingerprint over REAL decoded 16-bit PCM
    * samples — the audio sibling of [[decodeBmpDhash]], completing the
    * one-machinery multimodal dedup story (text SimHash, image dHash,
    * audio energy contour, all paired by
    * [[Dedup.fingerprintNearDuplicates]]). The channel-0 stream
    * divides into `windows` near-equal frame blocks (frame f joins
    * window f·windows/nFrames, integer division), each accumulating
    * its EXACT integer energy (sum of sample squares); one bit per
    * adjacent window pair: bit k set iff window k+1's mean energy
    * strictly exceeds window k's, compared cross-multiplied
    * (e_r·c_l > e_l·c_r) — never float division. The shape-not-scale
    * contract falls out: uniform amplitude scaling multiplies every
    * window energy equally, so a re-mastered louder copy fingerprints
    * IDENTICALLY, while an inserted transient flips only the bits
    * around it.
    *
    * The cross-multiplied compare is exact while e·c fits a long —
    * windows of up to ~90k frames at full 16-bit amplitude; chunk
    * longer audio first (the [[TextFunctions.chunkTokens]] stance).
    * That bound is ENFORCED on the actual values, not assumed: any
    * adjacent-window compare whose product would exceed Long range
    * reports ok=0 — loudly refusing, never silently wrapping into a
    * garbage-but-plausible fingerprint — while a long-but-quiet clip
    * whose true products fit keeps fingerprinting.
    * Clips with fewer channel-0 frames than `windows`, and anything
    * not 16-bit integer PCM, report ok=0 with a zero fingerprint.
    * Batched per partition; one narrow no-shuffle pass.
    * Output: (id, ok, n_frames, afp).
    */
  def decodePcmFingerprint(
      df: DataFrame, idCol: String, payloadCol: String,
      windows: Int = 65, batchSize: Int = 256): DataFrame = {
    require(windows >= 2 && windows - 1 <= 64,
      s"windows must be in [2, 65] so the fingerprint fits a long, got $windows")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytesOrNull) =>
            val b = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
            val none = (id, 0, 0L, 0L)
            if (!isWav(b)) none
            else {
              try {
                pcmFmtAndData(b) match {
                  case None => none
                  case Some((channels, _, dataOff, dataLen)) =>
                    val nSamples = dataLen / 2
                    val nFrames = nSamples / channels
                    if (nFrames < windows) none
                    else {
                      val energy = new Array[Long](windows)
                      val counts = new Array[Long](windows)
                      // walk COMPLETE frames only: a multi-channel clip
                      // truncated mid-frame has a trailing channel-0
                      // sample whose frame index equals nFrames, which
                      // would index one past the window array
                      var f = 0
                      while (f < nFrames) {
                        val i = f * channels
                        val lo = b(dataOff + 2 * i) & 0xff
                        val hi = b(dataOff + 2 * i + 1)
                        val s = (hi << 8) | lo
                        val w = (f.toLong * windows / nFrames).toInt
                        energy(w) += s.toLong * s
                        counts(w) += 1L
                        f += 1
                      }
                      var afp = 0L
                      var fits = true
                      var k = 0
                      while (fits && k < windows - 1) {
                        val eL = energy(k); val cL = counts(k)
                        val eR = energy(k + 1); val cR = counts(k + 1)
                        // the exact-integer contract enforced on the
                        // actual values: refuse (ok=0) if either cross
                        // product would wrap, instead of comparing
                        // garbage — counts are >= 1, energies >= 0
                        if (eR > Long.MaxValue / cL || eL > Long.MaxValue / cR)
                          fits = false
                        else if (eR * cL > eL * cR)
                          afp |= 1L << k
                        k += 1
                      }
                      if (!fits) none else (id, 1, nFrames.toLong, afp)
                    }
                }
              } catch { case scala.util.control.NonFatal(_) => none }
            }
          }
        }
      }
      .toDF("id", "ok", "n_frames", "afp")
  }

  /** Per-partition batched decode over (id, binary payload) rows.
    * Batching amortizes per-record codec setup exactly like
    * `mapInPandas` batches arrow record-batches.
    */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String, batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch decoder setup would go here (ImageIO readers are
          // created per payload since formats can vary within a batch)
          batch.iterator.map { case (id, bytes) => decodeOne(id, bytes) }
        }
      }
      .toDF()
  }

  /** Frame-sampling stub: emit every `stride`-th "frame index" for each
    * payload — the row-explosion shape of video frame extraction.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, stride: Int): DataFrame = {
    val nFrames = (octet_length(col(payloadCol).cast("binary")) % 16).cast("int")
    df
      // zero-frame payloads emit NO rows — clamping -1 up to 0 would
      // fabricate a phantom frame 0 that disagrees with decodeMeta
      .where(nFrames > 0)
      .select(
        col(idCol).cast("long").as("id"),
        explode(sequence(lit(0), nFrames - 1, lit(stride))).as("frame_idx")
      )
  }

  /** Feature extraction over binary payloads: each blob becomes a
    * fixed-`dim` float vector (here a STUB: an L1-normalized folded
    * byte histogram — deterministic, so identical payloads map to
    * identical vectors; swap the body for a real model/encoder without
    * touching the plan). Batched per partition like [[decodeMeta]];
    * output (id, features array<float>) feeds straight into the
    * [[Similarity]] ANN/near-dup operators — the binary -> embedding ->
    * dedup composition a training-data pipeline runs at 100 TB.
    */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      dim: Int = 64,
      batchSize: Int = 256
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real encoder would load model weights once per batch here
          batch.iterator.map { case (id, bytesOrNull) =>
            val bytes = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
            val hist = new Array[Float](dim)
            var i = 0
            while (i < bytes.length) {
              hist((bytes(i) & 0xff) % dim) += 1.0f
              i += 1
            }
            val total = math.max(bytes.length, 1).toFloat
            var j = 0
            while (j < dim) { hist(j) /= total; j += 1 }
            (id, hist)
          }
        }
      }
      .toDF("id", "features")
  }

  /** Resize stub: computes the target dimensions of an aspect-preserving
    * fit into `maxW` x `maxH` from the decoded (fake) dimensions — the
    * metadata side of a resize pipeline; a real implementation would
    * also emit the resized payload from the same per-batch loop.
    */
  def resizeMeta(df: DataFrame, idCol: String, payloadCol: String, maxW: Int, maxH: Int): DataFrame = {
    val n = octet_length(col(payloadCol).cast("binary"))
    val w = greatest(n % 640, lit(1)).cast("double")
    val h = greatest(n % 480, lit(1)).cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    df.select(
      col(idCol).cast("long").as("id"),
      w.cast("int").as("src_width"),
      h.cast("int").as("src_height"),
      floor(w * scale).cast("int").as("out_width"),
      floor(h * scale).cast("int").as("out_height")
    )
  }
}
