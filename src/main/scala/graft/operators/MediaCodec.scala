package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM media codecs for the multimodal path: binary PPM (P6) images and
  * PCM-16 WAV audio. These are real, spec-conformant parsers — no native
  * libraries — so the multimodal pipeline decodes actual payloads end-to-end
  * (the plug-point the round-1 stub documented). Formats this codec cannot
  * parse fall back to the documented byte-histogram stub in [[Multimodal]].
  */
object MediaCodec {

  final case class PpmImage(width: Int, height: Int, rgb: Array[Byte])
  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  // --- PPM P6 (binary RGB, maxval 255) --------------------------------------

  def encodePpm(img: PpmImage): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3, "rgb length != w*h*3")
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes(US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Parse a binary PPM: magic, whitespace/comment-tolerant header ints,
    * single whitespace, then `w*h*3` raw bytes. Returns None on any
    * deviation (wrong magic, maxval != 255, truncated payload).
    */
  def decodePpm(bytes: Array[Byte]): Option[PpmImage] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipSpaceAndComments(): Unit = {
      var going = true
      while (going && pos < bytes.length) {
        val c = bytes(pos)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else going = false
      }
    }
    def readInt(): Option[Int] = {
      skipSpaceAndComments()
      var v = 0L; var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); any = true; pos += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if maxval == 255 && w > 0 && h > 0
      // Long arithmetic: adversarial header dims must not overflow Int and
      // sneak past the payload-length guard (65536*65536*3 wraps to 0)
      payloadLen = w.toLong * h.toLong * 3L
      if payloadLen <= Int.MaxValue
      // exactly one whitespace byte separates header from payload
      if pos < bytes.length && (bytes(pos) == '\n' || bytes(pos) == ' ' ||
        bytes(pos) == '\t' || bytes(pos) == '\r')
      payload = {
        pos += 1
        if (bytes.length - pos >= payloadLen.toInt)
          Some(java.util.Arrays.copyOfRange(bytes, pos, pos + payloadLen.toInt))
        else None
      }
      rgb <- payload
    } yield PpmImage(w, h, rgb)
  }

  // --- WAV (RIFF, PCM 16-bit little-endian) ---------------------------------

  def encodeWav(audio: WavAudio): Array[Byte] = {
    require(audio.channels == 1, "encoder emits mono")
    val dataSize = audio.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataSize)
      .put("WAVE".getBytes(US_ASCII))
    buf.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(audio.channels.toShort)
      .putInt(audio.sampleRate)
      .putInt(audio.sampleRate * audio.channels * 2) // byte rate
      .putShort((audio.channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes(US_ASCII)).putInt(dataSize)
    audio.samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a RIFF/WAVE container: walk chunks, require a PCM-16 `fmt `, read
    * `data`. Returns None for non-RIFF payloads, compressed formats, or
    * truncated chunks.
    */
  def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); buf.get(riff)
    if (!java.util.Arrays.equals(riff, "RIFF".getBytes(US_ASCII))) return None
    buf.getInt // riff size (unchecked: streams often patch it late)
    val wave = new Array[Byte](4); buf.get(wave)
    if (!java.util.Arrays.equals(wave, "WAVE".getBytes(US_ASCII))) return None
    var sampleRate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (samples == null || sampleRate < 0)) {
      val id = new Array[Byte](4); buf.get(id)
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return None
      val idStr = new String(id, US_ASCII)
      if (idStr == "fmt ") {
        if (size < 16) return None
        val start = buf.position()
        val fmt = buf.getShort
        channels = buf.getShort
        sampleRate = buf.getInt
        buf.getInt; buf.getShort
        bits = buf.getShort
        if (fmt != 1 || bits != 16) return None // PCM-16 only
        buf.position(start + size + (size & 1))
      } else if (idStr == "data") {
        val n = size / 2
        samples = new Array[Short](n)
        var i = 0
        while (i < n) { samples(i) = buf.getShort; i += 1 }
        if ((size & 1) == 1 && buf.remaining() > 0) buf.get
      } else {
        buf.position(buf.position() + size + (size & 1))
      }
    }
    if (sampleRate > 0 && channels > 0 && samples != null)
      Some(WavAudio(sampleRate, channels, samples))
    else None
  }

  // --- AVI (RIFF container, uncompressed 00db frame chunks) -----------------

  /** An AVI video: dimensions, frame period, and raw frame payloads (24-bit
    * DIB bytes in the uncompressed profile this codec writes; the parser
    * accepts any `00db`/`00dc` chunk payload so foreign uncompressed or
    * compressed-stream files still yield their frame boundaries).
    */
  final case class AviVideo(width: Int, height: Int, microSecPerFrame: Int,
      frames: Seq[Array[Byte]])

  private def fourCC(s: String): Array[Byte] = s.getBytes(US_ASCII)

  /** Write a spec-conformant minimal AVI: RIFF('AVI ') { LIST hdrl [ avih,
    * LIST strl [ strh(vids), strf(BITMAPINFOHEADER) ] ], LIST movi
    * [ 00db* ] }. Chunks are word-aligned per RIFF rules.
    */
  def encodeAvi(video: AviVideo): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val out = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      out.put(fourCC(id)).putInt(body.length).put(body)
      out.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourCC(kind) ++ body)
    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(video.microSecPerFrame).putInt(0).putInt(0).putInt(0)
        .putInt(video.frames.length).putInt(0).putInt(1).putInt(0)
        .putInt(video.width).putInt(video.height)
      b.array()
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      // dwScale/dwRate must agree with avih's micro-sec-per-frame (frame
      // period = scale/rate seconds); standard consumers read THESE as the
      // normative fps source
      b.put(fourCC("vids")).put(fourCC("DIB ")).putInt(0).putInt(0).putInt(0)
        .putInt(video.microSecPerFrame).putInt(1000000).putInt(0)
        .putInt(video.frames.length).putInt(0).putInt(-1).putInt(0)
      b.array()
    }
    val strf = {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(video.width).putInt(video.height)
        .putShort(1).putShort(24).putInt(0)
        .putInt(video.width * video.height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", video.frames.toArray.flatMap(f => chunk("00db", f)))
    chunk("RIFF", fourCC("AVI ") ++ hdrl ++ movi)
  }

  /** Parse an AVI container: RIFF walk collecting the `avih` header and the
    * `movi` list's `00db`/`00dc` frame chunks. Tolerant of unknown chunks
    * (idx1, INFO, vendor lists); total over garbage (None on any structural
    * violation).
    */
  def decodeAvi(bytes: Array[Byte]): Option[AviVideo] = {
    if (bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); buf.get(riff)
    if (!java.util.Arrays.equals(riff, fourCC("RIFF"))) return None
    buf.getInt // riff size (unchecked, as in decodeWav)
    val kind = new Array[Byte](4); buf.get(kind)
    if (!java.util.Arrays.equals(kind, fourCC("AVI "))) return None
    var width = -1; var height = -1; var usPerFrame = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // walk(limit): parse sibling chunks until `limit`; descend into LISTs
    def walk(limit: Int): Boolean = {
      while (buf.position() + 8 <= limit) {
        val id = new Array[Byte](4); buf.get(id)
        val size = buf.getInt
        // compare against the REMAINING span — `position + size` would
        // integer-overflow on a hostile declared size and escape as
        // OOM/underflow instead of the documented None
        if (size < 0 || size > limit - buf.position()) return false
        val end = buf.position() + size + (size & 1)
        val idStr = new String(id, US_ASCII)
        if (idStr == "LIST") {
          if (size < 4) return false
          val lk = new Array[Byte](4); buf.get(lk) // list kind; walk contents
          if (!walk(buf.position() + size - 4)) return false
        } else if (idStr == "avih") {
          if (size < 40) return false
          val start = buf.position()
          usPerFrame = buf.getInt
          buf.position(start + 32)
          width = buf.getInt
          height = buf.getInt
          buf.position(start)
        } else if (idStr == "00db" || idStr == "00dc") {
          val f = new Array[Byte](size)
          buf.get(f)
          frames += f
          buf.position(end - size - (size & 1)) // rewind to re-skip uniformly
        }
        if (end > limit) return false
        buf.position(math.min(end, limit))
      }
      true
    }
    if (!walk(bytes.length)) return None
    if (width > 0 && height > 0 && usPerFrame >= 0) Some(AviVideo(width, height, usPerFrame, frames.toSeq))
    else None
  }
}
