package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/WAVE codec for 16-bit PCM mono — pure JVM, no codec
  * libraries, so audio decode in this engine is REAL (header walk + sample
  * extraction), not a stub: the multimodal audio path parses actual WAV
  * bytes the same way the image path decodes actual PNGs.
  *
  * Decode walks the chunk list (handles extra chunks like LIST/fact between
  * fmt and data, and odd-sized chunks' pad bytes) rather than assuming the
  * canonical 44-byte layout — real-world WAV files put metadata chunks
  * first.
  */
object WavCodec {

  /** Encode mono 16-bit PCM little-endian at `sampleRate`. */
  def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a mono 16-bit PCM WAV. Returns (sampleRate, samples), or None
    * for anything that is not such a WAV (wrong magic, compressed format,
    * stereo, other bit depths, truncated chunks). */
  def decode(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes == null || bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    buf.get(magic)
    if (new String(magic, "US-ASCII") != "RIFF") return None
    buf.getInt // riff size (ignored; files in the wild get it wrong)
    buf.get(magic)
    if (new String(magic, "US-ASCII") != "WAVE") return None

    var sampleRate = 0
    var valid = false
    while (buf.remaining() >= 8) {
      buf.get(magic)
      val id = new String(magic, "US-ASCII")
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val start = buf.position()
          val audioFormat = buf.getShort
          val channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          valid = audioFormat == 1 && channels == 1 && bits == 16
          // chunks pad to even — but a trailing odd-size chunk may omit the
          // pad byte, so clamp instead of letting position() throw
          val next = start + size + (size & 1)
          if (next > buf.limit()) return None
          buf.position(next)
        case "data" =>
          if (!valid) return None
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort; i += 1 }
          return Some((sampleRate, out))
        case _ =>
          val next = buf.position() + size + (size & 1)
          if (next > buf.limit()) return None // odd final chunk, pad absent
          buf.position(next)
      }
    }
    None
  }
}
