package graft.functions

/** A real (if small) RIFF/WAVE codec for the multimodal binary pipeline.
  *
  * The container synthesizes each document's payload as a genuine WAV file
  * — canonical RIFF framing, a 16-byte PCM `fmt ` chunk, an optional junk
  * `LIST` chunk, and a `data` chunk of 8-bit unsigned mono PCM — and the
  * decoder is a real chunk-walking parser: it validates the RIFF/WAVE
  * magic, reads the format fields it needs from `fmt `, SKIPS unknown
  * chunks (with RIFF's 2-byte alignment padding), and derives every
  * feature from the parsed header + samples alone. Nothing is shared
  * between builder and parser except the file format, so a parser that
  * assumed fixed offsets or misread a little-endian field diverges from
  * the DuckDB oracle immediately (half the corpus carries the junk chunk).
  *
  * 8-bit PCM is unsigned (0..255) per the WAV spec — kept as 0-based ints
  * here so features are exact integers (no float accumulation anywhere).
  */
object WavCodec {

  /** Parsed decode result: everything downstream features derive from. */
  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int]) {
    def nSamples: Long = samples.length.toLong
    /** Floor-divided like DuckDB's `//` on non-negative operands. */
    def durationMs: Long =
      if (sampleRate == 0) 0L else nSamples * 1000L / sampleRate
    def sumAmp: Long = { var s = 0L; var i = 0
      while (i < samples.length) { s += samples(i); i += 1 }; s }
    def peak: Long = { var m = 0L; var i = 0
      while (i < samples.length) { if (samples(i) > m) m = samples(i); i += 1 }; m }
  }

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Canonical little-endian PCM WAV container around `pcm` (8-bit mono).
    * `withJunkChunk` inserts a LIST chunk between fmt and data — real
    * encoders emit metadata chunks there, and a parser must skip them. */
  def build(pcm: Array[Byte], sampleRate: Int,
      withJunkChunk: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(pcm.length + 64)
    val junk = if (withJunkChunk)
      "LIST".getBytes("ASCII") ++ le32(12) ++
        ("INFOgraft_md".getBytes("ASCII")) // 12 payload bytes
    else Array.emptyByteArray
    val dataPad = if (pcm.length % 2 == 1) 1 else 0 // RIFF word alignment
    val riffSize = 4 + (8 + 16) + junk.length + (8 + pcm.length + dataPad)
    bos.write("RIFF".getBytes("ASCII")); bos.write(le32(riffSize))
    bos.write("WAVE".getBytes("ASCII"))
    bos.write("fmt ".getBytes("ASCII")); bos.write(le32(16))
    bos.write(le16(1))                   // audioFormat = PCM
    bos.write(le16(1))                   // channels = mono
    bos.write(le32(sampleRate))
    bos.write(le32(sampleRate * 1 * 1))  // byteRate = rate*channels*bytes
    bos.write(le16(1))                   // blockAlign
    bos.write(le16(8))                   // bitsPerSample
    bos.write(junk)
    bos.write("data".getBytes("ASCII")); bos.write(le32(pcm.length))
    bos.write(pcm)
    if (dataPad == 1) bos.write(0)
    bos.toByteArray
  }

  private def readLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def readLe16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ASCII")

  /** Chunk-walking RIFF parser. Returns None on anything malformed —
    * truncated header, wrong magic, missing fmt/data, non-PCM, a chunk
    * overrunning the buffer — never throws on hostile bytes. */
  def parse(bytes: Array[Byte]): Option[Wav] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    var data: Option[(Int, Int)] = None     // (offset, size)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, off)
      val size = readLe32(bytes, off + 4)
      val body = off + 8
      if (size < 0 || body + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = readLe16(bytes, body)
          if (audioFormat != 1) return None // PCM only
          fmt = Some((readLe32(bytes, body + 4), readLe16(bytes, body + 2),
            readLe16(bytes, body + 14)))
        case "data" => data = Some((body, size))
        case _ => // skip unknown chunk (LIST, INFO, ...)
      }
      off = body + size + (size % 2) // chunks are 2-byte aligned
    }
    for ((rate, ch, bits) <- fmt; (dOff, dSize) <- data) yield {
      // 8-bit mono is all the container emits; parse defensively anyway
      val n = if (bits == 8) dSize else dSize / math.max(1, bits / 8)
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) { samples(i) = bytes(dOff + i) & 0xff; i += 1 }
      Wav(rate, ch, bits, samples)
    }
  }
}
