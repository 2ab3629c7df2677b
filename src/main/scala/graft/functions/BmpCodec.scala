package graft.functions

/** A real (if small) BMP codec for the multimodal image pipeline — the
  * image sibling of [[WavCodec]].
  *
  * The container synthesizes each document's payload as a genuine
  * Windows BMP file — 14-byte BITMAPFILEHEADER, 40-byte BITMAPINFOHEADER,
  * 24-bit BGR pixel array stored BOTTOM-UP with each row padded to a
  * 4-byte boundary, and (for some docs) a junk gap between the headers
  * and the pixel array so the parser must honor the header's pixel-data
  * offset field rather than assume 54. The decoder is a real header
  * parser: it validates the `BM` magic, reads the little-endian offset /
  * width / height / bpp fields, walks padded rows in file order, and
  * re-assembles pixels in IMAGE order (row 0 = top). Nothing is shared
  * between builder and parser except the file format, so a parser that
  * forgot row padding, read the rows top-down, or ignored the offset
  * field diverges from the DuckDB oracle immediately.
  *
  * All features downstream are exact integer arithmetic on 8-bit
  * channels — no floats anywhere.
  */
object BmpCodec {

  /** Decoded image: `px(y)(x)` = (b, g, r) channel triple, row 0 = top. */
  final case class Bmp(width: Int, height: Int,
      px: Array[Array[(Int, Int, Int)]])

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def rowStride(width: Int): Int = (width * 3 + 3) / 4 * 4

  /** Canonical bottom-up 24-bit BMP around `px` (image order, row 0 =
    * top; each pixel (b, g, r)). `gapBytes` > 0 inserts junk between the
    * headers and the pixel array — real files carry ICC profiles /
    * palette remnants there, and a parser must follow the offset field. */
  def build(px: Array[Array[(Int, Int, Int)]], gapBytes: Int): Array[Byte] = {
    val h = px.length
    val w = if (h == 0) 0 else px(0).length
    val stride = rowStride(w)
    val pixOff = 14 + 40 + gapBytes
    val fileSize = pixOff + stride * h
    val bos = new java.io.ByteArrayOutputStream(fileSize)
    bos.write('B'); bos.write('M')
    bos.write(le32(fileSize))
    bos.write(le16(0)); bos.write(le16(0)) // reserved
    bos.write(le32(pixOff))
    bos.write(le32(40))                    // BITMAPINFOHEADER size
    bos.write(le32(w))
    bos.write(le32(h))                     // positive height = bottom-up
    bos.write(le16(1))                     // planes
    bos.write(le16(24))                    // bits per pixel
    bos.write(le32(0))                     // BI_RGB, uncompressed
    bos.write(le32(stride * h))            // image size
    bos.write(le32(2835)); bos.write(le32(2835)) // 72 DPI
    bos.write(le32(0)); bos.write(le32(0)) // palette
    var g = 0
    while (g < gapBytes) { bos.write(0xA5); g += 1 }
    var fy = 0
    while (fy < h) {                       // file rows run bottom-up
      val row = px(h - 1 - fy)
      var x = 0
      while (x < w) {
        val (b, gg, r) = row(x)
        bos.write(b); bos.write(gg); bos.write(r)
        x += 1
      }
      var pad = stride - w * 3
      while (pad > 0) { bos.write(0); pad -= 1 }
      fy += 1
    }
    bos.toByteArray
  }

  private def readLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def readLe16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Header-driven BMP parser. Returns None on anything malformed —
    * wrong magic, truncated headers, non-positive dims, non-24-bpp,
    * compressed data, or a pixel array overrunning the buffer — never
    * throws on hostile bytes. Handles both bottom-up (height > 0) and
    * top-down (height < 0) storage per the spec. */
  def parse(bytes: Array[Byte]): Option[Bmp] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val pixOff = readLe32(bytes, 10)
    val dibSize = readLe32(bytes, 14)
    if (dibSize < 40) return None
    val w = readLe32(bytes, 18)
    val rawH = readLe32(bytes, 22)
    // math.abs(Int.MinValue) is still negative — reject it outright.
    if (rawH == Int.MinValue) return None
    val bottomUp = rawH > 0
    val h = math.abs(rawH)
    val bpp = readLe16(bytes, 28)
    val compression = readLe32(bytes, 30)
    if (w <= 0 || h == 0 || bpp != 24 || compression != 0) return None
    // Stride math in Long: a hostile width near 2^30 overflows w*3 in Int,
    // poisoning the bounds guard below with a negative stride.
    val strideL = (w.toLong * 3 + 3) / 4 * 4
    if (pixOff < 54 || pixOff.toLong + strideL * h > bytes.length)
      return None
    val stride = strideL.toInt // safe: strideL * h fits in bytes.length
    val px = Array.ofDim[Array[(Int, Int, Int)]](h)
    var fy = 0
    while (fy < h) {
      val y = if (bottomUp) h - 1 - fy else fy
      val rowOff = pixOff + fy * stride
      val row = Array.ofDim[(Int, Int, Int)](w)
      var x = 0
      while (x < w) {
        val o = rowOff + x * 3
        row(x) = (bytes(o) & 0xff, bytes(o + 1) & 0xff, bytes(o + 2) & 0xff)
        x += 1
      }
      px(y) = row
      fy += 1
    }
    Some(Bmp(w, h, px))
  }
}
