package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BmpCodec

/** Property coverage for the real BMP codec behind q_multimodal_image:
  * round-trip fidelity over arbitrary pixel grids (including the padded
  * w=10 stride and header gaps) and total parser robustness over hostile
  * bytes — a decoder that runs inside executor tasks at 100 TB must
  * never throw on a corrupt payload, only return None. */
class BmpCodecSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, minSuccessful: Int = 200): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, s"$name: $res")
  }

  private val genChan = Gen.choose(0, 255)
  private val genGrid = for {
    w <- Gen.oneOf(1, 2, 3, 8, 10, 12) // 10 and odd widths force row padding
    h <- Gen.choose(1, 12)
    flat <- Gen.listOfN(w * h, Gen.zip(genChan, genChan, genChan))
  } yield flat.toArray.grouped(w).toArray

  test("round-trip: parse(build(px)) recovers dims + every channel, any gap") {
    val gen = for {
      px <- genGrid
      gap <- Gen.oneOf(0, 7, 16)
    } yield (px, gap)
    check("round-trip", Prop.forAll(gen) { case (px, gap) =>
      val parsed = BmpCodec.parse(BmpCodec.build(px, gap))
      parsed.isDefined && {
        val bmp = parsed.get
        bmp.height == px.length && bmp.width == px(0).length &&
          bmp.px.flatten.toSeq == px.flatten.toSeq
      }
    })
  }

  test("bottom-up storage: image row 0 is the LAST file row") {
    // two-row image with distinct rows: the file must store row 1 first
    val px = Array(Array((1, 2, 3)), Array((200, 201, 202)))
    val bytes = BmpCodec.build(px, gapBytes = 0)
    val pixOff = 54
    // first stored pixel = image row 1 (bottom), channels b,g,r
    assert((bytes(pixOff) & 0xff) == 200)
    assert((bytes(pixOff + 1) & 0xff) == 201)
    assert((bytes(pixOff + 2) & 0xff) == 202)
    val parsed = BmpCodec.parse(bytes).get
    assert(parsed.px(0)(0) == ((1, 2, 3)))
    assert(parsed.px(1)(0) == ((200, 201, 202)))
  }

  test("parser is total: arbitrary bytes never throw, only None or a valid Bmp") {
    val gen = Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
    check("total-on-garbage", Prop.forAll(gen) { bytes =>
      BmpCodec.parse(bytes) match {
        case None => true
        case Some(b) => b.width > 0 && b.height > 0 && b.px.length == b.height
      }
    })
  }

  test("parser is total on truncations and bit-flips of valid files") {
    val base = BmpCodec.build(
      Array.tabulate(5, 10)((y, x) => (x * 20, y * 40, (x + y) % 256)),
      gapBytes = 16)
    val gen = for {
      cut <- Gen.choose(0, base.length)
      flipAt <- Gen.choose(0, math.max(0, base.length - 1))
      bit <- Gen.choose(0, 7)
    } yield (cut, flipAt, bit)
    check("total-on-corruption", Prop.forAll(gen) { case (cut, flipAt, bit) =>
      BmpCodec.parse(base.take(cut)) // must not throw
      val flipped = base.clone()
      flipped(flipAt) = (flipped(flipAt) ^ (1 << bit)).toByte
      BmpCodec.parse(flipped) match {
        case None => true
        case Some(b) =>
          b.px.length == b.height && b.px.forall(_.length == b.width) &&
            b.px.flatten.forall { case (bb, g, r) =>
              bb >= 0 && bb <= 255 && g >= 0 && g <= 255 && r >= 0 && r <= 255
            }
      }
    }, minSuccessful = 2000)
  }

  test("overflow regressions: hostile width/height fields return None") {
    val base = BmpCodec.build(
      Array.tabulate(5, 10)((y, x) => (x * 20, y * 40, (x + y) % 256)),
      gapBytes = 0)
    def withLe32(at: Int, v: Int): Array[Byte] = {
      val b = base.clone()
      b(at) = (v & 0xff).toByte
      b(at + 1) = ((v >> 8) & 0xff).toByte
      b(at + 2) = ((v >> 16) & 0xff).toByte
      b(at + 3) = ((v >> 24) & 0xff).toByte
      b
    }
    // width ~2^30: w*3 overflows negative in Int — the r11 fuzz crash
    assert(BmpCodec.parse(withLe32(18, (1 << 30) + 10)).isEmpty)
    // width whose Int stride would be exactly poisoned (0x2AAAAAAB * 3 < 0)
    assert(BmpCodec.parse(withLe32(18, 0x2AAAAAAB)).isEmpty)
    // height = Int.MinValue: math.abs stays negative
    assert(BmpCodec.parse(withLe32(22, Int.MinValue)).isEmpty)
    // jointly hostile dims
    assert(BmpCodec.parse(withLe32(18, Int.MaxValue)).isEmpty)
  }
}
