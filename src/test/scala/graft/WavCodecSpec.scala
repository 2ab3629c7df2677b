package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WavCodec

/** Property coverage for the real RIFF/WAVE codec behind
  * q_multimodal_binary: round-trip fidelity over arbitrary PCM payloads
  * and total parser robustness over hostile bytes — a decoder that runs
  * inside executor tasks at 100 TB must never throw on a corrupt
  * payload, only return None. */
class WavCodecSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("round-trip: parse(build(pcm)) recovers rate + every sample, any junk flag") {
    val gen = for {
      pcm <- Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
      rate <- Gen.oneOf(8000, 12000, 16000, 44100)
      junk <- Gen.oneOf(true, false)
    } yield (pcm, rate, junk)
    check("round-trip", Prop.forAll(gen) { case (pcm, rate, junk) =>
      val w = WavCodec.parse(WavCodec.build(pcm, rate, junk))
      w.isDefined &&
        w.get.sampleRate == rate && w.get.channels == 1 &&
        w.get.bitsPerSample == 8 &&
        w.get.samples.toSeq == pcm.map(_ & 0xff).toSeq
    })
  }

  test("parser is total: arbitrary bytes never throw, only None or a valid Wav") {
    val gen = Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
    check("total-on-garbage", Prop.forAll(gen) { bytes =>
      WavCodec.parse(bytes) match {
        case None => true
        case Some(w) => w.samples != null && w.nSamples >= 0
      }
    })
  }

  test("parser is total on truncations and bit-flips of valid files") {
    val base = WavCodec.build("the quick brown fox".getBytes("UTF-8"), 12000, true)
    val gen = for {
      cut <- Gen.choose(0, base.length)
      flipAt <- Gen.choose(0, math.max(0, base.length - 1))
      bit <- Gen.choose(0, 7)
    } yield (cut, flipAt, bit)
    check("total-on-corruption", Prop.forAll(gen) { case (cut, flipAt, bit) =>
      val truncated = base.take(cut)
      WavCodec.parse(truncated) // must not throw
      val flipped = base.clone()
      flipped(flipAt) = (flipped(flipAt) ^ (1 << bit)).toByte
      WavCodec.parse(flipped) match {
        case None => true
        case Some(w) =>
          // a surviving parse must still be internally consistent
          w.nSamples == w.samples.length.toLong && w.samples.forall(s => s >= 0 && s <= 255)
      }
    })
  }
}
