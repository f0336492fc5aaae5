package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fuzz of the strict container walks' adversarial surface
  * (round-15 review sweep): the walks gate REAL decodes on a 100 TB media
  * column, so on hostile bytes the contract is TOTALITY — return (None or
  * a stub row), never throw, never loop, never read out of bounds. The
  * sweep is exhaustive where it matters and deterministic everywhere:
  * every truncation length of each valid fixture, and every single-byte
  * mutation at every offset with the adversarial value set
  * {0x00, 0x01, 0x7f, 0x80, 0xff} — which covers the length-field attacks
  * (zero-length chunks that would loop forever, lengths past the buffer,
  * sign-bit flips in size words, syncsafe violations) without any
  * randomness to flake on.
  */
class MultimodalFuzzSpec extends AnyFunSuite {

  private val MutVals = Array(0x00, 0x01, 0x7f, 0x80, 0xff).map(_.toByte)

  /** Totality sweep: f must terminate without throwing on every
    * truncation and every single-byte mutation of `base`.
    */
  private def totality(name: String, base: Array[Byte])(f: Array[Byte] => Any): Unit = {
    (0 to base.length).foreach { n =>
      val b = java.util.Arrays.copyOf(base, n)
      try f(b)
      catch { case e: Throwable => fail(s"$name threw on truncation to $n bytes: $e") }
    }
    base.indices.foreach { i =>
      MutVals.foreach { v =>
        if (base(i) != v) {
          val b = base.clone(); b(i) = v
          try f(b)
          catch { case e: Throwable => fail(s"$name threw on byte $i -> $v: $e") }
        }
      }
    }
    // null and empty are payload values a media column WILL carry
    f(null); f(Array.empty[Byte]); ()
  }

  test("mp3Walk is total under truncation and byte mutation (incl. ID3v2/ID3v1 wrapping)") {
    val plain = Multimodal.AudioCodecs.mp3Frames(Seq(1, 5, 9, 14))
    val wrapped = Multimodal.AudioCodecs.mp3Frames(Seq(2, 2), id3v2Pad = 17, id3v1 = true)
    totality("mp3Walk", plain)(Multimodal.AudioCodecs.mp3Walk(_))
    totality("mp3Walk+id3", wrapped)(Multimodal.AudioCodecs.mp3Walk(_))
  }

  test("aacWalk is total under truncation and byte mutation") {
    val adts = Multimodal.AudioCodecs.aacFrames(Seq(0, 13, 100), srIdx = 4, chCfg = 2)
    totality("aacWalk", adts)(Multimodal.AudioCodecs.aacWalk(_))
  }

  test("aviFrameSlices is total and every surviving slice stays in bounds") {
    val avi = Multimodal.VideoCodecs.syntheticMjpegAvi(3, seed = 7L)
    totality("aviFrameSlices", avi) { b =>
      Multimodal.VideoCodecs.aviFrameSlices(b).foreach(_.foreach { case (off, len) =>
        assert(off >= 0 && len >= 0 && off + len <= b.length,
          s"slice ($off, $len) escapes a ${b.length}-byte payload")
      })
    }
  }

  test("the public decode entry points are total on hostile bytes (WAV via the JRE reader included)") {
    val wav = {
      val data = Array.tabulate(256)(i => (i % 251).toByte)
      Multimodal.AudioCodecs.pcmWav(8000, 1, 8, data)
    }
    totality("audioMeta", wav)(b => Multimodal.AudioCodecs.audioMeta(1L, b))
    val avi = Multimodal.VideoCodecs.syntheticMjpegAvi(2, seed = 3L)
    totality("videoFeatures", avi)(b => Multimodal.VideoCodecs.videoFeatures(b, 16))
  }
}
