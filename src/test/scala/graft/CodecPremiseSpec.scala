package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal.AudioCodecs

/** COMMITTED failed-premise evidence for the two remaining honest stubs in
  * the multimodal layer (the kafka_source precedent: machine-verified
  * container limitation instead of an unverifiable scaladoc claim).
  *
  * Claim: compressed-audio PCM decode (MP3/AAC waveforms) and
  * compressed-video codec decode (H.264+) CANNOT be implemented in this
  * container without writing a full codec from scratch —
  *
  *  1. the JDK ships no decoder for them: `javax.sound.sampled` supports
  *     WAV/AIFF/AU PCM-family only (MP3/AAC support is an SPI plugin the
  *     JRE does not bundle), and ImageIO decodes still images only;
  *  2. the well-known pure-JVM codec libraries (JLayer, JAAD, JCodec) are
  *     not on the classpath and cannot be resolved (build.sbt pins
  *     COURSIER_MODE=offline with a pre-warmed scalatest-only cache — the
  *     round-8 kafka-clients resolution failure established that any
  *     artifact outside that cache fails not-found);
  *  3. a from-scratch MDCT/CABAC decoder is out of scope for a query
  *     engine and would dwarf the engine itself.
  *
  * Consequence (the honest-stub contract): [[AudioCodecs]] reports REAL
  * header-walk metadata for MP3/AAC (format/sample-rate/frame-count) with
  * bits = 0 and no energy, and [[graft.ext.Multimodal.VideoCodecs]] samples
  * real frames from MJPEG-in-AVI only (each frame is a JPEG the JRE CAN
  * decode); other codecs ride the deterministic stub. If any assertion
  * below ever FAILS, the premise has changed (a decoder appeared in the
  * container) and the stub should be replaced by a real decode.
  */
class CodecPremiseSpec extends AnyFunSuite {

  test("JDK AudioSystem cannot decode the VALID MP3/AAC streams the header walks parse") {
    // these exact fixtures are property-pinned as parseable by the strict
    // header walks (ExtensionsSpec) — so a rejection here is a missing
    // DECODER, not a malformed stream
    val mp3 = AudioCodecs.mp3Frames(Seq.fill(5)(9))
    val aac = AudioCodecs.aacFrames(Seq(64, 64))
    for ((name, bytes) <- Seq("mp3" -> mp3, "aac" -> aac)) {
      val e = intercept[Exception] {
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
      }
      assert(e.isInstanceOf[javax.sound.sampled.UnsupportedAudioFileException],
        s"$name: expected UnsupportedAudioFileException, got $e — a decoder " +
          "appeared; replace the header-walk stub with a real decode")
    }
    // and no third-party DECODE SPI is registered: decoder plugins
    // (JLayer's mp3spi, JAAD) register AudioFileReader /
    // FormatConversionProvider services — NOT writers, so
    // getAudioFileTypes (write support) would never see them; enumerate
    // the read-side registries themselves
    import scala.jdk.CollectionConverters._
    val readers = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.map(_.getClass.getName).toSeq
    val converters = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.FormatConversionProvider])
      .asScala.map(_.getClass.getName).toSeq
    val thirdParty = (readers ++ converters)
      .filterNot(n => n.startsWith("com.sun.media.sound.") || n.startsWith("sun."))
    assert(thirdParty.isEmpty,
      s"non-JDK audio decode SPIs appeared: $thirdParty — a decoder " +
        "plugin landed; replace the header-walk stub with a real decode")
  }

  test("no pure-JVM MP3/AAC/H.264 codec library is on the classpath") {
    val knownDecoders = Seq(
      "javazoom.jl.decoder.Decoder", // JLayer (MP3)
      "net.sourceforge.jaad.aac.Decoder", // JAAD (AAC)
      "org.jcodec.codecs.h264.H264Decoder", // JCodec (H.264)
      "org.bytedeco.ffmpeg.global.avcodec", // JavaCPP FFmpeg
      "com.sun.media.codec.audio.mp3.JavaDecoder") // JMF MP3 plugin
    val present = knownDecoders.filter { cls =>
      try { Class.forName(cls); true }
      catch { case _: Throwable => false }
    }
    assert(present.isEmpty,
      s"codec libraries appeared on the classpath: $present — the " +
        "failed-premise note no longer holds; implement the real decode")
  }

  test("ImageIO decodes still images only — no video codec readers") {
    val formats = javax.imageio.ImageIO.getReaderFormatNames.map(_.toLowerCase).toSet
    val video = formats.filter(f =>
      f.contains("264") || f.contains("avc") || f.contains("hevc") ||
        f.contains("mpeg") || f.contains("vp8") || f.contains("vp9") || f.contains("av1"))
    assert(video.isEmpty, s"ImageIO now claims video formats: $video")
  }
}
