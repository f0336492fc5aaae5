package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to typed metadata, and decode / feature-extract /
  * frame-sample run as typed `mapPartitions` stages (one decoder init per
  * partition, vectorized batches of rows — the Scala analog of
  * `mapInPandas`).
  *
  * IMAGE decode is REAL: [[ImageCodecs]] uses JDK ImageIO (PNG/JPEG/BMP/GIF
  * readers ship with the JRE — no external codec library needed) for
  * metadata, resize/re-encode, and the perceptual-hash pixel grid. A payload
  * no ImageIO reader accepts falls back to the deterministic [[StubCodecs]]
  * fakes, so non-image bytes still flow through the same schema instead of
  * failing the stage. AUDIO decode is REAL for WAV/PCM ([[AudioCodecs]],
  * `javax.sound.sampled`). VIDEO frame sampling is REAL for MJPEG-in-AVI
  * ([[VideoCodecs]]: RIFF chunk walk + per-frame ImageIO JPEG decode — the
  * one video format the JRE covers end-to-end). Only compressed
  * audio/video codecs (MP3/H.264/…) and the visual-embedding extractor
  * remain stubs — swap those kernels for JNI/ffmpeg/ONNX in production;
  * signatures and batch shape stay the same.
  */
object Multimodal {

  final case class MediaRow(id: Long, payload: Array[Byte])
  final case class MediaMeta(id: Long, n_bytes: Long, width: Int, height: Int,
                             channels: Int, format: String)
  final case class Frame(id: Long, frame_idx: Long, byte_offset: Long)

  /** STUB decoders: deterministic pure functions of the payload bytes.
    * Since round 8 these are the FALLBACK behind the real codec paths
    * ([[ImageCodecs]] ImageIO, [[VideoCodecs]] AVI/MJPEG — non-media
    * payloads flow through the same schema instead of failing the stage)
    * and the stand-in for the one kernel the JRE cannot supply: the
    * visual-embedding forward pass. Swap that for an ONNX/JNI encoder in
    * production; signatures and batch shape stay the same.
    */
  object StubCodecs {
    def imageMeta(id: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      MediaMeta(id, n,
        width = (n % 640).toInt + 1,
        height = ((n * 7) % 480).toInt + 1,
        channels = 3,
        format = (n % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" })
    }
    val frameStride = 256L
    def frames(id: Long, payload: Array[Byte]): Iterator[Frame] =
      (0L to payload.length / frameStride).iterator
        .map(i => Frame(id, i, i * frameStride))

    /** STUB resize/re-encode: keeps every other byte (a real kernel would
      * decode, scale to `maxDim`, re-encode — same 1→1 bytes→bytes shape).
      */
    def resize(payload: Array[Byte], maxDim: Int): Array[Byte] = {
      val out = new Array[Byte]((payload.length + 1) / 2)
      var i = 0
      while (i < out.length) { out(i) = payload(i * 2); i += 1 }
      out
    }

    /** STUB visual-embedding extractor: deterministic unit-norm vector from
      * splitmix64 mixes of (payload bytes, dim index) — stands in for a
      * vision-encoder forward pass; same bytes → array<float> shape.
      */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      var seed = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < payload.length) { seed = (seed ^ payload(i)) * 0xBF58476D1CE4E5B9L; i += 1 }
      val v = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        var z = seed + (d + 1).toLong * 0x94D049BB133111EBL
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        v(d) = ((z ^ (z >>> 31)).toDouble / Long.MaxValue).toFloat
        d += 1
      }
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
      var j = 0
      while (j < dim) { v(j) = v(j) / n; j += 1 }
      v
    }
  }

  /** REAL image codec kernels over JDK ImageIO. Every entry point is total:
    * a payload no allow-listed reader claims falls back to [[StubCodecs]]'
    * deterministic fakes, so arbitrary bytes flow through the same schema
    * instead of failing the stage. All methods are pure functions of the
    * payload bytes (no wall clock, no RNG) — decode twice, get identical
    * results, which is what lets the DuckDB oracle predict decoded values
    * for synthesized inputs.
    */
  object ImageCodecs {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    // never spill decode scratch to disk: executors shouldn't touch /tmp
    ImageIO.setUseCache(false)

    /** Formats we trust the magic-byte probe for. WBMP is deliberately
      * excluded: its header has no magic, so its reader false-positives on
      * arbitrary binary — which would nondeterministically steal rows from
      * the stub fallback path.
      */
    private val AllowedFormats = Set("png", "jpeg", "gif", "bmp")

    /** Formats whose magic is non-printable binary (PNG's \\x89PNG,
      * JPEG's \\xFF\\xD8) — real text cannot start with it, so the header
      * probe alone is trustworthy. GIF ("GIF89a") and BMP ("BM") magics are
      * printable ASCII a text payload CAN begin with, so those formats are
      * trusted only after their pixels actually decode.
      */
    private val BinaryMagicFormats = Set("png", "jpeg")

    /** Refuse to decode anything whose HEADER declares more pixels than
      * this before allocating — a text payload opening with "GIF89a" parses
      * arbitrary following bytes as unvalidated u16 dimensions, and an
      * unguarded read would then try to allocate the garbage (OOM kills the
      * task, and OutOfMemoryError is not an Exception a catch-all sees).
      */
    private val MaxPixels = 64L * 1024 * 1024

    /** One reader dispatch shared by probe and decode: stream setup, magic
      * dispatch, allowlist + declared-dimension sanity, then `f` on the
      * positioned reader. Any failure anywhere is `None` — callers fall
      * back to the deterministic stubs.
      */
    private def withReader[A](payload: Array[Byte])(
        f: (javax.imageio.ImageReader, String, Int, Int) => Option[A]): Option[A] = {
      if (payload == null) return None
      val iis =
        try ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (iis == null) None
      else try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            val fmt = r.getFormatName.toLowerCase
            if (!AllowedFormats(fmt)) None
            else {
              r.setInput(iis)
              val w = r.getWidth(0); val h = r.getHeight(0)
              if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) None
              else f(r, fmt, w, h)
            }
          } finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally iis.close()
    }

    /** (formatName, width, height, numComponents). Header-only for the
      * binary-magic formats; GIF/BMP additionally require a successful
      * pixel decode that confirms the declared dimensions (see
      * [[BinaryMagicFormats]]).
      */
    def probe(payload: Array[Byte]): Option[(String, Int, Int, Int)] =
      withReader(payload) { (r, fmt, w, h) =>
        val types = r.getImageTypes(0)
        val channels =
          if (types.hasNext) types.next().getColorModel.getNumComponents else 3
        if (BinaryMagicFormats(fmt)) Some((fmt, w, h, channels))
        else {
          val img = r.read(0)
          if (img != null && img.getWidth == w && img.getHeight == h)
            Some((fmt, w, h, channels))
          else None
        }
      }

    /** Full pixel decode in ONE reader pass (no separate probe — the
      * dispatch and header parse are not paid twice), `None` for anything
      * the allowlist or sanity checks reject.
      */
    def decode(payload: Array[Byte]): Option[BufferedImage] =
      withReader(payload) { (r, fmt, w, h) =>
        val img = r.read(0)
        if (img != null && (BinaryMagicFormats(fmt) ||
            (img.getWidth == w && img.getHeight == h))) Option(img)
        else None
      }

    def imageMeta(id: Long, payload: Array[Byte]): MediaMeta = probe(payload) match {
      case Some((fmt, w, h, ch)) => MediaMeta(id, payload.length.toLong, w, h, ch, fmt)
      // null rides the stub path as the empty payload (the SQL formulas
      // these stubs mirror treat NULL text as zero-length bytes)
      case None => StubCodecs.imageMeta(id,
        if (payload == null) Array.emptyByteArray else payload)
    }

    /** Downscale so max(width,height) == maxDim, preserving aspect ratio
      * with floor integer math (`ow = max(1, w*maxDim/max(w,h))`) — the
      * exact formula the x14 oracle mirrors in SQL. Already-small images
      * pass through byte-identical; output re-encodes as PNG (lossless, so
      * a follow-up decode sees exactly the scaled dimensions).
      */
    def resize(payload: Array[Byte], maxDim: Int): Array[Byte] = decode(payload) match {
      case Some(img) =>
        val w = img.getWidth; val h = img.getHeight; val m = math.max(w, h)
        if (m <= maxDim) payload
        else {
          val ow = math.max(1, w * maxDim / m)
          val oh = math.max(1, h * maxDim / m)
          val out = new BufferedImage(ow, oh, BufferedImage.TYPE_3BYTE_BGR)
          val g = out.createGraphics()
          try g.drawImage(img, 0, 0, ow, oh, null) finally g.dispose()
          encodePng(out)
        }
      case None =>
        StubCodecs.resize(if (payload == null) Array.emptyByteArray else payload, maxDim)
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Integer BT.601 luma — for single-band (gray) rasters this reads the
      * raw sample (r=g=b=v ⇒ (299v+587v+114v)/1000 = v exactly), which is
      * what makes the gray-PNG pHash oracle bit-exact.
      */
    private def luma(raster: java.awt.image.Raster, bands: Int, x: Int, y: Int): Int =
      if (bands == 1) raster.getSample(x, y, 0)
      else {
        val r = raster.getSample(x, y, 0)
        val g = raster.getSample(x, y, math.min(1, bands - 1))
        val b = raster.getSample(x, y, math.min(2, bands - 1))
        (299 * r + 587 * g + 114 * b) / 1000
      }

    /** `cols`×`rows` luminance grid, row-major. Matching dimensions read
      * samples 1:1 (bit-exact); anything else area-average-pools by hand —
      * deterministic floor math, no AWT resampling (whose interpolation is
      * JVM-version-dependent).
      */
    def luminanceGrid(img: BufferedImage, cols: Int, rows: Int): Array[Int] = {
      val raster = img.getRaster
      val bands = raster.getNumBands
      val w = img.getWidth; val h = img.getHeight
      if (w == cols && h == rows)
        Array.tabulate(cols * rows)(i => luma(raster, bands, i % cols, i / cols))
      else
        Array.tabulate(cols * rows) { i =>
          val c = i % cols; val r = i / cols
          val x0 = c * w / cols; val x1 = math.max(x0 + 1, (c + 1) * w / cols)
          val y0 = r * h / rows; val y1 = math.max(y0 + 1, (r + 1) * h / rows)
          var sum = 0L; var n = 0
          var y = y0
          while (y < y1 && y < h) {
            var x = x0
            while (x < x1 && x < w) { sum += luma(raster, bands, x, y); n += 1; x += 1 }
            y += 1
          }
          if (n == 0) 0 else (sum / n).toInt
        }
    }

    /** The NEAREST-to-square cols×rows grid with cols·rows == dim (rows =
      * the largest divisor of dim ≤ √dim): dim 64 → 8×8, 32 → 8×4, 8 →
      * 4×2, a prime dim degrades to a 1-row strip. Deterministic, so the
      * oracle and the descriptor always agree on the grid shape.
      */
    private[graft] def gridDims(dim: Int): (Int, Int) = {
      require(dim > 0, s"feature dim must be positive, got $dim")
      var rows = math.sqrt(dim.toDouble).toInt
      while (dim % rows != 0) rows -= 1
      (dim / rows, rows)
    }

    /** REAL visual descriptor — the tiny-image baseline (Torralba et al.,
      * PAMI 2008 used 32×32 grayscale; this is the [[gridDims]]-shaped
      * variant): decode → luminance grid via the same exact integer
      * pooling as [[luminanceGrid]] → L2-normalize. Normalization runs
      * entirely in DOUBLE (the grid ints are double-exact, the squared
      * sum ≤ dim·255² is double-exact, sqrt and divide are correctly
      * rounded) and casts to float only at the end — so an oracle
      * computing the same pixels in SQL doubles produces bit-identical
      * float32s (x63). An all-black grid has no direction: it stays the
      * zero vector, which downstream cosine ops already treat as "never
      * pairs" (the [[graft.ext.Similarity]] zero-norm convention). `None`
      * when the payload is not a decodable image — callers choose the
      * fallback.
      */
    def features(payload: Array[Byte], dim: Int): Option[Array[Float]] = {
      val (cols, rows) = gridDims(dim)
      decode(payload).map { img =>
        val grid = luminanceGrid(img, cols, rows)
        val norm = math.sqrt(grid.foldLeft(0.0)((a, v) => a + v.toDouble * v))
        if (norm == 0.0) new Array[Float](dim)
        else grid.map(v => (v / norm).toFloat)
      }
    }

    /** Deterministic RGB test image: pixel = splitmix64(seed, x, y). The
      * correctness queries synthesize these in-query so the oracle can
      * predict what a REAL decode must report.
      */
    def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          var z = seed + x.toLong * 0x9E3779B97F4A7C15L + y.toLong * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          img.setRGB(x, y, (z ^ (z >>> 31)).toInt & 0xFFFFFF)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    /** Lossless 8-bit grayscale PNG from explicit row-major pixel values —
      * the x32 oracle's bridge: it predicts these very samples back out of
      * the real decode.
      */
    def grayPng(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
      require(pixels.length == width * height, "pixels must be width*height row-major")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < pixels.length) { raster.setSample(i % width, i / width, 0, pixels(i) & 0xff); i += 1 }
      encodePng(img)
    }
  }

  /** Decode image metadata for every row — REAL ImageIO header probe with
    * stub fallback. One decoder per partition; rows stream through without
    * buffering the partition.
    */
  /** One row per audio payload: container facts + exact sample statistics.
    * `energy` = Σ centered-sample² over every channel sample (the zeroth
    * spectral moment — the standard silence/clipping screen); None on the
    * stub path, where the bytes have no audio semantics.
    */
  final case class AudioMeta(id: Long, n_bytes: Long, sample_rate: Long, channels: Long,
                             bits: Long, n_samples: Long, energy: Option[Long], format: String)

  /** REAL audio codec kernels over `javax.sound.sampled` (JRE-native WAV /
    * RIFF PCM — the same no-external-deps stance as [[ImageCodecs]]).
    * Total: payloads the decoder rejects fall back to a deterministic
    * stub row, so arbitrary bytes flow through the same schema. Pure
    * functions of the payload bytes — which is what lets the DuckDB
    * oracle predict the decoded statistics for synthesized inputs.
    * MP3 and AAC/ADTS get REAL header-walk metadata (strict frame walks —
    * exact frame/sample counts, no waveform); compressed-codec PCM
    * decode (MP3/AAC waveforms, Opus) needs external libraries — swap in
    * a JNI decoder in production; signatures and batch shape stay.
    */
  object AudioCodecs {
    import java.io.ByteArrayInputStream
    import java.nio.{ByteBuffer, ByteOrder}
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    /** Canonical 44-byte RIFF/WAVE header + raw PCM frames — 8-bit
      * unsigned or 16-bit signed little-endian (the two canonical WAV PCM
      * layouts). The test/fixture writer; decode goes through the real
      * [[AudioSystem]] reader, so round-trips exercise the JRE parser.
      */
    def pcmWav(sampleRate: Int, channels: Int, bits: Int, data: Array[Byte]): Array[Byte] = {
      require(bits == 8 || bits == 16, s"pcmWav: bits must be 8 or 16, got $bits")
      require(channels >= 1, s"pcmWav: channels must be >= 1, got $channels")
      val blockAlign = channels * bits / 8
      val out = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1.toShort)
        .putShort(channels.toShort).putInt(sampleRate).putInt(sampleRate * blockAlign)
        .putShort(blockAlign.toShort).putShort(bits.toShort)
      out.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
      out.array()
    }

    /** Real decode via the JRE reader, restricted to the PCM layouts whose
      * sample math is exact: 8-bit unsigned, 16-bit signed LE. The "RIFF"
      * magic is printable ASCII a text payload CAN begin with (the GIF/BMP
      * hazard), so the format is trusted only after the reader accepts it.
      */
    private def decodePcm(payload: Array[Byte]): Option[(AudioFormat, Array[Byte])] = {
      if (payload == null || payload.length < 44 ||
        payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' || payload(3) != 'F')
        return None
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
        try {
          val f = in.getFormat
          val ok =
            // channels in [1, 64]: a malformed header the JRE reader
            // tolerates with 0 channels would make audioMeta's blockAlign
            // 0 — a divide-by-zero — and an absurd channel count a huge
            // frame size (round-15 fuzz sweep)
            f.getChannels >= 1 && f.getChannels <= 64 &&
            ((f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED && f.getSampleSizeInBits == 8) ||
              (f.getEncoding == AudioFormat.Encoding.PCM_SIGNED && f.getSampleSizeInBits == 16 &&
                !f.isBigEndian))
          if (!ok) None
          else {
            // NOT readAllBytes: AudioInputStream.read returns 0 (not -1)
            // whenever the requested length is below one frame, and
            // InputStream.readAllBytes treats 0 as "keep going" — on a
            // fuzzed blockAlign that is an infinite 100%-CPU loop (caught
            // by the round-15 MultimodalFuzzSpec sweep). Read explicit
            // frame-multiple chunks, treat 0 as EOF, and bound the total
            // by the container length — PCM data is stored verbatim, so
            // decoded bytes exceeding the payload mean the header lies.
            val fs = math.max(1, f.getFrameSize)
            val cap = payload.length
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](math.max(fs, 8192 / fs * fs))
            var n = in.read(buf)
            while (n > 0 && out.size <= cap) { out.write(buf, 0, n); n = in.read(buf) }
            if (out.size > cap) None else Some((f, out.toByteArray))
          }
        } finally in.close()
      } catch { case _: Exception => None }
    }

    /** REAL waveform descriptor — the audio twin of
      * [[ImageCodecs.features]]: decode WAV/PCM, split the (interleaved)
      * sample stream into `bins` fixed-position bins (sample i lands in
      * bin ⌊i·bins/n⌋), accumulate each bin's ENERGY Σ s_i² over centered
      * samples, L2-normalize the bin vector. Every intermediate is
      * integer-exact until one float cast: centered samples are ints, the
      * per-bin energies are exact longs, the norm's Σ e_j² terms and
      * running sum stay integer-valued in double (exact below 2⁵³, which
      * at 16-bit full scale holds through ~2²³ samples per bin), sqrt and
      * divide are correctly rounded — so an oracle computing the same
      * samples in SQL doubles produces bit-identical float32s (x64). An
      * all-silence payload has no direction and stays the zero vector
      * (the [[graft.ext.Similarity]] never-pairs convention). `None` when
      * the payload is not decodable PCM — callers choose the fallback.
      */
    private[graft] def waveformFeatures(payload: Array[Byte], bins: Int): Option[Array[Float]] = {
      require(bins > 0, s"feature bins must be positive, got $bins")
      decodePcm(payload).map { case (f, data) =>
        val bits = f.getSampleSizeInBits
        val n = data.length / (bits / 8)
        val acc = new Array[Long](bins)
        var i = 0
        while (i < n) {
          val c =
            if (bits == 8) (data(i) & 0xff) - 128
            else ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
          acc((i.toLong * bins / n).toInt) += c.toLong * c
          i += 1
        }
        val norm = math.sqrt(acc.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble))
        if (norm == 0.0) new Array[Float](bins)
        else acc.map(v => (v.toDouble / norm).toFloat)
      }
    }

    // ------------------------------------------------- MP3 (metadata only)

    /** Layer III bitrate tables, kbps, indexed by the header's 4-bit
      * bitrate index (published MPEG-1/2 audio frame-header layout; index
      * 0 = "free format" and 15 are invalid for a length walk).
      */
    private val Mp3BitrateV1 =
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    private val Mp3BitrateV2 =
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

    /** Sample-rate tables by version bits (3 = MPEG1, 2 = MPEG2,
      * 0 = MPEG2.5), indexed by the 2-bit sample-rate index.
      */
    private def mp3Rates(version: Int): Array[Int] = version match {
      case 3 => Array(44100, 48000, 32000)
      case 2 => Array(22050, 24000, 16000)
      case _ => Array(11025, 12000, 8000) // version 0 = MPEG2.5
    }

    /** STRICT MPEG Layer III frame-header walk — metadata only, no PCM
      * decode (compressed-audio synthesis needs external codecs; this
      * parses the published header layout, the honest middle ground
      * between the real WAV decode and the stub). Accepts an optional
      * ID3v2 tag, then ≥ 1 CONSECUTIVE valid Layer III frames exactly
      * covering the remaining bytes (optionally a trailing 128-byte ID3v1
      * 'TAG' block); anything else is rejected — the [[VideoCodecs]]
      * strict-walk stance, because a permissive resync scan would "find"
      * frames inside arbitrary binary. Free-format bitrate (index 0) is
      * rejected: the frame length is then unknowable without decoding.
      * Sample rate / channel mode / version must be constant across
      * frames (VBR — per-frame BITRATE — is accepted, the normal case).
      *
      * Returns (sampleRate, channels, frames, samplesPerFrame):
      * 1152 samples per frame for MPEG1, 576 for MPEG2/2.5.
      */
    private[ext] def mp3Walk(payload: Array[Byte]): Option[(Int, Int, Long, Int)] = {
      if (payload == null || payload.length < 4) return None
      var off = 0
      // ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4); footer flag adds 10
      if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
          payload(2) == '3') {
        var sz = 0
        var i = 6
        while (i < 10) {
          if ((payload(i) & 0x80) != 0) return None // not syncsafe: corrupt
          sz = (sz << 7) | (payload(i) & 0x7f)
          i += 1
        }
        off = 10 + sz + (if ((payload(5) & 0x10) != 0) 10 else 0)
        if (off >= payload.length) return None
      }
      var end = payload.length
      if (end - off >= 128 + 4 && payload(end - 128) == 'T' &&
        payload(end - 127) == 'A' && payload(end - 126) == 'G') end -= 128
      var frames = 0L
      var sr = -1; var ch = -1; var spf = -1
      while (off < end) {
        if (off + 4 > end) return None
        val b1 = payload(off + 1) & 0xff
        val b2 = payload(off + 2) & 0xff
        val b3 = payload(off + 3) & 0xff
        if ((payload(off) & 0xff) != 0xff || (b1 & 0xe0) != 0xe0) return None
        val version = (b1 >> 3) & 3
        if (version == 1) return None // reserved
        if (((b1 >> 1) & 3) != 1) return None // not Layer III
        val bi = (b2 >> 4) & 15
        val sri = (b2 >> 2) & 3
        if (bi == 0 || bi == 15 || sri == 3) return None
        val pad = (b2 >> 1) & 1
        val rate = mp3Rates(version)(sri)
        val kbps = (if (version == 3) Mp3BitrateV1 else Mp3BitrateV2)(bi)
        val flen = (if (version == 3) 144000L * kbps / rate
                    else 72000L * kbps / rate).toInt + pad
        val chF = if (((b3 >> 6) & 3) == 3) 1 else 2
        val spfF = if (version == 3) 1152 else 576
        if (flen < 4 || off + flen > end) return None
        if (sr == -1) { sr = rate; ch = chF; spf = spfF }
        else if (sr != rate || ch != chF || spf != spfF) return None
        frames += 1
        off += flen
      }
      if (frames == 0) None else Some((sr, ch, frames, spf))
    }

    /** Synthesized Layer III stream for tests: one frame per bitrate
      * index (VBR when they differ), headers + zero fill, optionally
      * wrapped in ID3v2 padding and a trailing ID3v1 block — the
      * [[pcmWav]]/[[VideoCodecs.syntheticMjpegAvi]] fixture stance.
      */
    def mp3Frames(bitrateIdxs: Seq[Int], mpeg1: Boolean = true, srIdx: Int = 0,
                  stereo: Boolean = true, id3v2Pad: Int = -1,
                  id3v1: Boolean = false): Array[Byte] = {
      require(bitrateIdxs.nonEmpty && bitrateIdxs.forall(i => i >= 1 && i <= 14),
        s"mp3Frames: bitrate indices must be in 1..14: $bitrateIdxs")
      require(srIdx >= 0 && srIdx <= 2, s"mp3Frames: srIdx must be in 0..2: $srIdx")
      val version = if (mpeg1) 3 else 2
      val rate = mp3Rates(version)(srIdx)
      val out = new java.io.ByteArrayOutputStream()
      if (id3v2Pad >= 0) {
        out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
        out.write(Array((id3v2Pad >> 21) & 0x7f, (id3v2Pad >> 14) & 0x7f,
          (id3v2Pad >> 7) & 0x7f, id3v2Pad & 0x7f).map(_.toByte))
        out.write(new Array[Byte](id3v2Pad))
      }
      bitrateIdxs.foreach { bi =>
        val kbps = (if (mpeg1) Mp3BitrateV1 else Mp3BitrateV2)(bi)
        val flen = (if (mpeg1) 144000L * kbps / rate else 72000L * kbps / rate).toInt
        val b1 = 0xe0 | (version << 3) | (1 << 1) | 1 // Layer III, no CRC
        val b3 = if (stereo) 0 else 3 << 6
        out.write(Array(0xff, b1, (bi << 4) | (srIdx << 2), b3).map(_.toByte))
        out.write(new Array[Byte](flen - 4))
      }
      if (id3v1) {
        out.write(Array[Byte]('T', 'A', 'G'))
        out.write(new Array[Byte](125))
      }
      out.toByteArray
    }

    // ------------------------------------------------- AAC ADTS (metadata)

    /** ADTS sampling-frequency table, indexed by the header's 4-bit
      * sampling_frequency_index (published MPEG-4 audio layout; 13/14 are
      * reserved, 15 means explicit frequency — rejected, it needs the
      * escape bits a metadata walk shouldn't trust).
      */
    private val AacRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
      24000, 22050, 16000, 12000, 11025, 8000, 7350)

    /** STRICT AAC ADTS frame-header walk — the [[mp3Walk]] stance for the
      * other ubiquitous compressed-audio container: ≥ 1 CONSECUTIVE valid
      * ADTS frames exactly covering the payload, or rejection. Unlike MP3,
      * ADTS headers carry an explicit 13-bit frame length, so the walk
      * needs no bitrate table; each frame contributes
      * 1024 × (raw_data_blocks+1) samples. channel_configuration 0 (the
      * channel map lives in an in-band PCE) is rejected — unknowable
      * without decoding; 7 means 8 channels per the published mapping.
      * Sample rate / channel config must be constant across frames.
      *
      * Returns (sampleRate, channels, totalSamples).
      */
    private[ext] def aacWalk(payload: Array[Byte]): Option[(Int, Int, Long)] = {
      if (payload == null || payload.length < 7) return None
      var off = 0
      val end = payload.length
      var frames = 0L
      var samples = 0L
      var sr = -1; var ch = -1
      while (off < end) {
        if (off + 7 > end) return None
        val b1 = payload(off + 1) & 0xff
        if ((payload(off) & 0xff) != 0xff || (b1 & 0xf0) != 0xf0) return None
        if (((b1 >> 1) & 3) != 0) return None // ADTS layer must be 00
        val headerLen = if ((b1 & 1) == 1) 7 else 9 // protection_absent=0 adds CRC16
        val b2 = payload(off + 2) & 0xff
        val sri = (b2 >> 2) & 0xf
        if (sri >= 13) return None
        val b3 = payload(off + 3) & 0xff
        val chCfg = ((b2 & 1) << 2) | ((b3 >> 6) & 3)
        if (chCfg == 0) return None
        val chF = if (chCfg == 7) 8 else chCfg
        val flen = ((b3 & 3) << 11) | ((payload(off + 4) & 0xff) << 3) |
          ((payload(off + 5) & 0xff) >> 5)
        val rdb = payload(off + 6) & 3
        if (flen < headerLen || off + flen > end) return None
        if (sr == -1) { sr = AacRates(sri); ch = chF }
        else if (sr != AacRates(sri) || ch != chF) return None
        frames += 1
        samples += 1024L * (rdb + 1)
        off += flen
      }
      if (frames == 0) None else Some((sr, ch, samples))
    }

    /** Synthesized ADTS stream for tests: one 7-byte header per body
      * length, zero-filled bodies — the [[mp3Frames]] fixture stance.
      */
    def aacFrames(bodyLens: Seq[Int], srIdx: Int = 4, chCfg: Int = 2,
                  rdbm1: Int = 0): Array[Byte] = {
      require(bodyLens.nonEmpty && bodyLens.forall(l => l >= 0 && l <= 8191 - 7),
        s"aacFrames: body lengths must fit the 13-bit frame length: $bodyLens")
      require(srIdx >= 0 && srIdx <= 12, s"aacFrames: srIdx must be in 0..12: $srIdx")
      require(chCfg >= 1 && chCfg <= 7, s"aacFrames: chCfg must be in 1..7: $chCfg")
      require(rdbm1 >= 0 && rdbm1 <= 3, s"aacFrames: rdbm1 must be in 0..3: $rdbm1")
      val out = new java.io.ByteArrayOutputStream()
      bodyLens.foreach { bl =>
        val flen = 7 + bl
        // MPEG-4, layer 00, protection absent; profile AAC-LC; VBR
        // buffer-fullness (all ones)
        out.write(Array(
          0xff, 0xf1, (1 << 6) | (srIdx << 2) | ((chCfg >> 2) & 1),
          ((chCfg & 3) << 6) | ((flen >> 11) & 3), (flen >> 3) & 0xff,
          ((flen & 7) << 5) | 0x1f, (0x3f << 2) | rdbm1).map(_.toByte))
        out.write(new Array[Byte](bl))
      }
      out.toByteArray
    }

    /** Decode + exact statistics; MP3/AAC payloads report header-walk
      * metadata (format "mp3"/"aac", bits 0 — compressed, no PCM width —
      * and no energy: computing it needs a real decoder); stub fallback
      * (zeros + byte length, no energy) for payloads every parser rejects.
      * The walks are mutually exclusive by construction: mp3Walk requires
      * layer bits 01 (Layer III) where ADTS requires 00.
      */
    def audioMeta(id: Long, payload: Array[Byte]): AudioMeta = decodePcm(payload) match {
      case Some((f, data)) =>
        val bits = f.getSampleSizeInBits
        var energy = 0L
        if (bits == 8) {
          var i = 0
          while (i < data.length) {
            val c = (data(i) & 0xff) - 128
            energy += c.toLong * c
            i += 1
          }
        } else {
          var i = 0
          while (i + 1 < data.length) {
            val s = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toLong
            energy += s * s
            i += 2
          }
        }
        val blockAlign = f.getChannels * bits / 8
        AudioMeta(id, payload.length.toLong, f.getSampleRate.toLong, f.getChannels.toLong,
          bits.toLong, data.length.toLong / blockAlign, Some(energy), "wav")
      case None => mp3Walk(payload) match {
        case Some((rate, ch, frames, spf)) =>
          AudioMeta(id, payload.length.toLong, rate.toLong, ch.toLong,
            0L, frames * spf, None, "mp3")
        case None => aacWalk(payload) match {
          case Some((rate, ch, samples)) =>
            AudioMeta(id, payload.length.toLong, rate.toLong, ch.toLong,
              0L, samples, None, "aac")
          case None =>
            val n = if (payload == null) 0L else payload.length.toLong
            AudioMeta(id, n, 0L, 0L, 0L, n, None, "stub")
        }
      }
    }
  }

  /** Audio metadata + exact sample statistics per payload (1→1, narrow) —
    * REAL JRE WAV/PCM decode, stub fallback for non-audio bytes.
    */
  def decodeAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] =
    media.mapPartitions { it =>
      it.map(r => AudioCodecs.audioMeta(r.id, r.payload))
    }(Encoders.product[AudioMeta])

  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] =
    media.mapPartitions { it =>
      // per-partition decoder init would go here (JNI context, thread pools)
      it.map(r => ImageCodecs.imageMeta(r.id, r.payload))
    }(Encoders.product[MediaMeta])

  /** REAL video container kernels for MJPEG-in-AVI — the one video format a
    * JVM can handle end-to-end with no external codec: the container is a
    * plain RIFF chunk walk (this object) and every frame payload is a JPEG
    * the JRE's ImageIO already decodes ([[ImageCodecs]]). The same
    * no-external-deps stance as [[AudioCodecs]]' WAV/PCM path; compressed
    * codecs (H.264/VP9/AV1) need external libraries — swap in JNI/ffmpeg in
    * production, signatures and batch shape stay.
    *
    * Layout (public RIFF/AVI spec): `RIFF('AVI ' LIST('hdrl' avih
    * LIST('strl' strh strf)) LIST('movi' 00dc…))` — frame k is the data of
    * the k-th `##dc`/`##db` chunk inside `movi`.
    *
    * "RIFF" is printable ASCII a text payload CAN begin with (the
    * [[AudioCodecs]] hazard), so AVI status is trusted only after a FULL
    * strict walk: every chunk must lie inside its parent and a `movi` list
    * must exist, else the payload is not an AVI and the caller falls back
    * to the stub — arbitrary bytes can't nondeterministically steal rows
    * from the stub path.
    */
  object VideoCodecs {
    import java.nio.{ByteBuffer, ByteOrder}

    private def fourcc(p: Array[Byte], o: Int): String =
      new String(p, o, 4, "US-ASCII")
    private def u32(p: Array[Byte], o: Int): Long =
      (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)

    /** Strict parse: Some(frames at their real byte offsets) iff the whole
      * payload walks as a RIFF/AVI with a movi list; None = not an AVI.
      */
    def aviFrames(id: Long, payload: Array[Byte]): Option[Seq[Frame]] =
      aviFrameSlices(payload).map(_.zipWithIndex.map {
        case ((off, _), idx) => Frame(id, idx.toLong, off)
      })

    /** The walk behind [[aviFrames]], with chunk SIZES: Some((data offset,
      * data size) per frame chunk, in container order) iff the whole
      * payload walks as a RIFF/AVI with a movi list. The sizes let
      * [[videoFeatures]] decode each frame from exactly its own bytes
      * instead of an offset-to-end tail slice.
      */
    private[ext] def aviFrameSlices(payload: Array[Byte]): Option[Seq[(Long, Long)]] = {
      if (payload == null || payload.length < 12 ||
        fourcc(payload, 0) != "RIFF" || fourcc(payload, 8) != "AVI ")
        return None
      val riffEnd = 8L + u32(payload, 4)
      if (riffEnd > payload.length) return None
      val out = Seq.newBuilder[(Long, Long)]
      var foundMovi = false
      var off = 12L
      while (off + 8 <= riffEnd) {
        val cc = fourcc(payload, off.toInt)
        val sz = u32(payload, off.toInt + 4)
        if (off + 8 + sz > riffEnd) return None // overrun: not an AVI
        if (cc == "LIST" && sz >= 4 && fourcc(payload, off.toInt + 8) == "movi") {
          foundMovi = true
          val end = off + 8 + sz
          var o = off + 12
          while (o + 8 <= end) {
            val c2 = fourcc(payload, o.toInt)
            val s2 = u32(payload, o.toInt + 4)
            if (o + 8 + s2 > end) return None
            if (c2(0).isDigit && c2(1).isDigit &&
              (c2.endsWith("dc") || c2.endsWith("db"))) {
              out += ((o + 8, s2))
            } else if (c2 == "LIST" && s2 >= 4 &&
              fourcc(payload, o.toInt + 8) == "rec ") {
              // interleaved (CD-ROM-style) AVIs group each frame's chunks
              // one level deeper in LIST('rec ' …) — walk into it with the
              // same containment checks, or real frames silently vanish
              val rend = o + 8 + s2
              var r = o + 12
              while (r + 8 <= rend) {
                val c3 = fourcc(payload, r.toInt)
                val s3 = u32(payload, r.toInt + 4)
                if (r + 8 + s3 > rend) return None
                if (c3(0).isDigit && c3(1).isDigit &&
                  (c3.endsWith("dc") || c3.endsWith("db"))) {
                  out += ((r + 8, s3))
                }
                r += 8 + s3 + (s3 & 1)
              }
            }
            o += 8 + s2 + (s2 & 1) // chunks pad to even
          }
        }
        off += 8 + sz + (sz & 1)
      }
      if (foundMovi) Some(out.result()) else None
    }

    /** REAL pooled video descriptor (the x63/x64 stance, video twin):
      * strict AVI walk → per-frame REAL ImageIO decode → each frame's
      * [[ImageCodecs.luminanceGrid]] (near-square `dim`-cell grid, exact
      * integer pooling) → MEAN-pool across frames → L2-normalize. The
      * 1/frameCount of the mean cancels in the normalization, so the
      * descriptor is the exact INTEGER per-cell sum grid normalized
      * directly: sums are exact longs (≤ 255·frames per cell,
      * double-exact far past any real frame count), sqrt and divide are
      * correctly rounded doubles, one float cast at the end — an oracle
      * computing the same pixel sums in SQL doubles produces
      * bit-identical float32s (x65). `Some` only when the container
      * walks, has ≥ 1 frame, and EVERY frame decodes as an image — a
      * half-decodable container is not silently half-pooled; it rides
      * the caller's fallback like any other undecodable payload. An
      * all-black video stays the zero vector (the [[ImageCodecs
      * .features]] convention).
      */
    def videoFeatures(payload: Array[Byte], dim: Int): Option[Array[Float]] = {
      val (cols, rows) = ImageCodecs.gridDims(dim)
      aviFrameSlices(payload).flatMap { slices =>
        if (slices.isEmpty) None
        else {
          val sums = new Array[Long](dim)
          val allDecoded = slices.forall { case (off, len) =>
            ImageCodecs.decode(java.util.Arrays.copyOfRange(
              payload, off.toInt, (off + len).toInt)) match {
              case Some(img) =>
                val g = ImageCodecs.luminanceGrid(img, cols, rows)
                var i = 0
                while (i < dim) { sums(i) += g(i); i += 1 }
                true
              case None => false
            }
          }
          if (!allDecoded) None
          else {
            val norm = math.sqrt(sums.foldLeft(0.0)((a, v) => a + v.toDouble * v))
            if (norm == 0.0) Some(new Array[Float](dim))
            else Some(sums.map(v => (v / norm).toFloat))
          }
        }
      }
    }

    /** Assemble an MJPEG AVI from already-encoded JPEG frames — the
      * test/fixture writer (the [[AudioCodecs.pcmWav]] role); parsing goes
      * through [[aviFrames]] and per-frame decode through the real ImageIO
      * reader, so round-trips exercise the production read path.
      */
    def mjpegAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
                 fps: Int = 25): Array[Byte] = {
      require(fps > 0, s"mjpegAvi: fps must be positive, got $fps")
      def pad(n: Int): Int = n + (n & 1)
      val strf = 40
      val strh = 56
      val strl = 12 + (8 + strh) + (8 + strf)
      val avih = 56
      val hdrl = 12 + (8 + avih) + strl
      val moviData = frames.map(f => 8 + pad(f.length)).sum
      val movi = 12 + moviData
      val riffSize = 4 + hdrl + movi
      val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
      def cc(s: String): Unit = { buf.put(s.getBytes("US-ASCII")); () }
      cc("RIFF"); buf.putInt(riffSize); cc("AVI ")
      cc("LIST"); buf.putInt(hdrl - 8); cc("hdrl")
      cc("avih"); buf.putInt(avih)
      buf.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
        .putInt(frames.length).putInt(0).putInt(1)
        .putInt(frames.map(_.length).foldLeft(0)(math.max))
        .putInt(width).putInt(height)
        .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
      cc("LIST"); buf.putInt(strl - 8); cc("strl")
      cc("strh"); buf.putInt(strh)
      cc("vids"); cc("MJPG")
      buf.putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(fps) // dwScale / dwRate
        .putInt(0).putInt(frames.length)
        .putInt(frames.map(_.length).foldLeft(0)(math.max))
        .putInt(-1).putInt(0) // dwQuality, dwSampleSize
        .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
      cc("strf"); buf.putInt(strf)
      buf.putInt(strf).putInt(width).putInt(height).putShort(1).putShort(24)
      cc("MJPG")
      buf.putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
      cc("LIST"); buf.putInt(movi - 8); cc("movi")
      frames.foreach { f =>
        cc("00dc"); buf.putInt(f.length).put(f)
        if ((f.length & 1) == 1) buf.put(0.toByte)
      }
      buf.array()
    }

    /** Byte offset of frame 0's data in a [[mjpegAvi]] container — header
      * arithmetic (12 RIFF + 200 hdrl + 12 movi-list header + 8 chunk
      * header), pinned by the round-trip spec so an external oracle can
      * predict every offset: frame k's data sits at
      * `FirstFrameDataOffset + k * (8 + paddedFrameSize)`.
      */
    val FirstFrameDataOffset: Long = 232L

    /** Deterministic MJPEG fixture for oracle-checked queries: `n`
      * solid-color 16×8 JPEG frames (color mixed from (seed, frame)), each
      * zero-padded to exactly `frameSlot` bytes so every frame offset is
      * pure arithmetic (`232 + k * (8 + frameSlot)`) an external SQL
      * oracle can predict — while each padded slice still ImageIO-decodes
      * (JPEG readers stop at EOI; trailing bytes are ignored).
      */
    def syntheticMjpegAvi(n: Int, seed: Long, frameSlot: Int = 2048): Array[Byte] = {
      require(n > 0, s"syntheticMjpegAvi: n must be positive, got $n")
      require(frameSlot % 2 == 0, s"syntheticMjpegAvi: frameSlot must be even")
      val frames = (0 until n).map { j =>
        var z = (seed + j.toLong) * 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        val img = new java.awt.image.BufferedImage(16, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color((z & 0xffffff).toInt))
        g.fillRect(0, 0, 16, 8)
        g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpeg", out)
        val enc = out.toByteArray
        require(enc.length <= frameSlot,
          s"syntheticMjpegAvi: encoded frame ${enc.length} B exceeds slot $frameSlot")
        java.util.Arrays.copyOf(enc, frameSlot)
      }
      mjpegAvi(frames, width = 16, height = 8, fps = 10)
    }
  }

  /** Sample frames from a video payload, 1→N — REAL RIFF/AVI chunk walk
    * ([[VideoCodecs]]: frame offsets of the MJPEG `##dc` chunks, each a
    * JPEG the JRE decodes), stub fallback for non-AVI bytes.
    */
  def sampleFrames(media: Dataset[MediaRow]): Dataset[Frame] =
    media.mapPartitions(_.flatMap(r =>
      VideoCodecs.aviFrames(r.id, r.payload).map(_.iterator)
        // null rides the stub path as the empty payload — the imageMeta/
        // resize convention; without it a NULL payload NPEs the stage
        .getOrElse(StubCodecs.frames(r.id,
          if (r.payload == null) Array.emptyByteArray else r.payload))))(
      Encoders.product[Frame])

  /** Resize/re-encode every payload (1→1 binary→binary, narrow) — REAL
    * ImageIO decode→scale→PNG re-encode, stub fallback for non-images.
    */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int = 224): Dataset[MediaRow] =
    media.mapPartitions(_.map(r => MediaRow(r.id, ImageCodecs.resize(r.payload, maxDim))))(
      Encoders.product[MediaRow])

  final case class MediaEmbedding(id: Long, embedding: Array[Float])

  /** Media-embedding extraction: binary payload → `array<float>` column,
    * ready for [[Similarity]]'s ANN operators — the multimodal→embedding→
    * near-dup pipeline in one narrow stage. Image payloads get the REAL
    * [[ImageCodecs.features]] descriptor (a near-square luminance grid of
    * `dim` cells over the actual ImageIO decode, L2-normalized —
    * oracle-checked by x63); WAV/PCM payloads the image decoder rejects
    * get the REAL [[AudioCodecs.waveformFeatures]] energy envelope (`dim`
    * fixed-position bins over the actual AudioSystem decode, L2-normalized
    * — oracle-checked by x64); AVI payloads both reject get the REAL
    * [[VideoCodecs.videoFeatures]] pooled descriptor (per-frame luminance
    * grids over the actual strict-walk + ImageIO decodes, mean-pooled,
    * L2-normalized — oracle-checked by x65); anything every decoder
    * rejects rides the deterministic [[StubCodecs.features]] fallback,
    * the imageMeta/resize convention, so arbitrary bytes flow through the
    * same schema. The three real paths cannot steal each other's rows:
    * ImageIO only claims magic-byte-verified still images, decodePcm only
    * RIFF/WAVE PCM, the AVI walk only RIFF/AVI containers. `dim` is
    * validated at plan time, before any task launches.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaEmbedding] = {
    ImageCodecs.gridDims(dim)
    media.mapPartitions(_.map { r =>
      val payload = if (r.payload == null) Array.emptyByteArray else r.payload
      MediaEmbedding(r.id, ImageCodecs.features(payload, dim)
        .orElse(AudioCodecs.waveformFeatures(payload, dim))
        .orElse(VideoCodecs.videoFeatures(payload, dim))
        .getOrElse(StubCodecs.features(payload, dim)))
    })(Encoders.product[MediaEmbedding])
  }

  /** Test harness: lift any (id, string) pair into a binary media column so
    * the plumbing is exercisable on the driver-provided `documents` table.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    val enc = Encoders.product[MediaRow]
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).cast("binary").as("payload")).as(enc)
  }

  /** 60-bit perceptual difference-hash (dHash): REAL ImageIO decode to an
    * 11×6 grayscale luminance grid, one bit per adjacent-pixel comparison;
    * near-identical images then differ in few bits, found via
    * [[graft.ext.Dedup.simHashPairs]]' pigeonhole bands — NEVER an
    * all-pairs compare. Because the hash survives lossless re-encoding
    * (PNG↔BMP of the same pixels decodes to the same grid), byte-level
    * dedup misses those duplicates but pHash catches them.
    *
    * A payload ImageIO rejects falls back to a deterministic text
    * fingerprint on the SAME grid: pixel (r,c) = first md5 byte of the
    * 8-char stride-7 window at code-point offset (r*11+c)*7 of the UTF-8
    * text (matching windows ⇒ matching pixels, so payloads sharing most
    * content share most bits; windows past the end hash "" and contribute
    * constant pixels). Both paths are reproduced by the DuckDB oracle
    * (x32): the image path via synthesized gray PNGs whose samples the
    * oracle predicts, the text path via md5/substr transcription.
    *
    * Known hazard (shared with any dHash): LOW-TEXTURE inputs — flat or
    * near-empty images, texts shorter than the ~460-char sampled range —
    * collapse toward few distinct hashes and pair densely, making their
    * bands hot join keys. Filter degenerate payloads upstream
    * (length/quality gates) before pairing a 100 TB corpus, the same
    * stance as [[graft.ext.Dedup.jaccardPairs]]' df cap.
    *
    * Output (id, simhash) feeds [[graft.ext.Dedup.simHashPairs]] directly.
    */
  def pHash(media: DataFrame, idCol: String = "id",
            payloadCol: String = "payload"): DataFrame = {
    val hashUdf = udf((payload: Array[Byte]) => pHash60(payload))
    media.select(col(idCol).as("id"), hashUdf(col(payloadCol).cast("binary")).as("simhash"))
  }

  private[ext] val PHashCols = 11
  private[ext] val PHashRows = 6

  /** The pHash kernel: decode→11×6 luminance grid (stub text fingerprint on
    * decode failure), then dHash bit (r*10+c) = grid(r,c) < grid(r,c+1).
    */
  def pHash60(payload: Array[Byte]): Long = {
    val px = ImageCodecs.decode(payload) match {
      case Some(img) => ImageCodecs.luminanceGrid(img, PHashCols, PHashRows)
      // null hashes like the SQL formula hashed NULL text: an empty grid of
      // identical pixels, i.e. simhash 0 — never an NPE out of a UDF
      case None =>
        stubTextPixels(if (payload == null) Array.emptyByteArray else payload)
    }
    var bits = 0L
    var r = 0
    while (r < PHashRows) {
      var c = 0
      while (c < PHashCols - 1) {
        if (px(r * PHashCols + c) < px(r * PHashCols + c + 1))
          bits |= 1L << (r * (PHashCols - 1) + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Text-fingerprint fallback grid: pixel idx = first md5 byte of the
    * 8-char window at CODE-POINT offset idx*7 — code points, not UTF-16
    * units or bytes, because that is what SQL `substr` counts in both
    * Spark and DuckDB (the oracle transcribes this formula verbatim).
    */
  private[ext] def stubTextPixels(payload: Array[Byte]): Array[Int] = {
    val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    val nCp = text.codePointCount(0, text.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(PHashCols * PHashRows) { idx =>
      val s = math.min(idx * 7, nCp)
      val e = math.min(idx * 7 + 8, nCp)
      val window = text.substring(text.offsetByCodePoints(0, s), text.offsetByCodePoints(0, e))
      md.reset()
      md.digest(window.getBytes(java.nio.charset.StandardCharsets.UTF_8))(0) & 0xff
    }
  }

  /** Near-duplicate image pairs: Hamming distance <= maxHamming over
    * [[pHash]] signatures via the SimHash pigeonhole band join (equi-join
    * on signature bands — candidates scale with collisions, not pairs).
    */
  def pHashPairs(media: DataFrame, idCol: String = "id",
                 payloadCol: String = "payload", maxHamming: Int = 3): DataFrame =
    Dedup.simHashPairs(pHash(media, idCol, payloadCol), maxHamming)
}
