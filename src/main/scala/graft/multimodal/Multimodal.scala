package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Multimodal column handling for training-data pipelines (brief): media
  * travels as opaque `binary` payload columns plus a typed metadata struct;
  * decode/feature-extract/resize/frame-sample run distributed over
  * partitions of byte payloads.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration — is
  * real and tested. IMAGE decoding is REAL: [[PngDecoder]]/[[encodePng]]
  * round-trip PNG payloads through `javax.imageio` (in the JDK — no
  * external codecs needed), and [[resizeNearest]] is a real
  * nearest-neighbor resampler over decoded pixels. AUDIO decoding is REAL:
  * [[WavDecoder]]/[[encodeWav]] round-trip 16-bit PCM WAV through
  * `javax.sound.sampled` (also in the JDK). VIDEO is REAL for the two
  * containers the JDK can decode end-to-end:
  * [[MjpegDecoder]]/[[encodeMjpeg]] handle Motion-JPEG (concatenated JPEG
  * frames — the classic IP-camera / AVI-MJPC stream layout) and
  * [[ApngDecoder]]/[[encodeApng]] handle ANIMATED PNG (acTL/fcTL/fdAT
  * chunked frames — losslessly, where JPEG tolerates DC quantization),
  * both with evenly-spaced frame SAMPLING at decode. Compressed
  * containers (mp4/H.264) genuinely need codecs absent from the JDK —
  * those still enter through the same [[Decoder]] boundary via an
  * external binding. [[DecodeStub]] remains as the format-agnostic
  * byte-split stand-in for pipelines that want plumbing without a codec.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  case class MediaMeta(kind: String, width: Int, height: Int, sampleRateHz: Int)

  case class MediaRow(id: Long, payload: Array[Byte], kind: String, width: Int, height: Int, sampleRateHz: Int)

  case class MediaFeatures(id: Long, kind: String, nBytes: Long, nFrames: Int, histogram: Array[Long])

  /** Decode boundary: bytes in, "frames" of bytes out. */
  trait Decoder extends Serializable {
    def decodeFrames(payload: Array[Byte], maxFrames: Int): Array[Array[Byte]]

    /** (width, height) of the payload's frames, (-1, -1) if unknowable —
      * the codec-generic dims hook consumers like
      * [[graft.dedup.VideoDedup]] use (a PNG/ImageIO header parse is
      * only right for formats whose first bytes ARE an image header, so
      * codecs with framing junk override).
      */
    def dims(payload: Array[Byte]): (Int, Int) = PngDecoder.dims(payload)
  }

  /** STUB decoder: deterministic frame split of the raw payload — the
    * format-agnostic stand-in for pipelines exercising batch plumbing
    * without a codec (real codecs: [[PngDecoder]], [[WavDecoder]],
    * [[MjpegDecoder]]; compressed video containers need external bindings).
    */
  object DecodeStub extends Decoder {
    def decodeFrames(payload: Array[Byte], maxFrames: Int): Array[Array[Byte]] = {
      if (payload.isEmpty) return Array.empty
      val frameSize = math.max(1, payload.length / math.max(1, maxFrames))
      payload.grouped(frameSize).take(maxFrames).map(identity).toArray
    }
  }

  /** Encode packed row-major RGB bytes (3 bytes/pixel) as a PNG payload —
    * the real, lossless image codec in the JDK (`javax.imageio`). Runs in
    * executor tasks (headless-safe: no AWT toolkit involved).
    */
  private def rgbToImage(rgb: Array[Byte], width: Int, height: Int): java.awt.image.BufferedImage = {
    require(rgb.length == width * height * 3, s"need ${width * height * 3} bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < width * height) {
      val i = p * 3
      img.setRGB(p % width, p / width,
        ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
      p += 1
    }
    img
  }

  def encodePng(rgb: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgbToImage(rgb, width, height), "png", bos)
    bos.toByteArray
  }

  /** Encode packed-RGB frames as Motion-JPEG: each frame one complete JPEG
    * payload (`javax.imageio`), concatenated back to back — the classic
    * MJPEG stream layout. Runs in executor tasks like [[encodePng]].
    */
  def encodeMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    frames.foreach(rgb => javax.imageio.ImageIO.write(rgbToImage(rgb, width, height), "jpg", bos))
    bos.toByteArray
  }

  /** REAL video decoder for Motion-JPEG payloads: scans SOI (FFD8) → EOI
    * (FFD9) JPEG segment boundaries (inside entropy-coded data every 0xFF
    * is stuffed as FF00 or a RST marker, so FFD9 is a true end-of-image in
    * baseline JPEG — streams with embedded EXIF thumbnails would need the
    * full marker walk), SAMPLES up to `maxFrames` segments evenly across
    * the stream (the standard video frame-sampling shape: k frames
    * spanning the whole clip, not the first k), and decodes each sampled
    * segment through the same `javax.imageio` path as [[PngDecoder]].
    * Skip-not-throw like the other decoders: corrupt payloads or segments
    * yield fewer (or zero) frames.
    */
  object MjpegDecoder extends Decoder {

    /** [start, end) byte ranges of complete SOI..EOI segments; junk
      * between frames is skipped, a truncated trailing frame is dropped.
      */
    def segments(payload: Array[Byte]): Array[(Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var i = 0
      while (i + 1 < payload.length) {
        if ((payload(i) & 0xff) == 0xff && (payload(i + 1) & 0xff) == 0xd8) {
          var j = i + 2
          var end = -1
          while (j + 1 < payload.length && end < 0) {
            if ((payload(j) & 0xff) == 0xff && (payload(j + 1) & 0xff) == 0xd9) end = j + 2
            j += 1
          }
          if (end < 0) i = payload.length // truncated trailing frame
          else { out += ((i, end)); i = end }
        } else i += 1
      }
      out.toArray
    }

    /** Indices of `k` segments spread evenly over `n` (all of them when
      * n <= k): floor(i·n/k) — deterministic, first frame always included.
      */
    def sampleIndices(n: Int, k: Int): Array[Int] =
      if (n <= k) Array.range(0, n)
      else Array.tabulate(k)(i => (i.toLong * n / k).toInt)

    /** Dims from the FIRST complete JPEG segment (header-only read), so
      * leading junk before the first SOI — which [[segments]] tolerates —
      * doesn't blind the generic ImageIO parse at byte 0.
      */
    override def dims(payload: Array[Byte]): (Int, Int) =
      segments(payload).headOption.map { case (s, e) =>
        PngDecoder.dims(java.util.Arrays.copyOfRange(payload, s, e))
      }.getOrElse((-1, -1))

    def decodeFrames(payload: Array[Byte], maxFrames: Int): Array[Array[Byte]] =
      if (maxFrames < 1) Array.empty
      else {
        val segs = segments(payload)
        sampleIndices(segs.length, maxFrames).flatMap { si =>
          val (s, e) = segs(si)
          PngDecoder.decodeRgb(java.util.Arrays.copyOfRange(payload, s, e)).map(_._1)
        }
      }
  }

  /** REAL image decoder: PNG/JPEG/BMP payload → one frame of packed
    * row-major RGB bytes via `javax.imageio`. Undecodable payloads yield
    * zero frames (the contract a quality-filter pipeline wants: skip, not
    * throw, on corrupt media).
    */
  object PngDecoder extends Decoder {

    /** One ImageIO pass: (packed RGB bytes, width, height), or None for an
      * undecodable payload. NonFatal, not just IOException: ImageIO
      * readers throw RuntimeExceptions (IndexOutOfBounds,
      * NegativeArraySize, ...) on malformed headers, and the contract is
      * skip-not-throw.
      */
    def decodeRgb(payload: Array[Byte]): Option[(Array[Byte], Int, Int)] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      // dimensions whose packed-RGB buffer exceeds a JVM array are
      // skipped too — new Array[Byte](w*h*3) would otherwise throw
      // NegativeArraySizeException on Int overflow, outside any catch
      if (img == null || img.getWidth.toLong * img.getHeight * 3 > Int.MaxValue - 8) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Byte](w * h * 3)
        var p = 0
        while (p < w * h) {
          val px = img.getRGB(p % w, p / w)
          out(p * 3) = ((px >> 16) & 0xff).toByte
          out(p * 3 + 1) = ((px >> 8) & 0xff).toByte
          out(p * 3 + 2) = (px & 0xff).toByte
          p += 1
        }
        Some((out, w, h))
      }
    }

    def decodeFrames(payload: Array[Byte], maxFrames: Int): Array[Array[Byte]] =
      if (maxFrames < 1) Array.empty
      else decodeRgb(payload).map(_._1).toArray

    /** (width, height) of a decodable payload, (-1, -1) otherwise. TRUE
      * header-only read: `ImageIO.getImageReaders` + `reader.getWidth(0)`
      * parse just the format header — no raster decode, no pixel
      * extraction, no packed-RGB allocation. On a metadata-scan pass over
      * a media corpus this is the difference between reading bytes and
      * decoding terabytes.
      */
    override def dims(payload: Array[Byte]): (Int, Int) =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        if (iis == null) (-1, -1)
        else try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) (-1, -1)
          else {
            val r = readers.next()
            try { r.setInput(iis, true); (r.getWidth(0), r.getHeight(0)) }
            finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => (-1, -1) }
  }

  // ------------------------------------------------------------------ APNG

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** (type, data) PNG chunks of a payload in order; malformed framing
    * (bad length, truncation) ends the walk — callers treat the payload
    * as undecodable past that point (skip-not-throw).
    */
  private def pngChunks(payload: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    if (payload.length < 8 || !java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(payload, 0, 8), PngSig)) return out.toSeq
    var i = 8
    var ok = true
    while (ok && i + 8 <= payload.length) {
      val len = ((payload(i) & 0xff) << 24) | ((payload(i + 1) & 0xff) << 16) |
        ((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff)
      if (len < 0 || i + 12 + len.toLong > payload.length) ok = false
      else {
        val tpe = new String(payload, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        out += ((tpe, java.util.Arrays.copyOfRange(payload, i + 8, i + 8 + len)))
        i += 12 + len
      }
    }
    out.toSeq
  }

  private def writeChunk(bos: java.io.ByteArrayOutputStream, tpe: String, data: Array[Byte]): Unit = {
    def be(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val tb = tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    bos.write(be(data.length))
    bos.write(tb)
    bos.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    bos.write(be(crc.getValue.toInt))
  }

  /** Encode packed-RGB frames as ANIMATED PNG (APNG, the PNG third
    * edition's animation chunks): each frame compresses through the JDK's
    * own PNG encoder, its IDAT payloads splice in as frame 0's IDAT /
    * later frames' fdAT, with acTL/fcTL control chunks framing the
    * sequence. All frames are full-frame (x=y=0, blend=SOURCE), which is
    * also the only composition [[ApngDecoder]] serves. LOSSLESS — unlike
    * MJPEG, sampled frames round-trip byte-exact.
    */
  def encodeApng(frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
    require(frames.nonEmpty, "APNG needs at least one frame")
    val encoded = frames.map(rgb => pngChunks(encodePng(rgb, width, height)))
    val ihdr = encoded.head.collectFirst { case ("IHDR", d) => d }.get
    require(encoded.forall(_.collectFirst { case ("IHDR", d) => d }.exists(
      java.util.Arrays.equals(_, ihdr))), "frames encoded with differing IHDRs")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(PngSig)
    writeChunk(bos, "IHDR", ihdr)
    def be(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    writeChunk(bos, "acTL", be(frames.length) ++ be(0) /* loop forever */)
    var seq = 0
    encoded.zipWithIndex.foreach { case (chunks, fi) =>
      // fcTL: seq, w, h, x, y, delay 1/10 s, dispose=0 (NONE), blend=0 (SOURCE)
      writeChunk(bos, "fcTL",
        be(seq) ++ be(width) ++ be(height) ++ be(0) ++ be(0) ++
          Array[Byte](0, 1, 0, 10, 0, 0))
      seq += 1
      chunks.collect { case ("IDAT", d) => d }.foreach { d =>
        if (fi == 0) writeChunk(bos, "IDAT", d)
        else { writeChunk(bos, "fdAT", be(seq) ++ d); seq += 1 }
      }
    }
    writeChunk(bos, "IEND", Array.empty)
    bos.toByteArray
  }

  /** REAL decoder for ANIMATED PNG: walks the chunk stream, validates the
    * acTL/fcTL/fdAT animation framing, SAMPLES up to `maxFrames` frames
    * evenly across the sequence, and reconstructs each sampled frame as a
    * standalone PNG (IHDR + its data chunks, fdAT renumbered back to
    * IDAT) decoded through the same `javax.imageio` path as
    * [[PngDecoder]] — pure JVM, no external codecs, and lossless where
    * [[MjpegDecoder]] tolerates DC quantization.
    *
    * Supported composition: full-frame frames only (x=y=0, frame size =
    * canvas size, blend=SOURCE) — the frame-sampling shape a training
    * pipeline wants. Region/blend-OVER payloads (valid APNG, incremental
    * composition) are treated as undecodable: zero frames, skip-not-throw,
    * never a silently mis-composed image. A plain PNG (no acTL) decodes
    * as its single frame.
    */
  object ApngDecoder extends Decoder {

    /** Each animation frame's standalone-PNG byte ranges, reassembled:
      * None when the payload is not a supported full-frame APNG.
      */
    private[multimodal] def framePngs(payload: Array[Byte]): Option[Array[Array[Byte]]] = {
      val chunks = pngChunks(payload)
      if (chunks.isEmpty) return None
      val ihdr = chunks.collectFirst { case ("IHDR", d) => d }.getOrElse(return None)
      if (!chunks.exists(_._1 == "acTL"))
        return Some(Array(payload)) // plain PNG: its own single frame
      def be(d: Array[Byte], o: Int): Int =
        ((d(o) & 0xff) << 24) | ((d(o + 1) & 0xff) << 16) | ((d(o + 2) & 0xff) << 8) | (d(o + 3) & 0xff)
      val (canvasW, canvasH) = (be(ihdr, 0), be(ihdr, 4))
      // frames in fcTL order; every fcTL must be full-frame blend=SOURCE
      val frames = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[Array[Byte]]]
      var sawFctl = false
      chunks.foreach {
        case ("fcTL", d) =>
          if (d.length < 26) return None
          val (w, h, x, y, blend) = (be(d, 4), be(d, 8), be(d, 12), be(d, 16), d(25))
          if (w != canvasW || h != canvasH || x != 0 || y != 0 || blend != 0) return None
          frames += scala.collection.mutable.ArrayBuffer.empty
          sawFctl = true
        case ("IDAT", d) =>
          // an IDAT before any fcTL is a non-animated default image
          // (allowed by the spec); with a preceding fcTL it IS frame 0
          if (sawFctl && frames.nonEmpty && frames.length == 1) frames.head += d
        case ("fdAT", d) =>
          if (d.length < 4 || frames.isEmpty) return None
          frames.last += java.util.Arrays.copyOfRange(d, 4, d.length) // strip sequence number
        case _ => ()
      }
      if (frames.isEmpty || frames.exists(_.isEmpty)) return None
      Some(frames.map { datas =>
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(PngSig)
        writeChunk(bos, "IHDR", ihdr)
        chunks.collect { case ("PLTE", d) => d }.foreach(writeChunk(bos, "PLTE", _))
        datas.foreach(writeChunk(bos, "IDAT", _))
        writeChunk(bos, "IEND", Array.empty)
        bos.toByteArray
      }.toArray)
    }

    def decodeFrames(payload: Array[Byte], maxFrames: Int): Array[Array[Byte]] =
      if (maxFrames < 1) Array.empty
      else framePngs(payload) match {
        case None => Array.empty
        case Some(pngs) =>
          MjpegDecoder.sampleIndices(pngs.length, maxFrames)
            .flatMap(i => PngDecoder.decodeRgb(pngs(i)).map(_._1))
      }
  }

  /** Encode 16-bit signed mono PCM samples as a WAV payload
    * (`javax.sound.sampled` — in the JDK, headless-safe, runs in executor
    * tasks like [[encodePng]]).
    */
  def encodeWav(samples: Array[Short], sampleRateHz: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRateHz.toFloat, 16, 1, true /* signed */, false /* little-endian */)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decoder: WAV/PCM payload → samples via
    * `javax.sound.sampled`. Same skip-not-throw contract as [[PngDecoder]]:
    * undecodable payloads yield None/zero frames. Closes the last stub in
    * the multimodal row — video alone stays behind [[DecodeStub]].
    */
  object WavDecoder extends Decoder {

    /** (interleaved samples, sampleRateHz, channels), or None for an
      * undecodable or non-16-bit-PCM payload.
      */
    def decodePcm(payload: Array[Byte]): Option[(Array[Short], Int, Int)] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = ais.getFormat
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) None
          else {
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2
            val out = new Array[Short](n)
            var i = 0
            if (fmt.isBigEndian)
              while (i < n) {
                out(i) = (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
                i += 1
              }
            else
              while (i < n) {
                out(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
                i += 1
              }
            Some((out, math.round(fmt.getSampleRate), fmt.getChannels))
          }
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Frames = up-to-`maxFrames` contiguous chunks of the decoded PCM
      * byte stream (little-endian 16-bit) — the batch shape a feature
      * extractor consumes.
      */
    def decodeFrames(payload: Array[Byte], maxFrames: Int): Array[Array[Byte]] =
      if (maxFrames < 1) Array.empty
      else decodePcm(payload) match {
        case None => Array.empty
        case Some((samples, _, _)) =>
          val pcm = new Array[Byte](samples.length * 2)
          var i = 0
          while (i < samples.length) {
            pcm(2 * i) = (samples(i) & 0xff).toByte
            pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
            i += 1
          }
          if (pcm.isEmpty) Array.empty
          else {
            // ceil division: floor + take(maxFrames) would silently DROP
            // the trailing samples whenever length % maxFrames != 0
            val frameSize = math.max(1, (pcm.length + maxFrames - 1) / maxFrames)
            pcm.grouped(frameSize).toArray
          }
      }
  }

  /** Real nearest-neighbor resize over packed RGB pixels: output pixel
    * (x, y) samples input pixel (⌊x·w/ow⌋, ⌊y·h/oh⌋).
    */
  def resizeNearest(rgb: Array[Byte], w: Int, h: Int, ow: Int, oh: Int): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        val sx = x * w / ow
        val si = (sy * w + sx) * 3
        val di = (y * ow + x) * 3
        out(di) = rgb(si); out(di + 1) = rgb(si + 1); out(di + 2) = rgb(si + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Attach a metadata struct column to a payload DataFrame. */
  def withMeta(df: DataFrame, payloadCol: String, meta: MediaMeta): DataFrame =
    df.withColumn("meta", struct(
      lit(meta.kind).as("kind"),
      lit(meta.width).as("width"),
      lit(meta.height).as("height"),
      lit(meta.sampleRateHz).as("sample_rate_hz")))

  /** Distributed decode + featurize: one pass per partition over payload
    * batches (the Scala analog of `mapInPandas` batch plumbing). Features
    * here are a 16-bucket byte histogram per item — deterministic, cheap,
    * and shaped like a real extractor's output (fixed-width vector).
    */
  def extractFeatures(
      spark: SparkSession,
      media: Dataset[MediaRow],
      decoder: Decoder = DecodeStub,
      maxFrames: Int = 4): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val frames = decoder.decodeFrames(r.payload, maxFrames)
        val hist = new Array[Long](16)
        frames.foreach(_.foreach(b => hist((b & 0xff) >> 4) += 1))
        MediaFeatures(r.id, r.kind, r.payload.length.toLong, frames.length, hist)
      }
    }
  }

  /** "Resize" stub: byte decimation keeping every `factor`-th byte (binary
    * in → smaller binary out, the shape of a real resampler). Runs inside
    * the same partition pass as [[extractFeatures]].
    */
  def resize(payload: Array[Byte], factor: Int): Array[Byte] = {
    require(factor > 0)
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }
}
