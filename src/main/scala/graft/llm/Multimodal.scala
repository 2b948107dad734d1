package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to typed metadata; decode / feature-extract /
  * resize / frame-sample run batched per partition (the Scala analogue of
  * `mapInPandas` — one library context per partition, vectorizable batch
  * loop inside).
  *
  * IMAGE decode is REAL: `decodeImage` runs `javax.imageio.ImageIO` (PNG/
  * GIF/BMP ship with the JDK, no container codec needed), reading true
  * pixel dimensions and a pixel-sum feature off the decoded raster —
  * metadata lies are ignored, undecodable payloads flag `decoded=false`.
  * AUDIO decode is REAL for WAV/PCM and G.711 (`javax.sound.sampled
  * .AudioSystem`, format + frame data off the decoded stream) AND for
  * IMA ADPCM (WAVE tag 0x11 — the JDK ships no ADPCM codec, so the
  * two-table IMA state machine is implemented here directly). VIDEO
  * decode is REAL for MJPEG-in-AVI:
  * `decodeVideoFrames` walks the RIFF container and inflates each frame
  * through ImageIO (JPEG ships with the JDK). Inter-frame codecs
  * (H.264/VP9) and compressed audio (MP3/AAC) remain STUBBED
  * (`decodeStub`): no FFmpeg in this container, so those payloads get
  * deterministic byte-level features (length, md5, head bytes). The
  * partitioning, schema and batch shape are identical throughout —
  * swapping the stub for a JNI/FFmpeg call changes one function.
  *
  * Scale: `mapPartitions` keeps one decoder context per task; binary
  * payloads never shuffle (feature extraction projects them away before any
  * wide op); frame sampling is pure metadata arithmetic followed by a
  * narrow explode.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, durationMs: Long, codec: String)
  case class MediaItem(mediaId: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(
      mediaId: Long,
      kind: String,
      nBytes: Long,
      contentMd5: String,
      head8Hex: String,
      width: Int,
      height: Int)

  /** STUB decode: byte-level features standing in for a real codec call.
    * One MessageDigest per partition (the "library context"), reused across
    * the batch — the real-decoder resource pattern.
    */
  def decodeStub(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { m =>
        md.reset()
        val digest = md.digest(m.bytes).map("%02x".format(_)).mkString
        val head = m.bytes.take(8).map("%02x".format(_)).mkString
        MediaFeatures(m.mediaId, m.kind, m.bytes.length.toLong, digest, head,
          m.meta.width, m.meta.height)
      }
    }
  }

  case class ImageFeatures(
      mediaId: Long, decoded: Boolean, width: Int, height: Int, pixelSum: Long)

  /** REAL image decode via the JDK's ImageIO (PNG/GIF/BMP need no
    * external codec). Width/height come from the decoded raster — NOT the
    * metadata struct — and `pixelSum` folds every pixel's r+g+b, so a
    * wrong byte stream can't silently pass. `ImageIO.read` returns null
    * for undecodable payloads → `decoded=false` sentinel row (the error
    * side-channel shape, not an exception — one bad image must not kill
    * the partition).
    */
  def decodeImage(items: Dataset[MediaItem]): Dataset[ImageFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // ImageIO scans for plugin readers on first use; disk caching off
      // keeps the decode purely in-memory per task
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        // ImageIO.read returns null only when NO reader claims the
        // stream; a recognized-but-corrupt payload (valid magic bytes,
        // truncated data) THROWS from the selected reader instead — both
        // cases must take the sentinel, not kill the partition
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.bytes))
          catch { case _: Exception => null }
        if (img == null) ImageFeatures(m.mediaId, decoded = false, -1, -1, -1L)
        else {
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          ImageFeatures(m.mediaId, decoded = true, img.getWidth, img.getHeight, sum)
        }
      }
    }
  }

  case class ResizedFeatures(
      mediaId: Long, decoded: Boolean, inWidth: Int, inHeight: Int,
      outWidth: Int, outHeight: Int, outPixelSum: Long)

  /** REAL raster resize: ImageIO decode, then an EXACT nearest-neighbor
    * downscale in integer arithmetic — source index = `dst·in/out`
    * (floor), longest side capped at `maxDim` with aspect preserved.
    * Hand-rolled rather than `Graphics2D`/`getScaledInstance` because
    * library interpolation kernels are not pinned by any spec: integer
    * index math produces the same raster on every JVM, so the oracle can
    * re-derive the output pixel sum arithmetically from the synthetic
    * pattern. Undecodable payloads take the sentinel row, as in
    * [[decodeImage]]. (A production pipeline would swap in area-average
    * resampling — the batch shape, schema and sentinel contract stay.)
    */
  def resizeImage(items: Dataset[MediaItem], maxDim: Int): Dataset[ResizedFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.bytes))
          catch { case _: Exception => null }
        if (img == null)
          ResizedFeatures(m.mediaId, decoded = false, -1, -1, -1, -1, -1L)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val lng = math.max(w, h)
          val (ow, oh) =
            if (lng <= maxDim) (w, h)
            else (math.max(1, w * maxDim / lng), math.max(1, h * maxDim / lng))
          var sum = 0L
          var y = 0
          while (y < oh) {
            val sy = y * h / oh
            var x = 0
            while (x < ow) {
              val rgb = img.getRGB(x * w / ow, sy)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          ResizedFeatures(m.mediaId, decoded = true, w, h, ow, oh, sum)
        }
      }
    }
  }

  case class PHashFeatures(
      mediaId: Long, decoded: Boolean, hashHi: Long, hashLo: Long)

  /** Perceptual average-hash (aHash) over REAL decoded rasters: an 8×8
    * exact nearest-neighbor sample (the [[resizeImage]] integer index
    * math — `src = cell·in quot 8`), per-cell gray = r+g+b of the
    * sampled pixel, bit set when `64·g ≥ Σ cells` (the mean threshold in
    * pure integers — ties round UP, pinned). Two 32-bit words
    * (cells 0..31 → hashLo, 32..63 → hashHi) so no engine ever shifts
    * into bit 63 (DuckDB's checked `<<` errors there); near-dup distance
    * is `popcount(hi⊕hi) + popcount(lo⊕lo)`.
    *
    * This is the image analogue of the text SimHash tier: two encodes of
    * the same picture (recompressed, slightly recropped/rescaled) land
    * within a few bits while unrelated pictures sit near 32. At corpus
    * scale the pair join routes the two words through the Charikar block
    * scheme exactly like [[TextOps.simhashNearDups]] (radius ≤ 3 over 4
    * 16-bit blocks is lossless by pigeonhole); the audit row's handful of
    * images use the direct pair join. Undecodable payloads take the
    * sentinel row.
    */
  def aHash(items: Dataset[MediaItem]): Dataset[PHashFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.bytes))
          catch { case _: Exception => null }
        if (img == null) PHashFeatures(m.mediaId, decoded = false, -1L, -1L)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val g = new Array[Long](64)
          var sum = 0L
          var cy = 0
          while (cy < 8) {
            val sy = cy * h / 8
            var cx = 0
            while (cx < 8) {
              val rgb = img.getRGB(cx * w / 8, sy)
              val v = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                (rgb & 0xff)).toLong
              g(cy * 8 + cx) = v
              sum += v
              cx += 1
            }
            cy += 1
          }
          var hi = 0L
          var lo = 0L
          var k = 0
          while (k < 64) {
            if (g(k) * 64L >= sum) {
              if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
            }
            k += 1
          }
          PHashFeatures(m.mediaId, decoded = true, hi, lo)
        }
      }
    }
  }

  /** Image near-dup pairs over [[aHash]] words via the Charikar block
    * scheme — the corpus-scale pair join the [[aHash]] scaladoc routes
    * through (the direct all-pairs join is only for audit-sized sets).
    * The 64-bit hash splits into four 16-bit blocks (two per word — no
    * shift ever reaches bit 32); candidates share at least one EXACT
    * block, then verify `popcount(hi⊕hi) + popcount(lo⊕lo) ≤ maxHamming`.
    * With `maxHamming < 4` the pigeonhole makes the decomposition
    * LOSSLESS — the result EQUALS brute all-pairs (spec-pinned), the
    * same guarantee [[TextOps.simhashNearDups]] gives text fingerprints.
    *
    * Scale: the join key is (block_id, 16-bit block value) — expected
    * candidates per bucket ~ corpus/2¹⁶ per block; only the two 8-byte
    * words ride the self-join, never rasters; verification is two
    * XOR+POPCNT. Input is [[aHash]]'s frame (mediaId, hashHi, hashLo),
    * already filtered to decoded rows.
    */
  def aHashNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4,
      "pigeonhole needs maxHamming < 4 (else the block join loses pairs)")
    val blocks = hashes.select(col("mediaId").as("id"),
        col("hashHi").as("hi"), col("hashLo").as("lo"))
      .withColumn("blk", explode(expr(
        """array(
          |  struct(0 AS block_id, lo & 65535 AS block_key),
          |  struct(1 AS block_id, shiftright(lo, 16) & 65535 AS block_key),
          |  struct(2 AS block_id, hi & 65535 AS block_key),
          |  struct(3 AS block_id, shiftright(hi, 16) & 65535 AS block_key))"""
          .stripMargin)))
      .select(col("id"), col("hi"), col("lo"),
        col("blk.block_id"), col("blk.block_key"))
    blocks.select(col("id").as("id_a"), col("hi").as("hi_a"),
        col("lo").as("lo_a"), col("block_id"), col("block_key"))
      .join(blocks.select(col("id").as("id_b"), col("hi").as("hi_b"),
        col("lo").as("lo_b"), col("block_id"), col("block_key")),
        Seq("block_id", "block_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("CAST(bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b) AS BIGINT)")
          .as("hamming"))
      // a pair can collide in several blocks; hamming is functional in
      // the pair, so the dedup key is the pair alone
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  case class AudioFeatures(
      mediaId: Long, decoded: Boolean, sampleRate: Int, channels: Int,
      nSamples: Long, sumSq: Long)

  /** REAL audio decode for WAV/PCM via the JDK's
    * `javax.sound.sampled.AudioSystem` (no external codec — the same move
    * that made image decode real through ImageIO). Sample rate and channel
    * count come from the DECODED stream format, not metadata; `nSamples`
    * and the energy feature `sumSq` (Σ sample², exact 64-bit integer — an
    * RMS numerator without the float) come from the PCM frames themselves,
    * so a wrong byte stream can't silently pass. G.711 companded WAVs
    * (µ-law/A-law — the telephony encodings the JDK ships codecs for)
    * are TRANSCODED to 16-bit PCM first via
    * `AudioSystem.getAudioInputStream(targetFormat, stream)`, so features
    * come off the expanded samples — the one compressed-audio family
    * decodable without FFmpeg. Undecodable payloads (garbage bytes, or
    * other encodings) take the sentinel row — one bad file must not kill
    * the partition. MP3/AAC and video stay out of scope: no codec ships
    * with the JDK or this container (documented stub boundary).
    */
  def decodeAudio(items: Dataset[MediaItem]): Dataset[AudioFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val sentinel = AudioFeatures(m.mediaId, decoded = false, -1, -1, -1L, -1L)
        // the JDK has no ADPCM codec (UnsupportedAudioFileException), so
        // fmt-tag 0x11 routes to the hand-rolled IMA decoder; one shared
        // catch keeps the sentinel contract identical on both paths
        try if (isImaAdpcmWav(m.bytes)) decodeImaAdpcm(m.mediaId, m.bytes)
        else {
          import javax.sound.sampled.{AudioFormat, AudioSystem}
          val raw = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.bytes))
          val enc = raw.getFormat.getEncoding
          val ais =
            if (enc == AudioFormat.Encoding.ULAW || enc == AudioFormat.Encoding.ALAW) {
              val f = raw.getFormat
              AudioSystem.getAudioInputStream(
                new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, f.getSampleRate,
                  16, f.getChannels, f.getChannels * 2, f.getSampleRate, false),
                raw)
            } else raw
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) sentinel
          else {
            val data = ais.readAllBytes()
            val n = data.length / 2
            var sumSq = 0L
            var i = 0
            while (i < n) {
              val v =
                if (fmt.isBigEndian) (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff)
                else (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
              sumSq += v.toLong * v
              i += 1
            }
            AudioFeatures(m.mediaId, decoded = true, fmt.getSampleRate.toInt,
              fmt.getChannels, n.toLong, sumSq)
          }
        } catch { case _: Exception => sentinel }
      }
    }
  }

  /** Deterministic test WAV: 16-bit signed PCM at 8 kHz, linear sample
    * index i carries value `((i*31 + seed*7) % 2003) - 1001` — integer
    * arithmetic a SQL oracle reproduces exactly. The WAVE container is
    * written by AudioSystem, so decode must parse a real RIFF header.
    */
  def syntheticWav(seed: Long, nSamples: Int, channels: Int = 1): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels, true, false)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((i.toLong * 31 + seed * 7) % 2003) - 1001).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val frames = nSamples / channels
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** [[syntheticWav]] companded to G.711 µ-law (or A-law): the same
    * deterministic 16-bit pattern pushed through the JDK's own telephony
    * codec into an 8-bit/sample WAVE. Decode must transcode back — G.711
    * is lossy, but the compand/expand tables are fixed by spec, so the
    * round-tripped samples are integer-reproducible by an oracle.
    */
  def syntheticWavCompanded(seed: Long, nSamples: Int,
      alaw: Boolean = false): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((i.toLong * 31 + seed * 7) % 2003) - 1001).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val companded = new AudioFormat(
      if (alaw) AudioFormat.Encoding.ALAW else AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val cais = AudioSystem.getAudioInputStream(companded, ais)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(cais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  // ---- IMA ADPCM (WAVE format tag 0x11) ----------------------------------
  // The JDK ships NO ADPCM codec, but IMA ADPCM is two fixed tables and a
  // 4-bit state machine (IMA "Recommended Practices for Enhancing Digital
  // Audio Compatibility", rev 3.00 1992) — small enough to implement
  // honestly rather than stub: a third real compressed-audio family next
  // to PCM and G.711, still FFmpeg-free.

  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val ImaIndex: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA decode step: returns (sample, stepIndex'). */
  private def imaStep(pred: Int, sidx: Int, nib: Int): (Int, Int) = {
    val step = ImaStep(sidx)
    var delta = step >> 3
    if ((nib & 4) != 0) delta += step
    if ((nib & 2) != 0) delta += step >> 1
    if ((nib & 1) != 0) delta += step >> 2
    val p = if ((nib & 8) != 0) pred - delta else pred + delta
    val clamped = math.max(-32768, math.min(32767, p))
    (clamped, math.max(0, math.min(88, sidx + ImaIndex(nib))))
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)

  /** RIFF chunk walk: returns (offset, size) of the first chunk with
    * `tag`, or None. A negative or past-the-buffer declared size stops
    * the walk (malformed container) — the advance rides Long so a size
    * near Int.MaxValue can neither wrap `o` negative nor spin in place.
    */
  private def riffChunk(b: Array[Byte], tag: String): Option[(Int, Int)] = {
    var o = 12L // past RIFF....WAVE
    while (o + 8 <= b.length) {
      val t = new String(b, o.toInt, 4, "US-ASCII")
      val sz = le32(b, o.toInt + 4)
      if (sz < 0) return None
      if (t == tag) return Some((o.toInt + 8, sz))
      o += 8L + sz + (sz & 1) // chunks are word-aligned
    }
    None
  }

  private[llm] def isImaAdpcmWav(b: Array[Byte]): Boolean =
    try b.length > 20 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE" &&
      riffChunk(b, "fmt ").exists { case (o, sz) =>
        sz >= 16 && o + 2 <= b.length && le16(b, o) == 0x11 }
    catch { case _: Exception => false }

  /** Decode an IMA-ADPCM WAVE, mono or multi-channel: per block of
    * `blockAlign` bytes, one 4-byte header PER CHANNEL (int16 predictor
    * = sample 0 of that channel, step index, reserved), then the nibble
    * data interleaved in 4-byte WORDS round-robin across channels (word
    * 0 → ch0's nibbles 0-7, word 1 → ch1's nibbles 0-7, …, each byte
    * LOW nibble first) — the standard multi-channel IMA layout.
    * `nSamples`/`sumSq` aggregate across channels.
    */
  private def decodeImaAdpcm(mediaId: Long, b: Array[Byte]): AudioFeatures = {
    val (fo, fsz) = riffChunk(b, "fmt ").get
    val nCh = le16(b, fo + 2)
    require(nCh >= 1 && nCh <= 8, s"unsupported channel count $nCh")
    val sampleRate = le32(b, fo + 4)
    val blockAlign = le16(b, fo + 12)
    // a block is its per-channel headers at minimum; less would spin
    require(blockAlign >= 4 * nCh, s"blockAlign $blockAlign < header size")
    // samples per block (PER CHANNEL): from the fmt extension when
    // present (the chunk itself must DECLARE the extension — a
    // spec-valid 16-byte fmt has no cbSize field, and reading past it
    // would consume the next chunk's tag bytes), else derived from the
    // block size
    val samplesPerBlock =
      if (fsz >= 20 && le16(b, fo + 16) >= 2) le16(b, fo + 18)
      else (blockAlign - 4 * nCh) * 2 / nCh + 1
    val (dOff, dSz) = riffChunk(b, "data").get
    var sumSq = 0L
    var n = 0L
    var bo = dOff
    val dEnd = dOff + math.min(dSz, b.length - dOff)
    while (bo + 4 * nCh <= dEnd) {
      val blockEnd = math.min(bo + blockAlign, dEnd)
      val pred = new Array[Int](nCh)
      val sidx = new Array[Int](nCh)
      val emitted = new Array[Int](nCh)
      var c = 0
      while (c < nCh) {
        pred(c) = le16(b, bo + 4 * c).toShort.toInt
        sidx(c) = math.max(0, math.min(88, b(bo + 4 * c + 2) & 0xff))
        sumSq += pred(c).toLong * pred(c); n += 1
        emitted(c) = 1
        c += 1
      }
      var o = bo + 4 * nCh
      var word = 0
      while (o < blockEnd) {
        val ch = word % nCh
        val wordEnd = math.min(o + 4, blockEnd)
        while (o < wordEnd) {
          val byte = b(o) & 0xff
          var h = 0
          while (h < 2) {
            if (emitted(ch) < samplesPerBlock) {
              val nib = if (h == 0) byte & 0xf else byte >> 4
              val (s, si) = imaStep(pred(ch), sidx(ch), nib)
              pred(ch) = s; sidx(ch) = si
              sumSq += s.toLong * s; n += 1; emitted(ch) += 1
            }
            h += 1
          }
          o += 1
        }
        word += 1
      }
      bo += blockAlign
    }
    AudioFeatures(mediaId, decoded = true, sampleRate, nCh, n, sumSq)
  }

  /** Deterministic single-block IMA-ADPCM WAVE: header predictor
    * `(seed*7 % 2003) - 1001` (= sample 0), step index `seed*5 % 60`,
    * nibble j `(j*13 + seed*5) % 16` — a real tag-0x11 bitstream whose
    * decoded samples an oracle re-derives by replaying the IMA state
    * machine (recursive CTE). One block keeps the replay a single
    * sequential recursion; single-block files are valid WAVE.
    */
  def syntheticWavAdpcm(seed: Long, nSamples: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    require(nSamples >= 1)
    val nNib = nSamples - 1
    val nibBytes = (nNib + 1) / 2
    val blockAlign = 4 + nibBytes
    val dataSz = blockAlign
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); w32(4 + (8 + 20) + (8 + 4) + (8 + dataSz))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(20)
    w16(0x11); w16(1); w32(sampleRate)
    w32(sampleRate * blockAlign / nSamples) // nominal byte rate
    w16(blockAlign); w16(4); w16(2); w16(nSamples) // bits=4, cbSize=2, samplesPerBlock
    out.write("fact".getBytes("US-ASCII")); w32(4); w32(nSamples)
    out.write("data".getBytes("US-ASCII")); w32(dataSz)
    w16((((seed * 7) % 2003) - 1001).toInt & 0xffff)
    out.write(((seed * 5) % 60).toInt); out.write(0)
    var j = 0
    while (j < nibBytes) {
      val lo = ((2L * j * 13 + seed * 5) % 16).toInt
      val hi = if (2 * j + 1 < nNib) (((2L * j + 1) * 13 + seed * 5) % 16).toInt else 0
      out.write(lo | (hi << 4))
      j += 1
    }
    out.toByteArray
  }

  /** Deterministic single-block STEREO IMA-ADPCM WAVE: per channel c,
    * header predictor `((seed*7 + c*11) % 2003) - 1001`, step index
    * `(seed*5 + c*7) % 60`, nibble j `(j*13 + seed*5 + c*3) % 16` — the
    * c = 0 formulas reduce to [[syntheticWavAdpcm]]'s mono stream, so
    * one oracle recursion covers both by ranging over (id, channel).
    * The nibble streams are packed in the standard interleave (4-byte
    * words round-robin ch0, ch1, …), which is exactly what the decoder
    * must undo to reproduce the per-channel formulas.
    */
  def syntheticWavAdpcmStereo(seed: Long, nSamplesPerCh: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    require(nSamplesPerCh >= 1)
    val nCh = 2
    val nNib = nSamplesPerCh - 1
    val nWordsPerCh = (nNib + 7) / 8 // 8 nibbles per 4-byte word
    val blockAlign = 4 * nCh + nWordsPerCh * 4 * nCh
    val dataSz = blockAlign
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); w32(4 + (8 + 20) + (8 + 4) + (8 + dataSz))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(20)
    w16(0x11); w16(nCh); w32(sampleRate)
    w32(sampleRate * blockAlign / nSamplesPerCh) // nominal byte rate
    w16(blockAlign); w16(4); w16(2); w16(nSamplesPerCh) // bits=4, cbSize=2, samplesPerBlock
    out.write("fact".getBytes("US-ASCII")); w32(4); w32(nSamplesPerCh)
    out.write("data".getBytes("US-ASCII")); w32(dataSz)
    def nib(c: Int, j: Int): Int = ((j * 13 + seed * 5 + c * 3) % 16).toInt
    (0 until nCh).foreach { c =>
      w16((((seed * 7 + c * 11) % 2003) - 1001).toInt & 0xffff)
      out.write(((seed * 5 + c * 7) % 60).toInt); out.write(0)
    }
    var w = 0
    while (w < nWordsPerCh * nCh) {
      val c = w % nCh
      val base = (w / nCh) * 8 // this word carries the channel's nibbles base..base+7
      var byteIdx = 0
      while (byteIdx < 4) {
        val j0 = base + byteIdx * 2
        val lo = if (j0 < nNib) nib(c, j0) else 0
        val hi = if (j0 + 1 < nNib) nib(c, j0 + 1) else 0
        out.write(lo | (hi << 4))
        byteIdx += 1
      }
      w += 1
    }
    out.toByteArray
  }

  /** Deterministic test PNG: pixel(x,y) = (r,g,b) =
    * ((x*7+seed)%256, (y*11)%256, (x+y)%256), PNG-encoded. The encode is
    * lossless RGB, so a decode must reproduce the formula exactly.
    */
  def syntheticPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = ((x * 7 + seed) % 256).toInt
        val g = (y * 11) % 256
        val b = (x + y) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Synthetic PNG whose SPATIAL FREQUENCIES depend on the seed (channel
    * ramps `x·(7+5s)`, `y·(11+3s)`, `(x+y)·(1+s)` mod 256) — unlike
    * [[syntheticPng]]'s fixed pattern, different seeds produce genuinely
    * different pictures (aHash hamming 13–30 apart), while the same seed
    * at slightly different dimensions stays a near-dup (hamming ≤ 8).
    * Lossless PNG + TYPE_INT_RGB round-trips the raster exactly, so an
    * oracle replays per-pixel values from the formula alone.
    */
  def syntheticPng2(seed: Long, width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = ((x * (7 + seed * 5)) % 256).toInt
        val g = ((y * (11 + seed * 3)) % 256).toInt
        val b = (((x + y) * (1 + seed)) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  case class VideoFeatures(
      mediaId: Long, decoded: Boolean, nFrames: Int, width: Int, height: Int,
      pixelSum: Long)

  /** REAL video frame decode for MJPEG-in-AVI — the one video codec the
    * JDK can handle end-to-end: the AVI RIFF container is a plain chunk
    * walk (this file), and every MJPEG frame is an ordinary JPEG that
    * `ImageIO` decodes (the same move that made PNG and WAV real).
    * Frame count, dimensions and the total pixel sum come off the DECODED
    * rasters; a payload that isn't a RIFF/AVI, carries no video chunks,
    * or contains an undecodable frame takes the sentinel row. JPEG is
    * lossy, so unlike PNG the pixel sum is codec-implementation-defined —
    * exact within one container, within ~1% of the pre-encode pattern for
    * any correct decoder (the correctness row checks the tolerance
    * BOOLEAN, which is decoder-portable; the spec pins the tolerance).
    * Compressed-audio and non-MJPEG video remain out of scope — no codec
    * in the JDK or this container.
    */
  def decodeVideoFrames(items: Dataset[MediaItem]): Dataset[VideoFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val sentinel = VideoFeatures(m.mediaId, decoded = false, -1, -1, -1, -1L)
        try {
          val frames = aviFrameChunks(m.bytes)
          var nf = 0
          var w = -1
          var h = -1
          var sum = 0L
          var ok = frames.nonEmpty
          frames.foreach { fb =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
              catch { case _: Exception => null }
            if (img == null) ok = false
            else {
              nf += 1
              // dims come from the FIRST frame; a structurally valid AVI
              // with mixed frame dimensions reports the explicit -1
              // sentinel instead of silently echoing the last frame
              if (nf == 1) { w = img.getWidth; h = img.getHeight }
              else if (w != img.getWidth || h != img.getHeight) { w = -1; h = -1 }
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
            }
          }
          if (!ok || nf == 0) sentinel
          else VideoFeatures(m.mediaId, decoded = true, nf, w, h, sum)
        } catch { case _: Exception => sentinel }
      }
    }
  }

  /** Minimal RIFF/AVI chunk walk: video frame payloads (`##dc`/`##db`
    * chunks, nested inside any LIST) in file order. Word-aligned chunk
    * stepping per the RIFF spec; malformed sizes throw and the caller
    * takes the sentinel.
    */
  private[llm] def aviFrameChunks(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def fourcc(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val cc = fourcc(o)
        val sz = le32(o + 4)
        if (sz < 0 || o + 8 + sz > end) throw new IllegalArgumentException("bad chunk")
        if (cc == "LIST") walk(o + 12, o + 8 + sz)
        else if (cc.length == 4 && cc.charAt(0).isDigit && cc.charAt(1).isDigit &&
          (cc.endsWith("dc") || cc.endsWith("db")))
          out += java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + sz)
        o += 8 + sz + (sz & 1)
      }
    }
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      throw new IllegalArgumentException("not AVI")
    walk(12, math.min(bytes.length, 8 + le32(4)))
    out.toSeq
  }

  /** Deterministic frame pattern: pixel(x,y) of frame f has
    * (r,g,b) = ((x*3 + f*5 + seed) % 256, (y*7 + f) % 256,
    * (x + y + 2*f) % 256) — smooth gradients at test dimensions (no
    * wraps), so JPEG round-trips them with near-zero error and the
    * pattern sum is SQL-recomputable.
    */
  def videoFramePixel(seed: Long, f: Int, x: Int, y: Int): (Int, Int, Int) =
    // floorMod on the seed-bearing channel: Scala's % keeps the sign, so a
    // negative seed would otherwise produce an invalid negative red value
    (java.lang.Math.floorMod(x * 3 + f * 5 + seed, 256L).toInt,
      (y * 7 + f) % 256, (x + y + 2 * f) % 256)

  /** Deterministic test AVI: `nFrames` MJPEG frames of the
    * [[videoFramePixel]] pattern inside a structurally complete RIFF/AVI
    * (avih + strl headers + movi chunk list), written with JDK-only code
    * — decode must walk a real container and inflate real JPEGs.
    */
  def syntheticAvi(seed: Long, width: Int, height: Int, nFrames: Int): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      cc(id) ++ le32(body.length) ++ body ++ pad
    }
    def list(tpe: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(tpe) ++ children)

    val jpegs = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val (r, g, b) = videoFramePixel(seed, f, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val avih = chunk("avih", le32(100000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh", cc("vids") ++ cc("MJPG") ++ le32(0) ++
      le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(10) ++ le32(0) ++
      le32(nFrames) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(width) ++ le16(height))
    val strf = chunk("strf", le32(40) ++ le32(width) ++ le32(height) ++
      le16(1) ++ le16(24) ++ cc("MJPG") ++ le32(width * height * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length) ++ body
  }

  /** Resize plumbing: recompute target metadata, pass payload through the
    * (stubbed) transcode. Aspect ratio preserved, longest edge bounded.
    */
  def resizeMeta(df: DataFrame, maxEdge: Int): DataFrame =
    df.withColumn("scale",
        least(lit(1.0), lit(maxEdge) / greatest(col("meta.width"), col("meta.height"))))
      .withColumn("out_width", floor(col("meta.width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("meta.height") * col("scale")).cast("int"))
      .drop("scale")

  /** Frame sampling: one row per sampled frame index from duration + fps
    * metadata — pure arithmetic then a narrow explode (no payload copy;
    * a real sampler would slice `bytes` per frame in the decode stage).
    */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
        explode(sequence(lit(0L), greatest(col("meta.durationMs") - 1, lit(0L)),
          lit(everyMs))))
      .select(col("mediaId").as("media_id"), col("kind"), col("frame_ms"))

  /** Build MediaItems from the documents table: utf-8 payload bytes with
    * synthesized typed metadata (deterministic from n_chars).
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, n) =>
        MediaItem(id, "text-as-image-stub", text.getBytes("UTF-8"),
          MediaMeta((n % 640).toInt + 32, ((n * 7) % 480).toInt + 32,
            n * 10, "stub"))
      }
  }
}
