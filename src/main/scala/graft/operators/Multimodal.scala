package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the LLM-data-pipeline extension surface:
  * media payloads travel as opaque `binary` columns with typed metadata,
  * and decode / feature-extraction runs as a partition-wise batch stage.
  *
  * REAL here: the schema contract (binary payload + struct metadata), the
  * typed `Dataset.mapPartitions` batch stage (the Scala analogue of a
  * `mapInPandas` decode UDF: one iterator per partition, so a real decoder
  * would amortize model/codec init per batch, not per row), and the
  * partitioning strategy (salted repartition keyed by media_type so codec
  * variety per task stays bounded WITHOUT collapsing parallelism to
  * #media-types).
  *
  * REAL decode (image): [[decodeImages]] runs an actual
  * `javax.imageio.ImageIO` PNG decode inside the mapPartitions batch
  * stage, over deterministic PNG fixtures built by [[synthesizeImages]] —
  * the features (dimensions, pixel sums) are pixel-derived from the
  * decoded raster, and the oracle re-derives them from the generation
  * formula (PNG is lossless, so the round-trip is exact).
  *
  * REAL decode (audio): [[decodeAudio]] parses actual RIFF/WAVE
  * containers via `javax.sound.sampled` over deterministic 16-bit PCM
  * fixtures built by [[synthesizeAudio]] — sample statistics come from
  * the decoded frames, and the oracle re-derives them from the
  * generation formula (PCM is lossless, so the round-trip is exact).
  *
  * REAL decode (video): [[decodeVideos]] reads actual MULTI-FRAME media —
  * animated GIF, the one multi-frame container a bare JDK can both write
  * and read via `javax.imageio` — over deterministic fixtures built by
  * [[synthesizeVideos]]; frame count comes from the container directory
  * (`getNumImages`), per-frame pixel sums from each decoded raster, and
  * GIF's indexed palette is lossless for the grayscale fixture so the
  * oracle re-derives everything from the generation formula.
  *
  * REAL decode (video-in-MP4, round 13): [[decodeMjpegMp4]] walks a
  * genuine ISO-BMFF sample table (stsz sample sizes + stco chunk
  * offsets under moov/trak/mdia/minf/stbl) and runs a REAL JPEG decode
  * on every sample it finds — the MJPEG-in-MP4 shape, the closest a
  * bare JDK gets to production video (no H.264/VP9 codec ships in any
  * JDK; swapping the per-sample ImageIO call for a hardware codec is
  * the only change production needs). Since round 13 every registered
  * multimodal path runs a REAL codec; the former deterministic
  * fake-decode stands in test helpers only (graft.FakeMedia).
  *
  * Scale notes (100 TB): payload bytes dominate — keep them OUT of
  * shuffles (derive features first, project the binary away before any
  * wide stage); media_type partitioning bounds decoder variety per task;
  * batch iterators keep per-row overhead at zero.
  */
object Multimodal {

  private def hexVal(c: Char): Int = "0123456789abcdef".indexOf(c)

  /** Per-partition AMORTIZED image decode (round 15): `ImageIO.read`
    * performs a synchronized IIORegistry plugin scan per call — with 32
    * tasks decoding concurrently that shared lock is measurable
    * cross-thread contention (the round-14 mm_resize /
    * mm_image_decode_jpeg over-pin signature; the MJPEG path already
    * amortized its reader for the same reason, decodeMjpegMp4). One
    * cached reader per format per partition, fed through a direct
    * `MemoryCacheImageInputStream` (no registry lookup at all); payloads
    * that are neither JPEG nor PNG fall back to `ImageIO.read`. Call
    * once per partition; the returned function is NOT thread-safe
    * (one task = one partition = one instance, the mapPartitions
    * contract). */
  private def partitionImageDecoder()
      : Array[Byte] => java.awt.image.BufferedImage = {
    lazy val jpeg = javax.imageio.ImageIO
      .getImageReadersByFormatName("jpeg").next()
    lazy val png = javax.imageio.ImageIO
      .getImageReadersByFormatName("png").next()
    bytes => {
      val rdr =
        if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
            (bytes(1) & 0xFF) == 0xD8) jpeg
        else if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0x89 &&
            bytes(1) == 'P'.toByte) png
        else null
      if (rdr == null)
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      else {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try { rdr.setInput(iis); rdr.read(0) }
        finally iis.close()
      }
    }
  }

  /** The encode-side twin of [[partitionImageDecoder]]:
    * `ImageIO.write`'s per-call writer lookup hits the same registry
    * lock. One cached writer for `format` per partition, direct
    * `MemoryCacheImageOutputStream`. Same one-task-one-instance
    * contract. */
  private def partitionImageEncoder(format: String)
      : java.awt.image.BufferedImage => Array[Byte] = {
    lazy val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName(format).next()
    img => {
      val out = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.write(img)
        ios.flush()
      } finally ios.close()
      out.toByteArray
    }
  }

  /** One sampled frame reference. */
  final case class FrameRef(doc_id: Long, frame_idx: Long, n_frames: Long)

  /** One decoded row of the MIXED-MODAL corpus — the unified feature
    * contract of [[decodeMixed]]: images fill (width, height, 1 frame,
    * Σgray); audio fills (n_samples, 1, 1, Σ|s|); video fills (width,
    * height, n_frames, Σgray over every frame). */
  final case class MixedFeatures(
      doc_id: Long, media_type: String, width: Long, height: Long,
      n_frames: Long, content_sum: Long)

  /** Synthesize the MIXED-MODAL media table (round 13 — replaces the
    * retired UTF-8-bytes fake): media_type cycles by doc_id mod 3 and
    * every payload is REAL encoded media — PNG ([[synthesizeImages]]),
    * RIFF/WAVE PCM ([[synthesizeAudio]]), animated GIF
    * ([[synthesizeVideos]]) — under the one (doc_id, media_type,
    * binary payload) schema a (path, bytes) object-store source feeds. */
  def synthesizeMixedMedia(spark: SparkSession, docs: DataFrame): DataFrame =
    synthesizeImages(spark, docs.filter(pmod(col("doc_id"), lit(3)) === 0))
      .withColumn("media_type", lit("image"))
      .unionByName(
        synthesizeAudio(spark, docs.filter(pmod(col("doc_id"), lit(3)) === 1))
          .withColumn("media_type", lit("audio")))
      .unionByName(
        synthesizeVideos(spark, docs.filter(pmod(col("doc_id"), lit(3)) === 2))
          .withColumn("media_type", lit("video")))

  /** The mixed-modal DECODE ROUTER (round 13 — the production shape for
    * a corpus whose binary column carries several codecs): route rows
    * by media_type to the matching REAL decoder — ImageIO PNG,
    * javax.sound WAV, multi-frame GIF — and unify the typed outputs.
    * Each branch is the already-certified per-codec mapPartitions stage
    * (codec context amortized per batch); routing is three scan-level
    * filters + a union, zero shuffles, and the binary payload never
    * outlives its decode stage. An unknown media_type fails LOUD — a
    * silent drop would undercount the corpus. */
  def decodeMixed(spark: SparkSession, media: DataFrame): Dataset[MixedFeatures] = {
    import spark.implicits._
    val known = Seq("image", "audio", "video")
    val img = decodeImages(spark, media.filter(col("media_type") === "image"))
      .map(f => MixedFeatures(f.doc_id, "image", f.width, f.height, 1L,
        f.sum_gray))
    val aud = decodeAudio(spark, media.filter(col("media_type") === "audio"))
      .map(f => MixedFeatures(f.doc_id, "audio", f.n_samples, 1L, 1L,
        f.sum_abs))
    val vid = decodeVideos(spark, media.filter(col("media_type") === "video"))
      .map(f => MixedFeatures(f.doc_id, "video", f.width, f.height,
        f.n_frames, f.sum_gray))
    // the raise_error RIDES IN the doc_id column so column pruning can
    // never elide it: any row reaching this branch detonates at eval
    val unknown = media
      .filter(col("media_type").isNull || !col("media_type").isin(known: _*))
      .select(
        expr("raise_error(concat('unroutable media_type ', " +
          "coalesce(media_type, 'NULL'), ' for doc ', doc_id))")
          .cast("long").as("doc_id"),
        coalesce(col("media_type"), lit("?")).as("media_type"),
        lit(0L).as("width"), lit(0L).as("height"), lit(0L).as("n_frames"),
        lit(0L).as("content_sum"))
      .as[MixedFeatures]
    img.unionByName(aud).unionByName(vid).unionByName(unknown)
  }

  /** One REAL-resized image row: source dims, box-fitted output dims,
    * and the checksum of the resampled raster. */
  final case class ResizedImage(
      doc_id: Long, width: Long, height: Long, out_w: Long, out_h: Long,
      sum_resized: Long)

  /** The REAL raster RESIZE stage (round 13 — replaces the retired
    * geometry-only fake): decode the image, box-fit the dimensions into
    * `target`×`target` preserving aspect (dim·target / max(w,h) — exact
    * integers), then RESAMPLE the decoded raster by exact index mapping
    * (out(cx, cy) = in(cx·w div out_w, cy·h div out_h) — the integer
    * rule that stays cross-engine re-derivable where bilinear weights
    * would not; the dHash grid convention). `sum_resized` checksums the
    * output raster, so a resampler that read even one wrong source
    * pixel breaks the oracle hash. Same per-partition batch shape as
    * [[decodeImages]] — production swaps in SIMD resampling, not new
    * plumbing. */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   target: Long): Dataset[ResizedImage] = {
    import spark.implicits._
    require(target >= 1, s"target must be >= 1: $target")
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        val decode = partitionImageDecoder() // one reader set per task
        batch.map { case (id, bytes) =>
          val img = decode(bytes)
          require(img != null, s"undecodable image payload for doc $id")
          val w = img.getWidth.toLong
          val h = img.getHeight.toLong
          val m = math.max(w, h)
          val ow = (w * target / m).toInt.max(1)
          val oh = (h * target / m).toInt.max(1)
          var sum = 0L
          var cx = 0
          while (cx < ow) {
            val sx = (cx * w / ow).toInt
            var cy = 0
            while (cy < oh) {
              val sy = (cy * h / oh).toInt
              sum += (img.getRGB(sx, sy) & 0xff).toLong
              cy += 1
            }
            cx += 1
          }
          ResizedImage(id, w, h, ow.toLong, oh.toLong, sum)
        }
      }
  }

  /** One REAL-decoded image row: dimensions and pixel aggregates read
    * from the decoded raster. */
  final case class ImageFeatures(
      doc_id: Long, width: Long, height: Long, sum_gray: Long, px00: Long)

  /** Deterministic image fixture source (PNG default; format="jpg" for
    * the lossy-codec sibling — same formula, ImageIO's JPEG encoder, so
    * decode checks pin TOLERANCE invariants instead of exact pixels):
    * per document, a W×H grayscale
    * gradient PNG with gray(x, y) = (doc_id·31 + x + y) mod 256 and
    * W = 16 + hex₀(md5(text)), H = 16 + hex₁(md5(text)) — pure arithmetic
    * an external engine can re-derive, while the BYTES are a real PNG a
    * real decoder must actually parse. Encoded per-partition through the
    * same typed iterator a (path → bytes) object-store source would feed. */
  def synthesizeImages(spark: SparkSession, docs: DataFrame,
                       format: String = "png"): DataFrame = {
    import spark.implicits._
    require(Set("png", "jpg")(format), s"format must be png or jpg: $format")
    // Dedup.spread on the image/video synthesize* inputs (round 16): a
    // small docs parquet arrives as ONE split, and the whole
    // encode→decode codec chain then runs single-threaded (the decode
    // stages inherit this stage's partitioning). The spread shuffles
    // only (doc_id, md5) — never payload bytes — and is a no-op once
    // the scan is at least cluster-wide. The AUDIO synthesize entries
    // deliberately stay unspread: their PCM codec work is trivial, and
    // decodeAudio's per-row AudioSystem.getAudioInputStream walks a
    // synchronized provider registry — 32 concurrent tasks contend on
    // that lock and run SLOWER than one (measured 0.4 → 1.7 s).
    Dedup.spread(docs.select(col("doc_id").cast("long"),
        md5(coalesce(col("text"), lit(""))).as("h")))
      .as[(Long, String)]
      .mapPartitions { batch =>
        val encode = partitionImageEncoder(format) // one writer per task
        batch.map { case (id, hex) =>
          val w = 16 + hexVal(hex.charAt(0))
          val h = 16 + hexVal(hex.charAt(1))
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var x = 0
          while (x < w) {
            var y = 0
            while (y < h) {
              val g = ((id * 31 + x + y) % 256).toInt
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              y += 1
            }
            x += 1
          }
          (id, encode(img))
        }
      }.toDF("doc_id", "payload")
  }

  /** The REAL image-decode stage: `javax.imageio.ImageIO` PNG decode,
    * partition-by-partition through the typed iterator (identical stage
    * shape to [[decodeMixed]] — a production build swaps the codec,
    * not the plumbing). Features come from the decoded RASTER: width and
    * height from the image header, `sum_gray` = Σ of the red channel over
    * every pixel (the fixture is gray, so red == gray — and a decoder
    * that skipped or mangled pixel data cannot produce the right sum),
    * `px00` = the top-left pixel. PNG is lossless: the values equal the
    * generation formula exactly, which is what lets the DuckDB oracle
    * re-derive them without a decoder. */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        val decode = partitionImageDecoder() // one reader set per task
        batch.map { case (id, bytes) =>
          val img = decode(bytes)
          require(img != null, s"undecodable image payload for doc $id")
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var x = 0
          while (x < w) {
            var y = 0
            while (y < h) {
              sum += (img.getRGB(x, y) & 0xff).toLong
              y += 1
            }
            x += 1
          }
          ImageFeatures(id, w.toLong, h.toLong, sum,
            (img.getRGB(0, 0) & 0xff).toLong)
        }
      }
  }

  /** Deterministic VARIED image fixtures for perceptual-hash testing
    * (round 9): per document one base PNG whose gray value is the
    * XOR-mixed pattern
    *   g(id, x, y) = ((x·(3 + id%7)) XOR (y·(5 + id%11)) + id) mod 256
    * (dimensions from the md5 digits, the [[synthesizeImages]] rule) —
    * XOR mixing gives every id a visually DISTINCT texture, unlike the
    * smooth gradient whose dHash is degenerate-constant — plus, for
    * every id divisible by 10, a PLANTED NEAR-DUPLICATE twin at
    * doc_id + 1000000: the same pattern brightness-shifted by +5 mod
    * 256. dHash compares neighboring averages, so a uniform brightness
    * shift flips only the few bits where the mod wraps — the planted
    * twins are exactly what a perceptual near-dup detector must find. */
  def synthesizeImagesVaried(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // deliberately NOT spread (round 16): the one consumer (dhash
    // near-dup) feeds a 9-band unioned self-join off a localCheckpoint
    // of this stage's output — 32 checkpoint partitions × 9 band legs
    // exploded the join's task count and measured 2.2× SLOWER than the
    // single-split encode (1.1 vs 2.4 norm; adjudicated in BENCH_REF
    // round-16 history).
    docs.select(col("doc_id").cast("long"),
        md5(coalesce(col("text"), lit(""))).as("h"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        val encode = partitionImageEncoder("png") // one writer per task
        batch.flatMap { case (id, hex) =>
          val w = 16 + hexVal(hex.charAt(0))
          val h = 16 + hexVal(hex.charAt(1))
          def png(shift: Int): Array[Byte] = {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) {
                val g = ((((x * (3 + id % 7)) ^ (y * (5 + id % 11))) + id) % 256
                  + shift).toInt % 256
                img.setRGB(x, y, (g << 16) | (g << 8) | g)
                y += 1
              }
              x += 1
            }
            encode(img)
          }
          val base = Seq((id, png(0)))
          if (id % 10 == 0) base :+ ((id + 1000000L, png(5))) else base
        }
      }.toDF("doc_id", "payload")
  }

  /** One perceptual-hash row from a REAL decode. */
  final case class ImageHash(doc_id: Long, width: Long, height: Long,
                             dhash: Long)

  /** Perceptual difference-hash (dHash, Krawetz 2013 — the standard
    * cheap image near-dup fingerprint) over REAL PNG decodes: the
    * decoded raster area-averages onto a 9×8 grid with the INTEGER rule
    * cell(x) = x·9 div w (every step exact — a bilinear resize would not
    * be cross-engine re-derivable), bit (r, c) = [avg(r, c+1) >
    * avg(r, c)] for r < 8, c < 8, packed little-endian at k = r·8 + c
    * with bit 63 dropped — 63 bits, the SimHash63 sign-safety
    * convention. Brightness shifts leave neighbor DIFFERENCES intact,
    * so near-identical images collide — which is the point.
    * Same mapPartitions batch shape as [[decodeImages]]. */
  def dhashImages(spark: SparkSession, media: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        val decode = partitionImageDecoder() // one reader set per task
        batch.map { case (id, bytes) =>
          val img = decode(bytes)
          require(img != null, s"undecodable image payload for doc $id")
          val w = img.getWidth
          val h = img.getHeight
          require(w >= 9 && h >= 8, s"image $id too small for dHash: ${w}x$h")
          val sums = Array.ofDim[Long](8, 9)
          val counts = Array.ofDim[Long](8, 9)
          var x = 0
          while (x < w) {
            val c = x * 9 / w
            var y = 0
            while (y < h) {
              val r = y * 8 / h
              sums(r)(c) += (img.getRGB(x, y) & 0xff).toLong
              counts(r)(c) += 1L
              y += 1
            }
            x += 1
          }
          var bits = 0L
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              val k = r * 8 + c
              if (k < 63 &&
                sums(r)(c + 1) / counts(r)(c + 1) >
                  sums(r)(c) / counts(r)(c))
                bits |= 1L << k
              c += 1
            }
            r += 1
          }
          ImageHash(id, w.toLong, h.toLong, bits)
        }
      }
  }

  /** One REAL-decoded audio row: container header fields plus sample
    * statistics computed from the decoded PCM stream. */
  final case class AudioFeatures(
      doc_id: Long, n_samples: Long, sample_rate: Long, s0: Long,
      sum_abs: Long)

  /** Deterministic WAV fixture source (the audio analogue of
    * [[synthesizeImages]]): per document, a REAL RIFF/WAVE container —
    * 16-bit signed PCM, mono, 8 kHz, little-endian — holding
    * n = 64 + 4·hex₀(md5(text)) samples with
    * s(i) = ((doc_id·31 + i·7) mod 65536) − 32768. Closed-form integer
    * arithmetic an external engine re-derives sample-exactly, while the
    * bytes are a genuine WAV a real decoder must parse. */
  def synthesizeAudio(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        md5(coalesce(col("text"), lit(""))).as("h"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, hex) =>
          val n = 64 + 4 * hexVal(hex.charAt(0))
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = (((id * 31 + i * 7) % 65536) - 32768).toInt
            pcm(2 * i) = (s & 0xff).toByte // little-endian 16-bit
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          (id, out.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** Deterministic VARIED audio fixtures for fingerprint testing
    * (round 9, the audio analogue of [[synthesizeImagesVaried]]): per
    * document one base WAV whose NON-NEGATIVE waveform is an
    * XOR texture shaped by the document's own md5 ENVELOPE,
    *   s(id, i) = (((i·(31 + id mod 13)) XOR (id·7)) mod 32768)
    *              · (1 + hexval(md5[w mod 16])) div 16,  w = i·64 div n
    * (n = 64 + 4·hex₀ samples, the synthesizeAudio container contract;
    * everything non-negative, so integer division is engine-portable
    * truncation) — the md5 staircase gives every document an
    * effectively-random 16-step energy profile, so unrelated
    * fingerprints land far apart; a smooth shared texture measured
    * 178 background collisions at hamming ≤ 2, the md5 envelope ~0.
    * For id mod 10 == 0 a PLANTED twin at doc_id + 1000000 carries the
    * amplitude-scaled copy s' = (s·9) div 10 — the energy PROFILE keeps
    * its shape, exactly what a level-robust fingerprint must match. */
  def synthesizeAudioVaried(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        md5(coalesce(col("text"), lit(""))).as("h"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.flatMap { case (id, hex) =>
          val n = 64 + 4 * hexVal(hex.charAt(0))
          def wav(scale: Boolean): Array[Byte] = {
            val pcm = new Array[Byte](n * 2)
            var i = 0
            while (i < n) {
              val w = i * 64 / n
              val env = 1 + hexVal(hex.charAt(w % 16))
              val base = ((((i * (31 + id % 13)) ^ (id * 7)) % 32768)
                * env / 16).toInt
              val s = if (scale) (base * 9) / 10 else base
              pcm(2 * i) = (s & 0xff).toByte
              pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
              i += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(
              8000f, 16, 1, true, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
            val out = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
            out.toByteArray
          }
          val rows = Seq((id, wav(false)))
          if (id % 10 == 0) rows :+ ((id + 1000000L, wav(true))) else rows
        }
      }.toDF("doc_id", "payload")
  }

  /** One audio fingerprint from a REAL decode. */
  final case class AudioHash(doc_id: Long, n_samples: Long, ahash: Long)

  /** Audio energy-profile fingerprint (round 9) — the audio member of
    * the near-dup family (text SimHash, image dHash, THIS): decoded PCM
    * partitions into 64 windows by the integer rule
    * window(i) = i·64 div n, each window's mean |s| is an exact integer
    * (Σ|s| div count), and bit j compares adjacent window energies
    * (e(j+1) > e(j)), packed at k = j with bit 63 dropped — 63 bits,
    * level-robust by construction (a volume change scales every window
    * together, leaving comparisons intact except at truncation ties).
    * Same decode plumbing as [[decodeAudio]]. */
  def audioFingerprints(spark: SparkSession,
                        media: DataFrame): Dataset[AudioHash] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian, s"unexpected WAV format for doc $id: $fmt")
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          require(n >= 64, s"audio $id too short for 64 windows: $n")
          val sums = new Array[Long](64)
          val counts = new Array[Long](64)
          var i = 0
          while (i < n) {
            val s = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toLong
            val w = (i * 64) / n
            sums(w) += math.abs(s)
            counts(w) += 1L
            i += 1
          }
          var bits = 0L
          var j = 0
          while (j < 63) {
            if (sums(j + 1) / counts(j + 1) > sums(j) / counts(j))
              bits |= 1L << j
            j += 1
          }
          AudioHash(id, n.toLong, bits)
        }
      }
  }

  /** The REAL audio-decode stage: `javax.sound.sampled` WAV parse,
    * partition-by-partition through the typed iterator (identical stage
    * shape to [[decodeImages]] — production swaps the codec, not the
    * plumbing). Header fields (frame length, sample rate) come from the
    * parsed container; `s0`/`sum_abs` come from the decoded PCM frames —
    * a decoder that mangled even one sample breaks `sum_abs`. PCM is
    * lossless, so the DuckDB oracle re-derives every value from the
    * generation formula without a decoder. */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian,
            s"unexpected audio format for doc $id: $fmt")
          val n = ais.getFrameLength.toInt
          val buf = ais.readAllBytes()
          require(buf.length == n * 2,
            s"doc $id: expected ${n * 2} PCM bytes, decoded ${buf.length}")
          var i = 0
          var sumAbs = 0L
          var s0 = 0L
          while (i < n) {
            val s = (buf(2 * i + 1).toInt << 8) | (buf(2 * i) & 0xff)
            if (i == 0) s0 = s.toLong
            sumAbs += math.abs(s.toLong)
            i += 1
          }
          AudioFeatures(id, n.toLong, fmt.getSampleRate.toLong, s0, sumAbs)
        }
      }
  }

  /** One REAL-decoded video row: frame count from the container
    * directory, dimensions from the first frame, pixel aggregates over
    * EVERY decoded frame. */
  final case class VideoFeatures(
      doc_id: Long, n_frames: Long, width: Long, height: Long,
      sum_gray: Long, px000: Long)

  /** Deterministic multi-frame fixture source (the video analogue of
    * [[synthesizeImages]]): per document, a REAL animated GIF —
    * F = 2 + hex₀(md5(text)) frames of W×H = (8+hex₁)×(8+hex₂) grayscale
    * pixels with gray(f, x, y) = (doc_id·31 + x + y + 7·f) mod 256 —
    * written frame-by-frame through `javax.imageio`'s GIF sequence
    * writer. Frames use an explicit 256-gray indexed palette, so the GIF
    * encoding is LOSSLESS and an external engine re-derives every pixel
    * from the formula while the bytes remain a genuine multi-frame
    * container a real reader must walk. */
  def synthesizeVideos(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    Dedup.spread(docs.select(col("doc_id").cast("long"),
        md5(coalesce(col("text"), lit(""))).as("h")))
      .as[(Long, String)]
      .mapPartitions { batch =>
        // 256-entry grayscale palette: index i ↦ (i, i, i) — shared per
        // partition, the codec-context-amortization the iterator buys
        val grays = Array.tabulate(256)(_.toByte)
        val icm = new java.awt.image.IndexColorModel(
          8, 256, grays, grays, grays)
        // ONE GIF writer per partition + direct memory-cache streams
        // (round 15): the per-row writer lookup is a synchronized
        // registry scan, and createImageOutputStream may add a
        // temp-FILE cache per call
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        batch.map { case (id, hex) =>
          val f = 2 + hexVal(hex.charAt(0))
          val w = 8 + hexVal(hex.charAt(1))
          val h = 8 + hexVal(hex.charAt(2))
          val out = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var fi = 0
          while (fi < f) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) {
                val g = ((id * 31 + x + y + 7L * fi) % 256).toInt
                img.setRGB(x, y, (g << 16) | (g << 8) | g)
                y += 1
              }
              x += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            fi += 1
          }
          writer.endWriteSequence()
          // no dispose: the writer is shared across the partition's rows
          // (dispose leaves 'any other method' undefined per ImageWriter)
          ios.close()
          (id, out.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** The REAL video-decode stage: a multi-frame `javax.imageio` GIF read,
    * partition-by-partition (identical stage shape to [[decodeImages]] —
    * production swaps in an H.264/VP9 codec, not new plumbing).
    * `n_frames` comes from the container's image directory
    * (`getNumImages(allowSearch = true)` — a reader that misparsed the
    * frame structure gets it wrong), `sum_gray` sums the red channel over
    * EVERY pixel of EVERY decoded frame, `px000` is frame 0's top-left
    * pixel. The fixture's indexed-palette GIF decodes losslessly, so the
    * DuckDB oracle re-derives all of it from the generation formula. */
  def decodeVideos(spark: SparkSession, media: DataFrame): Dataset[VideoFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // ONE GIF reader per partition + direct memory-cache input
        // (round 15; see decodeMjpegMp4's amortization note)
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        batch.map { case (id, bytes) =>
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis, false)
          val n = reader.getNumImages(true)
          require(n >= 1, s"no frames decoded for doc $id")
          var sum = 0L
          var px000 = 0L
          var w = 0L
          var h = 0L
          var fi = 0
          while (fi < n) {
            val img = reader.read(fi)
            if (fi == 0) {
              w = img.getWidth.toLong
              h = img.getHeight.toLong
              px000 = (img.getRGB(0, 0) & 0xff).toLong
            }
            var x = 0
            while (x < img.getWidth) {
              var y = 0
              while (y < img.getHeight) {
                sum += (img.getRGB(x, y) & 0xff).toLong
                y += 1
              }
              x += 1
            }
            fi += 1
          }
          // no dispose: the reader is shared across the partition's rows
          iis.close()
          VideoFeatures(id, n.toLong, w, h, sum, px000)
        }
      }
  }

  /** Frame sampling over REAL decoded frame counts: up to `k`
    * evenly-spaced indices (i·n_frames / k, deduplicated) per video —
    * [[sampleFrames]]'s arithmetic fed by [[decodeVideos]]' container-
    * derived `n_frames` instead of the fake's. Runs after payload
    * projection: only (doc_id, frame_idx) rows fan out. */
  def sampleVideoFrames(spark: SparkSession, videos: Dataset[VideoFeatures],
                        k: Int): Dataset[FrameRef] = {
    import spark.implicits._
    videos.mapPartitions { batch =>
      batch.flatMap { v =>
        val idx = (0 until k).map(i => i.toLong * v.n_frames / k).distinct
        idx.iterator.map(FrameRef(v.doc_id, _, v.n_frames))
      }
    }
  }

  /** Container-metadata-only video row. */
  final case class VideoMeta(doc_id: Long, n_frames: Long)

  /** HEADER probe (round 9): frame count from the container's image
    * directory WITHOUT decoding a single raster —
    * `getNumImages(allowSearch = true)` walks the GIF block structure
    * (skipping LZW image data), so the probe costs container parsing,
    * not pixel decompression. This is the production shape for every
    * stage that needs media METADATA (frame sampling plans, duration
    * filters, shape-based routing): at 100 TB, decoding rasters to learn
    * a frame count would burn the pipeline's entire CPU budget on pixels
    * nobody reads. Same per-partition iterator shape as [[decodeVideos]]
    * — a production probe swaps in an MP4 moov-box parse, not new
    * plumbing. Still a REAL parse of real container bytes: a payload
    * with a mangled frame directory fails loud here, identically to the
    * full decode. */
  def probeVideoFrames(spark: SparkSession,
                       media: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // ONE GIF reader per partition (round 15) — dispose would kill
        // the shared instance; closing the per-row stream suffices
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        batch.map { case (id, bytes) =>
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis, false)
          val n = reader.getNumImages(true)
          require(n >= 1, s"no frames in container for doc $id")
          iis.close()
          VideoMeta(id, n.toLong)
        }
      }
  }

  /** [[sampleVideoFrames]]'s arithmetic over the HEADER probe instead of
    * the full decode — the pair a real sampling pipeline runs (probe
    * counts, pick indices, then decode ONLY the chosen frames). */
  def sampleProbedFrames(spark: SparkSession, meta: Dataset[VideoMeta],
                         k: Int): Dataset[FrameRef] = {
    import spark.implicits._
    meta.mapPartitions { batch =>
      batch.flatMap { v =>
        val idx = (0 until k).map(i => i.toLong * v.n_frames / k).distinct
        idx.iterator.map(FrameRef(v.doc_id, _, v.n_frames))
      }
    }
  }

  /** Parsed ISO-BMFF container header fields — everything a metadata
    * pipeline extracts WITHOUT a codec. */
  final case class Mp4Meta(doc_id: Long, major_brand: String,
                           timescale: Long, duration: Long,
                           duration_ms: Long, width: Long, height: Long,
                           track_id: Long, n_top_boxes: Long)

  /** Synthesize a REAL (minimal, spec-conformant) ISO-BMFF/MP4
    * container per document — the mm_* md5 fixture convention, so a
    * DuckDB oracle re-derives every parsed field from `documents`
    * alone. Box layout: `ftyp` (major 'isom', compat isom/mp42) +
    * optional `free` padding box (md5 char 6 even — exercises the
    * probe's box WALK, not just fixed offsets) + `moov{mvhd, trak
    * {tkhd}}`. Field formulas over md5(text) hex chars 1-5 (secs =
    * 1+c1, timescale = 600·(1+c2), duration = secs·timescale, width =
    * 16+c3, height = 16+c4, track_id = 1+(c5 mod 4)). No codec exists
    * for the (empty) media data — exactly the point: header metadata
    * extraction at corpus scale must not need one (the
    * probeVideoFrames contract, for the container format production
    * actually ships). */
  def synthesizeMp4(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    Dedup.spread(docs.select(col("doc_id").cast("long"),
        md5(coalesce(col("text"), lit(""))).as("h")))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, hex) =>
          val secs = 1L + hexVal(hex.charAt(0))
          val timescale = 600L * (1 + hexVal(hex.charAt(1)))
          val duration = secs * timescale
          val w = 16L + hexVal(hex.charAt(2))
          val h = 16L + hexVal(hex.charAt(3))
          val trackId = 1L + hexVal(hex.charAt(4)) % 4
          val withFree = hexVal(hex.charAt(5)) % 2 == 0
          def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
            val b = java.nio.ByteBuffer.allocate(8 + payload.length)
            b.putInt(8 + payload.length)
            b.put(tpe.getBytes("US-ASCII")) // 4 ASCII chars by contract
            b.put(payload)
            b.array()
          }
          val ftyp = box("ftyp", {
            val b = java.nio.ByteBuffer.allocate(16)
            b.put("isom".getBytes("US-ASCII")).putInt(0)
            b.put("isom".getBytes("US-ASCII"))
            b.put("mp42".getBytes("US-ASCII"))
            b.array()
          })
          val mvhd = box("mvhd", {
            val b = java.nio.ByteBuffer.allocate(100)
            b.putInt(0)                      // version 0 + flags
            b.putInt(0).putInt(0)            // creation, modification
            b.putInt(timescale.toInt)
            b.putInt(duration.toInt)
            b.putInt(0x00010000)             // rate 1.0
            b.putShort(0x0100.toShort)       // volume 1.0
            b.position(b.position() + 10)    // reserved
            Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
              .foreach(b.putInt)             // unity matrix
            b.position(b.position() + 24)    // pre_defined
            b.putInt(trackId.toInt + 1)      // next_track_ID
            b.array()
          })
          val tkhd = box("tkhd", {
            val b = java.nio.ByteBuffer.allocate(84)
            b.putInt(0x000007)               // v0 + enabled|in_movie|in_preview
            b.putInt(0).putInt(0)            // creation, modification
            b.putInt(trackId.toInt)
            b.putInt(0)                      // reserved
            b.putInt(duration.toInt)
            b.position(b.position() + 8)     // reserved
            b.putShort(0).putShort(0)        // layer, alternate_group
            b.putShort(0).putShort(0)        // volume (video: 0), reserved
            Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
              .foreach(b.putInt)
            b.putInt((w << 16).toInt)        // width, 16.16 fixed
            b.putInt((h << 16).toInt)        // height
            b.array()
          })
          val moov = box("moov", mvhd ++ box("trak", tkhd))
          val payload =
            if (withFree) ftyp ++ box("free", new Array[Byte](12)) ++ moov
            else ftyp ++ moov
          (id, "video/mp4", payload)
        }
      }.toDF("doc_id", "media_type", "payload")
  }

  /** REAL ISO-BMFF header parse — pure JDK byte walking, zero codec:
    * top-level boxes are walked by their (32-bit size, 4CC type)
    * headers, `moov`/`trak` are descended as containers, and the
    * version-0 `mvhd`/`tkhd` field layouts yield timescale, duration,
    * track id and the 16.16 fixed-point track dimensions.
    * `duration_ms` is the exact integer 1000·duration/timescale
    * (floor — duration is a timescale multiple in the fixtures, so no
    * rounding actually occurs). Corrupt containers (truncated box,
    * missing ftyp/moov/mvhd/tkhd, 64-bit largesize) fail LOUD with the
    * doc id — the probeVideoFrames contract.
    *
    * Scale shape: embarrassingly parallel map over payload bytes, no
    * shuffle; a production variant reads ONLY the first bytes of each
    * object via a ranged GET — the parse below never touches media
    * data (the synthesized containers simply have none). */
  def probeMp4(spark: SparkSession, media: DataFrame): Dataset[Mp4Meta] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
          def fourcc(): String = {
            val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
          }
          var majorBrand: String = null
          var timescale = -1L; var duration = -1L
          var width = -1L; var height = -1L; var trackId = -1L
          var topBoxes = 0L
          def walk(end: Int, depth: Int): Unit = {
            while (bb.position() < end) {
              require(end - bb.position() >= 8,
                s"doc $id: truncated box header at ${bb.position()}")
              val start = bb.position()
              val size = bb.getInt()
              val tpe = fourcc()
              require(size >= 8 && start + size <= end,
                s"doc $id: box '$tpe' size $size overruns container " +
                  s"(${end - start} bytes left; 64-bit largesize " +
                  "unsupported by this probe)")
              if (depth == 0) topBoxes += 1
              tpe match {
                case "ftyp" => majorBrand = fourcc()
                case "moov" | "trak" => walk(start + size, depth + 1)
                case "mvhd" =>
                  bb.getInt() // version+flags (v0 by fixture contract)
                  bb.getInt(); bb.getInt() // creation, modification
                  timescale = bb.getInt().toLong & 0xffffffffL
                  duration = bb.getInt().toLong & 0xffffffffL
                case "tkhd" =>
                  bb.getInt(); bb.getInt(); bb.getInt()
                  trackId = bb.getInt().toLong & 0xffffffffL
                  // width/height sit at the tkhd tail: last 8 bytes
                  bb.position(start + size - 8)
                  width = (bb.getInt().toLong & 0xffffffffL) >> 16
                  height = (bb.getInt().toLong & 0xffffffffL) >> 16
                case _ => // free/mdat/...: skip
              }
              bb.position(start + size)
            }
          }
          walk(bytes.length, 0)
          require(majorBrand != null, s"doc $id: no ftyp box — not ISO-BMFF")
          require(timescale > 0 && duration >= 0,
            s"doc $id: no mvhd box in moov")
          require(width >= 0 && trackId >= 0, s"doc $id: no tkhd box")
          Mp4Meta(id, majorBrand, timescale, duration,
            1000L * duration / timescale, width, height, trackId, topBoxes)
        }
      }
  }

  /** Synthesize a REAL MJPEG-shaped MP4 per document (round 13 — the
    * fixture that retires the last decode stub): JPEG frames inside a
    * spec-conformant ISO-BMFF container with a genuine SAMPLE TABLE.
    * Box layout: `ftyp` + `moov{mvhd, trak{tkhd, mdia{minf{stbl{stsz,
    * stco}}}}}` + `mdat` holding F concatenated REAL ImageIO-encoded
    * JPEG frames; `stsz` carries each frame's byte size, `stco` the
    * absolute file offset of each sample (one sample per chunk). Frame
    * content is the [[synthesizeVideos]] gradient at image-row dims —
    * F = 2 + hex₀, W = 16 + hex₁, H = 16 + hex₂ over md5(text), gray
    * (f, x, y) = (doc_id·31 + x + y + 7·f) mod 256 — so an external
    * engine re-derives frame count, dimensions, and expected per-frame
    * sums from `documents` alone, while the bytes demand a real
    * container walk AND a real (lossy) codec per frame. */
  def synthesizeMjpegMp4(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    Dedup.spread(docs.select(col("doc_id").cast("long"),
        md5(coalesce(col("text"), lit(""))).as("h")))
      .as[(Long, String)]
      .mapPartitions { batch =>
        // ONE JPEG encoder per partition (the codec-context amortization
        // the iterator shape exists for): writer lookup + instantiation
        // per frame measured ~35% of this stage's cost
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpg").next()
        batch.map { case (id, hex) =>
          val f = 2 + hexVal(hex.charAt(0))
          val w = 16 + hexVal(hex.charAt(1))
          val h = 16 + hexVal(hex.charAt(2))
          val frames: Array[Array[Byte]] = Array.tabulate(f) { fi =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) {
                val g = ((id * 31 + x + y + 7L * fi) % 256).toInt
                img.setRGB(x, y, (g << 16) | (g << 8) | g)
                y += 1
              }
              x += 1
            }
            val out = new java.io.ByteArrayOutputStream()
            // direct memory-cache stream (round 15):
            // createImageOutputStream may add a temp-FILE cache PER
            // FRAME — real disk I/O in the hot loop
            val ios =
              new javax.imageio.stream.MemoryCacheImageOutputStream(out)
            writer.setOutput(ios)
            writer.write(img)
            ios.close()
            out.toByteArray
          }
          def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
            val b = java.nio.ByteBuffer.allocate(8 + payload.length)
            b.putInt(8 + payload.length)
            b.put(tpe.getBytes("US-ASCII"))
            b.put(payload)
            b.array()
          }
          val ftyp = box("ftyp", {
            val b = java.nio.ByteBuffer.allocate(16)
            b.put("isom".getBytes("US-ASCII")).putInt(0)
            b.put("isom".getBytes("US-ASCII"))
            b.put("mp42".getBytes("US-ASCII"))
            b.array()
          })
          val timescale = 600
          val mvhd = box("mvhd", {
            val b = java.nio.ByteBuffer.allocate(100)
            b.putInt(0).putInt(0).putInt(0)
            b.putInt(timescale)
            b.putInt(f * timescale) // 1 fps
            b.putInt(0x00010000).putShort(0x0100.toShort)
            b.position(b.position() + 10)
            Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
              .foreach(b.putInt)
            b.position(b.position() + 24)
            b.putInt(2)
            b.array()
          })
          val tkhd = box("tkhd", {
            val b = java.nio.ByteBuffer.allocate(84)
            b.putInt(0x000007).putInt(0).putInt(0)
            b.putInt(1).putInt(0)
            b.putInt(f * timescale)
            b.position(b.position() + 8)
            b.putShort(0).putShort(0).putShort(0).putShort(0)
            Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
              .foreach(b.putInt)
            b.putInt(w << 16).putInt(h << 16)
            b.array()
          })
          // sample-table sizes are arithmetic in F, so the absolute
          // mdat offsets are computable before any box is materialized
          val stszLen = 8 + 12 + 4 * f
          val stcoLen = 8 + 8 + 4 * f
          val stblLen = 8 + stszLen + stcoLen
          val minfLen = 8 + stblLen
          val mdiaLen = 8 + minfLen
          val trakLen = 8 + (8 + 84) + mdiaLen
          val moovLen = 8 + (8 + 100) + trakLen
          val dataStart = ftyp.length + moovLen + 8 // + mdat header
          val stsz = box("stsz", {
            val b = java.nio.ByteBuffer.allocate(12 + 4 * f)
            b.putInt(0)       // version + flags
            b.putInt(0)       // sample_size 0 = per-sample table follows
            b.putInt(f)
            frames.foreach(fr => b.putInt(fr.length))
            b.array()
          })
          val stco = box("stco", {
            val b = java.nio.ByteBuffer.allocate(8 + 4 * f)
            b.putInt(0)
            b.putInt(f)
            var off = dataStart
            frames.foreach { fr => b.putInt(off); off += fr.length }
            b.array()
          })
          val moov = box("moov", mvhd ++
            box("trak", tkhd ++
              box("mdia", box("minf", box("stbl", stsz ++ stco)))))
          require(moov.length == moovLen,
            s"doc $id: moov layout drifted (${moov.length} != $moovLen)")
          val payload = ftyp ++ moov ++ box("mdat", frames.flatten)
          (id, "video/mp4", payload)
        }
      }.toDF("doc_id", "media_type", "payload")
  }

  /** One REAL MJPEG-in-MP4 decode row: frame count and dimensions from
    * the container (cross-checked against every decoded raster), plus
    * the per-frame mean-deviation verdict vs the generation formula. */
  final case class MjpegFeatures(
      doc_id: Long, n_frames: Long, width: Long, height: Long,
      mean_dev_ok: Boolean)

  /** The REAL video decode, production container shape (round 13):
    * walk the ISO-BMFF box tree to the sample table (stsz sizes + stco
    * offsets under moov/trak/mdia/minf/stbl), slice every sample out of
    * the payload, and run a REAL JPEG decode on each — genuine
    * container-parse → per-frame codec decode, the MJPEG pipeline. The
    * JPEG codec is lossy, so the contract pins invariants, not pixels
    * (the mm_image_decode_jpeg lesson): frame count and dimensions are
    * exact (container fields, required to match every decoded raster),
    * while EVERY frame's raster must land within a 3-gray-level mean
    * deviation of the generation formula — `mean_dev_ok` is the AND
    * over frames, so one mangled frame flips the row. Corrupt
    * containers (missing/truncated sample table, oversized sample,
    * undecodable frame) fail LOUD with the doc id. Same
    * embarrassingly-parallel mapPartitions shape as [[decodeImages]];
    * production swaps ImageIO for a hardware codec, nothing else. */
  def decodeMjpegMp4(spark: SparkSession, media: DataFrame): Dataset[MjpegFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // ONE JPEG decoder per partition (mirror of the encoder-side
        // amortization): ImageIO.read's per-call reader lookup was a
        // measured hot spot at ~10 frames/doc
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("jpeg").next()
        batch.map { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
          def fourcc(): String = {
            val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
          }
          var trackW = -1L; var trackH = -1L
          var sizes: Array[Int] = null
          var offsets: Array[Int] = null
          def walk(end: Int): Unit = {
            while (bb.position() < end) {
              require(end - bb.position() >= 8,
                s"doc $id: truncated box header at ${bb.position()}")
              val start = bb.position()
              val size = bb.getInt()
              val tpe = fourcc()
              require(size >= 8 && start + size <= end,
                s"doc $id: box '$tpe' size $size overruns container")
              tpe match {
                case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
                  walk(start + size)
                case "tkhd" =>
                  bb.position(start + size - 8)
                  trackW = (bb.getInt().toLong & 0xffffffffL) >> 16
                  trackH = (bb.getInt().toLong & 0xffffffffL) >> 16
                case "stsz" =>
                  bb.getInt() // version + flags
                  require(bb.getInt() == 0,
                    s"doc $id: fixed-sample-size stsz unsupported")
                  val n = bb.getInt()
                  sizes = Array.fill(n)(bb.getInt())
                case "stco" =>
                  bb.getInt()
                  val n = bb.getInt()
                  offsets = Array.fill(n)(bb.getInt())
                case _ => // ftyp/mvhd/mdat/...: skip
              }
              bb.position(start + size)
            }
          }
          walk(bytes.length)
          require(sizes != null && offsets != null,
            s"doc $id: no sample table (stsz/stco) in container")
          require(sizes.length == offsets.length && sizes.nonEmpty,
            s"doc $id: stsz/stco disagree " +
              s"(${sizes.length} vs ${offsets.length})")
          require(trackW > 0 && trackH > 0, s"doc $id: no tkhd box")
          var allOk = true
          var fi = 0
          while (fi < sizes.length) {
            val off = offsets(fi); val len = sizes(fi)
            require(off >= 0 && len > 0 && off + len <= bytes.length,
              s"doc $id: sample $fi [$off, ${off + len}) outside payload")
            // direct memory-cache stream (round 15): the registry
            // form may spin a temp-FILE cache PER FRAME
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(bytes, off, len))
            reader.setInput(iis, true, true)
            val img =
              try reader.read(0)
              catch {
                case e: Exception => throw new IllegalArgumentException(
                  s"doc $id: undecodable JPEG sample $fi", e)
              } finally iis.close()
            require(img != null, s"doc $id: undecodable JPEG sample $fi")
            val w = img.getWidth; val h = img.getHeight
            require(w == trackW && h == trackH,
              s"doc $id: sample $fi is ${w}x$h, track says ${trackW}x$trackH")
            // observed sum: the blue band read straight off the backing
            // byte buffer when the raster is the JPEG reader's standard
            // interleaved-byte sRGB layout — bit-identical to
            // (getRGB & 0xff) (sRGB ColorModel packs samples verbatim)
            // without getRGB's per-pixel getDataElements allocation +
            // pack/convert, the measured hot spot of this row. Anything
            // exotic falls back to the exact per-pixel form.
            // (Round 14 note: destination-raster reuse via
            // ImageReadParam.setDestination was tried TWICE and rejected
            // on same-box A/B — with getImageTypes(0) per frame it was
            // 60% slower, and even reusing the first decoded frame per
            // (w,h) as destination with zero type queries measured ~9%
            // slower than the plain allocating read: the reader's
            // destination-validation path costs more than the raster
            // allocation it avoids, and the sf1 ratio was unchanged at
            // 11.2x either way — the residual super-linearity is GC/JIT
            // noise on an embarrassingly parallel, shuffle-free row.)
            val raster = img.getRaster
            val cm = img.getColorModel
            var got = 0L
            (raster.getSampleModel, raster.getDataBuffer) match {
              case (p: java.awt.image.PixelInterleavedSampleModel,
                    db: java.awt.image.DataBufferByte)
                if cm.getNumComponents == 3 && !cm.hasAlpha &&
                   cm.getColorSpace.isCS_sRGB &&
                   raster.getNumBands == 3 && db.getOffset == 0 &&
                   raster.getSampleModelTranslateX == 0 &&
                   raster.getSampleModelTranslateY == 0 =>
                val data = db.getData
                val scan = p.getScanlineStride
                val ps = p.getPixelStride
                val blueOff = p.getBandOffsets()(2) // band 2 = blue
                var y = 0
                while (y < h) {
                  var idx = y * scan + blueOff
                  var x = 0
                  while (x < w) { got += data(idx) & 0xff; idx += ps; x += 1 }
                  y += 1
                }
              case _ =>
                var x = 0
                while (x < w) {
                  var y = 0
                  while (y < h) {
                    got += (img.getRGB(x, y) & 0xff).toLong; y += 1
                  }
                  x += 1
                }
            }
            // expected sum in O(w+h): gray(f,x,y) depends on (x,y) only
            // through s = x+y, and #{(x,y): x+y=s} is the triangular
            // overlap count — exact integer identity with the per-pixel
            // form sum((id*31 + x + y + 7*fi) mod 256)
            val base = (id * 31 + 7L * fi) % 256
            var exp = 0L
            var s2 = 0
            val smax = w + h - 2
            while (s2 <= smax) {
              val cnt = math.min(math.min(s2, w - 1),
                math.min(h - 1, smax - s2)) + 1
              exp += cnt * ((base + s2) % 256)
              s2 += 1
            }
            if (math.abs(got - exp).toDouble / (trackW * trackH) > 3.0)
              allOk = false
            fi += 1
          }
          MjpegFeatures(id, sizes.length.toLong, trackW, trackH, allOk)
        }
      }
  }

  // ------------------------------------------------------------------
  // Cross-modal alignment gate (the LAION §3 filter shape: keep an
  // (image, caption) pair only when the two modalities agree). The
  // encoder here is the sanctioned deterministic stand-in — image
  // features are EXACT quadrant gray sums of the REAL decoded raster
  // (a broken decoder cannot produce them), caption features are the
  // parsed integer profile the caption claims — while the Spark-side
  // plumbing is the production shape end to end: binary decode stage →
  // per-modality feature projection → doc-keyed equi-join → one
  // integer-exact similarity gate.

  /** Synthesize an (image, caption) pair per document — the mm_* md5
    * fixture convention, so a DuckDB oracle re-derives BOTH modalities
    * from `documents` alone. The image is the [[synthesizeImages]] PNG
    * (g(x,y) = (id·31+x+y) mod 256, w/h from md5 chars 1-2). The caption
    * textually claims a quadrant brightness profile: md5 char 3 even →
    * the TRUE profile (an aligned pair); odd → a decoy drawn from md5
    * chars 5-8 (a mismatched pair — the class the gate exists to drop).
    * Quadrant id = (2x ≥ w) + 2·(2y ≥ h). */
  def synthesizeCaptionedImages(spark: SparkSession,
                                docs: DataFrame): DataFrame = {
    import spark.implicits._
    Dedup.spread(docs.select(col("doc_id").cast("long"),
        md5(coalesce(col("text"), lit(""))).as("h")))
      .as[(Long, String)]
      .mapPartitions { batch =>
        val encode = partitionImageEncoder("png") // one writer per task
        batch.map { case (id, hex) =>
          val w = 16 + hexVal(hex.charAt(0))
          val h = 16 + hexVal(hex.charAt(1))
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val q = Array.ofDim[Long](4)
          var x = 0
          while (x < w) {
            var y = 0
            while (y < h) {
              val g = ((id * 31 + x + y) % 256).toInt
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              q((if (2 * x >= w) 1 else 0) + (if (2 * y >= h) 2 else 0)) += g
              y += 1
            }
            x += 1
          }
          val payload = encode(img)
          val caption =
            if (hexVal(hex.charAt(2)) % 2 == 0) q.mkString(" ")
            else (0 until 4).map(i => 1L + hexVal(hex.charAt(4 + i)))
              .mkString(" ")
          (id, payload, caption)
        }
      }.toDF("doc_id", "payload", "caption")
  }

  /** The gate itself: REAL PNG decode → exact quadrant sums of the
    * raster; caption → parsed integer profile; verdict = centered
    * cosine ≥ 9/10, decided ENTIRELY in DECIMAL(38) integer
    * cross-multiplication (dot > 0 ∧ 100·dot² ≥ 81·|a|²·|b|²; two flat
    * profiles — both zero after centering — align by convention).
    * Centering (aᵢ = 4qᵢ − Σq) is what makes cosine discriminative
    * here: raw all-positive profiles concentrate near the diagonal and
    * would wave almost any decoy through.
    *
    * Scale shape: decode is the embarrassingly-parallel typed stage
    * (per-row codec cost, zero shuffle — the dhashImages contract); the
    * caption projection is scan-speed; the join is doc-keyed; the gate
    * is one stateless projection. Output carries both profiles and the
    * verdict as data.
    *
    * Integer-headroom contract (round 12 — the gate must ERROR, never
    * silently NULL, past its arithmetic budget): with |centered
    * profile| ≤ 255·w·h on both sides, the DECIMAL(38,0) gate needs
    * 1600·(255·w·h)⁴ < 10³⁸ and the exported LONG dot needs
    * 4·(255·w·h)² < 2⁶³ — the binding one is the DECIMAL gate, giving
    * w·h ≤ 1.96e6. `maxPixels` (default 1,900,000 — just under that
    * budget) is enforced LOUDLY at decode, and caption profiles are
    * range-checked IN-PLAN (raise_error past 255·maxPixels): a caption
    * claiming magnitudes no image under the pixel budget could produce
    * is a contract breach, not a row to wave through with NULL
    * arithmetic. */
  def alignmentGate(spark: SparkSession, media: DataFrame,
                    maxPixels: Long = 1900000L): DataFrame = {
    require(maxPixels >= 1 && maxPixels <= 1900000L,
      s"maxPixels must be in [1, 1900000] (the DECIMAL(38) gate budget: " +
        s"1600*(255*px)^4 < 1e38), got $maxPixels")
    import spark.implicits._
    // The caption RIDES THROUGH the typed decode stage, so the whole
    // gate is ONE stateless pass — no self-join of the media frame
    // (which would be a shuffle in batch and an illegal stream-stream
    // join on an unbounded source): decode → projection, legal in any
    // streaming output mode with zero state.
    val feats = media.select(col("doc_id").cast("long"), col("payload"),
        col("caption"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { batch =>
        val decode = partitionImageDecoder() // one reader set per task
        batch.map { case (id, bytes, caption) =>
          val img = decode(bytes)
          require(img != null, s"undecodable image payload for doc $id")
          val w = img.getWidth
          val h = img.getHeight
          require(w.toLong * h <= maxPixels,
            s"doc $id: ${w}x$h = ${w.toLong * h} pixels exceeds " +
              s"maxPixels=$maxPixels — past this budget the DECIMAL(38) " +
              "alignment gate would overflow to NULL verdicts (ANSI " +
              "off); downscale upstream or split the raster")
          val q = Array.ofDim[Long](4)
          var x = 0
          while (x < w) {
            var y = 0
            while (y < h) {
              q((if (2 * x >= w) 1 else 0) + (if (2 * y >= h) 2 else 0)) +=
                (img.getRGB(x, y) & 0xff).toLong
              y += 1
            }
            x += 1
          }
          (id, q.toSeq, caption)
        }
      }.toDF("doc_id", "img_q", "caption")
    def centered(c: String, i: Int): Column =
      expr(s"CAST(4 * element_at($c, ${i + 1}) - " +
        s"(element_at($c, 1) + element_at($c, 2) + element_at($c, 3) + " +
        s"element_at($c, 4)) AS DECIMAL(38, 0))")
    val capBound = 255L * maxPixels
    val withDot = feats
      .withColumn("cap_q",
        expr("transform(split(caption, ' '), s -> CAST(s AS BIGINT))"))
      // caption profiles past the pixel budget's brightness ceiling
      // would overflow the same DECIMAL(38) gate from the OTHER side —
      // fail loud in-plan, never NULL through
      .withColumn("cap_q", when(
        expr(s"exists(cap_q, v -> v IS NULL OR abs(v) > ${capBound}L)"),
        expr(s"raise_error(concat('caption profile for doc ', doc_id, " +
          s"' is unparseable or exceeds the 255*maxPixels=$capBound " +
          "magnitude budget of the DECIMAL(38) alignment gate'))")
          .cast("array<bigint>"))
        .otherwise(col("cap_q")))
      .withColumn("dot", (0 until 4).map(i =>
        centered("img_q", i) * centered("cap_q", i)).reduce(_ + _))
      .withColumn("na2", (0 until 4).map(i =>
        centered("img_q", i) * centered("img_q", i)).reduce(_ + _))
      .withColumn("nb2", (0 until 4).map(i =>
        centered("cap_q", i) * centered("cap_q", i)).reduce(_ + _))
    val flat = (0 until 4).map(i =>
      expr(s"element_at(img_q, ${i + 1})").as(s"q$i")) ++
      (0 until 4).map(i =>
        expr(s"element_at(cap_q, ${i + 1})").as(s"c$i"))
    withDot.select(col("doc_id") +: flat :+
      col("dot").cast("long").as("dot") :+
      ((col("na2") === 0 && col("nb2") === 0) ||
        (col("dot") > 0 &&
          lit(100) * col("dot") * col("dot") >=
            lit(81) * col("na2") * col("nb2"))).as("aligned"): _*)
  }
}
