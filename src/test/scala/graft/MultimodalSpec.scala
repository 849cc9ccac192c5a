package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Real-codec multimodal decode stages: every value must round-trip the
  * actual container format bit-exactly against the fixtures' closed-form
  * generation formulas (PNG / indexed GIF / PCM are lossless). */
class MultimodalSpec extends SparkSpecBase {

  private def docs = {
    import spark.implicits._
    Seq((0L, "alpha"), (1L, "bravo"), (2L, "charlie delta"),
      (7L, "the quick brown fox"), (41L, "zz"))
      .toDF("doc_id", "text")
  }

  test("video: animated-GIF fixtures decode to the exact frame count and per-frame pixel sums of the generation formula") {
    val feats = Multimodal.decodeVideos(spark,
      Multimodal.synthesizeVideos(spark, docs))
      .collect().map(v => v.doc_id -> v).toMap
    // driver reference: hex digits of md5(text) drive F/W/H, pixels are
    // (id*31 + x + y + 7f) mod 256 — re-derived with java's own MD5
    def hexVal(c: Char): Int = "0123456789abcdef".indexOf(c)
    val texts = Map(0L -> "alpha", 1L -> "bravo", 2L -> "charlie delta",
      7L -> "the quick brown fox", 41L -> "zz")
    assert(feats.keySet === texts.keySet)
    for ((id, text) <- texts) {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val f = 2 + hexVal(hex.charAt(0))
      val w = 8 + hexVal(hex.charAt(1))
      val h = 8 + hexVal(hex.charAt(2))
      val sum = (for (fi <- 0 until f; x <- 0 until w; y <- 0 until h)
        yield (id * 31 + x + y + 7L * fi) % 256).sum
      val v = feats(id)
      assert(v.n_frames === f.toLong, s"doc $id frame count")
      assert(v.width === w.toLong && v.height === h.toLong)
      assert(v.sum_gray === sum, s"doc $id pixel sum — lossy GIF round-trip?")
      assert(v.px000 === (id * 31) % 256)
    }
    // frame sampling reads the REAL container frame count
    val refs = Multimodal.sampleVideoFrames(spark,
      Multimodal.decodeVideos(spark,
        Multimodal.synthesizeVideos(spark, docs)), k = 4)
      .collect().groupBy(_.doc_id)
    for ((id, rs) <- refs) {
      val n = feats(id).n_frames
      assert(rs.map(_.frame_idx).sorted.toSeq ===
        (0 until 4).map(i => i.toLong * n / 4).distinct.sorted)
      assert(rs.forall(_.n_frames == n))
    }
  }

  test("video header probe: frame counts match the full decode on the same containers; sampling parity; corrupt container fails loud") {
    val docs = Tables.documents(spark, sf0001).limit(40)
    val media = Multimodal.synthesizeVideos(spark, docs)
      .localCheckpoint(eager = true)
    val probed = Multimodal.probeVideoFrames(spark, media)
      .collect().map(m => m.doc_id -> m.n_frames).toMap
    val decoded = Multimodal.decodeVideos(spark, media)
      .collect().map(v => v.doc_id -> v.n_frames).toMap
    assert(probed === decoded,
      "header-probe frame counts diverge from the raster decode")
    // sampling over the probe ≡ sampling over the decode
    val viaProbe = Multimodal.sampleProbedFrames(spark,
      Multimodal.probeVideoFrames(spark, media), k = 4)
      .collect().map(f => (f.doc_id, f.frame_idx, f.n_frames)).toSet
    val viaDecode = Multimodal.sampleVideoFrames(spark,
      Multimodal.decodeVideos(spark, media), k = 4)
      .collect().map(f => (f.doc_id, f.frame_idx, f.n_frames)).toSet
    assert(viaProbe === viaDecode)
    // a payload that is not a parseable container must fail loud, not
    // report zero frames
    import spark.implicits._
    val junk = Seq((999L, Array.fill[Byte](64)(0x2a))).toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.probeVideoFrames(spark, junk).collect()
    }
    assert(e.getMessage != null)
  }

  test("dhashImages: every planted brightness twin collides within 8 bits; banding loses no pair") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val hashes = Multimodal.dhashImages(spark,
      Multimodal.synthesizeImagesVaried(spark, docs)).toDF()
    // every planted twin (id % 10 == 0 → id + 1000000) is a near-dup
    val twins = hashes.as("a").join(hashes.as("b"),
      col("b.doc_id") === col("a.doc_id") + 1000000L)
      .select(col("a.doc_id"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("ham"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val nBase = docs.filter(col("doc_id") % 10 === 0).count()
    assert(twins.length.toLong === nBase && nBase > 0)
    twins.foreach { case (id, ham) =>
      assert(ham <= 8, s"planted twin of $id drifted to hamming $ham")
    }
    // the registered 9-band candidate pairing equals brute force at ≤ 8
    val brute = hashes.as("a").join(hashes.as("b"),
      col("a.doc_id") < col("b.doc_id"))
      .withColumn("ham",
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))))
      .filter(col("ham") <= 8)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = graft.queries.ExtensionQueries.defs("mm_image_dhash")
      .fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute) // pigeonhole: 8 < 9 bands — exact, not heuristic
  }

  test("audioFingerprints: amplitude twins collide at hamming 0; banding equals brute force at <= 2") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val hashes = Multimodal.audioFingerprints(spark,
      Multimodal.synthesizeAudioVaried(spark, docs)).toDF()
    val twins = hashes.as("a").join(hashes.as("b"),
      col("b.doc_id") === col("a.doc_id") + 1000000L)
      .select(bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).as("ham"))
      .collect().map(_.getInt(0))
    val nBase = docs.filter(col("doc_id") % 10 === 0).count()
    assert(twins.length.toLong === nBase && nBase > 0)
    // a uniform volume change scales every window mean together — the
    // fingerprint is invariant up to integer-truncation near-ties
    // (all 50 twins measured hamming 0 at sf0.01; the tiny sf0.001
    // fixture set hits one truncation flip) — every twin stays inside
    // the detection threshold
    assert(twins.forall(_ <= 2), s"twin hammings: ${twins.toSeq}")
    assert(twins.exists(_ === 0))
    val brute = hashes.as("a").join(hashes.as("b"),
      col("a.doc_id") < col("b.doc_id"))
      .withColumn("ham",
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))))
      .filter(col("ham") <= 2)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = graft.queries.ExtensionQueries.defs("mm_audio_fingerprint")
      .fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute) // 2 < 3 bands — pigeonhole-exact pairing
  }

  test("alignment gate: planted captions align at cosine exactly 1, " +
    "anti-profiles are dropped, verdicts come from the DECODED raster") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001)
    val media = graft.operators.Multimodal
      .synthesizeCaptionedImages(spark, docs)
      .localCheckpoint(eager = false)
    val out = graft.operators.Multimodal.alignmentGate(spark, media)
      .localCheckpoint(eager = false)
    // planted-aligned docs (md5 char 3 even) MUST pass: caption == true
    // profile, centered cosine exactly 1 — zero misses allowed
    val planted = docs.select(col("doc_id"),
        (expr("instr('0123456789abcdef', substr(md5(text), 3, 1)) - 1")
          .cast("long") % 2 === 0).as("is_planted"))
    val missed = out.join(planted, "doc_id")
      .filter(col("is_planted") && !col("aligned")).count()
    assert(missed === 0L)
    // decode-not-trusted: the caption profile of an aligned doc equals
    // the DECODED quadrant sums — the raster round-trip is exact
    val mismatch = out.join(planted, "doc_id").filter(col("is_planted") &&
      (col("q0") =!= col("c0") || col("q1") =!= col("c1") ||
        col("q2") =!= col("c2") || col("q3") =!= col("c3"))).count()
    assert(mismatch === 0L)
    // a hand anti-profile is dropped: caption claiming the NEGATED
    // centered direction has cosine -1
    val one = media.limit(1).collect()(0)
    val q = out.join(planted, "doc_id").filter(col("is_planted"))
      .limit(1).collect()(0)
    val (q0, q1, q2, q3) = (q.getAs[Long]("q0"), q.getAs[Long]("q1"),
      q.getAs[Long]("q2"), q.getAs[Long]("q3"))
    val s = q0 + q1 + q2 + q3
    // anti: c_i = s - q_i  →  centered(c) = -centered(q)
    val anti = Seq((q.getAs[Long]("doc_id"),
      media.filter(col("doc_id") === q.getAs[Long]("doc_id"))
        .collect()(0).getAs[Array[Byte]]("payload"),
      Seq(s - q0, s - q1, s - q2, s - q3).mkString(" ")))
      .toDF("doc_id", "payload", "caption")
    val antiOut = graft.operators.Multimodal.alignmentGate(spark, anti)
      .collect()(0)
    assert(!antiOut.getAs[Boolean]("aligned"))
    assert(antiOut.getAs[Long]("dot") < 0L)
    assert(one != null) // media materialized
  }

  test("alignment gate integer-headroom contract: oversized rasters and " +
    "over-budget captions fail LOUD, never NULL through; null text is " +
    "hashed as empty string") {
    import spark.implicits._
    def rootMsgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    // a 90x60 raster against maxPixels=5000 trips the decode-side guard
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val big = Seq((1L, png(90, 60), "0 0 0 0"))
      .toDF("doc_id", "payload", "caption")
    val e1 = intercept[Throwable] {
      Multimodal.alignmentGate(spark, big, maxPixels = 5000L).collect()
    }
    assert(rootMsgs(e1).exists(m =>
      m.contains("maxPixels=5000") && m.contains("5400")))
    // a caption whose magnitude no under-budget image could produce
    // trips the in-plan raise_error (255 * 5000 = 1,275,000 budget)
    val loud = Seq((2L, png(10, 10), "9999999999 0 0 0"))
      .toDF("doc_id", "payload", "caption")
    val e2 = intercept[Throwable] {
      Multimodal.alignmentGate(spark, loud, maxPixels = 5000L).collect()
    }
    assert(rootMsgs(e2).exists(_.contains("magnitude budget")))
    // the default budget itself must stay inside DECIMAL(38):
    // 1600*(255*1.9e6)^4 < 1e38
    val worst = BigInt(1600) * BigInt(255L * 1900000L).pow(4)
    assert(worst < BigInt(10).pow(38))
    // null-text docs synthesize via md5('') instead of NPEing
    val nullDocs = Seq((7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val m = Multimodal.synthesizeCaptionedImages(spark, nullDocs).collect()
    assert(m.length === 1 && m(0).getAs[Array[Byte]]("payload").nonEmpty)
    // and the synthesized pair flows through the gate without error
    assert(Multimodal.alignmentGate(spark,
      Multimodal.synthesizeCaptionedImages(spark, nullDocs)).count() === 1L)
  }

  test("mp4 header probe: real box-tree walk recovers every synthesized " +
    "field; corrupt containers fail loud") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001)
    val media = Multimodal.synthesizeMp4(spark, docs)
    val probed = Multimodal.probeMp4(spark, media)
    // re-derive the formula per doc and compare every field
    val expect = docs.select(col("doc_id").cast("long"),
        md5(col("text")).as("h")).collect().map { r =>
      val hex = r.getString(1)
      def v(i: Int) = "0123456789abcdef".indexOf(hex.charAt(i)).toLong
      val secs = 1L + v(0); val ts = 600L * (1 + v(1))
      r.getLong(0) -> ((ts, secs * ts, secs * 1000L, 16L + v(2),
        16L + v(3), 1L + v(4) % 4, if (v(5) % 2 == 0) 3L else 2L))
    }.toMap
    val got = probed.collect()
    assert(got.length === expect.size)
    got.foreach { m =>
      val e = expect(m.doc_id)
      assert(m.major_brand === "isom")
      assert((m.timescale, m.duration, m.duration_ms, m.width, m.height,
        m.track_id, m.n_top_boxes) === e, s"doc ${m.doc_id}")
    }
    // corrupt: truncated mid-box and non-BMFF bytes both fail loud
    def msgs(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse(""))
      .toSeq
    val onePayload = media.limit(1).collect()(0).getAs[Array[Byte]]("payload")
    val truncated = Seq((1L, onePayload.take(onePayload.length - 4)))
      .toDF("doc_id", "payload")
    val e1 = intercept[Throwable] {
      Multimodal.probeMp4(spark, truncated).collect() }
    assert(msgs(e1).exists(m => m.contains("overruns") ||
      m.contains("truncated")))
    val garbage = Seq((2L, "not an mp4 container at all".getBytes))
      .toDF("doc_id", "payload")
    assert(msgs(intercept[Throwable] {
      Multimodal.probeMp4(spark, garbage).collect() }).nonEmpty)
  }

  test("dhash is exactly invariant to a wrap-free brightness shift") {
    import spark.implicits._
    // hand-built 18x16 image with values far from the mod boundary:
    // +5 cannot wrap, so the fingerprint must be IDENTICAL
    def png(shift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(18, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 18; y <- 0 until 16) {
        val g = 40 + ((x * 7 + y * 13) % 150) + shift
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val hs = Multimodal.dhashImages(spark,
      Seq((1L, png(0)), (2L, png(5))).toDF("doc_id", "payload"))
      .collect().map(h => h.doc_id -> h.dhash).toMap
    assert(hs(1L) === hs(2L))
  }

  test("mjpeg-in-mp4: sample-table walk finds every frame, per-frame JPEG " +
    "decode lands in budget, codec genuinely lossy, corrupt containers loud") {
    import spark.implicits._
    val many = Tables.documents(spark, sf0001).limit(60)
    val media = Multimodal.synthesizeMjpegMp4(spark, many)
      .localCheckpoint(eager = true)
    val out = Multimodal.decodeMjpegMp4(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    val meta = many.select(col("doc_id"),
        md5(coalesce(col("text"), lit(""))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet === meta.keySet)
    for ((id, hex) <- meta) {
      def hv(i: Int) = "0123456789abcdef".indexOf(hex.charAt(i))
      val f = out(id)
      assert(f.n_frames === (2 + hv(0)).toLong)  // stsz count
      assert(f.width === (16 + hv(1)).toLong)    // tkhd == every raster
      assert(f.height === (16 + hv(2)).toLong)
      assert(f.mean_dev_ok, s"doc $id: a frame broke the 3-gray budget")
    }
    val one = media.filter(col("doc_id") === meta.keys.head)
      .select("payload").head().getAs[Array[Byte]](0)
    // probeMp4's walker must also accept the container (ftyp + moov)
    val probed = Multimodal.probeMp4(spark,
      Seq((meta.keys.head, one)).toDF("doc_id", "payload")).collect()
    assert(probed.head.major_brand === "isom")
    // corrupt sample table: truncate the payload into the mdat — the
    // out-of-range sample must fail loud, not decode garbage
    val cut = one.take(one.length - 4)
    val err = intercept[Exception] {
      Multimodal.decodeMjpegMp4(spark,
        Seq((99L, cut)).toDF("doc_id", "payload")).collect()
    }
    assert(err.getMessage.contains("99") ||
      err.getCause != null && err.getCause.getMessage.contains("99"))
  }

  test("decodeMixed routes every media_type to its real codec and fails " +
    "loud on an unroutable type") {
    import spark.implicits._
    val many = Tables.documents(spark, sf0001).limit(30)
    val media = Multimodal.synthesizeMixedMedia(spark, many)
    val out = Multimodal.decodeMixed(spark, media).collect()
    assert(out.length === 30)
    val byType = out.groupBy(_.media_type)
    assert(byType.keySet === Set("image", "audio", "video"))
    assert(byType("audio").forall(f => f.height == 1L && f.n_frames == 1L))
    assert(byType("video").forall(_.n_frames >= 2L))
    // unknown media_type detonates instead of silently dropping
    val bad = media.limit(1)
      .withColumn("media_type", lit("hologram"))
    val err = intercept[Exception] {
      Multimodal.decodeMixed(spark, bad).collect()
    }
    assert(err.getMessage.contains("hologram") ||
      err.getCause != null && err.getCause.getMessage.contains("hologram"))
    // the routing claim as a PLAN pin: PAYLOAD BYTES never cross an
    // exchange. Pinned on the UN-limited table (the limit(30) fixture
    // above adds its own GlobalLimit exchange, which is the test's, not
    // the router's). Round 16: the synthesize* inputs spread the NARROW
    // (doc_id, md5) rows across the cluster before the codec chain
    // (guide §2.5 — a small docs parquet is one split), so the plan may
    // carry round-robin exchanges BELOW the encoders; the invariant is
    // that every exchange input is the pre-payload projection — no
    // exchange moves media bytes.
    val plan = Multimodal.decodeMixed(spark,
        Multimodal.synthesizeMixedMedia(spark,
          Tables.documents(spark, sf0001)))
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange")).foreach {
      case (line, i) =>
        assert(line.contains("RoundRobinPartitioning"),
          s"decodeMixed: only the narrow-input spread may shuffle:\n$plan")
        val child = lines.drop(i + 1).headOption.getOrElse("")
        assert(!child.contains("payload"),
          s"decodeMixed: an exchange is moving payload bytes:\n$plan")
    }
  }
}
