package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GQuery, QueryPack, Tables}

/** Multimodal columns: image/audio/video as opaque `binary` payloads with a
  * typed metadata struct, plus decode / feature-extract / exact-pool
  * downsample / frame-sample plumbing (builder-prompt beyond-parity
  * surface).
  *
  * The container has no codec libraries, so the DECODE STEP IS A
  * DETERMINISTIC STUB ([[MediaCodec.Fake]]); everything Spark-side — schema,
  * binary handling, partition-sized batch processing, frame explode shapes —
  * is real and oracle-checked. Swap [[MediaCodec]] for a JNI/ffmpeg-backed
  * implementation at deploy time; nothing else changes.
  *
  * Scale notes: payload bytes stay in executors (no driver collect); the
  * batch path is iterator-to-iterator `mapPartitions` (the JVM twin of
  * `mapInPandas` batch shape) so codec state is reused per partition, not
  * per row; frame sampling explodes bounded `sequence()` arrays, never
  * materializing whole decoded media.
  */
object MediaOps extends QueryPack {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long, codec: String)
  case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, mean_byte: Double)

  /** The codec seam. A real deployment plugs ffmpeg/libjpeg here. Resizing
    * is NOT part of the seam: interpolating resamplers are implementation-
    * defined and can never be oracle-checked — the exact-integer
    * [[poolGrid]] kernel (m4) is the library's downsample face. */
  trait MediaCodec extends Serializable {
    def features(payload: Array[Byte], meta: MediaMeta): MediaFeatures
  }

  object MediaCodec {
    /** STUB: a real codec would decode pixels/samples. This fake derives
      * deterministic pseudo-features from the raw bytes so the pipeline is
      * testable end-to-end without image/audio libraries. */
    object Fake extends MediaCodec {
      def features(payload: Array[Byte], meta: MediaMeta): MediaFeatures = {
        var sum = 0L; var check = 1125899906842597L
        payload.foreach { b => sum += (b & 0xff); check = check * 31 + (b & 0xff) }
        MediaFeatures(-1, meta.kind, payload.length.toLong, check,
          if (payload.isEmpty) 0.0 else sum.toDouble / payload.length)
      }
    }

    /** REAL decode, pure JVM: `javax.imageio` PNG. `checksum` carries the
      * exact integer pixel sum (grayscale sample values), `n_bytes` the
      * encoded payload size — PNG is lossless, so pixel stats computed from
      * the decoded raster are integer-exact and oracle-able. */
    object Png extends MediaCodec {
      def features(payload: Array[Byte], meta: MediaMeta): MediaFeatures = {
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        require(img != null, "payload is not a decodable image")
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        MediaFeatures(-1, meta.kind, payload.length.toLong, sum, sum.toDouble / n)
      }
    }
  }

  /** Deterministic grayscale test image: sample(x, y) =
    * (id*31 + 7x + 13y) mod 256 — a closed form the DuckDB oracle can
    * evaluate without any image library. PNG-encoded (lossless) so the
    * decode path reproduces it bit-exactly. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((id * 31 + 7L * x + 13L * y) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Partition-batched feature extraction — the `mapInPandas` twin: one codec
    * instance per partition, iterator in / iterator out, no row-at-a-time
    * driver involvement. */
  def extractFeatures(media: Dataset[MediaRecord],
      codec: MediaCodec = MediaCodec.Fake): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(r => codec.features(r.content, r.meta).copy(media_id = r.media_id))
    }
  }

  // ---- corpus-backed query-registry entries ---------------------------------

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // Single-sourced synthetic-media derivations: the kind router and the
  // decode dimensions appear in several queries AND their oracles — one
  // definition per side, so a range tweak cannot silently diverge copies.
  private def kindCol(id: Column): Column =
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(id, lit(3)) + 1).cast("int"))
  private def dimW(id: Column): Column = (pmod(id, lit(24)) + 8).cast("int")
  private def dimH(id: Column): Column = (pmod(id, lit(16)) + 8).cast("int")

  /** The closed-form P x P pooled-grid expression of the DuckDB oracle —
    * single source for m4/m6/m7's analytic pooling (only the grid size and
    * the id expression vary; expects `w`/`h` columns in scope). */
  private def pooledSql(p: Int, idExpr: String): String =
    s"""list_transform(range(0, ${p * p}), b ->
       |      list_sum(list_transform(range(b % $p * w // $p, (b % $p + 1) * w // $p), x ->
       |        list_sum(list_transform(range(b // $p * h // $p, (b // $p + 1) * h // $p), y ->
       |          ($idExpr * 31 + 7 * x + 13 * y) % 256))))
       |      // (((b % $p + 1) * w // $p - b % $p * w // $p)
       |         * ((b // $p + 1) * h // $p - b // $p * h // $p))""".stripMargin

  /** Deterministic synthetic media over `documents`: payload = utf8 bytes of
    * the text, kind by doc_id, metadata derived from payload size. This is
    * the ingestion shape (opaque bytes + typed struct), minus real files. */
  def mediaFrame(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(
        kindCol(col("doc_id")).as("kind"),
        (pmod(col("doc_id"), lit(640)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 16).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (length(col("text")) * 20).cast("long").as("durationMs"),
        lit("stub").as("codec")).as("meta"))

  /** m1: ingest + metadata projection over the binary payload (octet length,
    * magic-byte sniff, kind routing) — all computable by the oracle from the
    * same utf8 bytes. The oracle slices hex chars AFTER encode (4 bytes = 8
    * hex chars) so both engines hash the same leading BYTES even when a
    * multi-byte character straddles the boundary. */
  private val m1 = GQuery(
    "m1_media_metadata",
    (s, dir) =>
      mediaFrame(s, dir).select(
        col("media_id"), col("meta.kind").as("kind"),
        length(col("content")).as("n_bytes"),
        upper(hex(substring(col("content"), 1, 4))).as("magic"),
        col("meta.durationMs").as("duration_ms")),
    Some("""SELECT doc_id AS media_id,
           |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
           |  octet_length(encode(text)) AS n_bytes,
           |  upper(substring(hex(encode(text)), 1, 8)) AS magic,
           |  length(text) * 20 AS duration_ms
           |FROM documents""".stripMargin),
    doc = "Opaque binary payload + typed metadata projection (multimodal #1).")

  /** m2: frame sampling — fixed-stride slices exploded from each payload,
    * with a per-frame digest; the explode shape is exactly what a video
    * frame-sampler produces (bounded array, no full-media materialization).
    * Stride/length/size are in CHARACTERS (both engines slice code points —
    * `frame_chars`, not bytes); the byte-exact face is m1's hex-after-encode
    * magic slice. */
  private val m2 = GQuery(
    "m2_frame_sample",
    (s, dir) => {
      val frameLen = 64
      val stride = 256
      t(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          // floor() explicitly: Spark CAST(double AS INT) truncates but
          // DuckDB's rounds — floor is the one spelling both agree on
          explode(expr(
            s"transform(sequence(1, greatest(1, cast(floor((length(text) - 1) / $stride) as int) + 1))," +
              s" i -> struct(i as frame_no, substring(text, (i - 1) * $stride + 1, $frameLen) as frame))"))
            .as("f"))
        .select(col("media_id"), col("f.frame_no").cast("int").as("frame_no"),
          md5(col("f.frame").cast("binary")).as("frame_digest"),
          length(col("f.frame")).as("frame_chars"))
    },
    Some("""WITH frames AS (
           |  SELECT doc_id AS media_id,
           |    unnest(list_transform(
           |      range(1, greatest(1, CAST(floor((length(text) - 1) / 256) AS INT) + 1) + 1),
           |      i -> {'frame_no': i,
           |            'frame': substring(text, CAST((i - 1) * 256 + 1 AS INT), 64)})) AS f
           |  FROM documents)
           |SELECT media_id, CAST(f.frame_no AS INT) AS frame_no,
           |  md5(f.frame) AS frame_digest,
           |  CAST(length(f.frame) AS INT) AS frame_chars
           |FROM frames""".stripMargin),
    doc = "Fixed-stride frame sampling with per-frame digests (multimodal #2).")

  /** m3: REAL image decode through the batched codec path. Each document
    * becomes a deterministic grayscale PNG ([[syntheticPng]] — closed-form
    * pixels), the executor ENCODES then DECODES it with `javax.imageio`, and
    * per-kind stats aggregate the decoded rasters' integer pixel sums. The
    * DuckDB oracle evaluates the same closed form analytically (a lateral
    * generate_series per image) — a broken decode cannot reproduce it, so
    * this hash-checks the decode path itself. All accumulators are integers;
    * the one double division divides two exact longs. */
  private val m3 = GQuery(
    "m3_media_features",
    (s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
          dimW(col("doc_id")).as("w"), dimH(col("doc_id")).as("h"))
        .as[(Long, String, Int, Int)]
        .mapPartitions(_.map { case (id, kind, w, h) =>
          MediaRecord(id, syntheticPng(id, w, h),
            MediaMeta(kind, w, h, 0, 0L, "png"))
        })
      extractFeatures(media, MediaCodec.Png)
        .withColumn("n_px", ((pmod(col("media_id"), lit(24)) + 8)
          * (pmod(col("media_id"), lit(16)) + 8)).cast("long"))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_px")).as("total_px"),
          sum(col("checksum")).as("px_sum"))
        .withColumn("avg_px",
          col("px_sum").cast("double") / col("total_px").cast("double"))
    },
    Some("""WITH m AS (
           |  SELECT doc_id,
           |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
           |    CAST(doc_id % 24 + 8 AS BIGINT) AS w,
           |    CAST(doc_id % 16 + 8 AS BIGINT) AS h
           |  FROM documents),
           |px AS (
           |  SELECT kind, w * h AS n_px,
           |    list_sum(list_transform(range(0, CAST(w * h AS INT)),
           |      i -> (doc_id * 31 + 7 * (i % w) + 13 * (i // w)) % 256)) AS px_sum
           |  FROM m)
           |SELECT kind, count(*) AS n, CAST(sum(n_px) AS BIGINT) AS total_px,
           |  CAST(sum(px_sum) AS BIGINT) AS px_sum,
           |  CAST(sum(px_sum) AS DOUBLE) / CAST(sum(n_px) AS DOUBLE) AS avg_px
           |FROM px GROUP BY kind""".stripMargin),
    doc = "Real javax.imageio PNG decode, closed-form pixel oracle (multimodal #3).")

  /** Exact P x P average-pool over the decoded raster: block (bx, by) spans
    * x in [bx*w/P, (bx+1)*w/P) (integer bounds, non-empty while w, h >= P)
    * and its value is the FLOOR mean of the block's samples — all-integer
    * math, so a closed-form oracle can reproduce it analytically.
    * (Graphics2D.drawImage interpolation is implementation-defined and could
    * never be oracle-checked; this is the resize kernel spelled exactly.) */
  def poolGrid(payload: Array[Byte], p: Int): Array[Long] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    require(img.getWidth >= p && img.getHeight >= p,
      s"pool grid $p x $p needs an image at least that large, " +
        s"got ${img.getWidth} x ${img.getHeight}")
    val raster = img.getRaster
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Long](p * p)
    var b = 0
    while (b < p * p) {
      val bx = b % p; val by = b / p
      val x0 = bx * w / p; val x1 = (bx + 1) * w / p
      val y0 = by * h / p; val y1 = (by + 1) * h / p
      var s = 0L
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) { s += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      out(b) = s / ((x1 - x0).toLong * (y1 - y0))
      b += 1
    }
    out
  }

  /** m4: decode + RESIZE through the batched codec path — each synthetic PNG
    * decodes on the executor and average-pools to a 4x4 thumbnail with exact
    * integer math ([[poolGrid]]); the output row carries the thumbnail's
    * digest and floor-mean so the oracle (which evaluates the same pooling
    * analytically from the closed-form pixels) hash-checks the entire
    * decode-and-downsample kernel per image. The thumbnail serializes to a
    * '|'-joined string — scalar outputs only. */
  private val m4 = GQuery(
    "m4_media_resize_pool",
    (s, dir) => {
      import s.implicits._
      val P = 4
      t(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          dimW(col("doc_id")).as("w"), dimH(col("doc_id")).as("h"))
        .as[(Long, Int, Int)]
        .mapPartitions(_.map { case (id, w, h) =>
          val pooled = poolGrid(syntheticPng(id, w, h), P)
          (id, pooled.mkString("|"), pooled.sum)
        })
        .toDF("media_id", "thumb", "thumb_sum")
        .select(col("media_id"), md5(col("thumb").cast("binary")).as("thumb_digest"),
          col("thumb_sum"))
    },
    Some(s"""WITH m AS (
           |  SELECT doc_id,
           |    CAST(doc_id % 24 + 8 AS BIGINT) AS w,
           |    CAST(doc_id % 16 + 8 AS BIGINT) AS h
           |  FROM documents),
           |pooled AS (
           |  SELECT doc_id,
           |    ${pooledSql(4, "doc_id")}) AS t
           |  FROM m)
           |SELECT doc_id AS media_id,
           |  md5(array_to_string(t, '|')) AS thumb_digest,
           |  CAST(list_sum(t) AS BIGINT) AS thumb_sum
           |FROM pooled""".stripMargin),
    doc = "Real decode + exact average-pool 4x4 resize, per-image hash-checked (multimodal #4).")

  /** Deterministic s16le PCM payload: sample(i) = (id*31 + 7i) mod 65536
    * - 32768 — a closed form the oracle evaluates analytically. Encoded as
    * real little-endian 16-bit bytes so the decode path below exercises
    * genuine binary parsing, not a pass-through. */
  def syntheticPcm(id: Long, nSamples: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(nSamples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nSamples) {
      bb.putShort((((id * 31 + 7L * i) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** Decode s16le bytes and emit per-256-sample-frame features: energy
    * (exact integer sum of squares) and the zero-crossing count — the two
    * standard cheap audio signals (VAD gating, silence trim). All-integer
    * math end to end, so the DuckDB oracle reproduces it from the closed
    * form without any audio library. */
  def pcmFrameFeatures(id: Long, payload: Array[Byte], frameLen: Int): Seq[(Long, Int, Long, Int)] = {
    val sb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val nFrames = sb.limit() / frameLen
    (0 until nFrames).map { f =>
      var energy = 0L; var cross = 0; var i = 0
      var prev: Short = 0
      while (i < frameLen) {
        val s = sb.get(f * frameLen + i)
        energy += s.toLong * s
        if (i > 0 && ((prev < 0) != (s < 0))) cross += 1
        prev = s
        i += 1
      }
      (id, f, energy, cross)
    }
  }

  /** m5: the audio face of the multimodal family (m2 frames video, m3/m4
    * decode images): synthesize a REAL s16le byte payload per doc on the
    * executor, decode it back through ByteBuffer parsing, and window into
    * 256-sample frames with energy + zero-crossing features. Partition-
    * batched flatMap — payload bytes never leave executors, output is
    * frames-per-doc rows (bounded: doc_id%6+2 frames). */
  private val m5 = GQuery(
    "m5_audio_frame_energy",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(col("doc_id"), (pmod(col("doc_id"), lit(6)) + 2).cast("int").as("n_frames"))
        .as[(Long, Int)]
        .mapPartitions(_.flatMap { case (id, nf) =>
          pcmFrameFeatures(id, syntheticPcm(id, nf * 256), frameLen = 256)
        })
        .toDF("media_id", "frame_no", "energy", "n_cross")
    },
    Some("""WITH m AS (SELECT doc_id, CAST(doc_id % 6 + 2 AS INT) AS n_frames
           |           FROM documents),
           |f AS (SELECT doc_id, unnest(range(0, n_frames)) AS frame_no FROM m),
           |s AS (SELECT doc_id, frame_no,
           |        list_transform(range(0, 256), i ->
           |          (doc_id * 31 + 7 * (frame_no * 256 + i)) % 65536 - 32768) AS sm
           |      FROM f)
           |SELECT doc_id AS media_id, CAST(frame_no AS INT) AS frame_no,
           |  CAST(list_sum(list_transform(sm, x -> x * x)) AS BIGINT) AS energy,
           |  CAST(len(list_filter(range(1, 256), i ->
           |    (sm[i] < 0) <> (sm[i + 1] < 0))) AS INT) AS n_cross
           |FROM s""".stripMargin),
    doc = "s16le PCM decode + per-256-sample-frame energy / zero crossings, integer-exact (multimodal #5).")

  // ---- m6: media dedup via perceptual thumbnail digest -----------------------
  // The multimodal face of exact dedup: decode each image ON THE EXECUTOR,
  // average-pool to a 4x4 thumbnail (the m4 kernel — a tiny perceptual
  // hash), and hash-group the thumbnails: one row per distinct CONTENT with
  // its copy count and canonical (minimum) id. Payload content is keyed by
  // doc_id % 40 so real duplicate clusters exist; the pipeline is the d1
  // hash-groupBy with a decode in front, which is exactly how image dedup
  // runs at corpus scale (digest first, group on the 16-byte digest — raw
  // pixels never shuffle). The oracle reproduces the pooled thumbnails
  // analytically from the closed-form pixels.
  private val m6 = GQuery(
    "m6_media_dedup",
    (s, dir) => {
      import s.implicits._
      val P = 4
      t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), pmod(col("doc_id"), lit(40)).as("cid"))
        .select(col("media_id"), col("cid"),
          dimW(col("cid")).as("w"), dimH(col("cid")).as("h"))
        .as[(Long, Long, Int, Int)]
        .mapPartitions(_.map { case (id, cid, w, h) =>
          (id, poolGrid(syntheticPng(cid, w, h), P).mkString("|"))
        })
        .toDF("media_id", "thumb")
        .groupBy(md5(col("thumb").cast("binary")).as("content_digest"))
        .agg(count(lit(1)).as("n_copies"), min(col("media_id")).as("canonical_id"))
    },
    Some(s"""WITH m AS (
           |  SELECT doc_id, doc_id % 40 AS cid,
           |    CAST(doc_id % 40 % 24 + 8 AS BIGINT) AS w,
           |    CAST(doc_id % 40 % 16 + 8 AS BIGINT) AS h
           |  FROM documents),
           |pooled AS (
           |  SELECT doc_id,
           |    ${pooledSql(4, "cid")}) AS t
           |  FROM m)
           |SELECT md5(array_to_string(t, '|')) AS content_digest,
           |  count(*) AS n_copies, min(doc_id) AS canonical_id
           |FROM pooled GROUP BY 1""".stripMargin),
    doc = "Media dedup: executor-side decode + 4x4 pool digest, hash-grouped copies (multimodal #6).")

  // ---- M7: perceptual-hash NEAR-dup (multimodal #7) ---------------------------
  // m6 catches bit-identical images; m7 catches the re-encoded/near-identical
  // ones a real media pipeline must fold together. Per image: REAL PNG decode
  // (the m3/m4 path), 8x8 luminance pool, then a 56-bit difference hash
  // (dHash: bit = cell brighter than its right neighbor — gradients, so the
  // signature is invariant to uniform brightness shifts, exactly what
  // re-encodes perturb). Near-dup pairs = hamming distance <= 5 via the SAME
  // two-level pigeonhole banding that scales d4's SimHash sweep — raw pixels
  // never shuffle, only (id, 56-bit sig) longs do. The oracle recomputes the
  // pooled grid closed-form from the synthetic pixel function (the m6
  // discipline) and brute-forces all pairs — equality proves the banding
  // lossless at this distance, not just plausible.
  private val m7 = GQuery(
    "m7_media_phash_neardup",
    (s, dir) => {
      import s.implicits._
      // r13 (guide §1.2 "don't compute things you throw away"): decode ONCE
      // PER DISTINCT CONTENT, not once per document. Payload bytes are a
      // pure function of cid, so the old per-doc mapPartitions re-decoded
      // the same 40 images N/40 times each (5000 encode+decode round trips
      // at sf0.1 for 40 distinct signatures). A production media pipeline
      // does the same dedup with a byte-digest pre-group (m6's exact-dup
      // discipline) before the expensive perceptual decode; here the
      // content key is cid, so distinct-cid IS distinct-content. The tiny
      // signature table broadcast-joins back onto the doc ids.
      val docsCid = t(s, dir, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(40)).as("cid"))
      val cidSigs = docsCid.select(col("cid")).distinct()
        .select(col("cid"), dimW(col("cid")).as("w"), dimH(col("cid")).as("h"))
        .as[(Long, Int, Int)]
        .mapPartitions(_.map { case (cid, w, h) =>
          val g = poolGrid(syntheticPng(cid, w, h), 8)
          var sig = 0L
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 7) {
              if (g(r * 8 + c) > g(r * 8 + c + 1)) sig |= 1L << (r * 7 + c)
              c += 1
            }
            r += 1
          }
          (cid, sig)
        })
        .toDF("cid", "sim")
      // r14 (scale-hardening, VERDICT r13 #3): no forced broadcast — the
      // distinct-content signature table is 40 rows under THIS content key
      // but grows with the corpus under any real one; AQE broadcasts it at
      // runtime while small and falls back to a shuffled join when not.
      val sigs = docsCid.join(cidSigs, Seq("cid"))
        .select(col("doc_id"), col("sim"))
      // SCALE BOUNDARY: content is keyed doc_id % 40, so every doc of a cid
      // cluster shares ONE signature and hammingPairs' same-signature groups
      // are N/40 docs — BucketCap (10k) silently drops a whole group past
      // ~400k docs. MediaOpsSpec pins the margin (like d49's vocab gate); a
      // growing corpus must re-key the clusters or raise the cap explicitly.
      graft.queries.TextOps.hammingPairs(sigs, maxDist = 5)
        .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
          col("dist"))
    },
    Some(s"""WITH m AS (
           |  SELECT DISTINCT doc_id % 40 AS cid,
           |    CAST(doc_id % 40 % 24 + 8 AS BIGINT) AS w,
           |    CAST(doc_id % 40 % 16 + 8 AS BIGINT) AS h
           |  FROM documents),
           |pooled AS (
           |  SELECT cid,
           |    ${pooledSql(8, "cid")}) AS g
           |  FROM m),
           |sigs AS (
           |  SELECT cid,
           |    list_sum(list_transform(range(0, 56), i ->
           |      CASE WHEN g[(i // 7) * 8 + (i % 7) + 1] > g[(i // 7) * 8 + (i % 7) + 2]
           |           THEN CAST(1 AS BIGINT) << i ELSE 0 END))::BIGINT AS sig
           |  FROM pooled),
           |docs AS (
           |  SELECT doc_id, sig FROM documents JOIN sigs ON documents.doc_id % 40 = sigs.cid)
           |SELECT a.doc_id AS media_a, b.doc_id AS media_b,
           |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS dist
           |FROM docs a JOIN docs b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.sig, b.sig)) <= 5""".stripMargin),
    doc = "Media near-dup: real decode + 56-bit dHash, banded hamming<=5 pairs vs all-pairs oracle (multimodal #7).")

  override val all: Seq[GQuery] = Seq(m1, m2, m3, m4, m5, m6, m7)
}
