package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/
  * video as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample operators a training
  * pipeline runs over them.
  *
  * The payloads are format-VALID: BMP (BITMAPFILEHEADER+INFOHEADER),
  * WAV (RIFF/fmt/data), and an MP4-style ftyp/mdat box layout, generated
  * deterministically — and the decode step genuinely parses those
  * headers (dimensions, sample rate, duration, brand) AND computes REAL
  * signal features from the actual payload bytes: per-channel pixel
  * statistics for images, |sum|/zero-crossing-rate/mean-power for PCM
  * audio, and a per-frame chunk-size profile for video. All features
  * are integer-exact, so the m1/m2 oracles replay the byte-level
  * synth → (preprocess →) decode → feature round trip in DuckDB and the
  * queries stay hash-exact. (What would be MODEL inference in a real
  * deployment — a vision/audio embedding — is out of reach in this
  * container; these are the classical signal statistics a curation
  * pipeline computes without a model, e.g. for brightness/silence/
  * corruption screens.)
  *
  * Spark-side design (the part that matters at 100 TB):
  *  - bytes stay opaque through the plan; no shuffle carries decoded data;
  *  - `repartition(kind)` groups one codec per partition;
  *  - decode is `mapPartitions` batched at [[batchSize]] rows — the Scala
  *    analog of `mapInPandas`, bounding peak decode memory;
  *  - typed row contracts ([[MediaRow]] → [[MediaFeatures]]) pin schemas.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte], fmt: String)

  final case class MediaFeatures(
      media_id: Long, kind: String, fmt: String, n_bytes: Int,
      decoded_w: Int, decoded_h: Int,
      sample_rate: Int, duration_ms: Int,
      frames_sampled: Int, feature: Array[Long])

  val batchSize = 64 // rows decoded per in-memory batch (mapInPandas batch shape)

  // ── deterministic format-valid payload synthesis ────────────────────

  /** Content byte `i` of a payload stream: pure bounded integer
    * arithmetic (every intermediate < 2^31), so any SQL engine can
    * replay the exact payload content — the property that lets the m1/m2
    * oracles verify FEATURES (functions of every byte), not just
    * headers. Mildly mixing (quadratic term mod a prime) so per-payload
    * statistics actually vary.
    */
  private[graft] def contentByte(seed: Long, i: Long): Byte =
    (((seed % 256) * (i + 1) + (i * i % 251) * 31) % 256).toByte

  private def byteStream(seed: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = contentByte(seed, i.toLong); i += 1 }
    out
  }

  /** 24-bit BMP with real headers; w,h ≤ 32 keeps payloads small. */
  private[graft] def synthBmp(seed: Long, w: Int, h: Int): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val pixels = rowSize * h
    val size = 54 + pixels
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(pixels).putInt(2835).putInt(2835).putInt(0).putInt(0)
    b.put(byteStream(seed, pixels))
    b.array()
  }

  /** 16-bit mono PCM WAV with real RIFF headers. */
  private[graft] def synthWav(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(dataLen)
    b.put(byteStream(seed, dataLen))
    b.array()
  }

  /** MP4-style box layout: ftyp(isom) + mdat; nFrames encoded in mdat len.
    * ftyp box = size(4) + type(4) + major_brand(4) + minor_version(4) +
    * one compatible brand(4) = 20 bytes.
    */
  private[graft] def synthMp4(seed: Long, nFrames: Int): Array[Byte] = {
    val mdatLen = nFrames * 32
    val b = ByteBuffer.allocate(20 + 8 + mdatLen).order(ByteOrder.BIG_ENDIAN)
    b.putInt(20).put("ftyp".getBytes).put("isom".getBytes).putInt(512).put("iso2".getBytes)
    b.putInt(8 + mdatLen).put("mdat".getBytes)
    b.put(byteStream(seed, mdatLen))
    b.array()
  }

  /** Synthesize the media table over the documents corpus: format-valid
    * payloads + kind/fmt metadata. Stands in for a real
    * `spark.read.format("binaryFile")` ingest.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id")
      .as[Long]
      .mapPartitions(_.map { id =>
        (id % 3) match {
          case 0 => MediaRow(id, "image",
            synthBmp(id, (id % 4).toInt * 8 + 8, (id % 3).toInt * 8 + 8), "bmp")
          case 1 => MediaRow(id, "audio",
            synthWav(id, 16000, 100 + (id % 400).toInt), "wav")
          case _ => MediaRow(id, "video",
            synthMp4(id, 30 + (id % 270).toInt), "mp4")
        }
      })
  }

  // ── real header decode + stubbed feature extraction ────────────────

  private def le32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
  private def be32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.BIG_ENDIAN).getInt

  /** Per-channel pixel statistics over a 24-bit BMP's pixel area (the
    * classical no-model brightness/variance screen). Our synth widths
    * are 4-aligned (w ∈ {8,16,24,32} → 3w % 4 == 0), so the pixel area
    * has no row padding and channel = offset % 3; a general decoder
    * would skip pad bytes per row.
    */
  private def imageFeatures(b: Array[Byte], w: Int, h: Int): Array[Long] = {
    val n = w * h * 3
    val chanSum = new Array[Long](3)
    var bright = 0L; var minB = 255L; var maxB = 0L
    var i = 0
    while (i < n) {
      val v = (b(54 + i) & 0xff).toLong
      chanSum(i % 3) += v
      if (v > 127) bright += 1
      if (v < minB) minB = v
      if (v > maxB) maxB = v
      i += 1
    }
    Array(chanSum(0), chanSum(1), chanSum(2), bright, minB, maxB, w.toLong * h, 0L)
  }

  /** PCM statistics over 16-bit LE mono samples: Σ|s|, zero crossings
    * (strict sign flips), mean power ⌊Σs²/n⌋, max |s|, n — the no-model
    * silence/clipping screen.
    */
  private def audioFeatures(b: Array[Byte], dataLen: Int): Array[Long] = {
    val n = dataLen / 2
    var sumAbs = 0L; var crossings = 0L; var sumSq = 0L; var maxAbs = 0L
    var prevNeg = false
    var j = 0
    while (j < n) {
      val s = ((b(44 + j * 2) & 0xff) | (b(44 + j * 2 + 1) << 8)).toShort.toLong
      val a = math.abs(s)
      sumAbs += a; sumSq += s * s
      if (a > maxAbs) maxAbs = a
      val neg = s < 0
      if (j > 0 && neg != prevNeg) crossings += 1
      prevNeg = neg
      j += 1
    }
    Array(sumAbs, crossings, if (n > 0) sumSq / n else 0L, maxAbs, n.toLong, 0L, 0L, 0L)
  }

  /** mdat chunk-size profile over 32-byte frames: total byte sum,
    * max/min frame sum, count of frames above the expected mean (4080 =
    * 32·255/2), frame count — the no-model corruption/outlier screen.
    */
  private def videoFeatures(b: Array[Byte], mdatOff: Int, mdatLen: Int): Array[Long] = {
    val nFrames = mdatLen / 32
    var total = 0L; var maxF = 0L; var minF = Long.MaxValue; var above = 0L
    var f = 0
    while (f < nFrames) {
      var s = 0L
      var i = 0
      while (i < 32) { s += (b(mdatOff + f * 32 + i) & 0xff); i += 1 }
      total += s
      if (s > maxF) maxF = s
      if (s < minF) minF = s
      if (s > 4080) above += 1
      f += 1
    }
    if (nFrames == 0) minF = 0L
    Array(total, maxF, minF, above, nFrames.toLong, 0L, 0L, 0L)
  }

  /** Decode one row: REAL header parse AND real payload-statistics
    * features per format (see the object scaladoc for what a model would
    * add here).
    */
  private def decode(row: MediaRow): MediaFeatures = {
    val b = row.bytes
    val (w, h, rate, durMs, frames, feature) = row.fmt match {
      case "bmp" =>
        require(b(0) == 'B' && b(1) == 'M', s"not a BMP: media ${row.media_id}")
        val w0 = le32(b, 18); val h0 = le32(b, 22)
        (w0, h0, 0, 0, 1, imageFeatures(b, w0, h0))
      case "wav" =>
        require(new String(b, 0, 4) == "RIFF" && new String(b, 8, 4) == "WAVE",
          s"not a WAV: media ${row.media_id}")
        val sr = le32(b, 24)
        val dataLen = le32(b, 40)
        (0, 0, sr, (dataLen / 2) * 1000 / sr, 1, audioFeatures(b, dataLen))
      case "mp4" =>
        require(new String(b, 4, 4) == "ftyp", s"not an MP4: media ${row.media_id}")
        // walk the box chain: next box starts where ftyp's declared size ends
        val ftypSize = be32(b, 0)
        require(new String(b, ftypSize + 4, 4) == "mdat",
          s"no mdat after ftyp: media ${row.media_id}")
        val mdatLen = be32(b, ftypSize) - 8
        val nFrames = mdatLen / 32
        (0, 0, 0, nFrames * 33, math.min(nFrames, 16), // uniform frame-sample
          videoFeatures(b, ftypSize + 8, mdatLen))
      case other => throw new IllegalArgumentException(s"unknown fmt $other")
    }
    MediaFeatures(row.media_id, row.kind, row.fmt, b.length,
      w, h, rate, durMs, frames, feature)
  }

  // ── real preprocessing: resize / downsample (pure byte math) ────────

  /** REAL nearest-neighbor resize of a 24-bit BMP — header rewrite +
    * pixel resampling with correct 4-byte row padding on both sides.
    * (BMP needs no codec; this op is fully implemented, not stubbed —
    * a real deployment swaps in the JPEG/PNG codec with the same
    * signature.)
    */
  private[graft] def resizeBmp(b: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    require(b(0) == 'B' && b(1) == 'M', "not a BMP")
    val w = le32(b, 18); val h = le32(b, 22)
    val rowSize = (w * 3 + 3) / 4 * 4
    val rowSize2 = (w2 * 3 + 3) / 4 * 4
    val pixels2 = rowSize2 * h2
    val out = ByteBuffer.allocate(54 + pixels2).order(ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + pixels2).putInt(0).putInt(54)
    out.putInt(40).putInt(w2).putInt(h2).putShort(1).putShort(24)
      .putInt(0).putInt(pixels2).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val arr = out.array()
    var y2 = 0
    while (y2 < h2) {
      val ys = y2 * h / h2
      var x2 = 0
      while (x2 < w2) {
        val xs = x2 * w / w2
        System.arraycopy(b, 54 + ys * rowSize + xs * 3,
          arr, 54 + y2 * rowSize2 + x2 * 3, 3)
        x2 += 1
      }
      y2 += 1
    }
    arr
  }

  /** REAL WAV decimation: keep every k-th sample (k = srcRate/targetRate,
    * must divide) and rewrite the RIFF/fmt/data headers consistently.
    */
  private[graft] def downsampleWav(b: Array[Byte], targetRate: Int): Array[Byte] = {
    require(new String(b, 0, 4) == "RIFF" && new String(b, 8, 4) == "WAVE", "not a WAV")
    val srcRate = le32(b, 24)
    require(srcRate % targetRate == 0, s"rate $srcRate not divisible by $targetRate")
    val k = srcRate / targetRate
    val dataLen = le32(b, 40)
    val nSamples = dataLen / 2
    val n2 = (nSamples + k - 1) / k
    val out = ByteBuffer.allocate(44 + n2 * 2).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + n2 * 2).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(targetRate).putInt(targetRate * 2).putShort(2).putShort(16)
    out.put("data".getBytes).putInt(n2 * 2)
    var i = 0
    while (i < nSamples) {
      out.put(b(44 + i * 2)).put(b(44 + i * 2 + 1))
      i += k
    }
    out.array()
  }

  /** Preprocess pass (runs BEFORE featurize in a real pipeline): images
    * resize to `imgSize`², audio decimates to `audioRate`, video passes
    * through (frame selection happens at decode). Same mapPartitions
    * batching contract as [[featurize]] — bytes never shuffle decoded.
    */
  def preprocess(spark: SparkSession, media: Dataset[MediaRow],
      imgSize: Int = 8, audioRate: Int = 8000): Dataset[MediaRow] = {
    import spark.implicits._
    // no repartition here: the resize/decimate is pure per-row byte math
    // that gains nothing from codec locality, and featurize downstream
    // repartitions by kind anyway — a second exchange would ship the
    // whole binary payload across the network twice
    media
      .mapPartitions(_.map { r =>
        r.fmt match {
          case "bmp" => r.copy(bytes = resizeBmp(r.bytes, imgSize, imgSize))
          case "wav" => r.copy(bytes = downsampleWav(r.bytes, audioRate))
          case _ => r
        }
      })
  }

  /** Driver-facing query: preprocess → decode — every image must surface
    * as imgSize², every audio at audioRate. Scalar metadata only (longs
    * for oracle dtype parity); bytes/features stay engine-side.
    */
  def preprocessQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    featurize(spark, preprocess(spark, mediaTable(spark, dir)))
      .select(Seq($"media_id", $"kind", $"fmt", $"n_bytes".cast("long").as("n_bytes"),
        $"decoded_w".cast("long").as("decoded_w"),
        $"decoded_h".cast("long").as("decoded_h"),
        $"sample_rate".cast("long").as("sample_rate"),
        $"duration_ms".cast("long").as("duration_ms")) ++
        (0 until 8).map(i => element_at($"feature", i + 1).as(s"f$i")): _*)
  }

  /** Featurize: repartition by kind (one codec per partition), then a
    * partition-local batched decode.
    */
  def featurize(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.repartition(col("kind"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // real impl: one codec context per batch, vectorized decode
          batch.iterator.map(decode)
        }
      }
  }

  /** Driver-facing query (bytes/features stay engine-side; longs for
    * oracle dtype parity).
    */
  def featurizeQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    featurize(spark, mediaTable(spark, dir))
      .select(Seq($"media_id", $"kind", $"fmt", $"n_bytes".cast("long").as("n_bytes"),
        $"decoded_w".cast("long").as("decoded_w"),
        $"decoded_h".cast("long").as("decoded_h"),
        $"sample_rate".cast("long").as("sample_rate"),
        $"duration_ms".cast("long").as("duration_ms"),
        $"frames_sampled".cast("long").as("frames_sampled")) ++
        (0 until 8).map(i => element_at($"feature", i + 1).as(s"f$i")): _*)
  }

  /** The m1/m2 DuckDB oracles: every scalar the decode emits — headers
    * AND the payload-statistics features — is replayable from the
    * documents table alone, because the synthesis parameters are doc_id
    * arithmetic and the payload content is [[contentByte]]'s bounded
    * integer formula. The oracle regenerates every content byte with
    * `generate_series`, reassembles samples/pixels/frames, and
    * recomputes the identical aggregates: a single byte of drift in any
    * header writer, parser, resampler, or feature loop breaks the hash.
    * The binary payloads themselves stay engine-side (LlmOpsSpec pins
    * the resize/decimation pixel/sample-exact).
    */
  private def mediaParamsCte = s"""m AS (
    |  SELECT doc_id AS media_id, doc_id % 3 AS k,
    |         (doc_id % 4) * 8 + 8 AS bw, (doc_id % 3) * 8 + 8 AS bh,
    |         100 + doc_id % 400 AS ns, 30 + doc_id % 270 AS nf
    |  FROM documents)""".stripMargin

  /** [[contentByte]] in SQL: content byte `i` of media `sid`'s stream. */
  private def byteSql(sid: String, i: String) =
    s"((($sid % 256) * (($i) + 1) + ((($i) * ($i)) % 251) * 31) % 256)"

  /** The audio feature CTEs: 16-bit LE samples from a (possibly
    * re-indexed) content stream. `srcIdx(j)` maps kept-sample j to its
    * source SAMPLE index (identity for m1, 2j for the m2 decimation);
    * `nExpr` is the kept-sample count.
    */
  private def audioCtes(nExpr: String, srcIdx: String => String): String = {
    val lo = byteSql("media_id", s"2 * (${srcIdx("j")})")
    val hi = byteSql("media_id", s"2 * (${srcIdx("j")}) + 1")
    s"""aud_s AS (
       |  SELECT media_id, j, CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
       |  FROM (
       |    SELECT media_id, j, $lo + 256 * ($hi) AS v
       |    FROM (SELECT media_id, ns FROM m WHERE k = 1),
       |         UNNEST(generate_series(0, ($nExpr) - 1)) AS t(j))),
       |aud_x AS (
       |  SELECT media_id, s, lag(s) OVER (PARTITION BY media_id ORDER BY j) AS p
       |  FROM aud_s),
       |aud_f AS (
       |  SELECT media_id,
       |         sum(abs(s)) AS f0,
       |         sum(CASE WHEN p IS NOT NULL AND ((s < 0) <> (p < 0)) THEN 1 ELSE 0 END) AS f1,
       |         CAST(sum(s * s) AS BIGINT) // count(*) AS f2,
       |         max(abs(s)) AS f3,
       |         count(*) AS f4
       |  FROM aud_x GROUP BY 1)""".stripMargin
  }

  /** The image feature CTE: per-channel sums / bright count / min / max
    * over the pixel-area content stream. `srcByte(i)` maps output
    * content index i to its SOURCE content index (identity for m1, the
    * nearest-neighbor resample for m2); `nExpr` is the output pixel-area
    * byte count.
    */
  private def imageCtes(nExpr: String, srcByte: String => String): String =
    s"""img_f AS (
       |  SELECT media_id,
       |         sum(CASE WHEN i % 3 = 0 THEN b ELSE 0 END) AS f0,
       |         sum(CASE WHEN i % 3 = 1 THEN b ELSE 0 END) AS f1,
       |         sum(CASE WHEN i % 3 = 2 THEN b ELSE 0 END) AS f2,
       |         sum(CASE WHEN b > 127 THEN 1 ELSE 0 END) AS f3,
       |         min(b) AS f4, max(b) AS f5
       |  FROM (
       |    SELECT media_id, i, ${byteSql("media_id", srcByte("i"))} AS b
       |    FROM (SELECT media_id, bw, bh FROM m WHERE k = 0),
       |         UNNEST(generate_series(0, ($nExpr) - 1)) AS t(i))
       |  GROUP BY 1)""".stripMargin

  /** The video feature CTEs: 32-byte frame sums over the mdat stream
    * (identical in m1 and m2 — video passes preprocess through).
    */
  private val videoCtes =
    s"""vid_fr AS (
       |  SELECT media_id, i // 32 AS fr,
       |         sum(${byteSql("media_id", "i")}) AS fs
       |  FROM (SELECT media_id, nf FROM m WHERE k = 2),
       |       UNNEST(generate_series(0, nf * 32 - 1)) AS t(i)
       |  GROUP BY 1, 2),
       |vid_f AS (
       |  SELECT media_id, CAST(sum(fs) AS BIGINT) AS f0, max(fs) AS f1,
       |         min(fs) AS f2,
       |         sum(CASE WHEN fs > 4080 THEN 1 ELSE 0 END) AS f3,
       |         count(*) AS f4
       |  FROM vid_fr GROUP BY 1)""".stripMargin

  // per-kind feature dispatch: image f6 = pixel count, every unused
  // trailing dim is literal 0 (matching the fixed 8-dim engine vector)
  private val featureSelect =
    s"""  CAST(CASE k WHEN 0 THEN img_f.f0 WHEN 1 THEN aud_f.f0 ELSE vid_f.f0 END AS BIGINT) AS f0,
       |  CAST(CASE k WHEN 0 THEN img_f.f1 WHEN 1 THEN aud_f.f1 ELSE vid_f.f1 END AS BIGINT) AS f1,
       |  CAST(CASE k WHEN 0 THEN img_f.f2 WHEN 1 THEN aud_f.f2 ELSE vid_f.f2 END AS BIGINT) AS f2,
       |  CAST(CASE k WHEN 0 THEN img_f.f3 WHEN 1 THEN aud_f.f3 ELSE vid_f.f3 END AS BIGINT) AS f3,
       |  CAST(CASE k WHEN 0 THEN img_f.f4 WHEN 1 THEN aud_f.f4 ELSE vid_f.f4 END AS BIGINT) AS f4,
       |  CAST(CASE k WHEN 0 THEN img_f.f5 ELSE 0 END AS BIGINT) AS f5,
       |  CAST(CASE k WHEN 0 THEN pxn ELSE 0 END AS BIGINT) AS f6,
       |  CAST(0 AS BIGINT) AS f7""".stripMargin

  private val featureJoins =
    s"""FROM m
       |LEFT JOIN img_f USING (media_id)
       |LEFT JOIN aud_f USING (media_id)
       |LEFT JOIN vid_f USING (media_id)""".stripMargin

  val featurizeOracleSql: String =
    s"""WITH $mediaParamsCte,
       |${imageCtes("bw * bh * 3", i => i)},
       |${audioCtes("ns", j => j)},
       |$videoCtes
       |SELECT media_id,
       |  CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |  CASE k WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' ELSE 'mp4' END AS fmt,
       |  CAST(CASE k WHEN 0 THEN 54 + ((bw * 3 + 3) // 4 * 4) * bh
       |              WHEN 1 THEN 44 + ns * 2
       |              ELSE 28 + nf * 32 END AS BIGINT) AS n_bytes,
       |  CAST(CASE k WHEN 0 THEN bw ELSE 0 END AS BIGINT) AS decoded_w,
       |  CAST(CASE k WHEN 0 THEN bh ELSE 0 END AS BIGINT) AS decoded_h,
       |  CAST(CASE k WHEN 1 THEN 16000 ELSE 0 END AS BIGINT) AS sample_rate,
       |  CAST(CASE k WHEN 0 THEN 0 WHEN 1 THEN ns * 1000 // 16000
       |              ELSE nf * 33 END AS BIGINT) AS duration_ms,
       |  CAST(CASE k WHEN 2 THEN least(nf, 16) ELSE 1 END AS BIGINT) AS frames_sampled,
       |${featureSelect.replace("pxn", "bw * bh")}
       |$featureJoins""".stripMargin

  // m2 image resample: output content index i over the 8×8×3 area maps
  // to source content index (y2·bh//8)·(bw·3) + (x2·bw//8)·3 + c with
  // y2 = i//24, x2 = (i%24)//3, c = i%3 — resizeBmp's exact arithmetic
  private def resampleSrc(i: String) =
    s"((($i) // 24) * bh // 8) * (bw * 3) + ((((($i) % 24) // 3) * bw) // 8) * 3 + (($i) % 3)"

  val preprocessOracleSql: String =
    s"""WITH $mediaParamsCte,
       |${imageCtes("8 * 8 * 3", resampleSrc)},
       |${audioCtes("(ns + 1) // 2", j => s"2 * ($j)")},
       |$videoCtes
       |SELECT media_id,
       |  CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |  CASE k WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' ELSE 'mp4' END AS fmt,
       |  CAST(CASE k WHEN 0 THEN 54 + 24 * 8
       |              WHEN 1 THEN 44 + ((ns + 1) // 2) * 2
       |              ELSE 28 + nf * 32 END AS BIGINT) AS n_bytes,
       |  CAST(CASE k WHEN 0 THEN 8 ELSE 0 END AS BIGINT) AS decoded_w,
       |  CAST(CASE k WHEN 0 THEN 8 ELSE 0 END AS BIGINT) AS decoded_h,
       |  CAST(CASE k WHEN 1 THEN 8000 ELSE 0 END AS BIGINT) AS sample_rate,
       |  CAST(CASE k WHEN 0 THEN 0 WHEN 1 THEN ((ns + 1) // 2) * 1000 // 8000
       |              ELSE nf * 33 END AS BIGINT) AS duration_ms,
       |${featureSelect.replace("pxn", "64")}
       |$featureJoins""".stripMargin
}
