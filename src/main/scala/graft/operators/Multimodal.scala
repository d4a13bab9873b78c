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
  * deterministically from the document corpus — and the decode step
  * genuinely parses those headers (dimensions, sample rate, duration,
  * brand) with pure-JVM byte parsing. Only the ML feature extraction is
  * a clearly-marked STUB (no vision/audio model in this container); it
  * derives a deterministic 8-dim pseudo-embedding from the payload.
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
      frames_sampled: Int, feature: Array[Float])

  val batchSize = 64 // rows decoded per in-memory batch (mapInPandas batch shape)

  // ── deterministic format-valid payload synthesis ────────────────────

  private def byteStream(seed: Array[Byte], n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    var block = seed
    val md = java.security.MessageDigest.getInstance("SHA-256")
    while (i < n) {
      block = md.digest(block)
      val take = math.min(block.length, n - i)
      System.arraycopy(block, 0, out, i, take)
      i += take
    }
    out
  }

  /** 24-bit BMP with real headers; w,h ≤ 32 keeps payloads small. */
  private[graft] def synthBmp(seed: Array[Byte], w: Int, h: Int): Array[Byte] = {
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
  private[graft] def synthWav(seed: Array[Byte], sampleRate: Int, nSamples: Int): Array[Byte] = {
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
  private[graft] def synthMp4(seed: Array[Byte], nFrames: Int): Array[Byte] = {
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
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val seed = java.security.MessageDigest.getInstance("SHA-256")
          .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (id % 3) match {
          case 0 => MediaRow(id, "image",
            synthBmp(seed, (id % 4).toInt * 8 + 8, (id % 3).toInt * 8 + 8), "bmp")
          case 1 => MediaRow(id, "audio",
            synthWav(seed, 16000, 100 + (id % 400).toInt), "wav")
          case _ => MediaRow(id, "video",
            synthMp4(seed, 30 + (id % 270).toInt), "mp4")
        }
      })
  }

  // ── real header decode + stubbed feature extraction ────────────────

  private def le32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
  private def be32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.BIG_ENDIAN).getInt

  /** Decode one row: REAL header parse per format; STUB ??? for the
    * feature vector (a real deployment runs the vision/audio model here —
    * the deterministic sha-derived 8-dim stands in so the plumbing is
    * fully exercisable).
    */
  private def decode(row: MediaRow): MediaFeatures = {
    val b = row.bytes
    val (w, h, rate, durMs, frames) = row.fmt match {
      case "bmp" =>
        require(b(0) == 'B' && b(1) == 'M', s"not a BMP: media ${row.media_id}")
        (le32(b, 18), le32(b, 22), 0, 0, 1)
      case "wav" =>
        require(new String(b, 0, 4) == "RIFF" && new String(b, 8, 4) == "WAVE",
          s"not a WAV: media ${row.media_id}")
        val sr = le32(b, 24)
        val dataLen = le32(b, 40)
        (0, 0, sr, (dataLen / 2) * 1000 / sr, 1)
      case "mp4" =>
        require(new String(b, 4, 4) == "ftyp", s"not an MP4: media ${row.media_id}")
        // walk the box chain: next box starts where ftyp's declared size ends
        val ftypSize = be32(b, 0)
        require(new String(b, ftypSize + 4, 4) == "mdat",
          s"no mdat after ftyp: media ${row.media_id}")
        val mdatLen = be32(b, ftypSize) - 8
        val nFrames = mdatLen / 32
        (0, 0, 0, nFrames * 33, math.min(nFrames, 16)) // uniform frame-sample
      case other => throw new IllegalArgumentException(s"unknown fmt $other")
    }
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(b)
    val feature = Array.tabulate(8) { i => // STUB: model inference goes here
      ((sha(i * 2) & 0xff) * 256 + (sha(i * 2 + 1) & 0xff)) / 65535.0f
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
      .select($"media_id", $"kind", $"fmt", $"n_bytes".cast("long").as("n_bytes"),
        $"decoded_w".cast("long").as("decoded_w"),
        $"decoded_h".cast("long").as("decoded_h"),
        $"sample_rate".cast("long").as("sample_rate"),
        $"duration_ms".cast("long").as("duration_ms"))
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
      .select($"media_id", $"kind", $"fmt", $"n_bytes".cast("long").as("n_bytes"),
        $"decoded_w".cast("long").as("decoded_w"),
        $"decoded_h".cast("long").as("decoded_h"),
        $"sample_rate".cast("long").as("sample_rate"),
        $"duration_ms".cast("long").as("duration_ms"),
        $"frames_sampled".cast("long").as("frames_sampled"))
  }

  /** The m1/m2 DuckDB oracles: every scalar the decode emits is an
    * integer-arithmetic function of doc_id (the synthesis parameters) —
    * so the oracle PREDICTS, from the documents table alone, what the
    * real byte-level synth → (preprocess →) header-decode round trip
    * must produce. A single byte of drift in any header writer or parser
    * breaks the hash. The binary payloads and the stubbed feature vector
    * stay engine-side (LlmOpsSpec pins those pixel/sample-exact).
    */
  private def mediaParamsCte = s"""m AS (
    |  SELECT doc_id AS media_id, doc_id % 3 AS k,
    |         (doc_id % 4) * 8 + 8 AS bw, (doc_id % 3) * 8 + 8 AS bh,
    |         100 + doc_id % 400 AS ns, 30 + doc_id % 270 AS nf
    |  FROM documents)""".stripMargin

  val featurizeOracleSql: String =
    s"""WITH $mediaParamsCte
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
       |  CAST(CASE k WHEN 2 THEN least(nf, 16) ELSE 1 END AS BIGINT) AS frames_sampled
       |FROM m""".stripMargin

  val preprocessOracleSql: String =
    s"""WITH $mediaParamsCte
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
       |              ELSE nf * 33 END AS BIGINT) AS duration_ms
       |FROM m""".stripMargin
}
