package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/
  * video as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample operators a training
  * pipeline runs over them.
  *
  * The decode step is a clearly-marked STUB (no media codecs in this
  * container): `decodeStub` produces a deterministic fake feature vector
  * from the bytes. Everything Spark-side is real and tested — the schema,
  * the per-kind repartitioning (codec/batch affinity), the
  * `mapPartitions` batch shape (the Scala analog of `mapInPandas`:
  * partition-at-a-time iterators, batched to bound peak memory), and the
  * typed row contracts.
  *
  * Scale notes (100 TB of media): bytes stay opaque through the plan —
  * no shuffle ever carries decoded frames; featurization is a narrow
  * partition-local map; `repartition(kind)` groups rows so a partition
  * loads one codec; parquet binary chunks + `spark.sql.files.
  * maxPartitionBytes` bound task input size.
  */
object Multimodal {

  /** Typed row contracts (the `mapInPandas` schema equivalent). */
  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int, fmt: String)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int, content_sha: String,
      feature: Array[Float], frames_sampled: Int)

  val batchSize = 64 // rows decoded per in-memory batch (mapInPandas batch shape)

  /** Synthesize a media table over the documents corpus: deterministic
    * fake bytes (sha2-derived, repeated to a plausible size) + typed
    * metadata. Stands in for a real `(path, bytes)` ingest such as
    * `spark.read.format("binaryFile")`.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
      $"doc_id".as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        pmod($"doc_id", lit(3)).cast("int") + 1).as("kind"),
      // opaque payload: hex of sha2 repeated — deterministic, binary-typed
      repeat(sha2($"text", 256), 8).cast("binary").as("bytes"),
      (pmod($"doc_id", lit(4)).cast("int") * 112 + 224).as("width"),
      (pmod($"doc_id", lit(3)).cast("int") * 112 + 224).as("height"),
      when(pmod($"doc_id", lit(3)) === 1, 16000).otherwise(0).as("sample_rate"),
      when(pmod($"doc_id", lit(3)) === 2, 300).otherwise(1).as("n_frames"),
      element_at(array(lit("jpeg"), lit("wav"), lit("mp4")),
        pmod($"doc_id", lit(3)).cast("int") + 1).as("fmt"))
  }

  /** STUB ??? — the real implementation decodes `bytes` with an image/
    * audio/video codec and runs a feature extractor; neither library
    * exists in this container. The stub derives a deterministic
    * 8-dim pseudo-feature from the payload bytes so the plumbing
    * (schema, batching, partitioning) is fully exercisable.
    */
  private def decodeStub(row: MediaRow): MediaFeatures = {
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(row.bytes)
    val feature = Array.tabulate(8) { i =>
      ((sha(i * 2) & 0xff) * 256 + (sha(i * 2 + 1) & 0xff)) / 65535.0f
    }
    val frames = row.kind match {
      case "video" => math.min(row.n_frames, 16) // uniform frame-sample stub
      case _ => 1
    }
    MediaFeatures(row.media_id, row.kind, row.bytes.length,
      sha.map("%02x".format(_)).mkString, feature, frames)
  }

  /** Featurize: repartition by kind (one codec per partition), then a
    * partition-local batched decode — the Scala analog of `mapInPandas`
    * with `batchSize`-row batches.
    */
  def featurize(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.repartition(col("kind")).as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // real impl: one codec context per batch, vectorized decode
          batch.iterator.map(decodeStub)
        }
      }
  }

  /** Driver-facing rows-only query: featurize the synthesized media table
    * and project the comparable metadata (bytes/features stay engine-side).
    */
  def featurizeQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    featurize(spark, mediaTable(spark, dir))
      .select($"media_id", $"kind", $"n_bytes", $"content_sha", $"frames_sampled")
  }
}
