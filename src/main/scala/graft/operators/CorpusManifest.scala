package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus snapshot / manifest — the reproducibility contract of a
  * training-data pipeline. A corpus "version" is a set of components
  * (input tables at a watermark, screen-verdict roots, quota-ledger
  * totals, mart partitions, persisted index versions); the manifest is
  * ONE small table — one row per component — that lets any later reader
  * prove it sees the same corpus the version was cut from:
  *
  *   (version, component, n_rows, xor_hash, sum_hash, watermark)
  *
  * Reference analog: the bronze envelope's per-record provenance fields
  * (`kafka_fashion_consumer.py:60-69`) writ corpus-large — instead of
  * stamping each record with where it came from, stamp the corpus with
  * what exactly is in it.
  *
  * Content fingerprint (the design constraint is ORDER-INDEPENDENCE —
  * a 100 TB component's row order is a function of partitioning and
  * scheduling, so any order-sensitive digest is non-reproducible by
  * construction):
  *
  *  - each row is canonicalized to a string: the caller-chosen columns
  *    in the caller-given order, joined with ``, nulls coded as a
  *    `` sentinel (concat_ws silently DROPS nulls, which would
  *    alias (null,"x") with ("x",null));
  *  - `h = low 60 bits of md5(canonical)` as bigint — md5 because it is
  *    hex-identical in every SQL engine (the repo-wide portability rule,
  *    Dedup.scala:11);
  *  - component fingerprint = (bit_xor(h), sum(h mod 2^30), count(*)).
  *    bit_xor is commutative (shuffle-proof) but blind to even
  *    multiplicities — a row appearing twice cancels out; the modular
  *    sum catches multiplicity (each term < 2^30, so the bigint sum is
  *    overflow-safe past 2^33 rows — ANSI mode would throw, not wrap,
  *    before that); the count pins cardinality. All three are
  *    map-side-combinable single-pass aggregates: fingerprinting a
  *    component costs one scan and a 1-row reduce, no shuffle of data.
  *
  * Everything is integer-exact, so a manifest is replayable bit-for-bit
  * by any engine (the mf1/mf2 oracles replay it in DuckDB).
  */
object CorpusManifest {

  /** One component of a corpus version. `canonicalCols` must be
    * cross-engine-stable strings (ints, strings, dates; quantize floats
    * first — see `quantizedVec`); `watermark` is the component's
    * freshness marker (max ingest key/date), rendered as a string.
    */
  final case class Component(name: String, df: DataFrame,
      canonicalCols: Seq[Column], watermark: Column)

  private val FieldSep = ""
  private val NullCode = ""

  /** Canonical per-row string: fixed column order, null-sentinel-coded. */
  def canonical(cols: Seq[Column]): Column =
    concat_ws(FieldSep, cols.map(c => coalesce(c.cast("string"), lit(NullCode))): _*)

  /** Low 60 bits of md5(canonical) as bigint (15 hex chars < 2^63). */
  def rowHash(canon: Column): Column =
    conv(substring(md5(canon), 1, 15), 16, 10).cast("long")

  /** Float-vector column → cross-engine-stable string: per-element
    * floor(x·2^20) (the e4 quantized-Lloyd idiom — ·2^20 is exact in
    * binary FP, floor is deterministic), comma-joined.
    */
  def quantizedVec(vec: Column): Column =
    concat_ws(",",
      transform(vec, x =>
        floor(x.cast("double") * lit(1048576.0d)).cast("long").cast("string")))

  /** Fingerprint one component: exactly one output row. */
  def fingerprint(c: Component): DataFrame = {
    val h = rowHash(canonical(c.canonicalCols))
    // max over the TYPED watermark, cast to string after — a string max
    // over numeric keys would be lexicographic ("9" > "10")
    // (r13: a spread() before the hash was tried here and REVERTED —
    // measured mf1 0.10→0.36, mf2 0.80→1.24: at manifest-component sizes
    // the repartition of full rows costs more than the single-task md5
    // saves; the guide §1 re-measure loop caught it)
    c.df.select(h.as("h"), c.watermark.as("wm"))
      .agg(
        count(lit(1)).as("n_rows"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("xor_hash"),
        coalesce(sum(col("h") % lit(1073741824L)), lit(0L)).as("sum_hash"),
        max(col("wm")).cast("string").as("watermark"))
      .select(lit(c.name).as("component"), col("n_rows"), col("xor_hash"),
        col("sum_hash"), col("watermark"))
  }

  /** Build the manifest for one corpus version: one row per component,
    * sorted by component name (determinism is the whole point).
    */
  def build(version: Long, components: Seq[Component]): DataFrame = {
    require(components.nonEmpty, "manifest of zero components")
    require(components.map(_.name).distinct.size == components.size,
      "duplicate component names")
    components.map(fingerprint)
      .reduce(_.unionAll(_))
      .withColumn("version", lit(version))
      .select("version", "component", "n_rows", "xor_hash", "sum_hash", "watermark")
      .orderBy("component")
  }

  /** Persist a manifest under `dir/version=N` — byte-deterministic: one
    * file, rows in component order, so two builds from the same inputs
    * emit identical bytes (ManifestSpec pins this). The tiny coalesce(1)
    * is correct at any corpus scale: the manifest has one row per
    * component, never per datum.
    */
  def write(manifest: DataFrame, dir: String): Unit = {
    val version = manifest.select(col("version")).limit(1)
      .collect().headOption.map(_.getLong(0))
      .getOrElse(throw new IllegalArgumentException("empty manifest"))
    manifest.coalesce(1).sortWithinPartitions("component")
      .write.mode("overwrite").parquet(s"$dir/version=$version")
  }

  def read(spark: SparkSession, dir: String, version: Long): DataFrame =
    spark.read.parquet(s"$dir/version=$version")

  /** List the versions present under `dir`, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("version=") =>
        n.stripPrefix("version=").toLong }
      .sorted
  }

  /** RETENTION: expire all but the newest `keepLast` manifest versions
    * (the Iceberg `expire_snapshots` shape for this store). Refuses to
    * expire everything — a corpus with no reproducibility record left is
    * an operational error, not a retention policy. Returns the versions
    * it deleted; idempotent (a second call deletes nothing).
    */
  def expire(spark: SparkSession, dir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val vs = versions(spark, dir)
    val doomed = vs.dropRight(keepLast)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/version=$v"), true)
    }
    doomed
  }

  /** Verify a manifest against live components: recompute every
    * fingerprint and compare field by field. One row per component with
    * per-field booleans and `ok` = their conjunction; a component in the
    * manifest but missing from `components` (or vice versa) surfaces as
    * a row with `present = false` rather than silently passing — a
    * verification that can't see a component must fail loudly.
    */
  def verify(manifest: DataFrame, components: Seq[Component]): DataFrame = {
    val recomputed = components.map(fingerprint).reduce(_.unionAll(_))
    val m = manifest.select(col("component"),
      col("n_rows").as("m_rows"), col("xor_hash").as("m_xor"),
      col("sum_hash").as("m_sum"), col("watermark").as("m_wm"))
    m.join(recomputed, Seq("component"), "full_outer")
      .select(
        col("component"),
        (col("m_rows").isNotNull && col("n_rows").isNotNull).as("present"),
        coalesce(col("m_rows") === col("n_rows"), lit(false)).as("rows_ok"),
        coalesce(col("m_xor") === col("xor_hash"), lit(false)).as("xor_ok"),
        coalesce(col("m_sum") === col("sum_hash"), lit(false)).as("sum_ok"),
        coalesce(col("m_wm") <=> col("watermark"), lit(false)).as("wm_ok"))
      .withColumn("ok",
        col("present") && col("rows_ok") && col("xor_ok") && col("sum_ok") && col("wm_ok"))
      .orderBy("component")
  }

  /** Diff two manifests (old version → new version): one row per
    * component with its transition status — the "what changed between
    * corpus v(N−1) and vN" audit every retraining decision starts from.
    * `rows_delta` is signed (added components contribute +n_rows,
    * removed ones −n_rows); `content_changed` means the fingerprint
    * moved even if the row count did not (in-place edits);
    * `watermark_advanced` distinguishes append-style growth from
    * rewrites. Manifest-sized inputs → a broadcast-trivial full-outer
    * join, regardless of corpus scale.
    */
  def diff(oldM: DataFrame, newM: DataFrame): DataFrame = {
    def side(df: DataFrame, tag: String) = df.select(
      col("component"),
      col("n_rows").as(s"${tag}_rows"), col("xor_hash").as(s"${tag}_xor"),
      col("sum_hash").as(s"${tag}_sum"), col("watermark").as(s"${tag}_wm"))
    side(oldM, "o").join(side(newM, "n"), Seq("component"), "full_outer")
      .select(
        col("component"),
        when(col("o_rows").isNull, lit("added"))
          .when(col("n_rows").isNull, lit("removed"))
          .when(col("o_xor") === col("n_xor") && col("o_sum") === col("n_sum") &&
            col("o_rows") === col("n_rows") && col("o_wm") <=> col("n_wm"),
            lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        (coalesce(col("n_rows"), lit(0L)) - coalesce(col("o_rows"), lit(0L)))
          .as("rows_delta"),
        (!(col("o_xor") <=> col("n_xor")) || !(col("o_sum") <=> col("n_sum")))
          .as("content_changed"),
        coalesce(col("n_wm") > col("o_wm"), lit(false)).as("watermark_advanced"))
      .orderBy("component")
  }

  /** Snapshot a full intake run (the composed StreamingIntake outputs)
    * as one corpus version: the verdict root, the quota-ledger totals
    * (per-lang admitted counts — the number a mixture rebalance reads),
    * and the band-index postings. The caller adds input-table components
    * via [[Component]] directly. Returns the manifest it wrote.
    */
  def snapshotIntakeRun(spark: SparkSession, version: Long,
      verdictDir: String, ledgerDir: String, indexDir: String,
      manifestDir: String): DataFrame = {
    val verdicts = spark.read.parquet(verdictDir)
    val ledger = spark.read.option("basePath", ledgerDir).parquet(ledgerDir)
      .groupBy(col("lang")).agg(sum(col("n_admitted")).as("n_admitted"))
    val postings = spark.read.option("basePath", indexDir).parquet(indexDir)
    val components = Seq(
      Component("intake_verdicts", verdicts,
        Seq(col("doc_id"), col("admitted")), col("doc_id")),
      Component("quota_ledger_totals", ledger,
        Seq(col("lang"), col("n_admitted")), col("lang")),
      Component("band_index", postings,
        Seq(col("doc_id"), col("band_idx"), col("band_key")), col("doc_id")))
    val manifest = build(version, components)
    write(manifest, manifestDir)
    read(spark, manifestDir, version)
  }

  /** The components of a stream-maintained IVF index
    * ([[graft.streaming.StreamingIvf]]'s layout): the frozen codebook
    * (its fingerprint IS the "index version" — any retrain shows as a
    * changed centroids component) and the live postings (pending-aware
    * scan, so a manifest cut mid-compaction fingerprints exactly the
    * rows a probe would see). Feed these to [[build]]/[[verify]] to pin
    * an index version inside a corpus snapshot.
    */
  def ivfIndexComponents(spark: SparkSession, indexDir: String): Seq[Component] = {
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val postings = graft.streaming.PartitionedIndex
      .scan(spark, s"$indexDir/postings")
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "vec_id bigint, cell_id int")))
    Seq(
      Component("ivf_centroids", cents,
        Seq(col("cell_id"), concat_ws(",", transform(col("cq"), _.cast("string")))),
        col("cell_id")),
      Component("ivf_postings", postings,
        Seq(col("vec_id"), col("cell_id")), col("vec_id")))
  }

  /** SCHEMA drift surveillance: a component whose ROWS are another
    * component's schema fields `(ordinal, name, ddl_type, nullable)` —
    * one row per column. No new manifest machinery: [[build]] fingerprints
    * the field rows like any data, so a column added, dropped, renamed,
    * retyped, or re-nullabled between two versions surfaces as a
    * `changed`/`rows_delta` row in [[diff]] — and a training run can pin
    * "same schema I trained against" in [[verify]]. (The row-content
    * hashes catch VALUE drift; without this, a lossless cast — e.g. int →
    * string of the same digits — could slip through, since canonical
    * strings erase types.)
    */
  def schemaComponent(name: String, df: DataFrame): Component = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
      (i, f.name, f.dataType.sql, f.nullable)
    }
    Component(name, fields.toDF("ordinal", "col_name", "ddl_type", "nullable"),
      Seq(col("ordinal"), col("col_name"), col("ddl_type"), col("nullable")),
      col("ordinal"))
  }
}
