package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.CorpusManifest
import graft.operators.CorpusManifest.Component

/** Driver-gated corpus snapshot/manifest queries (VERDICT r8 item 2).
  *
  * mf1 fingerprints three heterogeneous corpus components (text docs,
  * float-vector embeddings, a timestamped fact table) into one manifest;
  * the oracle replays the exact md5/bit_xor/modular-sum arithmetic in
  * DuckDB — any drift in canonicalization, null coding, quantization, or
  * aggregation breaks the hash match.
  *
  * mf2 drives the FULL snapshot lifecycle under the gate: build →
  * parquet write → read back → verify against live recomputation. The
  * verify booleans are a d3f-style boolean contract (the engine must
  * derive all-true from an actual round trip; the oracle recomputes the
  * per-component counts alongside, so the row is not vacuous).
  * Tamper detection (flip a manifest field → ok=false) is spec-gated in
  * ManifestSpec — a driver query must be deterministic, so the negative
  * case can't live here.
  */
object Manifest {

  private val sep = "chr(1)"
  private val nul = "chr(2)"

  private def duckCol(c: String) = s"coalesce(CAST($c AS VARCHAR), $nul)"
  private def duckCanon(cols: Seq[String]) =
    cols.map(duckCol).mkString(s" || $sep || ")

  /** The CorpusManifest row-hash in DuckDB — shared with c4's release
    * fingerprint (one definition, no drift).
    */
  private[queries] def duckHash(canon: String) =
    s"CAST('0x' || substr(md5($canon), 1, 15) AS BIGINT)"

  /** `duckHash` over a canonicalized column list (the engine's
    * [[CorpusManifest.canonical]] + [[CorpusManifest.rowHash]]).
    */
  private[queries] def duckRowHash(cols: Seq[String]): String =
    duckHash(duckCanon(cols))
  private val duckVecQ =
    "array_to_string(list_transform(embedding, " +
      "x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)), ',')"

  private def duckComponent(name: String, table: String, canonCols: Seq[String],
      watermark: String): String =
    s"""SELECT '$name' AS component,
       |       CAST(count(*) AS BIGINT) AS n_rows,
       |       coalesce(bit_xor(${duckHash(duckCanon(canonCols))}), 0) AS xor_hash,
       |       CAST(coalesce(sum(${duckHash(duckCanon(canonCols))} % 1073741824), 0) AS BIGINT) AS sum_hash,
       |       CAST(max($watermark) AS VARCHAR) AS watermark
       |FROM $table""".stripMargin

  // the three mf1 components — kept in ONE place so engine and oracle
  // can't drift on the column lists
  private def components(s: org.apache.spark.sql.SparkSession, dir: String) = Seq(
    Component("documents", Tables.documents(s, dir),
      Seq(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars")),
      col("doc_id")),
    Component("embeddings", Tables.embeddings(s, dir),
      Seq(col("vec_id"), CorpusManifest.quantizedVec(col("embedding")), col("label")),
      col("vec_id")),
    Component("orders", Tables.orders(s, dir),
      Seq(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * lit(100.0d)).cast("long"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
        col("o_orderpriority")),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")))

  private val duckComponents = Seq(
    duckComponent("documents", "documents",
      Seq("doc_id", "text", "lang", "source", "n_chars"), "doc_id"),
    duckComponent("embeddings", "embeddings",
      Seq("vec_id", duckVecQ, "label"), "vec_id"),
    duckComponent("orders", "orders",
      Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(floor(o_totalprice * 100) AS BIGINT)",
        "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')", "o_orderpriority"),
      "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')"))

  private val duckManifestSql =
    duckComponents
      .map(c => s"SELECT CAST(1 AS BIGINT) AS version, * FROM ($c)")
      .mkString("\nUNION ALL\n")

  /** MF1: the manifest itself, hash-exact across engines. */
  val corpusManifest = Q("mf1_corpus_manifest", duckManifestSql) { (s, dir) =>
    CorpusManifest.build(1L, components(s, dir))
  }

  /** MF2: full lifecycle — build, persist (byte-deterministic single
    * file under version=1), read back, verify vs live recomputation.
    * Output: per component, the manifest's n_rows plus the five verify
    * booleans, which the round trip must prove all-true.
    */
  val manifestVerify = Q("mf2_manifest_verify",
    duckComponents.map { c =>
      s"""SELECT component, n_rows, TRUE AS present, TRUE AS rows_ok,
         |TRUE AS xor_ok, TRUE AS sum_ok, TRUE AS wm_ok, TRUE AS ok
         |FROM ($c)""".stripMargin
    }.mkString("\nUNION ALL\n")) { (s, dir) =>
    val comps = components(s, dir)
    val manifestDir = s"${System.getProperty("java.io.tmpdir")}/graft_mf2_" +
      Memo.fingerprint(s, dir)
    CorpusManifest.write(CorpusManifest.build(1L, comps), manifestDir)
    val persisted = CorpusManifest.read(s, manifestDir, 1L)
    CorpusManifest.verify(persisted, comps)
      .join(persisted.select(col("component"), col("n_rows")), Seq("component"))
      .select("component", "n_rows", "present", "rows_ok", "xor_ok",
        "sum_ok", "wm_ok", "ok")
  }

  /** MF3: manifest DIFF — the audit a retraining decision starts from:
    * what changed between corpus v1 and v2? The fixture covers every
    * transition in one result: documents CHANGED (v2 drops doc_id % 7 ==
    * 0 — content hash and count both move), embeddings UNCHANGED, orders
    * REMOVED, events ADDED. The oracle replays both versions' fingerprints
    * and the same status derivation. (At 100 TB the diff itself is a
    * |components|-row join — corpus size only enters through the
    * fingerprint scans, one per live component.)
    */
  val manifestDiff = Q("mf3_manifest_diff", {
    val docsV2 = "(SELECT * FROM documents WHERE doc_id % 7 <> 0) AS t"
    val eventsCanon = Seq("event_id", "user_id", "event_type")
    def union(cs: Seq[String]) =
      cs.map(c => s"SELECT * FROM ($c)").mkString("\nUNION ALL\n")
    val oldSql = union(Seq(
      duckComponent("documents", "documents",
        Seq("doc_id", "text", "lang", "source", "n_chars"), "doc_id"),
      duckComponent("embeddings", "embeddings",
        Seq("vec_id", duckVecQ, "label"), "vec_id"),
      duckComponent("orders", "orders",
        Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "CAST(floor(o_totalprice * 100) AS BIGINT)",
          "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')", "o_orderpriority"),
        "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')")))
    val newSql = union(Seq(
      duckComponent("documents", docsV2,
        Seq("doc_id", "text", "lang", "source", "n_chars"), "doc_id"),
      duckComponent("embeddings", "embeddings",
        Seq("vec_id", duckVecQ, "label"), "vec_id"),
      duckComponent("events", "events", eventsCanon, "event_id")))
    s"""WITH o AS ($oldSql),
       |n AS ($newSql)
       |SELECT coalesce(o.component, n.component) AS component,
       |  CASE WHEN o.component IS NULL THEN 'added'
       |       WHEN n.component IS NULL THEN 'removed'
       |       WHEN o.xor_hash = n.xor_hash AND o.sum_hash = n.sum_hash
       |            AND o.n_rows = n.n_rows AND o.watermark = n.watermark
       |         THEN 'unchanged'
       |       ELSE 'changed' END AS status,
       |  coalesce(n.n_rows, 0) - coalesce(o.n_rows, 0) AS rows_delta,
       |  (o.component IS NULL OR n.component IS NULL
       |   OR o.xor_hash <> n.xor_hash OR o.sum_hash <> n.sum_hash)
       |    AS content_changed,
       |  coalesce(n.watermark > o.watermark, FALSE) AS watermark_advanced
       |FROM o FULL OUTER JOIN n ON o.component = n.component""".stripMargin
  }) { (s, dir) =>
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(s, dir)
    val emb = Component("embeddings", Tables.embeddings(s, dir),
      Seq(col("vec_id"), CorpusManifest.quantizedVec(col("embedding")), col("label")),
      col("vec_id"))
    val v1 = CorpusManifest.build(1L, Seq(
      Component("documents", docs,
        Seq(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars")),
        col("doc_id")),
      emb,
      Component("orders", Tables.orders(s, dir),
        Seq(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * lit(100.0d)).cast("long"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
          col("o_orderpriority")),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))))
    val v2 = CorpusManifest.build(2L, Seq(
      Component("documents", docs.filter(col("doc_id") % 7 =!= 0),
        Seq(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars")),
        col("doc_id")),
      emb,
      Component("events", Tables.events(s, dir),
        Seq(col("event_id"), col("user_id"), col("event_type")), col("event_id"))))
    CorpusManifest.diff(v1, v2)
  }

  val queries: Seq[Q] = Seq(corpusManifest, manifestVerify, manifestDiff)
}
