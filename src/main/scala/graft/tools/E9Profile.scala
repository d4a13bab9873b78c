package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{IvfIndex, PqIndex}

/** Stage-level profile of e9 (IVF×PQ ANN) — the r11 watch-list item:
  * adjudicate whether the repeated per-evaluation cost is the ADC-table
  * build, the corpus-wide assigned⋈encoded codes join, the interpreted
  * ADC fold, or codegen warm-up. Times each sub-plan separately, three
  * runs each, after the shared indexes are memoized (the bench's own
  * warm-up discipline).
  */
object E9Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.FloatVecDot.register(spark)

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[e9prof] $label%-34s ${ts.map(_._1).map(t => f"$t%.3f").mkString(" ")} s  (rows=${ts.head._2})")
    }

    // memoized builds (warm them first, untimed)
    val ivf = IvfIndex.indexQFor(spark, dir, 16)
    val pq = PqIndex.indexFor(spark, dir)
    ivf.assigned.count(); pq.encoded.count()

    val probes = Tables.embeddings(spark, dir).filter(col("vec_id") < 16)

    time("probeCells")(IvfIndex.probeCells(probes, ivf, 4).count())

    // pre-fix shape: the corpus-wide codes join that ran PER EVALUATION
    // (now materialized once as IvfPq.postingsFor — timed next)
    val members = ivf.assigned.select(col("vec_id"), col("cell_id"))
      .join(pq.encoded.select(col("vec_id"), col("codes")), Seq("vec_id"))
    time("members join (assigned⋈encoded)")(members.count())
    val postings = graft.operators.IvfPq.postingsFor(spark, dir)
    postings.count() // warm the persist, untimed
    time("postings scan (materialized)")(postings.count())

    val probeT = probes
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        PqIndex.quantizeCol(col("embedding")).as("pq"))
      .select(col("query_id"), col("q_emb"),
        PqIndex.adcTable(spark, pq, col("pq")).as("dt"))
    time("probeT (ADC tables, 16 rows)")(probeT.count())

    val probeCells = IvfIndex.probeCells(probes, ivf, 4)
    val cand = probeCells.join(members, Seq("cell_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .join(broadcast(probeT), Seq("query_id"))
    time("candidates (no ADC)")(cand.count())

    val adc = cand.select(col("query_id"), col("q_emb"),
      col("vec_id").as("neighbor_id"),
      PqIndex.adcDistance(col("dt"), col("codes")).as("approx_d2"))
    time("candidates + ADC fold")(adc.count())

    time("full e9")(graft.operators.IvfPq.query(spark, dir).count())
    spark.stop()
  }
}
