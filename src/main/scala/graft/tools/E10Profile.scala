package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Controlled steady-state timing of e10 (residual IVF×PQ) after the r12
  * #4 fix (postings carry cell_id from the residual corpus — the former
  * per-evaluation assigned⋈encoded join is gone, both top-k cuts are
  * bounded-heap). Times the full query N times in one JVM after the
  * memoized index builds are warm, plus the RETIRED sub-plan (the
  * corpus-wide codes join) for attribution.
  */
object E10Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val sorted = ts.map(_._1).sorted
      println(f"[e10prof] $label%-40s median ${sorted(runs / 2)}%.3f s  " +
        s"runs=${ts.map(t => f"${t._1}%.3f").mkString(",")}  rows=${ts.head._2}")
    }

    // warm the memoized builds (index construction is once-per-corpus
    // cost, not per-query cost)
    val ivf = graft.operators.IvfIndex.indexQFor(spark, dir, 16)
    val rpq = graft.operators.IvfPqResidual.indexFor(spark, dir, 16)
    ivf.assigned.count(); rpq.postings.count()
    graft.operators.IvfPqResidual.query(spark, dir).count() // codegen warm-up

    time("e10 query (steady state)")(
      graft.operators.IvfPqResidual.query(spark, dir).count())

    // attribution: plan construction+analysis only (no action)
    time("e10 plan build only (no action)") {
      graft.operators.IvfPqResidual.query(spark, dir); 0L
    }
    // one pre-built plan, repeated actions (pure execution cost)
    val prebuilt = graft.operators.IvfPqResidual.query(spark, dir)
    time("e10 prebuilt plan, repeated count")(prebuilt.count())

    // the retired per-evaluation sub-plan, for attribution
    val retired = ivf.assigned.select(col("vec_id"), col("cell_id"))
      .join(rpq.postings.select(col("vec_id"), col("codes")), Seq("vec_id"))
    time("retired sub-plan (assigned⋈codes join)")(retired.count())

    spark.stop()
  }
}
