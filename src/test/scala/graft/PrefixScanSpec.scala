package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PrefixScan

/** Gates for the distributed prefix scan: bucketed scan ≡ the global
  * single-partition window it replaces, bucket-granularity invariance
  * (any monotone bucketing yields the identical prefix), and the w19
  * sweep-line conservation law (concurrency returns to zero).
  */
class PrefixScanSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private lazy val deltas = {
    // a deterministic signed-delta frame with same-key ties: (t, delta, id)
    val n = 500
    spark.range(n).select(
      (col("id") % 40).as("t"),
      when(col("id") % 2 === 0, 1L).otherwise(-1L).as("delta"),
      col("id"))
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("bucketed scan equals the global window") {
    val got = PrefixScan.runningSum(deltas, bucket = col("t") / 8,
      order = Seq(col("t"), col("delta"), col("id")),
      value = col("delta"), out = "run")
    val want = deltas.withColumn("run",
      sum(col("delta")).over(Window.orderBy(col("t"), col("delta"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(canon(got) == canon(want))
  }

  test("bucket granularity never changes the prefix (coarse ≡ fine ≡ constant)") {
    def scan(bucket: org.apache.spark.sql.Column) =
      PrefixScan.runningSum(deltas, bucket,
        order = Seq(col("t"), col("delta"), col("id")),
        value = col("delta"), out = "run")
    val fine = scan(col("t"))            // one bucket per key
    val coarse = scan(col("t") / 13)     // uneven 13-key bands
    val one = scan(lit(0))               // degenerate single bucket
    assert(canon(fine) == canon(coarse) && canon(coarse) == canon(one))
  }

  test("a24 ABC classes: conservation + A-parts outrank B-parts outrank C-parts") {
    val out = graft.queries.Aggregations.a24AbcPareto.run(spark, sfDir).cache()
    val classes = out.collect().map(r => r.getAs[String]("abc_class") ->
      (r.getAs[Long]("n_parts"), r.getAs[Long]("class_cents"))).toMap
    // conservation against the raw fact
    val raw = Tables.lineitem(spark, sfDir)
      .groupBy($"l_partkey").agg(sum((graft.queries.Exact.dec2($"l_extendedprice") * 100)
        .cast("long")).as("rev"))
      .agg(count(lit(1)).as("n"), sum($"rev").as("c")).collect().head
    assert(classes.values.map(_._1).sum == raw.getAs[Long]("n"))
    assert(classes.values.map(_._2).sum == raw.getAs[Long]("c"))
    // class A is a PREFIX of the revenue-sorted list: every A part's
    // revenue >= every B part's, and every B's >= every C's
    val pr = Tables.lineitem(spark, sfDir)
      .groupBy($"l_partkey".as("p"))
      .agg(sum((graft.queries.Exact.dec2($"l_extendedprice") * 100).cast("long")).as("rev"))
    val sorted = pr.orderBy($"rev".desc, $"p").select($"rev").as[Long].collect()
    val nA = classes.get("A").map(_._1).getOrElse(0L).toInt
    val nB = classes.get("B").map(_._1).getOrElse(0L).toInt
    if (nA > 0 && nB > 0) assert(sorted(nA - 1) >= sorted(nA))
    if (nB > 0 && nA + nB < sorted.length) assert(sorted(nA + nB - 1) >= sorted(nA + nB))
    // and the A prefix really carries >= 80% only once C is nonempty
    assert(classes.contains("A") && classes.contains("C"))
  }

  test("w19 peaks match a brute-force single-window sweep on the same sessions") {
    val out = graft.queries.AdvancedOps.peakConcurrency.run(spark, sfDir)
    // independent recompute: sessions → deltas → ONE global window (fine
    // at sf0.001), then per-day peaks — must agree with the bucketed scan
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sess = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", unix_micros($"ts").as("ts_us"))
      .withColumn("new_session",
        when(lag($"ts_us", 1).over(byUser).isNull
          || $"ts_us" - lag($"ts_us", 1).over(byUser) > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum($"new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts_us").as("s_us"), max($"ts_us").as("e_us"))
    val d = sess.select($"s_us".as("t_us"), lit(1L).as("delta"), $"user_id", $"session_id")
      .unionByName(sess.select(($"e_us" + 1).as("t_us"), lit(-1L).as("delta"),
        $"user_id", $"session_id"))
    // conservation: every +1 has a −1, so the sweep ends at zero
    assert(d.agg(sum($"delta")).as[Long].head() == 0L)
    val brute = d.withColumn("conc", sum($"delta").over(
        Window.orderBy($"t_us", $"delta", $"user_id", $"session_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(date_format(timestamp_micros($"t_us"), "yyyy-MM-dd").as("day"))
      .agg(max($"conc").cast("long").as("peak_concurrency"),
        count(lit(1)).as("n_changes"))
    assert(canon(out) == canon(brute))
  }
}
