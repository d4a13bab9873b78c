package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Z-order layout gates: the key is a true Morton interleave, the
  * rewrite preserves rows exactly, and — the point of the operator — a
  * 2-D box filter reads measurably fewer rows through the scan than the
  * same data sorted on one dimension (parquet row-group stats prune on
  * BOTH dimensions only when the layout localizes both).
  */
class ZOrderSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  test("zValue is the Morton interleave (matches a reference implementation)") {
    def morton(x: Int, y: Int): Long =
      (0 until 8).map(i => (((x >> i) & 1).toLong << (2 * i)) |
        (((y >> i) & 1).toLong << (2 * i + 1))).reduce(_ | _)
    val rows = Seq((0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (85, 170), (37, 201))
    val got = rows.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue($"x", $"y", bits = 8).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    for ((x, y) <- rows)
      assert(got((x, y)) == morton(x, y), s"($x, $y)")
    // alternating-bit sanity: x=170 fills the odd SOURCE bits -> even
    // target positions 2,6,10,14; y=85 fills 1,5,9,13 -> 0x6666 (and the
    // swapped pair the complement 0x9999)
    assert(got((170, 85)) == 0x6666L && got((85, 170)) == 0x9999L)
  }

  test("bits=16 with IntegerType columns never goes negative (sign-bit widening)") {
    val got = Seq((65535, 65535), (0, 65535), (65535, 0), (32768, 32768))
      .toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", bits = 16).as("z"))
      .collect().map(_.getLong(0))
    assert(got.forall(_ >= 0L), s"negative Morton keys: ${got.mkString(",")}")
    assert(got(0) == 0xFFFFFFFFL) // all 32 low bits set
  }

  private def randomPoints(n: Int): Seq[(Long, Int, Int)] = {
    // independent uniform dims — a linear-congruential pair like
    // (a*i %256, b*i %256) degenerates to a 1-D curve (x determines y)
    // and makes any space-filling layout meaningless
    val rnd = new scala.util.Random(42)
    (0 until n).map(i => (i.toLong, rnd.nextInt(256), rnd.nextInt(256)))
  }

  test("z-ordered rewrite preserves rows exactly") {
    val dir = Files.createTempDirectory("graft-z").resolve("t").toString
    val df = randomPoints(20000).toDF("id", "x", "y")
    ZOrder.writeZOrdered(df, "x", "y", dir, nFiles = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == 20000)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("2-D box filter scans fewer rows on z-ordered layout than 1-D sorted layout") {
    val n = 200000
    val df = randomPoints(n).toDF("id", "x", "y")
    val zDir = Files.createTempDirectory("graft-z2").resolve("z").toString
    val linDir = Files.createTempDirectory("graft-z3").resolve("lin").toString
    // repartitionByRange samples only 100 rows/partition by default;
    // noisy quantile boundaries occasionally produce one fat file whose
    // z-range spans the query box, erasing the localization this test
    // measures (observed once in a full-suite run: z read 12.7% like the
    // 1-D layout). Layout writes should pin a real sample size — same
    // note in ZOrder's scaladoc for production rewrites.
    val sampleKey = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prevSample = spark.conf.getOption(sampleKey)
    try {
      spark.conf.set(sampleKey, "2000")
      ZOrder.writeZOrdered(df, "x", "y", zDir, nFiles = 32)
      // the 1-D strawman: same file count, sorted on x only
      df.repartitionByRange(32, $"x").sortWithinPartitions($"x")
        .write.mode("overwrite").parquet(linDir)
    } finally prevSample match {
      case Some(v) => spark.conf.set(sampleKey, v)
      case None => spark.conf.unset(sampleKey)
    }

    def scannedRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter($"x" >= 32 && $"x" < 64 && $"y" >= 32 && $"y" < 64)
      q.collect()
      val scan = q.queryExecution.executedPlan.collectLeaves()
        .find(_.metrics.contains("numOutputRows")).get
      scan.metrics("numOutputRows").value
    }
    val zRows = scannedRows(zDir)
    val linRows = scannedRows(linDir)
    info(f"scan output rows — z-ordered: $zRows, x-sorted: $linRows")
    // the box is (32/256)² ≈ 1.6% of the space; the x-sort can prune to
    // ~12.5% at best (one dimension), z-order localizes both
    assert(zRows < linRows,
      s"z-order should out-prune the 1-D sort: z=$zRows vs linear=$linRows")
    assert(zRows < n / 8, s"z-order pruned too little: $zRows of $n")
  }
}
