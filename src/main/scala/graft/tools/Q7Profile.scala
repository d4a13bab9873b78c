package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Variance postmortem for q7_volume_shipping (the r11 `weak` flag: its
  * committed in-context baseline read 0.34 s while standalone/driver runs
  * read 0.76–1.81 s with zero code change). This tool names the variance
  * source with data instead of conjecture: it runs q7 N times in one JVM
  * and, per run, splits wall time into the stage-metric buckets —
  * executor CPU, scan/input, shuffle write, shuffle fetch wait, GC,
  * task-scheduling gap (wall − max stage span), and result serialization.
  * Whatever bucket swings between the fast and slow runs is the source.
  */
object Q7Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_Q7_RUNS", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class StageRow(
        executorRunMs: Long, executorCpuMs: Long, gcMs: Long,
        shuffleWriteMs: Long, fetchWaitMs: Long,
        inputBytes: Long, shuffleWriteBytes: Long, shuffleReadBytes: Long,
        resultSerMs: Long, tasks: Int)
    val stages = new ConcurrentLinkedQueue[StageRow]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) stages.add(StageRow(
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.jvmGCTime,
          m.shuffleWriteMetrics.writeTime / 1000000L,
          m.shuffleReadMetrics.fetchWaitTime,
          m.inputMetrics.bytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.totalBytesRead,
          m.resultSerializationTime,
          sc.stageInfo.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val q = graft.SparkEntry.registry.find(_.name == "q7_volume_shipping").get
    q.run(spark, dir).count() // warm-up (codegen, broadcast, page cache)

    println("[q7prof] run wall_s nstages ntasks execRun_s execCpu_s gc_s " +
      "shufWrite_s fetchWait_s resultSer_s input_MB shufW_MB shufR_MB")
    (1 to runs).foreach { i =>
      stages.clear()
      val t0 = System.nanoTime()
      q.run(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let the listener bus drain so this run's stages are all counted
      Thread.sleep(400)
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toVector
      def s(f: StageRow => Long): Double = ss.map(f).sum / 1000.0
      def mb(f: StageRow => Long): Double = ss.map(f).sum / 1048576.0
      println(f"[q7prof] $i%3d $wall%7.3f ${ss.size}%7d ${ss.map(_.tasks).sum}%6d " +
        f"${s(_.executorRunMs)}%9.3f ${s(_.executorCpuMs)}%9.3f ${s(_.gcMs)}%5.3f " +
        f"${s(_.shuffleWriteMs)}%10.3f ${s(_.fetchWaitMs)}%10.3f ${s(_.resultSerMs)}%11.3f " +
        f"${mb(_.inputBytes)}%8.1f ${mb(_.shuffleWriteBytes)}%8.1f ${mb(_.shuffleReadBytes)}%8.1f")
    }
    spark.stop()
  }
}
