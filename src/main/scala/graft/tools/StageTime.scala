package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Generic per-stage wall/task-time attribution for named queries —
  * the round-14 optimization loop's "which stage is slow" tool (the
  * guide's Stages-tab reading, headless). For each named query: one
  * cold run, one warm run (stats cleared in between), then the warm
  * run's stages sorted by summed task runtime with shuffle/spill
  * bytes and the stage's first plan line, so a regression can be
  * pinned to an operator without the UI.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.StageTime q65_pagerank_fixpoint ... */
object StageTime {

  /** stageId -> (Σ task runtime ms, max task runtime ms, n tasks,
    * shuffle read bytes, shuffle write bytes, spill disk bytes). */
  private val stages =
    new ConcurrentHashMap[Int, (Long, Long, Long, Long, Long, Long)]()
  private val stageNames = new ConcurrentHashMap[Int, (String, Long)]()

  private final class TimeListener extends SparkListener {
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val info = s.stageInfo
      val wall = (for {
        a <- info.completionTime
        b <- info.submissionTime
      } yield a - b).getOrElse(0L)
      val scopes = info.rddInfos.sortBy(_.id)
        .map(r => r.scope.map(_.name).getOrElse(r.name))
        .distinct.mkString(">").take(110)
      stageNames.put(info.stageId, (scopes, wall))
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) stages.merge(t.stageId,
        (m.executorRunTime, m.executorRunTime, 1L,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.diskBytesSpilled),
        (a, b) => (a._1 + b._1, math.max(a._2, b._2), a._3 + b._3,
          a._4 + b._4, a._5 + b._5, a._6 + b._6))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.localDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new TimeListener)
    val all = SparkEntry.queries ++ SparkEntry.benchExtras
    all("q1_agg")(spark, sfDir).write.format("noop").mode("overwrite").save()

    args.foreach { name =>
      val fn = all(name)
      def once(): Double = {
        graft.Sessions.releaseBlocks(spark)
        stages.clear(); stageNames.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = once()
      println(f"[stagetime] $name%-28s cold=$cold%8.3f warm=$warm%8.3f " +
        f"stages=${stages.size}%d")
      import scala.jdk.CollectionConverters._
      val top = stages.asScala.toSeq.sortBy(-_._2._1).take(12)
      top.foreach { case (sid, (sum, mx, n, sr, sw, sp)) =>
        val (nm, wall) = stageNames.getOrDefault(sid, ("?", 0L))
        println(f"[stagetime]   stage $sid%5d wall=${wall / 1e3}%7.2f " +
          f"taskSum=${sum / 1e3}%8.2f max=${mx / 1e3}%6.2f n=$n%4d " +
          f"sRd=${sr / 1e6}%8.1f MB sWr=${sw / 1e6}%8.1f MB " +
          f"spill=${sp / 1e6}%7.1f MB $nm")
      }
    }
    spark.stop()
  }
}
