package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Overlap}

/** Stage-level profile of q107 (asymmetric containment): times each
  * pipeline prefix through the noop sink so the sf10 budget
  * (VERDICT r9 #3) can be attributed — inverted-index build vs df
  * gate vs posting-pair counting vs the size joins — and, since
  * round 14, attributes MEMORY per stage (the round-13 sf10 chain
  * caught a task-level OOM at the default 16 GiB heap, so the
  * budget question became an allocation question): per pipeline
  * step, the listener reports each Spark stage's max single-task
  * peak execution memory and its spill totals, which names the
  * allocation site a heap-marginal run dies at.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ107 */
object ProfileQ107 {

  /** stageId -> (max task peak exec mem, Σ mem spill, Σ disk spill,
    * Σ shuffle write bytes, task count). */
  private val stages =
    new ConcurrentHashMap[Int, (Long, Long, Long, Long, Long)]()
  private val stageNames = new ConcurrentHashMap[Int, String]()

  private final class MemListener extends SparkListener {
    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
      stageNames.put(s.stageInfo.stageId,
        s.stageInfo.name.takeWhile(_ != '\n').take(60))
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) stages.merge(t.stageId,
        (m.peakExecutionMemory, m.memoryBytesSpilled,
          m.diskBytesSpilled, m.shuffleWriteMetrics.bytesWritten, 1L),
        (a, b) => (math.max(a._1, b._1), a._2 + b._2, a._3 + b._3,
          a._4 + b._4, a._5 + b._5))
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
    spark.sparkContext.addSparkListener(new MemListener)

    def time(name: String)(df: => DataFrame): Unit = {
      graft.Sessions.releaseBlocks(spark)
      stages.clear()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[q107prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      import scala.jdk.CollectionConverters._
      val top = stages.asScala.toSeq.sortBy(-_._2._1).take(4)
      top.foreach { case (sid, (peak, ms, ds, sw, n)) =>
        println(f"[q107prof]   stage $sid%5d tasks=$n%4d " +
          f"peakTaskMem=${peak / 1e6}%9.1f MB " +
          f"spillMem=${ms / 1e6}%9.1f MB spillDisk=${ds / 1e6}%9.1f MB " +
          f"shufWrite=${sw / 1e6}%9.1f MB " +
          stageNames.getOrDefault(sid, "?"))
      }
    }

    // the q107 pipeline, stage by stage (mirrors Dedup.q107Containment)
    def inv = Tables.spread(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("w"))
      .select(col("doc_id"),
        expr("CAST(conv(substring(md5(w), 1, 12), 16, 10) AS BIGINT)")
          .as("s"))
      .distinct()
    def dfAll = inv.groupBy(col("s")).agg(count(lit(1)).as("c"))
    def keep = inv.join(dfAll, "s").filter(col("c") <= Dedup.ContainDfCap)
    def pairs = keep.filter(col("c") >= 2)
      .groupBy(col("s"))
      .agg(collect_list(col("doc_id")).as("ds"))
      .select(explode(Overlap.orderedPairs(col("ds"), (a, b) =>
        struct(least(a, b).as("da"), greatest(a, b).as("db")))).as("p"))
      .groupBy(col("p.da").as("da"), col("p.db").as("db"))
      .agg(count(lit(1)).as("n_inter"))

    time("1_inv_distinct")(inv)
    time("2_df_counts")(dfAll)
    time("3_gate_join")(keep)
    time("4_pair_counts")(pairs)
    time("5_full_q107")(Dedup.q107Containment(spark, sfDir))
    time("5_full_q107_again")(Dedup.q107Containment(spark, sfDir))
    spark.stop()
  }
}
