package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway bisection harness for the optimization round — times
  * ad-hoc sub-chains of a query under the bench session config. Not
  * part of any declared surface; edited freely while iterating. */
object Scratch {
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

    def time(name: String)(df: => DataFrame): Unit = {
      graft.Sessions.releaseBlocks(spark)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val c = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t1) / 1e9
      graft.Sessions.releaseBlocks(spark)
      println(f"[scratch] $name%-30s cold=$c%8.3f warm=$w%8.3f")
    }

    time("q176:full")(
      graft.operators.EntityRes.q176ErRecall(spark, sfDir))
    spark.stop()
  }
}
