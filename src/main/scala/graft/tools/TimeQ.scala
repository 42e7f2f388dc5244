package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Targeted timing for named queries (cold + warm runs through the
  * noop sink) — the full `graft.Bench` suite takes minutes; this is
  * the fast feedback loop while iterating on one operator.
  * Usage: `runMain graft.tools.TimeQ q1_agg ta_langid ...`
  * (SPARK_GRAFT_SF_DIR selects the corpus, default sf0.1). */
object TimeQ {
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
    val all = SparkEntry.queries ++ SparkEntry.benchExtras
    // session warm-up so the first named query isn't charged for init
    all("q1_agg")(spark, sfDir).write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val fn = all(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.Sessions.releaseBlocks(spark) // see Bench: isolation
        sec
      }
      val cold = once()
      val warm = once()
      println(f"[timeq] $name%-24s cold=$cold%8.3f warm=$warm%8.3f")
    }
    spark.stop()
  }
}
