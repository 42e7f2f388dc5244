package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, SetSim}

/** Stage-by-stage wall-time profile of q153's recall calibration —
  * scratch tool, mirrors [[Dedup.q153DedupRecall]]. */
object ProfileQ153 {
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
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[q153prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    val posts = Tables.spread(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("sz"),
        explode(col("sh")).as("g"))
      .localCheckpoint(false)
    time("posts_checkpoint")(posts)
    val probe = broadcast(posts
      .filter(col("doc_id") % SetSim.ProbeMod === 0)
      .select(col("doc_id").as("p"), col("sz").as("psz"), col("g")))
    val truth = posts
      .join(probe, "g")
      .filter(col("doc_id") =!= col("p"))
      .filter(col("doc_id") % SetSim.ProbeMod =!= 0 ||
        col("doc_id") > col("p"))
      .groupBy(col("doc_id"), col("sz"), col("p"), col("psz"))
      .agg(count(lit(1)).as("n_inter"))
      .filter(col("n_inter") * 2 >=
        col("sz") + col("psz") - col("n_inter"))
      .select(least(col("doc_id"), col("p")).as("a"),
        greatest(col("doc_id"), col("p")).as("b"))
      .localCheckpoint(false)
    time("truth")(truth)
    val found = Dedup.minhashPairs(spark, sfDir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .filter(col("a") % SetSim.ProbeMod === 0 ||
        col("b") % SetSim.ProbeMod === 0)
    time("found_minhash")(found)
    time("semi_and_report")(found.join(truth, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_found")))
    spark.stop()
  }
}
