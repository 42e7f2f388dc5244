package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{SetSim, TextAnalysis}

/** Stage-level profile of q134 (exact set-similarity search): times
  * each pipeline prefix through the noop sink. The round-10 rework
  * attribution: the legacy prefix-join + posting-re-join verification
  * was 136.6 s of the 137 s sf10 wall (340M-row two-join fan-out);
  * the broadcast-probe-index form counts |∩| in one exchange.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ134 */
object ProfileQ134 {
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

    // NOTE: no releaseBlocks between stages — `sets` is a
    // localCheckpoint shared by every consumer (as in the real
    // query); dropping blocks would invalidate it mid-profile.
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[q134prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    // mirrors SetSim.q134SetSimSearch stage by stage
    lazy val sets = Tables.spread(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"),
        array_distinct(TextAnalysis.tokens(col("text"))).as("arr"))
      .select(col("doc_id"),
        size(col("arr")).cast("long").as("sz"),
        explode(col("arr")).as("tok"))
      .localCheckpoint(true)
    def probes = sets.filter(col("doc_id") % SetSim.ProbeMod === 0)
      .select(col("tok"), col("doc_id").as("probe_id"),
        col("sz").as("szp"))
    def inter = sets.join(broadcast(probes), Seq("tok"))
      .filter(col("probe_id") =!= col("doc_id") &&
        lit(5) * least(col("szp"), col("sz")) >=
          lit(4) * greatest(col("szp"), col("sz")))
      .groupBy(col("probe_id"), col("doc_id"),
        col("szp"), col("sz").as("szc"))
      .agg(count(lit(1)).as("inter"))

    time("1_postings")(sets)
    time("2_probe_index")(probes)
    time("3_pair_counts")(inter)
    time("4_full_q134")(SetSim.q134SetSimSearch(spark, sfDir))
    spark.stop()
  }
}
