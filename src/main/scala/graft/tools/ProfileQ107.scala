package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Overlap}

/** Stage-level profile of q107 (asymmetric containment): times each
  * pipeline prefix through the noop sink so the sf10 budget
  * (VERDICT r9 #3) can be attributed — inverted-index build vs df
  * gate vs posting-pair counting vs the size joins.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ107 */
object ProfileQ107 {
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
      println(f"[q107prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
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
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .select(explode(Overlap.orderedPairs(col("ds"), (a, b) =>
        struct(a.as("da"), b.as("db")))).as("p"))
      .groupBy(col("p.da").as("da"), col("p.db").as("db"))
      .agg(count(lit(1)).as("n_inter"))

    time("1_inv_distinct")(inv)
    time("2_df_counts")(dfAll)
    time("3_gate_join")(keep)
    time("4_pair_counts")(pairs)
    time("5_full_q107")(Dedup.q107Containment(spark, sfDir))
    spark.stop()
  }
}
