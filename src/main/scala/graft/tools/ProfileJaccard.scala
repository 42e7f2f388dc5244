package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** One-off stage profiler for dedup_ngram_jaccard. */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-22s n=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val K = graft.operators.Dedup.JaccardSketch
    time("sketch pass only")(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextFunctions.charShingleSketch(col("text"), K)
            .as("sk"))
        .count())
    time("shingle pass only")(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextFunctions.charShingles(col("text")).as("cs"))
        .select(sum(size(col("cs")))).collect().head.getLong(0))
    time("norm pass only")(
      Tables.load(spark, dir, "documents")
        .select(graft.functions.TextStatFunctions.normText(col("text"))
          .as("nt"))
        .select(sum(length(col("nt")))).collect().head.getLong(0))
    time("full query x1")(graft.operators.Dedup.dedupNgramJaccard(spark, dir).count())
    time("full query x2")(graft.operators.Dedup.dedupNgramJaccard(spark, dir).count())
    spark.stop()
  }
}
