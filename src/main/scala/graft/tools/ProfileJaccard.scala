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
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.charShingles(col("text")).as("cs"))
      .withColumn("blk", graft.functions.TextFunctions.minMd5(col("cs")))
      .repartition(col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("base materialize")(base.count())
    val blocks = base.select(col("doc_id"), col("blk"))
    time("block sizes top")(
      blocks.groupBy("blk").count().orderBy(col("count").desc)
        .limit(5).collect().map(_.getLong(1)).sum)
    val cand = blocks.as("a")
      .join(blocks.as("b"), col("a.blk") === col("b.blk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("candidates")(cand.count())
    time("full query")(graft.operators.Dedup.dedupNgramJaccard(spark, dir).count())
    spark.stop()
  }
}
