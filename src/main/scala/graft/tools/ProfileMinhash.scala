package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** One-off stage profiler for dedup_minhash_lsh. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = Tables.load(spark, dir, "documents")
    time("warmup scan")(docs.count())
    val toks = split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")
    time("tokenize only")(docs.select(size(toks).as("n")).agg(sum("n")).count())
    val base = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    time("shingles")(base.select(size(col("sh"))).agg(sum("size(sh)")).count())
    val hashed = base.withColumn("hashes", Dedup.shingleHashes(col("sh")))
    time("+hashes")(hashed.select(size(col("hashes"))).agg(max("size(hashes)")).count())
    val sigs = hashed.select(col("doc_id") +:
      (0 until Dedup.NumHashes).map(k =>
        Dedup.minhashSig(col("hashes"), k).as(s"sig_$k")): _*)
    time("+sigs")(sigs.agg(max("sig_0")).count())
    time("sigs all cols")(sigs.agg(max("sig_0"), max("sig_1"), max("sig_2"),
      max("sig_3"), max("sig_4"), max("sig_5"), max("sig_6"),
      max("sig_7")).count())
    time("hashed noop write") {
      hashed.write.format("noop").mode("overwrite").save(); 0L
    }
    time("hashed repart noop") {
      hashed.repartition(col("doc_id")).write.format("noop")
        .mode("overwrite").save(); 0L
    }
    val persistNoShuffle = hashed
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist no-shuffle")(persistNoShuffle.count())
    persistNoShuffle.unpersist(true)
    val persisted = hashed
      .repartition(col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist base")(persisted.count())
    val sigs2 = persisted.select(col("doc_id") +:
      (0 until Dedup.NumHashes).map(k =>
        Dedup.minhashSig(col("hashes"), k).as(s"sig_$k")): _*)
    val bandCols = (0 until 4).map { b =>
      md5(concat_ws("|", col(s"sig_${2 * b}"), col(s"sig_${2 * b + 1}")))
    }
    val bands = sigs2.select(col("doc_id"),
      explode(array(bandCols: _*)).as("band"))
    time("bands")(bands.count())
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("cand")(cand.count())
    val sa = persisted.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val sb = persisted.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    val full = cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("n_inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("n_union", size(array_union(col("sha"), col("shb"))).cast("long"))
      .filter(col("n_inter") * 2 >= col("n_union"))
    time("verify join")(full.count())
    time("full query")(Dedup.dedupMinhashLsh(spark, dir).count())
    spark.stop()
  }
}
