package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

object ProfileQ35 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.load(spark, sfDir, "lineitem")
    time("warmup-scan")(noop(li.select("l_returnflag")))
    time("scan-only")(noop(li.select("l_orderkey","l_linenumber","l_returnflag","l_quantity","l_extendedprice")))
    time("md5-filter-only")(noop(li.filter(substring(md5(concat_ws(":", col("l_orderkey"), col("l_linenumber"))), 1, 2) <= "19").select("l_returnflag")))
    time("q35-full")(noop(graft.operators.Relational2.q35SampleHash(spark, sfDir)))
    time("q35-full-2nd")(noop(graft.operators.Relational2.q35SampleHash(spark, sfDir)))
    time("q1-for-reference")(noop(graft.operators.Relational.q1Agg(spark, sfDir)))
    // variant: xxhash64-based sampling instead of md5-hex
    time("xxhash-variant")(noop(
      li.filter(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(256)) < 26)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))))
    // variant: md5 but compare via conv-prefix long
    time("md5-substr-eq")(noop(
      li.select(substring(md5(concat_ws(":", col("l_orderkey"), col("l_linenumber"))), 1, 2).as("h"))))
    spark.stop()
  }
}
