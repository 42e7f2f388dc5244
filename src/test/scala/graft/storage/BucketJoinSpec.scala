package graft.storage

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Bucketed co-located join (SCALING.md's "co-locate joins via
  * bucketing"): when both sides are bucketed AND sorted by the join
  * key, the sort-merge join runs with NO shuffle exchange and NO
  * per-task sort — at 100 TB this turns the nightly fact-fact join
  * from a full-network shuffle into a local merge per bucket. */
class BucketJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("bucketed+sorted tables join without exchange or sort") {
    val sf = "/root/testdata/sf0.001"
    val nBuckets = 8
    Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bkt_orders")
    Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bkt_lineitem")
    try {
      val joined = spark.table("bkt_lineitem")
        .join(spark.table("bkt_orders").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.substring(0, plan.length)
      // the merge join itself must sit directly on the bucketed scans:
      // no ShuffleExchange below it (the final groupBy still shuffles)
      val smjIdx = joinSection.indexOf("SortMergeJoin")
      assert(smjIdx >= 0, "join must be sort-merge on bucketed tables")
      val belowJoin = joinSection.substring(smjIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey") &&
        !belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle its inputs:\n$belowJoin")
      // correctness: equals the plain (shuffled) join
      val plain = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(plain).isEmpty &&
        plain.exceptAll(joined).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
