package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `Tables.spread` contract: parallelize unsplittable small
  * scans, change nothing once the input is already parallel (the
  * at-scale no-op guarantee), and never disturb row content. */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("spread parallelizes a single-partition scan without changing rows") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    assume(df.rdd.getNumPartitions <
      spark.sparkContext.defaultParallelism)
    val out = Tables.spread(df)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    val a = df.agg(count(lit(1)), sum(col("doc_id")),
      sum(length(col("text")))).head
    val b = out.agg(count(lit(1)), sum(col("doc_id")),
      sum(length(col("text")))).head
    assert(a == b)
  }

  test("spread is a no-op when the input is already parallel") {
    import spark.implicits._
    val wide = spark.range(0, 1000)
      .repartition(spark.sparkContext.defaultParallelism * 2)
    val out = Tables.spread(wide.toDF())
    // no new exchange: same partitioning object, plan unchanged
    assert(out.rdd.getNumPartitions == wide.rdd.getNumPartitions)
    assert((out.queryExecution.logical eq
      wide.toDF().queryExecution.logical) ||
      !out.queryExecution.optimizedPlan.toString.contains("Repartition"))
  }

  test("filters still push below the spread exchange") {
    val df = Tables.spread(Tables.load(spark, "/root/testdata/sf0.001",
      "lineitem")).filter(col("l_quantity") < 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThan(l_quantity"))
  }
}
