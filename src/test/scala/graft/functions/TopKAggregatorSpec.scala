package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.Tables

class TopKAggregatorSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("typed top-k aggregator matches the window formulation") {
    import spark.implicits._
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))

    // aggregator path: bounded partial buffers, one aggregation
    val topk = udaf(new TopKAggregator(3))
    val viaAgg = orders
      .groupBy("o_custkey")
      // case-class input flattens to (id, score) arguments
      .agg(topk(col("o_orderkey"), col("cents")).as("top"))
      .select(col("o_custkey"), explode(col("top")).as("s"))
      .select(col("o_custkey"), col("s.id").as("o_orderkey"),
        col("s.score").as("cents"))

    // window path: full per-group sort
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("cents").desc, col("o_orderkey").asc)
    val viaWindow = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).drop("rk")

    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty,
      "aggregator and window top-k must agree exactly")
  }
}
