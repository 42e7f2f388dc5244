package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

object ProfileQ22 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf1")
    val spark = graft.Sessions.localDefaults(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.load(spark, sfDir, "lineitem")
      .withColumn("pc", graft.operators.Relational.cents(col("l_extendedprice")))
    time("warmup")(noop(li.groupBy("l_returnflag").agg(count(lit(1)))))
    time("sketches-only")(noop(li.groupBy("l_returnflag").agg(
      approx_count_distinct(col("l_orderkey")).as("a_orders"),
      approx_count_distinct(col("l_partkey"), 0.01).as("a_parts"),
      percentile_approx(col("pc"), lit(0.5), lit(1000)).as("a_median"),
      count(lit(1)).as("n"))))
    time("two-distincts")(noop(li.groupBy("l_returnflag").agg(
      countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")))))
    time("pct-array")(noop(li.groupBy("l_returnflag").agg(
      expr("percentile(pc, array(0.48,0.5,0.52))"))))
    time("pct-three-calls")(noop(li.groupBy("l_returnflag").agg(
      expr("percentile(pc, 0.5)"), expr("percentile(pc, 0.48)"), expr("percentile(pc, 0.52)"))))
    time("combined-current")(noop(graft.operators.Relational.q22Approx(spark, sfDir)))
    spark.stop()
  }
}
