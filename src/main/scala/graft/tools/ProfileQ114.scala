package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Stage-by-stage wall-time profile of q114's mask-histogram plan —
  * scratch tool for perf iteration, mirrors
  * [[graft.operators.Quality.q114BasketLift]]. */
object ProfileQ114 {
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
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[q114prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    val brands = Tables.load(spark, sfDir, "part")
      .select(col("p_brand")).distinct()
    val brandBit = brands.as("a")
      .join(broadcast(brands.as("b")),
        col("b.p_brand") < col("a.p_brand"), "left")
      .groupBy(col("a.p_brand").as("item"))
      .agg(count(col("b.p_brand")).as("bit"))
      .withColumn("bitval",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))

    time("scan_lineitem")(Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")))
    time("scan_join_part")(Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(Tables.load(spark, sfDir, "part")
        .select(col("p_partkey"), col("p_brand").as("item"))),
        col("l_partkey") === col("p_partkey")))
    time("plus_bit_join")(Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(Tables.load(spark, sfDir, "part")
        .select(col("p_partkey"), col("p_brand").as("item"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(brandBit.select(col("item"), col("bitval"))),
        "item"))
    val masks = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(Tables.load(spark, sfDir, "part")
        .select(col("p_partkey"), col("p_brand").as("item"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(brandBit.select(col("item"), col("bitval"))),
        "item")
      .groupBy(col("l_orderkey"))
      .agg(expr("bit_or(bitval)").as("mask"))
    time("plus_mask_agg")(masks)
    time("plus_hist")(masks.groupBy(col("mask"))
      .agg(count(lit(1)).as("cnt")))
    spark.stop()
  }
}
