package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.Registry
import graft.crud.CrudEngine
import graft.storage.ParquetBackend

/** Point-op scaling evidence: bulk-load the orders table into the
  * pk-bucketed store, then time read/update/create/delete point ops.
  * The claim under test (README / SURVEY §8): point CRUD is
  * O(|table|/buckets), not O(|table|) — the reference rewrites its
  * whole store per request. */
object PointOpBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val model = Registry.parseDefinition(
      """{"model_name":"order","storage_type":"json",
        |"attributes":{"id":"Integer","status":"String","total":"Float"},
        |"primary_key":"id","required":["id"]}"""
        .stripMargin.replace("\n", "")).toOption.get
    val engine = new CrudEngine(spark, new ParquetBackend(spark,
      Files.createTempDirectory("pointop").toString, buckets = 64))

    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").as("total"))
    val n = orders.count()
    var t0 = System.nanoTime()
    engine.bulkLoad(model, orders)
    println(f"bulk_load   rows=$n%-8d ${(System.nanoTime - t0) / 1e9}%.2fs")

    def time(name: String)(f: => Any): Unit = {
      val t = System.nanoTime()
      val r = f
      println(f"$name%-11s ${(System.nanoTime - t) / 1e9}%.3fs  ($r)")
    }
    time("read_one")(engine.readOne(model, "42").map(_("status")))
    time("read_one2")(engine.readOne(model, "4242").map(_("status")))
    time("update_one")(engine.updateOne(model, "42",
      """{"status":"X"}""").map(_("status")))
    time("create_one")(engine.createOne(model,
      s"""{"id":${n * 10},"status":"N"}""").map(_("id")))
    time("delete_one")(engine.deleteOne(model, "42").map(_("id")))
    println(s"final count=${engine.readMany(model).count()} (expect $n)")
    spark.stop()
  }
}
