package graft.storage

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.Tables

/** Source/sink surface (SURVEY §2.2 "scans/sources/sinks"): the engine
  * reads parquet natively; CSV and JSON round-trip through the same
  * DataFrames with schema preserved. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("csv and json round-trip the nation table") {
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    val dir = Files.createTempDirectory("sources")

    nation.write.option("header", "true").csv(s"$dir/nation_csv")
    val csv = spark.read.option("header", "true")
      .schema(nation.schema).csv(s"$dir/nation_csv")
    assert(csv.count() == nation.count())
    assert(csv.exceptAll(nation).isEmpty && nation.exceptAll(csv).isEmpty)

    nation.write.json(s"$dir/nation_json")
    val json = spark.read.schema(nation.schema).json(s"$dir/nation_json")
    assert(json.exceptAll(nation).isEmpty && nation.exceptAll(json).isEmpty)
  }

  test("partitioned sink: a type filter prunes partitions at the scan") {
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = Files.createTempDirectory("sink-part")
    // hive-style layout — at 100 TB this (plus bucketing) is what makes
    // a selective read touch one directory instead of the whole corpus
    events.write.partitionBy("event_type").parquet(s"$dir/events_p")
    val back = spark.read.parquet(s"$dir/events_p")
      .filter(col("event_type") === "click")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), "filter must prune at partition level")
    val expected = events.filter(col("event_type") === "click").count()
    assert(back.count() == expected)
    // the pruned scan reads strictly fewer files than the full table
    val all = spark.read.parquet(s"$dir/events_p")
    assert(back.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString.contains("click"))
    assert(all.count() > expected)
  }

  test("BucketRoute matches driver-side bucketOf for every pk type") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val longs = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue)
    val strs = Seq("", "1", "true", "a", "zebra", "ümlaut £")
    val bools = Seq(true, false)
    val dbls = Seq(0.0, -0.0, 1.0, -3.25, 1e300)
    def routed[T](df: org.apache.spark.sql.DataFrame): Seq[Int] =
      df.select(BucketRoute(col("v"), 64)).collect().map(_.getInt(0)).toSeq
    assert(routed(longs.toDF("v")) ==
      longs.map(StorageBackend.bucketOf(_, 64)))
    assert(routed(strs.toDF("v")) ==
      strs.map(StorageBackend.bucketOf(_, 64)))
    assert(routed(bools.toDF("v")) ==
      bools.map(StorageBackend.bucketOf(_, 64)))
    assert(routed(dbls.toDF("v")) ==
      dbls.map(StorageBackend.bucketOf(_, 64)))
    // typed keys: 1 ≠ "1" ≠ true may land in different buckets — just
    // assert the three hashes are the typed ones, not a common coercion
    assert(StorageBackend.bucketOf(1L, 64) ==
      Math.floorMod(java.lang.Long.hashCode(1L), 64))
    assert(StorageBackend.bucketOf("1", 64) ==
      Math.floorMod("1".hashCode, 64))
  }

  test("parquet writes preserve model schema through the backend") {
    import graft.core.Registry
    val m = Registry.parseDefinition(
      """{"model_name":"movie","storage_type":"json",
        |"attributes":{"id":"Integer","name":"String","tags":["String"]},
        |"primary_key":"id","required":["id"]}"""
        .stripMargin.replace("\n", "")).toOption.get
    val backend = new ParquetBackend(spark,
      Files.createTempDirectory("sschema").toString, buckets = 4)
    backend.overwrite(m, StorageBackend.empty(spark, m))
    assert(backend.table(m).schema == m.schema)
  }
}
