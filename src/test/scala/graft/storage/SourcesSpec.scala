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
