package graft.storage

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.core.{ModelDefinition, PrimValue}

/** Canonical store: one directory per model, hash-bucketed by primary
  * key into `_bucket=N` subdirectories.
  *
  * Replaces gus's single-file JSON store (whole-file read + whole-file
  * rewrite per request, `json/mod.rs:45-80`) with a layout where a
  * point read touches exactly one bucket directory (no partition
  * discovery over the rest) and a point write rewrites one bucket
  * atomically (write-temp-then-swap). With B buckets, point ops are
  * O(|table|/B); at cluster scale B is sized so a bucket fits in one
  * executor's working set.
  */
final class ParquetBackend(spark: SparkSession, root: String,
    buckets: Int = 64) extends StorageBackend {

  private def modelDir(m: ModelDefinition): Path =
    Paths.get(root, m.modelName.pluralCamel)
  private def bucketDir(m: ModelDefinition, b: Int): Path =
    modelDir(m).resolve(s"_bucket=$b")

  override def table(model: ModelDefinition): DataFrame = {
    val dir = modelDir(model)
    if (!Files.isDirectory(dir)) StorageBackend.empty(spark, model)
    else {
      val hasData = Files.list(dir).iterator().asScala.exists(p =>
        p.getFileName.toString.startsWith("_bucket="))
      if (!hasData) StorageBackend.empty(spark, model)
      // schema pinned: partition-col inference off, read data columns only
      else spark.read.schema(model.schema)
        .parquet(dir.toString + "/_bucket=*")
    }
  }

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = {
      new Iterator[A] {
        def hasNext: Boolean = it.hasNext
        def next(): A = it.next()
      }
    }
  }

  override def slice(model: ModelDefinition, v: PrimValue): DataFrame = {
    val b = StorageBackend.bucketOf(v.raw, buckets)
    val dir = bucketDir(model, b)
    if (!Files.isDirectory(dir) ||
        !Files.list(dir).iterator().asScala.exists(_.toString.endsWith(".parquet")))
      StorageBackend.empty(spark, model)
    else spark.read.schema(model.schema).parquet(dir.toString)
  }

  override def writeSlice(model: ModelDefinition, v: PrimValue,
      df: DataFrame): Unit = {
    val b = StorageBackend.bucketOf(v.raw, buckets)
    val tmp = modelDir(model).resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.createDirectories(modelDir(model))
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val target = bucketDir(model, b)
    deleteRecursively(target)
    Files.move(tmp, target)
  }

  override def overwrite(model: ModelDefinition, df: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    // codegen'd routing expression (dispatches on the pk column's Spark
    // type at planning time; semantics identical to driver-side bucketOf)
    val bucketCol = BucketRoute(col(model.primaryKey), buckets)
    val tmp = Paths.get(root, s".tmp-${java.util.UUID.randomUUID()}")
    df.withColumn("_bucket", bucketCol)
      .write.mode(SaveMode.Overwrite).partitionBy("_bucket")
      .parquet(tmp.toString)
    val target = modelDir(model)
    deleteRecursively(target)
    Files.createDirectories(target.getParent)
    Files.move(tmp, target)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
}
