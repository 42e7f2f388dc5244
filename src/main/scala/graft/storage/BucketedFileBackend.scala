package graft.storage

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.core.{ModelDefinition, PrimValue}

/** Shared layout for file-format storage backends: one directory per
  * model, hash-bucketed by primary key into `_bucket=N`
  * subdirectories, atomic write-temp-then-swap per bucket. The format
  * (parquet, jsonl, ...) is a plug — the bucketing, atomicity, and
  * O(|table|/B) point-op I/O bound are format-independent, which is
  * the actual SPI claim ([[StorageBackend]]): backends differ in
  * bytes-on-disk, not in semantics.
  */
abstract class BucketedFileBackend(spark: SparkSession, root: String,
    buckets: Int, fmt: String, suffix: String) extends StorageBackend {

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
      else spark.read.schema(model.schema).format(fmt)
        .load(dir.toString + "/_bucket=*")
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
        !Files.list(dir).iterator().asScala.exists(_.toString.endsWith(suffix)))
      StorageBackend.empty(spark, model)
    else spark.read.schema(model.schema).format(fmt).load(dir.toString)
  }

  override def writeSlice(model: ModelDefinition, v: PrimValue,
      df: DataFrame): Unit = {
    val b = StorageBackend.bucketOf(v.raw, buckets)
    val tmp = modelDir(model).resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.createDirectories(modelDir(model))
    df.write.mode(SaveMode.Overwrite).format(fmt).save(tmp.toString)
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
      .format(fmt).save(tmp.toString)
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

/** Human-readable line-per-record store (the modern spelling of gus's
  * JSON heritage): each bucket is JSONL files, read back under the
  * model's pinned schema so types survive the round-trip. */
final class JsonlBackend(spark: SparkSession, root: String,
    buckets: Int = 64)
  extends BucketedFileBackend(spark, root, buckets, "json", ".json")
