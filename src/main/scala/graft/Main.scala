package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.Registry
import graft.crud.CrudEngine
import graft.rest.Server
import graft.storage.{GusJsonBackend, ParquetBackend, StorageBackend}

/** CLI — the reference's `gus start` (`index.rs:20-110`):
  * `run --modelspath <dir> [--port N] [--storage parquet:<dir>|gusjson:<file>]`.
  * Validates arguments the same way (port bounds, existing dirs),
  * loads the model registry once (the reference re-reads per request),
  * and serves REST + GraphQL over the Spark CRUD engine.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

    val modelsPath = opts.getOrElse("modelspath", {
      System.err.println("missing --modelspath <dir>"); sys.exit(2)
    })
    if (!Files.isDirectory(Paths.get(modelsPath))) {
      System.err.println(s"modelspath $modelsPath is not a directory")
      sys.exit(2)
    }
    val port = opts.get("port").map(_.toInt).getOrElse(8080)
    if (port < 0 || port > 65535) {
      System.err.println(s"invalid port $port"); sys.exit(2)
    }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-server")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val backend: StorageBackend = opts.getOrElse("storage", "parquet:./data") match {
      case s if s.startsWith("gusjson:") =>
        new GusJsonBackend(spark, s.stripPrefix("gusjson:"))
      case s if s.startsWith("parquet:") =>
        new ParquetBackend(spark, s.stripPrefix("parquet:"))
      case other =>
        System.err.println(s"unknown storage $other"); sys.exit(2)
    }

    Registry.load(Paths.get(modelsPath)) match {
      case Left(err) => System.err.println(err); sys.exit(2)
      case Right(reg) =>
        val server = new Server(reg, new CrudEngine(spark, backend), port)
        server.start()
        println(s"graft serving on :${server.boundPort} " +
          s"(models: ${reg.all.map(_.modelName.raw).mkString(", ")})")
        Thread.currentThread().join()
    }
  }
}
