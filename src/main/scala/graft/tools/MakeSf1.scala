package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthesizes an sf1-equivalent corpus from the sf0.1 parquet by
  * union-with-key-offset: every scaled table is replicated `Copies`
  * times with all key columns shifted by `rep * Delta`, preserving
  * referential integrity across tables (the same delta applies to a
  * key domain wherever it appears: `o_custkey` moves with `c_custkey`,
  * `l_orderkey` with `o_orderkey`, `user_id` with the event key
  * domain, …). `region`/`nation` are fixed dimensions in TPC-H and are
  * copied as-is — their keys are referenced by the scaled tables and
  * must not move.
  *
  * Replicated documents/embeddings are exact content copies under new
  * ids — a deliberately dup-heavy corpus, which is the realistic (and
  * adversarial) input for the dedup/CC operators: every block, band
  * bucket, and near-dup component grows 10×, so super-linear plans
  * show up as super-linear times. `BENCH_sf1.json` is produced by
  * running `graft.Bench` with `SPARK_GRAFT_SF_DIR` pointed at the
  * output.
  *
  * Usage: runMain graft.tools.MakeSf1 [inDir] [outDir] [copies]
  * (defaults: /root/testdata/sf0.1 → target/sf1 × 10)
  */
object MakeSf1 {
  val Delta = 10000000L

  /** Key columns to shift per scaled table; tables absent here are
    * fixed dimensions and copied unchanged. */
  val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    val in = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach { name =>
      val base = spark.read.parquet(s"$in/$name.parquet")
      val scaled = keyCols.get(name) match {
        case Some(keys) =>
          val reps = base.withColumn("rep",
            explode(sequence(lit(0L), lit(copies - 1L))))
          keys.foldLeft(reps) { (df, k) =>
            df.withColumn(k, col(k) + col("rep") * Delta)
          }.drop("rep")
        case None => base
      }
      scaled.write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[make-sf1] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
