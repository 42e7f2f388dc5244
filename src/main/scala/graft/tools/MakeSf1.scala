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
  * Replicated document TEXT gets a per-replica Caesar shift
  * (`translate` over the rotated alphabet): within one replica the
  * shift is an isomorphism, so every replica family keeps the
  * original corpus's near-dup structure exactly (shingle sets,
  * simhash collisions, jaccard scores are shift-invariant in shape),
  * while cross-replica similarity is destroyed — near-dup PAIR counts
  * grow linearly with the corpus, like a real corpus, instead of
  * quadratically in the copy factor (exact ×10 copies make every doc
  * pair with its 9 clones: the pair OUTPUT itself explodes ×45, which
  * benchmarks the data, not the plan — measured as a 31× time blowup
  * in dedup_embedding before this fix). Embedding replicas get the
  * same treatment via a per-replica CIRCULAR SHIFT of the dimensions:
  * an isometry within a replica (all dots/distances preserved, so
  * each replica family keeps the original near-dup structure
  * exactly) that decorrelates vectors across replicas.
  * `BENCH_sf1.json` is produced by running `graft.Bench` with
  * `SPARK_GRAFT_SF_DIR` pointed at the output.
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
          val shifted = keys.foldLeft(reps) { (df, k) =>
            df.withColumn(k, col(k) + col("rep") * Delta)
          }
          val transformed =
            if (name == "documents") {
              val abc = "abcdefghijklmnopqrstuvwxyz"
              def rot(k: Int) = abc.drop(k % 26) + abc.take(k % 26)
              val shiftedText = (1 until copies).foldLeft(col("text")) {
                (acc, r) =>
                  when(col("rep") === r,
                    translate(col("text"),
                      abc + abc.toUpperCase,
                      rot(r) + rot(r).toUpperCase)).otherwise(acc)
              }
              shifted.withColumn("text", shiftedText)
            } else if (name == "embeddings") {
              val dim = 64
              val rolled = (1 until copies).foldLeft(col("embedding")) {
                (acc, r) =>
                  val k = (r * 7) % dim // distinct nonzero shifts
                  when(col("rep") === r, expr(
                    s"concat(slice(embedding, ${k + 1}, ${dim - k}), " +
                      s"slice(embedding, 1, $k))")).otherwise(acc)
              }
              shifted.withColumn("embedding", rolled)
            } else shifted
          transformed.drop("rep")
        case None => base
      }
      // realistic splittable layout: a production corpus arrives as
      // many files/row groups, never as one unsplittable blob — write
      // the big tables as 16 files so scan stages parallelize the way
      // they would on a real cluster (tiny dims stay single-file)
      val nFiles = if (Seq("lineitem", "orders", "events", "documents",
        "embeddings", "customer", "part").contains(name)) 16 else 1
      scaled.repartition(nFiles)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[make-sf1] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
