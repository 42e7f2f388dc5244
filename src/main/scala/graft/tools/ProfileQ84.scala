package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Pipeline3.{SpanGram => K}
import graft.operators.TextAnalysis.tokens

/** Stage-by-stage wall-time profile of q84's curation funnel —
  * attributes the sf10 budget (round-10 verdict asked whether the
  * 6.3× decade ratio is the survivor-barrier recompute or the
  * algorithm's floor). Mirrors `Pipeline3.q84CurationFunnel`; also
  * times a variant with a SECOND barrier under `grams` to measure
  * whether checkpointing the explode (used by both the df aggregate
  * and the occurrence semi-join) pays or thrashes (the q153
  * block-eviction lesson).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ84 */
object ProfileQ84 {
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
      graft.Sessions.releaseBlocks(spark)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[q84prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    def survivors = {
      val base = Tables.spread(Tables.load(spark, sfDir, "documents"))
        .select(col("doc_id"), col("lang"),
          md5(graft.functions.TextStatFunctions.normText(col("text")))
            .as("h"),
          tokens(col("text")).as("toks"),
          graft.functions.TextStatFunctions.tokenStats(col("text"), Nil)
            .as("st"))
        .select(col("doc_id"), col("lang"), col("h"), col("toks"),
          col("st").getItem(1).cast("long").as("n_tokens"),
          (col("st").getItem(2) * 100).as("dx"))
        .withColumn("ttr_pct", expr("dx div n_tokens"))
      base
        .withColumn("survivor",
          min(col("doc_id")).over(Window.partitionBy(col("h"))))
        .filter(col("doc_id") === col("survivor") &&
          col("n_tokens").between(10, 5000) && col("ttr_pct") >= 30)
        .select(col("doc_id"), col("lang"), col("toks"), col("n_tokens"))
        .localCheckpoint(false)
    }

    def gramsOf(surv: DataFrame) = surv.select(col("doc_id"),
        col("n_tokens").as("n"),
        graft.functions.TextFunctions.tokenShingleMd5(col("toks"), K)
          .as("sh"))
      .select(col("doc_id"), col("n"),
        posexplode(col("sh")).as(Seq("pos", "sh")))

    def spanStage(surv: DataFrame, grams: DataFrame) = {
      val dupSh = grams.groupBy(col("sh"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2).select(col("sh"))
      val occ = grams.join(dupSh, Seq("sh"), "left_semi")
        .select(col("doc_id"),
          (col("pos") + 1).cast("long").as("s"),
          least(col("pos") + lit(K), col("n")).cast("long").as("e"))
      val prev = Window.partitionBy(col("doc_id")).orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val run = Window.partitionBy(col("doc_id")).orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      occ
        .withColumn("pmax", max(col("e")).over(prev))
        .withColumn("brk",
          when(col("pmax").isNull || col("s") > col("pmax") + 1, 1)
            .otherwise(0))
        .withColumn("iid", sum(col("brk")).over(run))
        .groupBy(col("doc_id"), col("iid"))
        .agg(min(col("s")).as("s"), max(col("e")).as("e"))
        .groupBy(col("doc_id"))
        .agg(sum(col("e") - col("s") + 1).as("n_removed"))
    }

    // stage prefixes (each from a fresh session-state, warm JVM)
    time("warmup(full-query)") {
      graft.operators.Pipeline3.q84CurationFunnel(spark, sfDir) }
    time("s1:survivor-barrier") { survivors.select(col("doc_id")) }
    time("s2:+grams-df-agg") {
      val sv = survivors
      gramsOf(sv).groupBy(col("sh"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2).select(col("sh")) }
    time("s3:+span-windows(removed)") {
      val sv = survivors
      spanStage(sv, gramsOf(sv)) }
    time("full:as-shipped") {
      graft.operators.Pipeline3.q84CurationFunnel(spark, sfDir) }
    time("variant:grams-barrier") {
      val sv = survivors
      val g = gramsOf(sv).localCheckpoint(false)
      val removed = spanStage(sv, g)
      val v = conv(substring(md5(col("doc_id").cast("string")), 1, 6),
        16, 10).cast("long")
      val u = (v + lit(1)).cast("double") / lit(16777217.0d)
      sv.join(removed, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"))
        .withColumn("n_kept", col("n_tokens") - col("n_removed"))
        .filter(col("n_kept") >= 1)
        .withColumn("es_key",
          round(lit(1e9) * -log(u) / col("n_kept")).cast("long"))
        .orderBy(col("es_key"), col("doc_id"))
        .limit(graft.operators.Pipeline3.CurationK) }
    spark.stop()
  }
}
