package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Stage-by-stage wall-time profile of q109's triangle census —
  * scratch tool for perf iteration, mirrors
  * [[graft.operators.EntityRes.q109ErTriangles]]. */
object ProfileQ109 {
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
      println(f"[q109prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    val edges = EntityRes.matchedPairs(spark, sfDir)
      .select(col("cust_a").as("a"), col("cust_b").as("b"))
      .localCheckpoint(false)
    time("matched_pairs")(edges)
    val bidir = edges.unionByName(
      edges.select(col("b").as("a"), col("a").as("b")))
      .toDF("u", "v")
    val deg = bidir.groupBy(col("u")).agg(count(lit(1)).as("d"))
    time("degrees")(deg)
    val oriented = bidir
      .join(deg.select(col("u"), col("d").as("du")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u"), col("v"))
      .localCheckpoint(false)
    time("oriented")(oriented)
    val adj = oriented.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))
      .localCheckpoint(false)
    time("adjacency")(adj)
    time("intersect_count")(oriented
      .join(adj.select(col("u"), col("nbrs").as("nu")), "u")
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), "v")
      .select(size(array_intersect(col("nu"), col("nv")))
        .cast("long").as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles")))
    spark.stop()
  }
}
