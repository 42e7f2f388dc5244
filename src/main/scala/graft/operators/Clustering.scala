package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector clustering over the `embeddings` table — the codebook
  * TRAINER that `ann_ivf` / `q68_semdedup` presuppose (both currently
  * seed their coarse quantizer with the first-k vectors; their
  * scaladocs call that "a stand-in for a trained k-means codebook").
  * q70 is that training step: Lloyd's k-means in the exact
  * integer-quantized space the similarity family already uses.
  *
  * Determinism/oracle strategy (nothing here is approximate):
  *  - vectors are exact integer milli-vectors ([[Similarity.ivec]]);
  *  - assignment distance is pure integer arithmetic:
  *    `d(v,c) = |v|² − 2·(v·c) + |c|²` with ties to the smallest
  *    centroid id;
  *  - the centroid update re-quantizes to integer space as
  *    `floor(double(Σ vᵢ) / n)` per component — double division of
  *    identical integer inputs is one IEEE-754 op, bit-identical in
  *    Spark and DuckDB (the `cos_e6` trick), so the trained codebook
  *    hash-matches exactly;
  *  - a FIXED number of Lloyd rounds (3) keeps the oracle expressible
  *    as unrolled CTEs. A convergence-driven variant would get the q65
  *    monotone-fixpoint treatment; for codebook training a fixed small
  *    round count is also what large-scale IVF builds actually run.
  *
  * 100 TB posture: each round is (a) one corpus scan × broadcast k-row
  * codebook (BNLJ by intent — the fact side never shuffles, identical
  * to ann_ivf's assignment), then (b) a per-(centroid, dim) partial
  * sum — map-side combine reduces the shuffle to
  * O(tasks × k × dims) rows regardless of corpus size. Driver state
  * between rounds is the k×dims codebook itself (KBytes). Empty
  * clusters drop out in both engines identically (inner-join
  * semantics); k must grow ~√n or per IVF sizing rules at scale, which
  * is a parameter, not a shape change.
  */
object Clustering {

  val K = 8       // codebook size (tiny here; the SHAPE is k ≪ n)
  val Rounds = 3  // fixed Lloyd rounds — see determinism note above
  val Dims = 64   // embeddings table is fixed 64-dim (TESTDATA.md)

  /** The Lloyd training loop behind q70/q92: returns the trained
    * codebook as k rows (cent_id, cv, csq, n_assigned). */
  private[operators] def trainCodebook(s: SparkSession,
      dir: String): DataFrame = {
    val b = Similarity.exactPairsBase(s, dir)
      .select(col("vec_id"), col("v"), col("sq"))

    // init: the first-k vectors (exactly the seed ann_ivf/q68 use)
    var cents = b.filter(col("vec_id") < K)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"),
        col("sq").as("csq"), lit(0L).as("n_assigned"))
      .localCheckpoint(true)

    for (_ <- 1 to Rounds) {
      // (a) assignment: integer distance, ties to smallest cent_id
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("dist").asc, col("cent_id").asc)
      val assigned = b.crossJoin(broadcast(cents.select("cent_id", "cv", "csq")))
        .withColumn("dist",
          col("sq") - lit(2L) * Similarity.idot(col("v"), col("cv")) + col("csq"))
        .withColumn("crk", row_number().over(w))
        .filter(col("crk") === 1)
        .select(col("cent_id"), col("v"))

      // (b) update: per-(centroid, dim) sums — partial aggregation
      // collapses the shuffle to O(k × dims) groups; count(*) per
      // (cent, dim) is the member count n (each member contributes
      // exactly one row per dim)
      val sums = assigned
        .select(col("cent_id"), posexplode(col("v")).as(Seq("i", "comp")))
        .groupBy(col("cent_id"), col("i"))
        .agg(sum(col("comp")).as("sm"), count(lit(1)).as("n"))
        .withColumn("c",
          floor(col("sm").cast("double") / col("n")).cast("long"))

      cents = sums.groupBy(col("cent_id"))
        .agg(
          transform(sort_array(collect_list(struct(col("i"), col("c")))),
            e => e.getField("c")).as("cv"),
          max(col("n")).as("n_assigned"))
        .withColumn("csq", Similarity.idot(col("cv"), col("cv")))
        // truncate lineage per round: the codebook is k rows, the
        // barrier keeps round r+1's plan independent of round r's
        .localCheckpoint(true)
    }
    cents
  }

  /** q70: train the k-means codebook; returns the trained centroids
    * exploded to (cent_id, n_assigned, i, comp) rows. */
  def q70Kmeans(s: SparkSession, dir: String): DataFrame =
    trainCodebook(s, dir)
      .select(col("cent_id"), col("n_assigned"),
        posexplode(col("cv")).as(Seq("i", "comp")))
      .select(col("cent_id"), col("n_assigned"),
        col("i").cast("long").as("i"), col("comp"))
      .orderBy(col("cent_id"), col("i"))

  /** One Lloyd round as DuckDB CTEs: `prev` → assignment → per-dim
    * sums → re-quantized codebook `out` (cent_id, cv, csq, n). */
  private def roundSql(r: Int, prev: String, out: String): String =
    s"""d$r AS (
       |  SELECT s.vec_id, s.v, c.cent_id,
       |    s.sq - 2*CAST(list_sum(list_transform(range(1, len(s.v)+1),
       |        i -> s.v[i]*c.cv[i])) AS BIGINT) + c.csq AS dist
       |  FROM sq s CROSS JOIN $prev c),
       |a$r AS (
       |  SELECT vec_id, v, cent_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dist ASC, cent_id ASC) AS crk FROM d$r)
       |  WHERE crk = 1),
       |s$r AS (
       |  SELECT cent_id, t.i AS i,
       |    CAST(sum(v[t.i+1]) AS BIGINT) AS sm, count(*) AS n
       |  FROM a$r, range(0, $Dims) t(i) GROUP BY cent_id, t.i),
       |$out AS (
       |  SELECT cent_id, cv,
       |    CAST(list_sum(list_transform(range(1, len(cv)+1),
       |      i -> cv[i]*cv[i])) AS BIGINT) AS csq, n
       |  FROM (SELECT cent_id,
       |          list(CAST(floor(CAST(sm AS DOUBLE)/n) AS BIGINT)
       |            ORDER BY i) AS cv,
       |          max(n) AS n
       |        FROM s$r GROUP BY cent_id))""".stripMargin

  val q70KmeansOracle: String = {
    val rounds = (1 to Rounds)
      .map(r => roundSql(r, if (r == 1) "c0" else s"c${r - 1}", s"c$r"))
      .mkString(",\n")
    s"""WITH base AS (
       |  SELECT vec_id, ${Similarity.ivecSql} AS v FROM embeddings),
       |sq AS (
       |  SELECT vec_id, v,
       |    CAST(list_sum(list_transform(range(1, len(v)+1),
       |      i -> v[i]*v[i])) AS BIGINT) AS sq
       |  FROM base),
       |c0 AS (SELECT vec_id AS cent_id, v AS cv, sq AS csq, 0 AS n
       |       FROM sq WHERE vec_id < $K),
       |$rounds
       |SELECT cent_id, CAST(n AS BIGINT) AS n_assigned, t.i AS i,
       |  cv[t.i+1] AS comp
       |FROM c$Rounds, range(0, $Dims) t(i)
       |ORDER BY cent_id, i""".stripMargin
  }

  val SampleCap = 25 // per-cell keep budget for q92

  /** q92: cluster-capped diversity sampling — the cluster-balanced
    * subsampling step of embedding-space curation (cap the over-dense
    * clusters, keep sparse clusters whole, so the subsample preserves
    * coverage of the embedding space instead of mirroring its density
    * skew). Assigns every vector to its nearest q70-trained centroid
    * (the [[trainCodebook]] codebook — broadcast k rows, the intended
    * ann_ivf/q70 BNLJ shape), then keeps at most `SampleCap` vectors
    * per cell in deterministic pseudo-random order (24-bit md5 prefix
    * of vec_id, ties to vec_id — the q81/q47 hash-sampling key).
    * Returns (cell, vec_id, rk, n_cell): the kept rows plus how big
    * their cell was, so the output shows exactly where density was
    * cut.
    *
    * 100 TB posture: assignment is one corpus pass against a
    * broadcast codebook (never shuffles the fact side); per-cell
    * selection is a k-partition window that WindowGroupLimit
    * truncates to `SampleCap` rows per partition BEFORE the sort
    * spills anything — O(k · cap) survivors. The per-vector nearest-
    * centroid window is partitioned by vec_id (the q70 shape). */
  def q92DiversitySample(s: SparkSession, dir: String): DataFrame = {
    val b = Similarity.exactPairsBase(s, dir)
      .select(col("vec_id"), col("v"), col("sq"))
    val cents = trainCodebook(s, dir)

    val wv = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist").asc, col("cent_id").asc)
    val assigned = b
      .crossJoin(broadcast(cents.select("cent_id", "cv", "csq")))
      .withColumn("dist",
        col("sq") - lit(2L) * Similarity.idot(col("v"), col("cv")) +
          col("csq"))
      .withColumn("crk", row_number().over(wv))
      .filter(col("crk") === 1)
      .select(col("cent_id").as("cell"), col("vec_id"))

    val wc = Window.partitionBy(col("cell"))
      .orderBy(col("skey").asc, col("vec_id").asc)
    val wn = Window.partitionBy(col("cell"))
    assigned
      .withColumn("skey",
        conv(substring(md5(col("vec_id").cast("string")), 1, 6), 16, 10)
          .cast("long"))
      .withColumn("n_cell", count(lit(1)).over(wn))
      .withColumn("rk", row_number().over(wc).cast("long"))
      .filter(col("rk") <= SampleCap)
      .select(col("cell"), col("vec_id"), col("rk"), col("n_cell"))
      .orderBy(col("cell"), col("rk"))
  }

  /** q92 oracle: the q70 training chain, one more assignment round
    * against the final codebook, then the per-cell capped hash-order
    * selection. */
  val q92DiversitySampleOracle: String = {
    val rounds = (1 to Rounds)
      .map(r => roundSql(r, if (r == 1) "c0" else s"c${r - 1}", s"c$r"))
      .mkString(",\n")
    val hex6 = (0 until 6).map { i =>
      val mult = math.pow(16, 5 - i).toLong
      s"(strpos('0123456789abcdef', substring(hx, ${i + 1}, 1)) - 1)" +
        (if (mult == 1) "" else s" * $mult")
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT vec_id, ${Similarity.ivecSql} AS v FROM embeddings),
       |sq AS (
       |  SELECT vec_id, v,
       |    CAST(list_sum(list_transform(range(1, len(v)+1),
       |      i -> v[i]*v[i])) AS BIGINT) AS sq
       |  FROM base),
       |c0 AS (SELECT vec_id AS cent_id, v AS cv, sq AS csq, 0 AS n
       |       FROM sq WHERE vec_id < $K),
       |$rounds,
       |df AS (
       |  SELECT s.vec_id, c.cent_id,
       |    s.sq - 2*CAST(list_sum(list_transform(range(1, len(s.v)+1),
       |        i -> s.v[i]*c.cv[i])) AS BIGINT) + c.csq AS dist
       |  FROM sq s CROSS JOIN c$Rounds c),
       |af AS (
       |  SELECT vec_id, cent_id AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dist ASC, cent_id ASC) AS crk FROM df)
       |  WHERE crk = 1),
       |keyed AS (
       |  SELECT cell, vec_id, $hex6 AS skey FROM (
       |    SELECT cell, vec_id,
       |      substring(md5(CAST(vec_id AS VARCHAR)), 1, 6) AS hx
       |    FROM af)),
       |sel AS (
       |  SELECT cell, vec_id,
       |    CAST(row_number() OVER (PARTITION BY cell
       |      ORDER BY skey ASC, vec_id ASC) AS BIGINT) AS rk,
       |    CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS n_cell
       |  FROM keyed)
       |SELECT cell, vec_id, rk, n_cell FROM sel
       |WHERE rk <= $SampleCap
       |ORDER BY cell, rk""".stripMargin
  }

  val OutlierTopK = 5

  /** q76: distance-to-centroid outlier ranking per label group — the
    * example-difficulty metric of Sorscher et al. 2022 ("Beyond neural
    * scaling laws: beating power law scaling via data pruning"): rank
    * each embedding by its squared distance from its group's centroid;
    * the far tail is what curation inspects (mislabeled/atypical
    * examples) and what pruning keeps or drops depending on the
    * data-abundance regime. Exact in the integer milli-vector space:
    * the centroid re-quantizes per component as `floor(double(Σv)/n)`
    * (the q70 one-IEEE-op trick) and distances are pure integer sums,
    * so both engines hash-match.
    *
    * Plan shape: per-dim decomposition, never per-pair — one
    * groupBy(label, dim) with map-side partial aggregation collapses
    * the centroid shuffle to O(labels × dims) rows regardless of
    * corpus size; the distance pass joins each (vec, dim) row to the
    * BROADCAST centroid table (labels × dims rows — KBytes) and sums
    * per vector. Top-k per label goes through the rank window, which
    * WindowGroupLimit prunes to k rows per partition before the final
    * shuffle. */
  def q76CentroidOutliers(s: SparkSession, dir: String): DataFrame = {
    val b = Similarity.exactPairsBase(s, dir)
    val dims = b.select(col("label"), col("vec_id"),
      posexplode(col("v")).as(Seq("i", "comp")))
    val cents = dims.groupBy(col("label"), col("i"))
      .agg(sum(col("comp")).as("sm"), count(lit(1)).as("n"))
      .select(col("label"), col("i"),
        floor(col("sm").cast("double") / col("n")).cast("long").as("c"))
    val dist = dims.join(broadcast(cents), Seq("label", "i"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum((col("comp") - col("c")) * (col("comp") - col("c")))
        .as("dist"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("dist").desc, col("vec_id").asc)
    dist.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= OutlierTopK)
      .select(col("label"), col("rk"), col("vec_id"), col("dist"))
      .orderBy(col("label"), col("rk"))
  }

  val q76CentroidOutliersOracle: String =
    s"""WITH base AS (
       |  SELECT vec_id, label, ${Similarity.ivecSql} AS v FROM embeddings),
       |dims AS (
       |  SELECT label, vec_id, t.i AS i, v[t.i+1] AS comp
       |  FROM base, range(0, $Dims) t(i)),
       |cents AS (
       |  SELECT label, i,
       |    CAST(floor(CAST(sum(comp) AS DOUBLE) / count(*)) AS BIGINT) AS c
       |  FROM dims GROUP BY label, i),
       |dist AS (
       |  SELECT d.label, d.vec_id,
       |    CAST(sum((d.comp - c.c) * (d.comp - c.c)) AS BIGINT) AS dist
       |  FROM dims d JOIN cents c ON c.label = d.label AND c.i = d.i
       |  GROUP BY d.label, d.vec_id)
       |SELECT label, rk, vec_id, dist FROM (
       |  SELECT *, row_number() OVER (PARTITION BY label
       |    ORDER BY dist DESC, vec_id ASC) AS rk FROM dist)
       |WHERE rk <= $OutlierTopK
       |ORDER BY label, rk""".stripMargin
}
