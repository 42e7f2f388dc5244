package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Source-overlap matrix: for every pair of sources, the EXACT
  * Jaccard similarity of their word-shingle vocabularies next to the
  * MinHash ESTIMATE of the same quantity — the corpus-diagnostics
  * query behind "which domains duplicate each other" (crawl snapshots
  * that re-scrape the same sites, mirrored wikis, syndicated news),
  * run before any doc-level dedup to decide which source pairs are
  * worth a full near-dup pass. Reporting the estimator AGAINST the
  * ground truth in one table is the point: at 100 TB you drop the
  * exact arm and keep the signature arm, and this query is the
  * calibration evidence for that swap.
  *
  * Shapes (both arms share ONE distinct-(source, shingle) pass):
  *  - exact arm: shingle-indexed co-occurrence — group the distinct
  *    pairs by shingle into a ≤S source list, expand the C(S,2)
  *    in-list pairs with array HOFs, count per pair. No all-pairs
  *    join of rows, no join at data scale at all: the only
  *    data-sized shuffles are the distinct and the per-shingle
  *    groupBy (the dedup_exact class).
  *  - estimate arm: the source-level MinHash signature is the
  *    elementwise min of the [[Dedup]] 8×32-bit signature over the
  *    source's shingle UNION — computed directly as 8 column-mins in
  *    the same per-source aggregate that counts vocabulary size
  *    (min-of-substring over distinct shingles ≡ min over the doc
  *    union; no doc-level signature materialized). S sources → an
  *    S-row table; the complete C(S,2) matrix is expanded inside one
  *    collected row (the q86/q88 bounded-sufficient-statistic shape),
  *    so zero-intersection pairs appear with jaccard_e6 = 0 instead
  *    of silently vanishing.
  *
  * Exactness: counts, intersections and unions are BIGINT;
  * `jaccard_e6 = inter·10⁶ div union`, `mh_est_e6 = agree·10⁶ div 8`
  * are true integer divisions; the signature components are
  * lexicographic mins of fixed-width hex strings — identical in both
  * engines. Fully deterministic.
  *
  * 100 TB posture: one documents scan → distinct (source, shingle)
  * (the one data-scale shuffle, keyed wide enough to spread);
  * everything after is O(vocab) then O(S²) with S in the dozens. The
  * per-shingle source list is bounded by S itself — no posting-list
  * cap needed, unlike doc-level grams. */
object Overlap {

  import Dedup.NumHashes

  /** Expand the ordered C(n,2) pairs of a sorted array column via
    * nested transform/slice; `f(a, b)` builds the pair element. */
  private[graft] def orderedPairs(arr: Column,
      f: (Column, Column) => Column): Column =
    flatten(transform(arr, (a, i) =>
      transform(slice(arr, i + lit(2), size(arr)), b => f(a, b))))

  /** q89: complete source×source overlap matrix — exact shingle
    * Jaccard vs its own MinHash estimate; returns (source_a,
    * source_b, n_a, n_b, n_inter, n_union, jaccard_e6, mh_agree,
    * mh_est_e6). */
  def q89SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    // ONE distinct (source, shingle) pass feeds both arms; hash
    // material is computed post-distinct (once per distinct shingle
    // per source, not per occurrence). localCheckpoint: two
    // downstream aggregates would otherwise re-run the shingle
    // kernel + md5s per consumer (column pruning makes the subtrees
    // non-identical, so ReuseExchange cannot merge them).
    val sh = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("source"), explode(Dedup.shingles(col("text"))).as("sh"))
      .distinct()
      .withColumn("h",
        concat(md5(col("sh")), md5(concat(lit("x:"), col("sh")))))
      .localCheckpoint(false)

    // per-source vocab size + 8-component source-level signature in
    // ONE aggregate (min over the shingle union per hex window)
    val sigMins = (0 until NumHashes)
      .map(k => min(substring(col("h"), k * 8 + 1, 8)).as(s"sig_$k"))
    val perSrc = sh.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sigMins: _*)

    // the complete pair matrix from one collected S-row list
    val one = perSrc
      .select(struct(col("source"), col("n"),
        array((0 until NumHashes).map(k => col(s"sig_$k")): _*).as("sig"))
        .as("d"))
      .agg(sort_array(collect_list(col("d"))).as("ds"))
    val pairs = one
      .select(explode(orderedPairs(col("ds"), (a, b) =>
        struct(a.getField("source").as("source_a"),
          b.getField("source").as("source_b"),
          a.getField("n").as("n_a"), b.getField("n").as("n_b"),
          aggregate(
            zip_with(a.getField("sig"), b.getField("sig"),
              (x, y) => when(x === y, 1L).otherwise(0L)),
            lit(0L), (acc, v) => acc + v).as("mh_agree"))))
        .as("p"))
      .select(col("p.source_a"), col("p.source_b"), col("p.n_a"),
        col("p.n_b"), col("p.mh_agree"))

    // exact intersections: per-shingle source list (≤ S), in-list
    // ordered pairs, count — the only data-scale aggregation
    val inter = sh.groupBy(col("sh"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .select(explode(orderedPairs(col("ss"), (a, b) =>
        struct(a.as("sa"), b.as("sb")))).as("p"))
      .groupBy(col("p.sa").as("sa"), col("p.sb").as("sb"))
      .agg(count(lit(1)).as("n_inter"))

    pairs
      .join(inter, col("source_a") === col("sa") &&
        col("source_b") === col("sb"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .withColumn("jaccard_e6", expr("n_inter * 1000000 div n_union"))
      .withColumn("mh_est_e6",
        expr(s"mh_agree * 1000000 div $NumHashes"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_inter"), col("n_union"), col("jaccard_e6"),
        col("mh_agree"), col("mh_est_e6"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** q93: label-centroid affinity matrix — the SEMANTIC complement
    * of q89's lexical overlap: for every pair of labels, the cosine
    * between their mean embedding vectors, next to both group sizes.
    * The eval-side diagnostic for "which label pairs are confusable"
    * (centroids nearly parallel ⇒ the label boundary is weak in this
    * embedding space) and the source-mixture analogue when labels
    * partition the corpus.
    *
    * Exactness: centroids re-quantize to integer space exactly as
    * q70's Lloyd update does (`floor(double(Σ mᵢ) / n)` per
    * component — one IEEE division of identical integer inputs in
    * both engines); the pairwise cosine is the established `cos_e6`
    * form on those integer vectors. Fully deterministic.
    *
    * 100 TB posture: ONE corpus pass — the per-(label, dim) partial
    * sum collapses the scan to O(L × dims) groups map-side (the q70
    * update shuffle without the assignment join); the pair matrix
    * expands from one collected L-row list (the q89 shape). No join
    * at data scale anywhere. */
  def q93LabelAffinity(s: SparkSession, dir: String): DataFrame = {
    val dims = Similarity.exactPairsBase(s, dir)
      .select(col("label"), posexplode(col("v")).as(Seq("i", "m")))
    val cents = dims.groupBy(col("label"), col("i"))
      .agg(sum(col("m")).as("sm"), count(lit(1)).as("n"))
      .withColumn("c",
        floor(col("sm").cast("double") / col("n")).cast("long"))
    val vecs = cents.groupBy(col("label"))
      .agg(
        transform(sort_array(collect_list(struct(col("i"), col("c")))),
          e => e.getField("c")).as("cv"),
        max(col("n")).as("n_members"))
      .withColumn("csq", Similarity.idot(col("cv"), col("cv")))

    vecs
      .select(struct(col("label"), col("n_members"), col("cv"),
        col("csq")).as("d"))
      .agg(sort_array(collect_list(col("d"))).as("ds"))
      .select(explode(orderedPairs(col("ds"), (a, b) =>
        struct(a.getField("label").as("label_a"),
          b.getField("label").as("label_b"),
          a.getField("n_members").as("n_a"),
          b.getField("n_members").as("n_b"),
          Similarity.cosE6(
            Similarity.idot(a.getField("cv"), b.getField("cv")),
            a.getField("csq"), b.getField("csq")).as("cos_e6"))))
        .as("p"))
      .select(col("p.label_a"), col("p.label_b"), col("p.n_a"),
        col("p.n_b"), col("p.cos_e6"))
      .orderBy(col("label_a"), col("label_b"))
  }

  val q93LabelAffinityOracle: String =
    s"""WITH base AS (
       |  SELECT vec_id, label, ${Similarity.ivecSql} AS v
       |  FROM embeddings),
       |dims AS (
       |  SELECT label, t.i AS i, CAST(sum(v[t.i+1]) AS BIGINT) AS sm,
       |    count(*) AS n
       |  FROM base, range(0, ${Clustering.Dims}) t(i)
       |  GROUP BY label, t.i),
       |cvals AS (
       |  SELECT label, i,
       |    CAST(floor(CAST(sm AS DOUBLE) / n) AS BIGINT) AS c, n
       |  FROM dims),
       |cents AS (
       |  SELECT label, list(c ORDER BY i) AS cv,
       |    CAST(max(n) AS BIGINT) AS n_members
       |  FROM cvals GROUP BY label),
       |withsq AS (
       |  SELECT label, cv, n_members,
       |    CAST(list_sum(list_transform(range(1, len(cv)+1),
       |      i -> cv[i]*cv[i])) AS BIGINT) AS csq
       |  FROM cents)
       |SELECT a.label AS label_a, b.label AS label_b,
       |  a.n_members AS n_a, b.n_members AS n_b,
       |  CAST(floor(CAST(list_sum(list_transform(range(1, len(a.cv)+1),
       |      i -> a.cv[i]*b.cv[i])) AS DOUBLE)
       |    / (sqrt(CAST(a.csq AS DOUBLE)) * sqrt(CAST(b.csq AS DOUBLE)))
       |    * 1e6) AS BIGINT) AS cos_e6
       |FROM withsq a JOIN withsq b ON a.label < b.label
       |ORDER BY label_a, label_b""".stripMargin

  val q89SourceOverlapOracle: String = {
    val sigDefs = (0 until NumHashes)
      .map(k => s"min(substring(h, ${k * 8 + 1}, 8)) AS sig_$k")
      .mkString(",\n    ")
    val agree = (0 until NumHashes)
      .map(k => s"(CASE WHEN a.sig_$k = b.sig_$k THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH sh AS (
       |  SELECT DISTINCT source, sh FROM (
       |    SELECT source, unnest(${Dedup.shinglesSql}) AS sh
       |    FROM documents)),
       |h AS (
       |  SELECT source, sh, md5(sh) || md5('x:' || sh) AS h FROM sh),
       |per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n,
       |    $sigDefs
       |  FROM h GROUP BY source),
       |pairs AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    a.n AS n_a, b.n AS n_b,
       |    CAST($agree AS BIGINT) AS mh_agree
       |  FROM per a JOIN per b ON a.source < b.source),
       |inter AS (
       |  SELECT a.source AS sa, b.source AS sb,
       |    CAST(count(*) AS BIGINT) AS n_inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT source_a, source_b, n_a, n_b,
       |  CAST(coalesce(n_inter, 0) AS BIGINT) AS n_inter,
       |  CAST(n_a + n_b - coalesce(n_inter, 0) AS BIGINT) AS n_union,
       |  CAST(coalesce(n_inter, 0) * 1000000
       |    // (n_a + n_b - coalesce(n_inter, 0)) AS BIGINT) AS jaccard_e6,
       |  mh_agree,
       |  CAST(mh_agree * 1000000 // $NumHashes AS BIGINT) AS mh_est_e6
       |FROM pairs LEFT JOIN inter
       |  ON source_a = sa AND source_b = sb
       |ORDER BY source_a, source_b""".stripMargin
  }
}
