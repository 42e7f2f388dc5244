package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextStatFunctions
import graft.operators.TextAnalysis.tokensSql

/** Keyword retrieval scoring — the lexical half of a hybrid search
  * stack (q63 fuses a raw token-count keyword arm with the vector
  * arm; this is the serious version of that keyword arm). Reference
  * scope note: qwerdenkerXD/gus has no search surface; this extends
  * the generalized document operators.
  */
object Retrieval {

  /** BM25 query terms (mid-frequency corpus vocabulary). */
  val Bm25Terms = Seq("spark", "vector", "merge")
  val Bm25TopK = 50

  /** q83: BM25 document scoring, made engine-exact. Standard
    * Okapi/Lucene BM25 with k1=1.2, b=0.75:
    *
    *   score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *
    * with the Lucene non-negative idf `ln(1 + (N−df+0.5)/(df+0.5))`.
    * Substituting k1=6/5, b=3/4 and avgdl=T/N (T = corpus tokens)
    * and clearing denominators gives the exact integer form
    *
    *   contribution = (idf_e6 · 44·tf·T) div (20·tf·T + 6·T + 18·dl·N)
    *
    * — pure BIGINT floor division on positives in both engines. The
    * only doubles are the three per-TERM idf evaluations (exact
    * rational inputs, quantized to 1e-6), never per-row arithmetic.
    * Headroom: the numerator is ~idf_e6·44·tf·T ≈ 5·10^17 at the ×100
    * corpus; a true 100 TB corpus lifts these to DECIMAL(38,0) the
    * way q55's PMI did.
    *
    * Shape for 100 TB: per-doc tf for ALL query terms comes from ONE
    * single-pass codegen kernel (tokenSetCounts — no explode, no
    * per-term scan); corpus stats (N, T, per-term df, idf) are ONE
    * aggregation to a 1-row frame broadcast back over the per-doc
    * frame (the q36/q55 intended constant-side BNLJ shape); scoring
    * is then map-side integer arithmetic and selection is
    * TakeOrderedAndProject — O(k) per partition. Two passes over the
    * per-doc stats (not the corpus text: the localCheckpoint barrier
    * keeps the kernel pass single). */
  def q83Bm25(s: SparkSession, dir: String): DataFrame = {
    val terms = Bm25Terms
    val perDoc = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"),
        TextStatFunctions.tokenSetCounts(col("text"),
          terms.map(Seq(_))).as("tfs"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"))
      .select(col("doc_id") +: col("dl") +:
        terms.indices.map(i => col("tfs").getItem(i).cast("long")
          .as(s"tf$i")): _*)
      .localCheckpoint(false) // kernel pass runs once for both consumers
    val statCols = count(lit(1)).cast("long").as("n_docs") +:
      sum(col("dl")).as("t_toks") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val withIdf = stats.select(col("n_docs") +: col("t_toks") +:
      terms.indices.map { i =>
        round(lit(1e6) * log(lit(1.0) +
          (col("n_docs").cast("double") - col(s"df$i") + lit(0.5)) /
            (col(s"df$i") + lit(0.5)))).cast("long").as(s"idf$i")
      }: _*)
    val contrib = terms.indices.map { i =>
      expr(s"(idf$i * 44 * tf$i * t_toks) div " +
        s"(20 * tf$i * t_toks + 6 * t_toks + 18 * dl * n_docs)")
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(withIdf))
      .select(col("doc_id"), col("dl"), contrib.as("bm25_e6"))
      .orderBy(col("bm25_e6").desc, col("doc_id").asc)
      .limit(Bm25TopK)
  }

  val q83Bm25Oracle: String = {
    val terms = Bm25Terms
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(",\n       |    ")
    val dfCols = terms.indices.map { i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i"
    }.mkString(",\n       |    ")
    val idfCols = terms.indices.map { i =>
      s"CAST(round(1e6 * ln(1 + (n_docs - df$i + 0.5) / (df$i + 0.5))) " +
        s"AS BIGINT) AS idf$i"
    }.mkString(",\n       |    ")
    val contrib = terms.indices.map { i =>
      s"(idf$i * 44 * tf$i * t_toks) // " +
        s"(20 * tf$i * t_toks + 6 * t_toks + 18 * dl * n_docs)"
    }.mkString("\n       |    + ")
    s"""WITH base AS (
       |  SELECT doc_id, $tokensSql AS toks FROM documents),
       |per_doc AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM base),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS t_toks,
       |    $dfCols
       |  FROM per_doc),
       |idf AS (
       |  SELECT n_docs, t_toks,
       |    $idfCols
       |  FROM stats)
       |SELECT doc_id, dl,
       |    $contrib
       |    AS bm25_e6
       |FROM per_doc CROSS JOIN idf
       |ORDER BY bm25_e6 DESC, doc_id ASC
       |LIMIT $Bm25TopK""".stripMargin
  }
}
