package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis.tokensSql

/** Unigram-LM (SentencePiece-style) subword vocabulary training over
  * the `documents` table — q72/q74's companion: where BPE GROWS a
  * vocabulary bottom-up by merging, the unigram LM (Kudo 2018,
  * "Subword Regularization") SHRINKS a seed vocabulary top-down by
  * EM: seed with every substring, alternately (E) Viterbi-segment the
  * corpus under the current piece probabilities and (M) re-estimate
  * probabilities from the segmentation counts, then prune to the
  * target size. q74/q90 are the encode/fertility consumers of a
  * trained vocabulary; this is the trainer for the second of the two
  * standard tokenizer families.
  *
  * Spark decomposition (the q72 boundary, kept explicit): the ONLY
  * corpus-scale stage is one `explode(tokens) → groupBy(word)` pass
  * collapsing the corpus to the word-frequency table; seeding, both
  * EM rounds and the prune run on vocabulary-scale rows. Each word's
  * Viterbi DP runs IN-ROW (a fold over its ≤ [[MaxWordLen]]
  * positions against a per-word substring→probability map built by
  * ONE equi-join) — no DP state ever crosses rows, so the E-step is
  * embarrassingly parallel at any corpus size. Per-round lazy
  * `localCheckpoint` on the vocabulary keeps round r+1's plan
  * independent of round r (the q158 discipline).
  *
  * Exact integer semantics (both engines bit-identical):
  *  - probabilities are ×10⁴ integers (`p_e4`), truncating division,
  *    floored at 1 so every surviving piece stays segmentable;
  *  - Viterbi compares path scores as Π p_e4(piece)·10⁴⁽ᴸ⁻¹⁾ per
  *    piece of length L — for paths covering the same prefix this is
  *    the true probability ordering under a COMMON 10^{4·chars}
  *    denominator, in pure integers (≤ 10^{4·MaxWordLen} = 10³²,
  *    inside DECIMAL(38,0)/HUGEINT); ties break to the smallest
  *    backpointer (the longest last piece);
  *  - words longer than [[MaxWordLen]] chars are excluded from
  *    training (documented cap, the SentencePiece
  *    max-sentencepiece-length analogue);
  *  - M-step: piece count = frequency-weighted occurrences on the
  *    Viterbi paths; length-1 pieces are floored at count 1 (never
  *    die — the SentencePiece character-coverage invariant); longer
  *    pieces with zero count are dropped;
  *  - prune: keep all single characters plus the top
  *    [[VocabTarget]] longer pieces by (count desc, piece asc);
  *    final p_e4 re-normalizes over the pruned set.
  *
  * The DuckDB oracle is a deliberately INDEPENDENT formulation (the
  * q134 pattern): where Spark folds the DP in-row over a substring
  * map, the oracle unrolls the DP as [[MaxWordLen]] materialized
  * CTE rounds of position-grain joins plus an unrolled backtrack —
  * two implementations of the same exact arithmetic gating each
  * other. Pinned [[EmRounds]] EM rounds keep that oracle expressible
  * (the q70/q158 convention: both engines compute the same
  * not-yet-converged model; convergence is a modeling question,
  * bit-equality is the gate). */
object UnigramLm {

  /** Training word-length cap (chars) — also the DP unroll depth. */
  val MaxWordLen = 8
  /** Maximum piece length seeded (chars). */
  val MaxPieceLen = 4
  /** Pinned EM rounds — see object scaladoc. */
  val EmRounds = 2
  /** Longer-piece budget after pruning (single chars always kept). */
  val VocabTarget = 24
  /** Probability scale: p_e4 = cnt·10⁴ div total, floored at 1. */
  val PScale = 10000L

  /** The in-row Viterbi forward pass: folds positions 1..n, carrying
    * `array<struct<s decimal(38,0), bp int>>` (index i+1 = best
    * score·10^{4i} reaching char i, and its backpointer). Candidate
    * pieces come from the per-word map `m` keyed j·16+len; a missing
    * piece scores 0 and can never win (the single-char floor keeps
    * every position reachable with s ≥ 1). The fold visits j
    * ascending and replaces only on strictly-greater score, so ties
    * keep the SMALLEST j — the longest last piece. */
  private val dpSql: String =
    s"""aggregate(
       |  sequence(1, n),
       |  array(named_struct('s', CAST(1 AS DECIMAL(38,0)), 'bp', -1)),
       |  (acc, i) -> array_append(acc,
       |    aggregate(
       |      transform(sequence(greatest(0, i - $MaxPieceLen), i - 1),
       |        j -> named_struct(
       |          's', element_at(acc, j + 1).s
       |            * CAST(coalesce(element_at(m, j * 16 + i - j), 0)
       |                AS DECIMAL(38,0))
       |            * element_at(array(CAST(1 AS DECIMAL(38,0)),
       |                CAST(10000 AS DECIMAL(38,0)),
       |                CAST(100000000 AS DECIMAL(38,0)),
       |                CAST(1000000000000 AS DECIMAL(38,0))), i - j),
       |          'bp', j)),
       |      named_struct('s', CAST(-1 AS DECIMAL(38,0)), 'bp', -1),
       |      (b, c) -> IF(c.s > b.s, c, b))))""".stripMargin

  /** The in-row backtrack: n iterations popping backpointers from
    * position n to 0, emitting the path's pieces (iterations after
    * reaching 0 are no-ops — a word has at most n pieces). */
  private val btSql: String =
    """aggregate(
      |  sequence(1, n),
      |  named_struct('pos', n, 'ps', CAST(array() AS ARRAY<STRING>)),
      |  (st, x) -> IF(st.pos <= 0, st,
      |    named_struct(
      |      'pos', element_at(dp, st.pos + 1).bp,
      |      'ps', array_append(st.ps,
      |        substring(w, element_at(dp, st.pos + 1).bp + 1,
      |          st.pos - element_at(dp, st.pos + 1).bp)))),
      |  st -> st.ps)""".stripMargin

  /** (w, n, freq) — the one corpus-scale pass, barriered. */
  private def wordTable(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.load(s, dir, "documents"))
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(length(col("w")).between(1, MaxWordLen))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("n", length(col("w")).cast("int"))
      .localCheckpoint(false) // read by the seed + every EM round

  /** Every (word, start j, len l, piece) substring row. */
  private def wordSubs(words: DataFrame): DataFrame =
    words
      .withColumn("j", explode(sequence(lit(0), col("n") - 1)))
      .withColumn("l", explode(sequence(lit(1),
        least(lit(MaxPieceLen), col("n") - col("j")))))
      .withColumn("piece", expr("substring(w, j + 1, l)"))

  /** E-step: Viterbi counts under `probs` (piece, p). */
  private def eStep(words: DataFrame, probs: DataFrame): DataFrame =
    wordSubs(words)
      .join(probs, "piece")
      .groupBy(col("w"), col("n"), col("freq"))
      .agg(map_from_entries(collect_list(struct(
        (col("j") * 16 + col("l")).cast("int").as("k"),
        col("p").as("v")))).as("m"))
      .withColumn("dp", expr(dpSql))
      .withColumn("ps", expr(btSql))
      .select(col("freq"), explode(col("ps")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** M-step: re-estimate (piece, plen, cnt, p) over the surviving
    * vocabulary; single chars floored, zero-count longer pieces
    * dropped; barriered per round. */
  private def mStep(vocab: DataFrame, counts: DataFrame): DataFrame =
    normalize(vocab.select(col("piece"), col("plen"))
      .join(counts, Seq("piece"), "left")
      .withColumn("cnt",
        when(col("plen") === 1,
          greatest(coalesce(col("cnt"), lit(0L)), lit(1L)))
          .otherwise(coalesce(col("cnt"), lit(0L))))
      .filter(col("cnt") >= 1))

  /** Renormalize (piece, plen, cnt) to p_e4 over a 1-row broadcast
    * total; barriered (q158: round r+1 independent of round r). */
  private def normalize(v: DataFrame): DataFrame = {
    val tot = v.agg(sum(col("cnt")).as("tot"))
    // cnt widened to DECIMAL(38,0) before the ×PScale — the oracle
    // multiplies in HUGEINT exactly, and non-ANSI Long arithmetic
    // would wrap silently past cnt ≈ 9.2e14 (the q170 overflow class)
    v.crossJoin(broadcast(tot))
      .withColumn("p",
        greatest(expr(
          s"CAST(CAST(cnt AS DECIMAL(38,0)) * $PScale div tot AS BIGINT)"),
          lit(1L)))
      .select(col("piece"), col("plen"), col("cnt"), col("p"))
      .localCheckpoint(false)
  }

  /** q174: train the unigram LM; returns the pruned vocabulary as
    * (piece, piece_len, cnt, p_e4) by (cnt desc, piece asc). */
  def q174UnigramLm(s: SparkSession, dir: String): DataFrame = {
    val words = wordTable(s, dir)
    val seed = wordSubs(words)
      .groupBy(col("piece"))
      .agg(sum(col("freq")).as("cnt"))
      .withColumn("plen", length(col("piece")).cast("int"))
    var vocab = normalize(seed)
    for (_ <- 1 to EmRounds)
      vocab = mStep(vocab,
        eStep(words, vocab.select(col("piece"), col("p"))))
    val pruned = vocab.filter(col("plen") === 1)
      .unionAll(vocab.filter(col("plen") > 1)
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(VocabTarget))
      .select(col("piece"), col("plen"), col("cnt"))
    val tot = pruned.agg(sum(col("cnt")).as("tot"))
    pruned.crossJoin(broadcast(tot))
      .select(col("piece"), col("plen").as("piece_len"), col("cnt"),
        // DECIMAL-widened like normalize() — see the comment there
        greatest(expr(
          s"CAST(CAST(cnt AS DECIMAL(38,0)) * $PScale div tot AS BIGINT)"),
          lit(1L)).as("p_e4"))
      .orderBy(col("cnt").desc, col("piece").asc)
  }

  // ---- oracle ------------------------------------------------------

  /** 10^{4(l-1)} as a HUGEINT CASE over the piece length `l`. */
  private def scaleSql(l: String): String =
    s"(CASE $l WHEN 1 THEN CAST(1 AS HUGEINT) WHEN 2 THEN 10000 " +
      s"WHEN 3 THEN 100000000 ELSE 1000000000000 END)"

  /** DP round r against probability CTE `probs`: materialized CTEs
    * d{r}_0..d{r}_MaxWordLen (each holding every position ≤ i), then
    * the unrolled backtrack t{r}_1..t{r}_MaxWordLen and the counts. */
  private def emRoundSql(r: Int, probs: String): String = {
    val dp = (1 to MaxWordLen).map { i =>
      s"""d${r}_$i AS MATERIALIZED (
         |  SELECT * FROM d${r}_${i - 1}
         |  UNION ALL
         |  SELECT w, n, freq, i, s, bp FROM (
         |    SELECT c.*, row_number() OVER (PARTITION BY c.w
         |      ORDER BY c.s DESC, c.bp ASC) AS rk FROM (
         |      SELECT d.w, d.n, d.freq, $i AS i,
         |        d.s * p.p * ${scaleSql(s"($i - d.i)")} AS s,
         |        d.i AS bp
         |      FROM d${r}_${i - 1} d
         |      JOIN $probs p
         |        ON p.piece = substring(d.w, d.i + 1, $i - d.i)
         |      WHERE d.i BETWEEN greatest(0, $i - $MaxPieceLen)
         |        AND $i - 1 AND d.n >= $i
         |    ) c) WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val bt = (1 to MaxWordLen).map { k =>
      val prev = if (k == 1) s"t${r}_0" else s"t${r}_${k - 1}"
      s"""t${r}_$k AS MATERIALIZED (
         |  SELECT t.w, t.freq, d.bp AS pos,
         |    substring(t.w, d.bp + 1, t.pos - d.bp) AS piece
         |  FROM $prev t
         |  JOIN d${r}_$MaxWordLen d ON d.w = t.w AND d.i = t.pos
         |  WHERE t.pos > 0)""".stripMargin
    }.mkString(",\n")
    val union = (1 to MaxWordLen)
      .map(k => s"SELECT freq, piece FROM t${r}_$k").mkString("\n  UNION ALL ")
    s"""d${r}_0 AS (
       |  SELECT w, n, freq, 0 AS i, CAST(1 AS HUGEINT) AS s, -1 AS bp
       |  FROM wrd),
       |$dp,
       |t${r}_0 AS (SELECT w, freq, n AS pos FROM wrd),
       |$bt,
       |cnt$r AS (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |  $union)
       |  GROUP BY piece),
       |v$r AS (
       |  SELECT piece, plen, cnt FROM (
       |    SELECT s.piece, s.plen,
       |      CASE WHEN s.plen = 1 THEN greatest(coalesce(c.cnt, 0), 1)
       |           ELSE coalesce(c.cnt, 0) END AS cnt
       |    FROM $probs s LEFT JOIN cnt$r c USING (piece))
       |  WHERE cnt >= 1),
       |vt$r AS (SELECT CAST(sum(cnt) AS HUGEINT) AS tot FROM v$r),
       |p$r AS MATERIALIZED (
       |  SELECT piece, plen, cnt,
       |    greatest(CAST(cnt * $PScale // tot AS BIGINT), 1) AS p
       |  FROM v$r, vt$r)""".stripMargin
  }

  lazy val q174UnigramLmOracle: String = {
    val rounds = (1 to EmRounds)
      .map(r => emRoundSql(r, if (r == 1) "p0" else s"p${r - 1}"))
      .mkString(",\n")
    s"""WITH wrd AS MATERIALIZED (
       |  SELECT w, CAST(len(w) AS INT) AS n,
       |    CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($tokensSql) AS w FROM documents)
       |  WHERE len(w) BETWEEN 1 AND $MaxWordLen GROUP BY w),
       |sub0 AS (
       |  SELECT w, n, freq, unnest(range(0, n)) AS j FROM wrd),
       |sub1 AS (
       |  SELECT w, n, freq, j,
       |    unnest(range(1, least($MaxPieceLen, n - j) + 1)) AS l
       |  FROM sub0),
       |seed AS (
       |  SELECT substring(w, j + 1, l) AS piece,
       |    CAST(min(l) AS INT) AS plen,
       |    CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM sub1 GROUP BY 1),
       |st AS (SELECT CAST(sum(cnt) AS HUGEINT) AS tot FROM seed),
       |p0 AS MATERIALIZED (
       |  SELECT piece, plen, cnt,
       |    greatest(CAST(cnt * $PScale // tot AS BIGINT), 1) AS p
       |  FROM seed, st),
       |$rounds,
       |keep1 AS (
       |  SELECT piece, plen, cnt FROM p$EmRounds WHERE plen = 1),
       |keepn AS (
       |  SELECT piece, plen, cnt FROM p$EmRounds WHERE plen > 1
       |  ORDER BY cnt DESC, piece LIMIT $VocabTarget),
       |fin AS (
       |  SELECT * FROM keep1 UNION ALL SELECT * FROM keepn),
       |ft AS (SELECT CAST(sum(cnt) AS HUGEINT) AS tot FROM fin)
       |SELECT piece, plen AS piece_len, cnt,
       |  greatest(CAST(cnt * $PScale // tot AS BIGINT), 1) AS p_e4
       |FROM fin, ft
       |ORDER BY cnt DESC, piece""".stripMargin
  }
}
