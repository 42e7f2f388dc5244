package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis.tokensSql

/** q134: EXACT set-similarity search — the deterministic complement
  * to the MinHash-LSH band join (`Dedup` finds *candidates*
  * probabilistically; this operator returns EVERY corpus partner of
  * each probe document whose token-set Jaccard meets the threshold,
  * zero false negatives, no sketch).
  *
  * The probe set is doc_id ≡ 0 (mod 97) — the q129 audit-subset
  * convention — NOT because the algorithm needs it, but because the
  * corpus is near-duplicate-heavy BY DESIGN and a full self-join's
  * OUTPUT is Θ(Σ cluster²) (measured: ≥9k pairs at J≥0.9 from 500
  * sf0.01 docs — quadratic in duplication, a result-size bomb no
  * candidate pruning can fix). SetSimSpec proves the operator
  * complete against a brute-force all-pairs ground truth.
  *
  * Plan shape — BROADCAST PROBE INDEX. An audit-sized probe set
  * means the probe postings (probe_id, tok, |probe|) are broadcast-
  * small BY CONSTRUCTION (P·avg_set rows — KB to low MB for any
  * plausible audit set, independent of corpus size), which makes the
  * textbook small-side similarity-search plan available: ONE
  * broadcast hash join of corpus postings against the probe index,
  * the Jaccard size filter 5·min(|a|,|b|) ≥ 4·max(|a|,|b|) applied
  * IN the join output before anything shuffles, then a single
  * groupBy (probe, doc) whose COUNT is |∩| exactly — no token,
  * array, or posting list ever rides a shuffle, and the only
  * exchange in the whole query is the pair-count aggregation.
  * Because corpus postings arrive doc-clustered from the scan,
  * map-side partial aggregation collapses the per-token join hits
  * to one row per (probe, doc) pair BEFORE the exchange: shuffle
  * volume is the number of co-occurring pairs, not Σ df·p join
  * rows (sf10 measured: 506M join rows → 70M shuffled pair rows →
  * a 3.3× wall-clock cut vs the prefix-join + posting-re-join
  * formulation this replaced, 126.5→38s-class). |∪| is derived
  * (|a|+|b|−|∩|), sizes are computed AT THE SCAN
  * (`size(array_distinct(tokens))` before the explode — no sizes
  * join), and the integer filter `inter·10⁶ ≥ t_e6·union` is
  * EXACTLY the real-valued J ≥ 0.8 test.
  *
  * When the probe side is NOT audit-sized (self-join set-sim), the
  * right shape is prefix filtering instead (Chaudhuri–Ganti–Kaushik
  * ICDE'06; Bayardo–Ma–Srikant WWW'07; distributed:
  * Vernica–Carey–Li SIGMOD'10): under a global rarity order, two
  * sets with J ≥ t must share a token among their first
  * |x| − ceil(t·|x|) + 1 tokens, so candidates come from an
  * equi-join on short prefix postings. The DuckDB oracle below
  * deliberately implements THAT algorithm — the correctness gate
  * therefore cross-checks two independent exact formulations
  * (broadcast-index count vs prefix-filter + verify) against each
  * other, a strictly stronger check than mirrored algebra.
  *
  * 100 TB posture: corpus side is one scan + one map-side hash
  * probe + one pair-keyed exchange bounded by output candidacy;
  * nothing is quadratic in corpus size (the Σ df·p expansion rows
  * exist only inside whole-stage codegen between the broadcast
  * probe and the partial aggregate — never materialized, never
  * shuffled). Probe side scales with the audit set, not the corpus.
  */
object SetSim {

  /** Jaccard threshold ×10⁶ (0.8). The prefix/size-filter algebra
    * below hard-codes the same 4/5 ratio so both engines share one
    * integer formulation. */
  val JaccardThresholdE6 = 800000L

  /** Probe-set modulus (the q129 audit-subset convention). */
  val ProbeMod = 97L

  def q134SetSimSearch(s: SparkSession, dir: String): DataFrame = {
    // set size at the scan — no per-doc aggregation join later
    val sets = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"),
        array_distinct(TextAnalysis.tokens(col("text"))).as("arr"))
      .select(col("doc_id"),
        size(col("arr")).cast("long").as("sz"),
        explode(col("arr")).as("tok"))
      // two consumers (probe index + corpus side) — one scan, reused
      .localCheckpoint(true)
    val probes = sets.filter(col("doc_id") % ProbeMod === 0)
      .select(col("tok"), col("doc_id").as("probe_id"),
        col("sz").as("szp"))
    // ONE broadcast hash join; size filter (J ≥ 0.8 ⇒ 5·min ≥ 4·max)
    // inside the join output, before the only exchange in the query
    val inter = sets.join(broadcast(probes), Seq("tok"))
      .filter(col("probe_id") =!= col("doc_id") &&
        lit(5) * least(col("szp"), col("sz")) >=
          lit(4) * greatest(col("szp"), col("sz")))
      // the COUNT over shared tokens IS |∩|; szp/szc are
      // functionally determined by the pair, carried through the agg
      .groupBy(col("probe_id"), col("doc_id"),
        col("szp"), col("sz").as("szc"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("union_sz", col("szp") + col("szc") - col("inter"))
      .filter(col("inter") * lit(1000000L) >=
        lit(JaccardThresholdE6) * col("union_sz"))
      .select(col("probe_id"), col("doc_id"), col("inter"),
        col("union_sz"),
        expr("inter * 1000000 div union_sz").as("jaccard_e6"))
      .orderBy(col("probe_id"), col("doc_id"))
  }

  val q134SetSimSearchOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct($tokensSql)) AS tok
       |  FROM documents),
       |sizes AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
       |  FROM tok GROUP BY doc_id),
       |dfreq AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS df
       |  FROM tok GROUP BY tok),
       |ranked AS (
       |  SELECT t.doc_id, t.tok, s.sz,
       |    row_number() OVER (PARTITION BY t.doc_id
       |                       ORDER BY d.df, t.tok) AS rn
       |  FROM tok t JOIN dfreq d USING (tok) JOIN sizes s USING (doc_id)),
       |pref AS (
       |  SELECT doc_id, tok, sz FROM ranked
       |  WHERE rn <= sz - ((4 * sz + 4) // 5) + 1),
       |cand AS (
       |  SELECT DISTINCT p.doc_id AS probe_id, c.doc_id AS doc_id,
       |    p.sz AS szp, c.sz AS szc
       |  FROM pref p JOIN pref c ON p.tok = c.tok
       |    AND p.doc_id != c.doc_id
       |  WHERE p.doc_id % $ProbeMod = 0
       |    AND 5 * least(p.sz, c.sz) >= 4 * greatest(p.sz, c.sz)),
       |inter AS (
       |  SELECT c.probe_id AS pa, c.doc_id AS pb,
       |    CAST(count(*) AS BIGINT) AS inter
       |  FROM cand c
       |  JOIN tok ta ON ta.doc_id = c.probe_id
       |  JOIN tok tb ON tb.doc_id = c.doc_id AND tb.tok = ta.tok
       |  GROUP BY c.probe_id, c.doc_id)
       |SELECT c.probe_id, c.doc_id, i.inter,
       |  CAST(c.szp + c.szc - i.inter AS BIGINT) AS union_sz,
       |  CAST(i.inter * 1000000 // (c.szp + c.szc - i.inter)
       |    AS BIGINT) AS jaccard_e6
       |FROM cand c JOIN inter i
       |  ON i.pa = c.probe_id AND i.pb = c.doc_id
       |WHERE i.inter * 1000000 >= $JaccardThresholdE6
       |  * (c.szp + c.szc - i.inter)
       |ORDER BY probe_id, doc_id""".stripMargin
}
