package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The LAST step of the training-data pipeline: a deterministic
  * global shuffle of the curated corpus into size-bounded training
  * shards, plus the conservation-gated manifest a dataloader
  * consumes. The rest of the house stops one step short of the
  * training run — q84 SELECTS the corpus, q66 PACKS sequences, q92
  * BALANCES clusters — but nothing emitted the randomized shard
  * layout whose manifest a trainer can trust without re-reading the
  * corpus. q171/q172 are that operator.
  *
  * Why a shuffle at all: documents arrive in crawl/source order, and
  * a training run that reads them that way sees highly correlated
  * batches (one domain for an hour). The standard cure is a
  * DETERMINISTIC permutation — order by a cryptographic hash of the
  * doc id — which is (a) reproducible run-to-run (the training-data
  * provenance requirement), (b) independent of the input's physical
  * order, and (c) free of coordination: any worker can recompute any
  * shard's membership from the ids alone.
  *
  * Layout (q171): survivors of the q84 stage-1 election
  * ([[Pipeline3.curationSurvivors]] — the SAME election, factored,
  * so "what the trainer reads" ≡ "what curation kept") are keyed by
  * `md5('shard:' || doc_id)`, land in [[PackGrains]] hash GRAINS
  * (first two hex digits of the key mod grains), and pack greedily in
  * key order within their grain into [[ShardTokens]]-token shards
  * (the q66 running-cumsum machinery: a doc whose preceding-token
  * count has consumed `seq` full budgets opens or continues shard
  * `seq`; docs may straddle the budget boundary — standard overflow
  * packing, so every shard holds ≥1 doc and ≤ budget + max-doc
  * tokens). Output: one row per document,
  * (shard_id, position, doc_id, lang, n_tokens, token_offset) —
  * position is the doc's 0-based rank inside its shard and
  * token_offset its first token's offset in the shard's concatenated
  * token stream, exactly what a sequence-packing dataloader seeks to.
  *
  * PROVENANCE CONTRACT — which knobs define the layout and which
  * merely label it: ([[PackGrains]], [[ShardTokens]]) are
  * layout-DEFINING — change either and shard membership changes (a
  * different, equally valid deterministic permutation; a training
  * run pins both for reproducibility). [[ShardBuckets]] is a pure
  * RELABEL: the canonical shard key is (grain, seq), and the bucket
  * count only folds grains into coarser shard-id families —
  * `shard_id = (g % B)·2³² + (g div B)·2²⁴ + seq` is a bijection of
  * (g, seq) for ANY B, so member sets and positions are invariant
  * under a bucket-count change (ShardsSpec gates exactly this,
  * including conservation at a non-default count). A deployment may
  * therefore set ShardBuckets freely per BATCH run (q171 recomputes
  * the layout from scratch, so only the labels change), while
  * grains/tokens are corpus-pinned parameters. A STREAMING output
  * dir is narrower: [[graft.streaming.ShardIngest]] recovery decodes
  * (grain, seq) from the STORED shard_ids under the current knobs,
  * so the ingest twins persist a `_shard_knobs` sidecar and refuse
  * to restart under different values — all three knobs are pinned
  * for that dir's lifetime (round-13 advisor finding).
  *
  * Manifest (q172): one row per shard — (shard_id, n_docs, n_tokens,
  * first_doc, last_doc, members_md5, corpus_docs, corpus_tokens).
  * `members_md5` fingerprints the member ids IN POSITION ORDER, so a
  * reader can audit a downloaded shard against the manifest without
  * the corpus. `corpus_docs`/`corpus_tokens` repeat the layout-side
  * totals on every row; the DuckDB oracle recomputes them FROM THE
  * SURVIVOR SET — the hash gate therefore IS the conservation proof
  * (Σ shard docs ≡ survivors, no doc dropped or duplicated; a
  * layout bug cannot pass both engines).
  *
  * 100 TB posture: the permutation is embarrassingly parallel (a
  * map-side hash), the pack is the q66 two-level shape — the GLOBAL
  * per-corpus cumsum that a naive "order all docs by key" plan needs
  * is the q63 single-partition anti-pattern; graining first makes
  * the cumsum per-grain, and [[PackGrains]] is the parallelism knob
  * (16 here for test-corpus multi-shard grains; a cluster corpus
  * pins O(executors) — e.g. 4 hex digits = 65536 grains — a
  * parameter, not a shape change). Two window stages run on refining
  * keys (grain, then grain+seq) over DOC-GRAIN rows (ids and counts
  * only — no text rides any shuffle), and the manifest is one hash
  * aggregate whose collect_list is bounded by the shard budget (≥1
  * token per doc ⇒ ≤ [[ShardTokens]] + max-doc members). Totals join
  * back as a 1-row broadcast, never an unpartitioned window. */
object Shards {

  /** Layout-defining pack grain count (see the provenance contract
    * above): per-grain cumsums replace the global sort, so this is
    * also the pack's parallelism. Env-overridable for a deployment
    * (`GRAFT_SHARD_GRAINS`); ≤ 256 (the two-hex-digit key space). */
  val PackGrains: Long =
    sys.env.get("GRAFT_SHARD_GRAINS").map(_.toLong).getOrElse(16L)
  /** Layout-defining token budget per shard (tiny here for
    * test-corpus shard counts; a real run uses O(10⁸) — a parameter,
    * not a shape change). Env-overridable (`GRAFT_SHARD_TOKENS`). */
  val ShardTokens: Long =
    sys.env.get("GRAFT_SHARD_TOKENS").map(_.toLong).getOrElse(1024L)
  /** Pure-relabel shard-id family count (see the provenance
    * contract): folds grains into ShardBuckets id families without
    * touching membership. Env-overridable (`GRAFT_SHARD_BUCKETS`). */
  val ShardBuckets: Long =
    sys.env.get("GRAFT_SHARD_BUCKETS").map(_.toLong).getOrElse(8L)

  /** shard_id = bucket·2³² + (grain div buckets)·2²⁴ + seq:
    * collision-free while grains ≤ 256 (sub-label < 256 ⇒ the middle
    * field < 2³²) and every grain packs < 2²⁴ shards — at the
    * production 10⁸-token budget that is 1.6·10¹⁵ tokens per grain
    * before overflow. */
  val ShardIdBase = 4294967296L
  val ShardSubBase = 16777216L

  /** Canonical (grain, seq) of a shard id labeled under `buckets` —
    * the inverse of the relabel bijection (specs + state recovery). */
  def grainSeqOf(shardId: Long, buckets: Long): (Long, Long) = {
    val bucket = shardId / ShardIdBase
    val rem = shardId % ShardIdBase
    (rem / ShardSubBase * buckets + bucket, rem % ShardSubBase)
  }

  /** The doc-grain layout over an arbitrary survivor table
    * (doc_id, lang, n_tokens): (grain, seq, shard_id, position,
    * token_offset) under the deterministic md5-key permutation.
    * Parameterized so specs can gate the relabel-invariance and
    * conservation claims at non-default knob values. */
  private[graft] def layoutOf(survivors: DataFrame, grains: Long,
      tokens: Long, buckets: Long): DataFrame = {
    val keyed = survivors
      .withColumn("k",
        md5(concat(lit("shard:"), col("doc_id").cast("string"))))
      .withColumn("grain",
        expr(s"CAST(conv(substring(k, 1, 2), 16, 10) AS BIGINT)" +
          s" % $grains"))
    val wCum = Window.partitionBy(col("grain"))
      .orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = keyed
      .withColumn("start",
        sum(col("n_tokens")).over(wCum) - col("n_tokens"))
      .withColumn("seq", expr(s"start div $tokens"))
    val wOrd = Window.partitionBy(col("grain"), col("seq"))
      .orderBy(col("k"), col("doc_id"))
    val wShard = Window.partitionBy(col("grain"), col("seq"))
    packed
      .withColumn("position",
        (row_number().over(wOrd) - 1).cast("long"))
      .withColumn("token_offset",
        col("start") - min(col("start")).over(wShard))
      .withColumn("shard_id",
        col("grain") % buckets * lit(ShardIdBase)
          + expr(s"grain div $buckets") * lit(ShardSubBase)
          + col("seq"))
  }

  /** The shared corpus layout under the session knobs. */
  private def layout(s: SparkSession, dir: String): DataFrame =
    layoutOf(Pipeline3.curationSurvivors(s, dir, withToks = false),
      PackGrains, ShardTokens, ShardBuckets)

  /** q171: the per-document shard assignment (see object scaladoc). */
  def q171ShardLayout(s: SparkSession, dir: String): DataFrame =
    layout(s, dir)
      .select(col("shard_id"), col("position"), col("doc_id"),
        col("lang"), col("n_tokens"), col("token_offset"))
      .orderBy(col("shard_id"), col("position"))

  /** q172: the per-shard manifest with conservation columns (see
    * object scaladoc). */
  def q172ShardManifest(s: SparkSession, dir: String): DataFrame = {
    val l = layout(s, dir)
    val totals = l.agg(count(lit(1)).as("corpus_docs"),
      sum(col("n_tokens")).as("corpus_tokens"))
    l.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(when(col("position") === 0, col("doc_id"))).as("first_doc"),
        max_by(col("doc_id"), col("position")).as("last_doc"),
        md5(concat_ws(",", transform(
          sort_array(collect_list(struct(col("position"), col("doc_id")))),
          e => e.getField("doc_id").cast("string")))).as("members_md5"))
      .crossJoin(broadcast(totals))
      .orderBy(col("shard_id"))
  }

  /** The keyed/packed/fin CTE chain shared by both oracles; `fin`
    * is the q171 row shape. */
  private val layoutSql: String = {
    // first two hex digits of k decoded exactly like Spark's conv
    val hex2 = Sketch.hexSql("k", 2)
    s"""keyed AS (
       |  SELECT doc_id, lang, n_tokens,
       |    md5('shard:' || CAST(doc_id AS VARCHAR)) AS k
       |  FROM surv),
       |bkt AS (
       |  SELECT *, ($hex2) % $PackGrains AS grain FROM keyed),
       |packed AS (
       |  SELECT *,
       |    CAST(sum(n_tokens) OVER (PARTITION BY grain
       |        ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING)
       |      - n_tokens AS BIGINT) AS start
       |  FROM bkt),
       |sq AS (
       |  SELECT *, CAST(start // $ShardTokens AS BIGINT) AS seq
       |  FROM packed),
       |fin AS (
       |  SELECT (grain % $ShardBuckets) * $ShardIdBase
       |      + (grain // $ShardBuckets) * $ShardSubBase + seq
       |      AS shard_id,
       |    CAST(row_number() OVER (PARTITION BY grain, seq
       |      ORDER BY k, doc_id) - 1 AS BIGINT) AS position,
       |    doc_id, lang, n_tokens,
       |    start - min(start) OVER (PARTITION BY grain, seq)
       |      AS token_offset
       |  FROM sq)""".stripMargin
  }

  val q171ShardLayoutOracle: String =
    s"""WITH ${Pipeline3.curationSurvSql},
       |$layoutSql
       |SELECT shard_id, position, doc_id, lang, n_tokens, token_offset
       |FROM fin ORDER BY shard_id, position""".stripMargin

  /** Conservation columns come from `surv` DIRECTLY (not from the
    * layout) — the cross-engine hash gate is only a conservation
    * proof if the two sides derive the totals independently. */
  val q172ShardManifestOracle: String =
    s"""WITH ${Pipeline3.curationSurvSql},
       |$layoutSql,
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS corpus_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens
       |  FROM surv)
       |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min(CASE WHEN position = 0 THEN doc_id END) AS first_doc,
       |  max_by(doc_id, position) AS last_doc,
       |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY position))
       |    AS members_md5,
       |  corpus_docs, corpus_tokens
       |FROM fin, tot
       |GROUP BY shard_id, corpus_docs, corpus_tokens
       |ORDER BY shard_id""".stripMargin
}
