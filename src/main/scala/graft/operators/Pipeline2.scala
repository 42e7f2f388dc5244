package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextStatFunctions
import graft.operators.TextAnalysis.tokensSql

/** Second block of training-data pipeline operators: repetition
  * filters, per-domain capping, k-NN label voting, co-occurrence
  * statistics, and corpus length profiling.
  *
  * Like `Pipeline`, everything is integer/md5-deterministic so the
  * DuckDB oracle hash-matches, and every per-row text pass is a
  * codegen'd kernel, not an interpreted HOF.
  */
object Pipeline2 {

  /** q52: Gopher-style repetition signals — the share of a doc owned
    * by its most frequent token / most frequent bigram, and the share
    * of duplicated trigrams. All five counts come from ONE single-pass
    * kernel ([[graft.functions.RepetitionStats]]); map-only + final
    * sort, scales linearly with input splits. Short-doc guards use
    * `greatest(_, 1)` so both engines divide identically. */
  def q52Repetition(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"),
        TextStatFunctions.repetitionStats(col("text")).as("st"))
      .select(col("doc_id"),
        col("st").getItem(0).as("n_tokens"),
        col("st").getItem(1).as("top_token_cnt"),
        col("st").getItem(2).as("top_bigram_cnt"),
        (col("st").getItem(3) - col("st").getItem(4)).as("n_dup_trigrams"),
        col("st").getItem(3).as("n_trigrams"))
      .withColumn("top_token_pct",
        expr("top_token_cnt * 100 div n_tokens"))
      .withColumn("top_bigram_pct",
        expr("top_bigram_cnt * 100 div greatest(n_tokens - 1, 1)"))
      .withColumn("dup_trigram_pct",
        expr("n_dup_trigrams * 100 div greatest(n_trigrams, 1)"))
      .select(col("doc_id"), col("n_tokens"), col("top_token_cnt"),
        col("top_token_pct"), col("top_bigram_pct"),
        col("dup_trigram_pct"))
      .orderBy(col("doc_id"))

  val q52RepetitionOracle: String =
    s"""WITH base AS (
       |  SELECT doc_id, $tokensSql AS toks FROM documents),
       |topu AS (
       |  SELECT doc_id, max(c) AS top_token_cnt FROM (
       |    SELECT doc_id, g, count(*) AS c
       |    FROM (SELECT doc_id, unnest(toks) AS g FROM base)
       |    GROUP BY doc_id, g)
       |  GROUP BY doc_id),
       |topb AS (
       |  SELECT doc_id, max(c) AS top_bigram_cnt FROM (
       |    SELECT doc_id, g, count(*) AS c
       |    FROM (SELECT doc_id,
       |            unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
       |              i -> toks[i] || ' ' || toks[i + 1])) AS g
       |          FROM base)
       |    GROUP BY doc_id, g)
       |  GROUP BY doc_id),
       |tri AS (
       |  SELECT doc_id,
       |    list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
       |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS tg
       |  FROM base)
       |SELECT b.doc_id,
       |  CAST(len(b.toks) AS BIGINT) AS n_tokens,
       |  CAST(topu.top_token_cnt AS BIGINT) AS top_token_cnt,
       |  CAST(topu.top_token_cnt * 100 // len(b.toks) AS BIGINT)
       |    AS top_token_pct,
       |  CAST(coalesce(topb.top_bigram_cnt, 0) * 100
       |    // greatest(len(b.toks) - 1, 1) AS BIGINT) AS top_bigram_pct,
       |  CAST((len(tri.tg) - len(list_distinct(tri.tg))) * 100
       |    // greatest(len(tri.tg), 1) AS BIGINT) AS dup_trigram_pct
       |FROM base b
       |JOIN topu USING (doc_id)
       |LEFT JOIN topb USING (doc_id)
       |JOIN tri USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  val DomainCap = 15

  /** q53: per-domain (source) capping — keep at most [[DomainCap]]
    * docs per source, chosen by a deterministic content-hash priority
    * (md5 of the doc id), the standard move to stop one domain from
    * dominating a training mix. One hash-shuffle on source; the
    * rank ≤ k filter compiles to WindowGroupLimit (per-partition
    * top-k heaps, no full per-source sort), which is exactly the
    * 100 TB shape — a skewed source never materializes beyond k rows
    * per map task. */
  def q53DomainCap(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        md5(concat(lit("cap:"), col("doc_id"))).as("pri"))
      .withColumn("rk", row_number()
        .over(Window.partitionBy(col("source"))
          .orderBy(col("pri").asc, col("doc_id").asc)).cast("long"))
      .filter(col("rk") <= DomainCap)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy(col("source"), col("rk"))

  val q53DomainCapOracle: String =
    s"""SELECT doc_id, source, rk FROM (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY md5('cap:' || doc_id), doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= $DomainCap
       |ORDER BY source, rk""".stripMargin

  val KnnK = 10

  /** q54: k-NN label voting — classify held-out query vectors by the
    * majority label of their [[KnnK]] nearest neighbors (integer dot
    * product, exact). The query side is a BOUNDED eval panel
    * (vec_id % 100 = 7 AND vec_id < 10000, ≤ 100 probes at any corpus
    * size) and broadcast; the corpus is scanned once — the same
    * map-side-join shape as ann_brute, plus two small shuffles for
    * the per-query rank and the vote count. The bound matters: an
    * unbounded `% 100` panel grows WITH the corpus, which made the
    * scored side O(n²/100) — the sf10 gate measured it 17× sf1 before
    * the panel was pinned (an eval set is fixed-size by nature; a
    * grow-with-corpus probe set is a different op). Ties: higher dot
    * wins, then lower vec_id; vote ties go to the smaller label. */
  def q54KnnClassify(s: SparkSession, dir: String): DataFrame = {
    import Similarity.{idot, ivec}
    val iv = Tables.spread(Tables.load(s, dir, "embeddings"))
      .select(col("vec_id"), col("label"), ivec(col("embedding")).as("v"))
    val q = iv.filter(col("vec_id") % 100 === 7 && col("vec_id") < 10000)
      .select(col("vec_id").as("q_id"), col("label").as("true_label"),
        col("v").as("qv"))
    val c = iv.filter(col("vec_id") % 100 =!= 7)
    val scored = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("true_label"), col("vec_id"), col("label"),
        idot(col("qv"), col("v")).as("dot"))
    val ranked = scored.withColumn("rk", row_number()
      .over(Window.partitionBy(col("q_id"))
        .orderBy(col("dot").desc, col("vec_id").asc)))
      .filter(col("rk") <= KnnK)
    ranked.groupBy(col("q_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("wr", row_number()
        .over(Window.partitionBy(col("q_id"))
          .orderBy(col("n_votes").desc, col("label").asc)))
      .filter(col("wr") === 1)
      .select(col("q_id"), col("true_label"),
        col("label").as("pred_label"), col("n_votes"),
        (col("label") === col("true_label")).cast("int").as("correct"))
      .orderBy(col("q_id"))
  }

  val q54KnnClassifyOracle: String =
    s"""WITH iv AS (
       |  SELECT vec_id, label, ${Similarity.ivecSql} AS v FROM embeddings),
       |q AS (
       |  SELECT vec_id AS q_id, label AS true_label, v AS qv
       |  FROM iv WHERE vec_id % 100 = 7 AND vec_id < 10000),
       |c AS (SELECT * FROM iv WHERE vec_id % 100 <> 7),
       |scored AS (
       |  SELECT q_id, true_label, c.vec_id, c.label,
       |    CAST(list_sum(list_transform(range(1, len(qv) + 1),
       |      i -> qv[i] * c.v[i])) AS BIGINT) AS dot
       |  FROM q CROSS JOIN c),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY dot DESC, vec_id) AS rk FROM scored),
       |votes AS (
       |  SELECT q_id, true_label, label, count(*) AS n_votes
       |  FROM ranked WHERE rk <= $KnnK GROUP BY 1, 2, 3),
       |win AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY n_votes DESC, label) AS wr FROM votes)
       |SELECT q_id, true_label, label AS pred_label, n_votes,
       |  CAST(label = true_label AS INT) AS correct
       |FROM win WHERE wr = 1 ORDER BY q_id""".stripMargin

  val PmiMinSupport = 5
  val PmiTopK = 50

  /** q55: corpus bigram co-occurrence — top-[[PmiTopK]] consecutive
    * word pairs by a scaled PMI lift `cnt_ab * total_tokens * 1000 /
    * (cnt_a * cnt_b)` (ranking-equivalent to PMI up to the constant
    * total_bigrams/total_tokens factor). The lift runs in
    * DECIMAL(38,0) with truncating integral division (HUGEINT `//` on
    * the oracle side), so both numerator and denominator are
    * wrap-immune to ~10^17 corpus tokens while the emitted quotient
    * stays a bigint (it is bounded by 1000·total_tokens). Shuffles
    * are vocabulary-sized (token/bigram counts), never corpus-sized;
    * the totals ride a 1-row broadcast and the top-k is a
    * TakeOrderedAndProject, not a full sort. */
  def q55CooccurPmi(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.load(s, dir, "documents"))
    val uni = docs
      .select(explode(TextStatFunctions.tokenNgrams(col("text"), 1)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
    val totalUni = uni.agg(sum(col("cnt")).as("total_uni"))
    val bi = docs
      .select(explode(TextStatFunctions.tokenNgrams(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("cnt_ab"))
      .filter(col("cnt_ab") >= PmiMinSupport)
    bi
      .withColumn("tok_a", split(col("bigram"), " ").getItem(0))
      .withColumn("tok_b", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("g").as("tok_a"), col("cnt").as("cnt_a")), "tok_a")
      .join(uni.select(col("g").as("tok_b"), col("cnt").as("cnt_b")), "tok_b")
      .crossJoin(broadcast(totalUni))
      .withColumn("pmi_scaled",
        expr("CAST(cnt_ab AS DECIMAL(38,0)) * total_uni * 1000 div " +
          "(CAST(cnt_a AS DECIMAL(38,0)) * cnt_b)"))
      .select(col("bigram"), col("cnt_ab"), col("cnt_a"), col("cnt_b"),
        col("pmi_scaled"))
      .orderBy(col("pmi_scaled").desc, col("bigram").asc)
      .limit(PmiTopK)
  }

  val q55CooccurPmiOracle: String =
    s"""WITH toks AS (
       |  SELECT $tokensSql AS t FROM documents),
       |uni AS (
       |  SELECT g, count(*) AS cnt
       |  FROM (SELECT unnest(t) AS g FROM toks) GROUP BY g),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_uni FROM uni),
       |bi AS (
       |  SELECT bigram, count(*) AS cnt_ab FROM (
       |    SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
       |      i -> t[i] || ' ' || t[i + 1])) AS bigram FROM toks)
       |  GROUP BY bigram HAVING count(*) >= $PmiMinSupport)
       |SELECT bigram, CAST(cnt_ab AS BIGINT) AS cnt_ab,
       |  CAST(ua.cnt AS BIGINT) AS cnt_a, CAST(ub.cnt AS BIGINT) AS cnt_b,
       |  CAST(CAST(cnt_ab AS HUGEINT) * total_uni * 1000
       |    // (CAST(ua.cnt AS HUGEINT) * ub.cnt) AS BIGINT) AS pmi_scaled
       |FROM bi
       |JOIN uni ua ON ua.g = string_split(bigram, ' ')[1]
       |JOIN uni ub ON ub.g = string_split(bigram, ' ')[2]
       |CROSS JOIN tot
       |ORDER BY pmi_scaled DESC, bigram ASC
       |LIMIT $PmiTopK""".stripMargin

  /** q57: incremental materialized-view maintenance — refresh a daily
    * per-type aggregate from a stored base aggregate plus a delta of
    * new arrivals, WITHOUT rescanning base rows. The merge works
    * because the aggregates are algebraic (count/sum merge by sum,
    * min/max by min/max); the base partial is pinned behind a
    * localCheckpoint to model the stored view. Refresh cost is
    * O(delta + |view|) — the nightly-MV pattern at warehouse scale.
    * countDistinct is deliberately absent: it is NOT mergeable from
    * partials (that is what q22's HLL sketches are for). The oracle is
    * the full recompute over all events — the merged view must be
    * bit-identical to it. */
  def q57IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    import Relational.cents
    val ev = Tables.load(s, dir, "events")
      .select((expr("ts div 86400000000000") * 86400L).as("day"),
        col("event_type"), col("event_id"), cents(col("value")).as("vc"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("vc")).as("cents"),
          min(col("vc")).as("vmin"), max(col("vc")).as("vmax"))
    // the "stored" view: everything but the newest modular slice
    val baseAgg = partial(ev.filter(col("event_id") % 10 =!= 9))
      .localCheckpoint(false)
    val deltaAgg = partial(ev.filter(col("event_id") % 10 === 9))
    baseAgg.unionByName(deltaAgg)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("cnt")).as("n_events"),
        sum(col("cents")).as("value_cents"),
        min(col("vmin")).as("min_cents"),
        max(col("vmax")).as("max_cents"))
      .orderBy(col("day"), col("event_type"))
  }

  val q57IncrementalAggOracle: String =
    """SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
      |  event_type, count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |    AS value_cents,
      |  CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |    AS min_cents,
      |  CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |    AS max_cents
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val PrRounds = 3

  /** q61: PageRank over the simhash near-dup graph —
    * [[PrRounds]] synchronous rounds of integer-scaled rank flow
    * (`r' = 150 + 0.85·Σ contrib`, everything ×1000 in bigints with
    * truncating division, so both engines agree bit-for-bit). Star
    * edges (group-min ↔ member) keep the edge set O(group); each
    * round is one edge-keyed join + one vertex-keyed agg — the
    * hash-partitioned weighted-propagation shape (q38/q45's CC loop
    * with per-edge arithmetic), no driver state. Fixed rounds keep it
    * oracle-checkable; a production run iterates with per-round
    * checkpoints like q45. */
  def q61Pagerank(s: SparkSession, dir: String): DataFrame = {
    val (ids, edges) = prGraph(s, dir) // shared with q65 — one construction
    var r = ids.withColumn("r", lit(1000L))
    for (_ <- 1 to PrRounds) {
      val contrib = edges
        .join(r.withColumnRenamed("doc_id", "src"),
          edges("u") === col("src"))
        .select(col("v"), expr("r div d").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("s"))
      r = ids.join(contrib, ids("doc_id") === contrib("v"), "left")
        .select(ids("doc_id"),
          expr("150 + (850 * coalesce(s, CAST(0 AS BIGINT))) div 1000")
            .as("r"))
    }
    val deg = edges.select(col("u"), col("d")).distinct()
    r.join(deg, r("doc_id") === deg("u"), "left")
      .select(r("doc_id"), col("r").as("rank_x1000"),
        coalesce(col("d"), lit(0L)).as("deg"))
      .orderBy(col("doc_id"))
  }

  val q61PagerankOracle: String = {
    def round(prev: String, cur: String) =
      s"""$cur AS (
         |  SELECT b.doc_id,
         |    CAST(150 + (850 * coalesce(t.s, 0)) // 1000 AS BIGINT) AS r
         |  FROM documents b LEFT JOIN (
         |    SELECT v, sum(r // d) AS s
         |    FROM ed JOIN $prev p ON p.doc_id = ed.u GROUP BY v) t
         |  ON t.v = b.doc_id)"""
    val rounds = (1 to PrRounds)
      .map(k => round(s"r${k - 1}", s"r$k")).mkString(",\n")
    val sh = Dedup.simhashSql("toks")
    s"""WITH base AS (
       |  SELECT doc_id, CAST($sh AS BIGINT) AS sh
       |  FROM (SELECT doc_id, $tokensSql AS toks FROM documents)),
       |star AS (
       |  SELECT doc_id AS v, min(doc_id) OVER (PARTITION BY sh) AS u
       |  FROM base),
       |e AS (SELECT u, v FROM star WHERE u <> v),
       |bidir AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
       |deg AS (SELECT u, count(*) AS d FROM bidir GROUP BY u),
       |ed AS (SELECT bidir.u, v, d FROM bidir JOIN deg USING (u)),
       |r0 AS (SELECT doc_id, CAST(1000 AS BIGINT) AS r FROM documents),
       |$rounds
       |SELECT b.doc_id AS doc_id, r$PrRounds.r AS rank_x1000,
       |  CAST(coalesce(deg.d, 0) AS BIGINT) AS deg
       |FROM documents b
       |JOIN r$PrRounds ON r$PrRounds.doc_id = b.doc_id
       |LEFT JOIN deg ON deg.u = b.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }

  /** Pinned round count for the q65 oracle — the engine ASSERTS its
    * fixpoint landed within this bound (the q45 pattern), so a corpus
    * whose rank flow converges slower fails loudly instead of
    * hash-mismatching. The tail is the dangling-mass term (most docs
    * are isolated): its per-round contraction is ≈ 0.85 × dangling
    * share, so the ×1000 integer quantum is reached in ~45 rounds on
    * the test corpora (measured 46 at sf0.01); 64 leaves margin. */
  val PrOracleRounds = 64

  /** The q61/q65 shared graph: simhash star edges over `documents`,
    * bidirectional, with out-degrees. Returns (ids, bidir edges with
    * degree) — both behind barriers since every rank round rereads
    * them. */
  private[operators] def prGraph(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"),
        graft.functions.TextFunctions
          .simhash16(TextAnalysis.tokens(col("text"))).as("sh"))
      .repartition(col("doc_id"))
      .localCheckpoint(false)
    val star = base
      .withColumn("u", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
      .filter(col("u") =!= col("doc_id"))
      .select(col("u"), col("doc_id").as("v"))
    val bidir = star.union(star.select(col("v").as("u"), col("u").as("v")))
    val deg = bidir.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val edges = bidir.join(deg, "u")
      .repartition(col("u"))
      .localCheckpoint(false)
    (base.select(col("doc_id")), edges)
  }

  /** Epsilon-free EXACT-fixpoint PageRank with dangling-mass
    * redistribution — the production path q61's fixed 3 rounds
    * approximate (the q45 treatment applied to rank flow).
    *
    * The recurrence (everything ×1000 in bigints, truncating div):
    *   r'(v) = 150 + 850·(Σ_{u→v} r(u) div d(u)  +  dm div N) div 1000
    * where dm = Σ r over DANGLING nodes (no out-edges — in this graph,
    * docs with no near-dup edge, i.e. most of the corpus) and N is the
    * doc count: dangling mass is redistributed uniformly instead of
    * leaking, the standard PageRank correction q61 omits.
    *
    * Termination is EXACT, not epsilon: seeded at the teleport floor
    * (r₀ = 150, not 1000) the map is monotone non-decreasing — every
    * operand (div by a constant, sums, the dangling term) is monotone
    * in r and F(r₀) ≥ r₀, so by induction r_{k+1} ≥ r_k pointwise,
    * bounded above by total mass ⇒ an exact integer fixpoint in
    * finitely many rounds, after which extra rounds are no-ops. That
    * makes "Σr unchanged ⟺ no component changed" (all deltas ≥ 0) the
    * same one-scalar-per-round convergence probe as
    * [[Pipeline.fixpointLabels]], and lets a pinned-round oracle
    * overshoot harmlessly. The Σ runs in DECIMAL(38,0) (wrap-immune);
    * per-node ranks stay BIGINT — bounded by total mass ≈ 1000·N,
    * exact to ~10¹⁵ docs. The dangling sum rides the dataflow as a
    * broadcast 1-row frame (dangling is a static per-doc flag), so the
    * driver only probes every [[Pipeline.FixpointProbeEvery]] rounds:
    * each probe group costs k edge joins + k vertex aggs + ONE eager
    * localCheckpoint + ONE O(1)-row driver read — the q45 iterative
    * shape with k× less per-round fixed overhead.
    *
    * `oracleRoundBound` asserts the fixpoint was reached within the
    * pinned oracle's round budget ([[PrOracleRounds]]), failing loudly
    * if the corpus outgrows it. */
  private[operators] def pagerankFixpoint(ids: DataFrame, edges: DataFrame,
      n: Long, maxRounds: Int = 100,
      oracleRoundBound: Option[Int] = None,
      probeEvery: Int = Pipeline.FixpointProbeEvery): DataFrame = {
    // Isolated nodes (no in- OR out-edges) receive no edge
    // contribution and are all dangling, so every round gives them
    // the SAME rank r_z = 150 + 850·(dm div N) div 1000 — one driver
    // scalar, not |corpus| rows. The per-round join/agg therefore runs
    // over the ACTIVE subgraph only (edge endpoints): in the near-dup
    // graph that is the docs inside simhash groups, a small fraction
    // of the corpus — each round costs O(near-dup subgraph), not
    // O(corpus) (measured 13.3 s → sub-second at sf1, and the gap
    // widens with corpus size since |active| grows with DUPS, not
    // docs). Exactness is unchanged: the recurrence below is applied
    // verbatim to both classes, Pipeline2Spec pins a graph with both,
    // and the round count (hence the oracle bound) is identical.
    val endpoints = edges.select(col("u").as("doc_id"))
      .union(edges.select(col("v").as("doc_id"))).distinct()
    val dang = ids
      .join(edges.select(col("u").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(true).as("dang"))
    val active = ids.join(endpoints, Seq("doc_id"), "left_semi")
      .join(dang, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("dang"), lit(false)).as("dang"))
      .localCheckpoint(true) // reused every round
    val zCount = n - active.count()
    val bd = (x: Long) => java.math.BigDecimal.valueOf(x)
    var rz = 150L
    var r = active.withColumn("r", lit(150L)).localCheckpoint(true)
    val row0 = r.agg(
      sum(col("r").cast("decimal(38,0)")),
      sum(when(col("dang"), col("r")).otherwise(lit(0L)))).head
    val ta0 = Option(row0.get(0)).map(_.asInstanceOf[java.math.BigDecimal])
      .getOrElse(java.math.BigDecimal.ZERO)
    val dmA0 = if (row0.isNullAt(1)) 0L else row0.getLong(1)
    var tot0 = ta0.add(bd(zCount).multiply(bd(rz)))
    var dm = dmA0 + zCount * rz
    var executed = 0
    var fixRound = if (n == 0) 0 else -1
    var converged = n == 0
    if (!converged && zCount == n) {
      // No active subgraph at all: every node is isolated and the
      // recurrence collapses to the scalar rz iteration — pure driver
      // arithmetic, no Spark jobs.
      while (!converged && executed < maxRounds) {
        val rz1 = 150L + (850L * (dm / n)) / 1000L
        val dm1 = n * rz1
        executed += 1
        if (rz1 == rz && dm1 == dm) { converged = true; fixRound = executed - 1 }
        rz = rz1; dm = dm1
      }
    }
    // dm splits into a driver-fresh and a cluster-stale part:
    //   dm = dmA (dangling ACTIVE nodes)  +  zCount·rz (isolated tail).
    // The zCount·rz term — which carries the slow ~0.85-contraction
    // convergence tail, i.e. nearly all the rounds — is pure scalar
    // arithmetic the driver advances EVERY round for free. Only dmA
    // needs a cluster aggregation, so it refreshes at the probe
    // cadence and is held constant (stale ≤ k-1 rounds) in between.
    // In any BIDIRECTIONAL graph (q61/q65's star edges) every active
    // node has out-edges, so dmA ≡ 0 and the per-round literals — hence
    // the whole rank sequence — are bit-for-bit the fresh-per-round
    // sequence; the cadence only batches the convergence PROBE. For a
    // general edge set the stale-dmA iterates stay monotone (every
    // operand is monotone and the stale dmA is an earlier, hence ≤,
    // value) and sandwiched below the fresh sequence, so they converge
    // to the SAME least fixpoint, just possibly a few probe windows
    // later. Each k-round group is ONE linear k-deep plan (each round
    // referenced once — no subtree duplication), one eager checkpoint,
    // one O(1)-row probe: k× less per-round fixed overhead.
    var dmA = dmA0
    while (!converged && executed < maxRounds) {
      val k = math.min(probeEvery, maxRounds - executed)
      var cur = r
      var rzc = rz
      for (_ <- 1 to k) {
        val dmDivN = (dmA + zCount * rzc) / n // truncating, both engines
        val contrib = edges
          .join(cur.select(col("doc_id").as("src"), col("r")),
            edges("u") === col("src"))
          .select(col("v"), expr("r div d").as("c"))
          .groupBy(col("v")).agg(sum(col("c")).as("s"))
        cur = active.join(contrib, active("doc_id") === contrib("v"), "left")
          .select(active("doc_id"), active("dang"),
            expr(s"150 + (850 * (coalesce(s, CAST(0 AS BIGINT)) + $dmDivN)) div 1000")
              .as("r"))
        rzc = 150L + (850L * dmDivN) / 1000L
      }
      r = cur.localCheckpoint(true)
      val row = r.agg(
        sum(col("r").cast("decimal(38,0)")),
        sum(when(col("dang"), col("r")).otherwise(lit(0L)))).head
      val ta1 = Option(row.get(0)).map(_.asInstanceOf[java.math.BigDecimal])
        .getOrElse(java.math.BigDecimal.ZERO)
      dmA = if (row.isNullAt(1)) 0L else row.getLong(1)
      val tot1 = ta1.add(bd(zCount).multiply(bd(rzc)))
      executed += k
      if (tot1.compareTo(tot0) == 0) { converged = true; fixRound = executed - k }
      tot0 = tot1; rz = rzc
    }
    oracleRoundBound.foreach { bound =>
      require(converged && fixRound <= bound,
        s"PageRank fixpoint needed ${if (converged) fixRound else s">=$maxRounds"} " +
          s"rounds (probe cadence $probeEvery rounds up), " +
          s"above the pinned oracle bound $bound — raise " +
          "PrOracleRounds to keep the oracle at fixpoint")
    }
    r.select(col("doc_id"), col("r"))
      .union(ids.join(endpoints, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit(rz).as("r")))
  }

  /** q65: exact-fixpoint PageRank with dangling-mass redistribution
    * over the q61 near-dup graph — see [[pagerankFixpoint]]. The
    * oracle runs the same recurrence for [[PrOracleRounds]] unrolled
    * rounds; the engine asserts its fixpoint landed within that bound,
    * so both agree bit-for-bit (Pipeline2Spec pins a synthetic graph
    * where q61's fixed 3 rounds and the fixpoint genuinely differ). */
  def q65PagerankFixpoint(s: SparkSession, dir: String): DataFrame = {
    // Round-14 optimization (guide §1.2 step 1 — change the
    // distributed algorithm, not the constants). The round-latency
    // profile was flat for 8 rounds of tuning: the ~60 exact-integer
    // contraction rounds each cost an edge join + vertex agg — ~120
    // tiny shuffle stages — and batching probes changed nothing
    // because the stages themselves were the time. What removes them
    // is STRUCTURE the generic solver cannot see: the q61/q65 graph
    // is a disjoint union of simhash STARS (hub = min doc_id per sh
    // group), so (a) every active node has out-edges (bidirectional
    // star ⇒ the active dangling sum dmA ≡ 0 — rank ≥ 150 > 0 makes
    // dmA = 0 ⟺ "no active dangling node", a structural fact, not a
    // numeric coincidence), hence the dangling sequence dm_t =
    // zCount·rz_t is pure scalar arithmetic; and (b) within a star
    // all leaves start equal and update identically (leaf rank
    // depends only on the hub, m, and dm), so a component's whole
    // state is (r_hub, r_leaf) — and it depends ONLY on the star
    // size. The exact per-round recurrence
    //   h' = 150 + 850·(m·l + dm div n) div 1000
    //   l' = 150 + 850·((h div m) + dm div n) div 1000
    //   rz' = 150 + 850·(dm div n) div 1000,  dm = zCount·rz
    // therefore runs ON THE DRIVER once per DISTINCT star size —
    // O(|sizes| · rounds) integer ops against a one-collect size
    // histogram (|sizes| ≤ √active — bounded the way the q161 life
    // table is) — and the cluster work collapses to: one corpus
    // simhash pass, one sh-keyed exchange (window min/count), one
    // broadcast join of the ≤|sizes|-row fixpoint table, and the
    // output sort. Measured sf0.1 warm: 9.44 s → 1.5 s (the ~120
    // iteration stages gone); the recurrence and hence the output is
    // bit-identical (Pipeline2Spec cross-gates this solver against
    // [[pagerankFixpoint]] on the real corpus, and the unchanged
    // oracle re-proves it at every scale).
    import s.implicits._
    val base = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"),
        graft.functions.TextFunctions
          .simhash16(TextAnalysis.tokens(col("text"))).as("sh"))
      .repartition(col("sh"))
      .localCheckpoint(false)
    // ONE tiny driver read: the (star size -> #groups) histogram.
    val hist = base.groupBy(col("sh")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("ng"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val n = hist.map { case (sz, ng) => sz * ng }.sum
    val zCount = hist.collectFirst { case (1L, ng) => ng }.getOrElse(0L)
    val ms: Seq[Long] = hist.collect { case (sz, _) if sz >= 2 => sz - 1 }

    // the exact recurrence, driver-side; identical termination
    // contract to pagerankFixpoint (monotone ⇒ state equality is the
    // fixpoint test; fixRound asserted against the oracle's pinned
    // unroll bound)
    val maxRounds = 100
    var rz = 150L
    var h = ms.map(_ -> 150L).toMap
    var l = h
    var fixRound = if (n == 0) 0 else -1
    var converged = n == 0
    var executed = 0
    while (!converged && executed < maxRounds) {
      val dmDivN = (zCount * rz) / n // truncating, both engines
      val rz1 = 150L + (850L * dmDivN) / 1000L
      val h1 = ms.map(m =>
        m -> (150L + (850L * (m * l(m) + dmDivN)) / 1000L)).toMap
      val l1 = ms.map(m =>
        m -> (150L + (850L * (h(m) / m + dmDivN)) / 1000L)).toMap
      executed += 1
      if (rz1 == rz && h1 == h && l1 == l) {
        converged = true; fixRound = executed - 1
      }
      rz = rz1; h = h1; l = l1
    }
    require(converged && fixRound <= PrOracleRounds,
      s"PageRank fixpoint needed ${if (converged) fixRound else s">=$maxRounds"} " +
        s"rounds, above the pinned oracle bound $PrOracleRounds — raise " +
        "PrOracleRounds to keep the oracle at fixpoint")

    val fixTable = ms.map(m => (m + 1, h(m), l(m))).toDF("sz", "hr", "lr")
    val wsh = org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))
    base
      .withColumn("hub", min(col("doc_id")).over(wsh))
      .withColumn("sz", count(lit(1)).over(wsh))
      .join(broadcast(fixTable), Seq("sz"), "left")
      .select(col("doc_id"),
        when(col("sz") === 1, lit(rz))
          .when(col("doc_id") === col("hub"), col("hr"))
          .otherwise(col("lr")).as("rank_x1000"),
        when(col("sz") === 1, lit(0L))
          .when(col("doc_id") === col("hub"), col("sz") - 1)
          .otherwise(lit(1L)).as("deg"))
      .orderBy(col("doc_id"))
  }

  val q65PagerankFixpointOracle: String = {
    // Every CTE that a round re-references is AS MATERIALIZED: DuckDB
    // inlines single-reference CTEs, and with 64 unrolled rounds the
    // inlined `ed`/`ids` chains re-open the parquet per reference
    // ("too many open files") and re-derive the simhash graph per
    // round. Each r{k} is also materialized — it is referenced twice
    // (contribution join + dangling sum), which would otherwise double
    // the evaluation of its whole ancestor chain per round.
    def round(prev: String, cur: String) =
      s"""$cur AS MATERIALIZED (
         |  SELECT b.doc_id,
         |    CAST(150 + (850 * (coalesce(t.s, 0) +
         |      (SELECT coalesce(sum(r), 0) FROM $prev
         |       WHERE doc_id NOT IN (SELECT u FROM deg))
         |      // (SELECT n FROM total))) // 1000 AS BIGINT) AS r
         |  FROM ids b LEFT JOIN (
         |    SELECT v, sum(r // d) AS s
         |    FROM ed JOIN $prev p ON p.doc_id = ed.u GROUP BY v) t
         |  ON t.v = b.doc_id)"""
    val rounds = (1 to PrOracleRounds)
      .map(k => round(s"r${k - 1}", s"r$k")).mkString(",\n")
    val sh = Dedup.simhashSql("toks")
    s"""WITH base AS (
       |  SELECT doc_id, CAST($sh AS BIGINT) AS sh
       |  FROM (SELECT doc_id, $tokensSql AS toks FROM documents)),
       |ids AS MATERIALIZED (SELECT doc_id FROM documents),
       |total AS MATERIALIZED (SELECT count(*) AS n FROM ids),
       |star AS (
       |  SELECT doc_id AS v, min(doc_id) OVER (PARTITION BY sh) AS u
       |  FROM base),
       |e AS (SELECT u, v FROM star WHERE u <> v),
       |bidir AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
       |deg AS MATERIALIZED (SELECT u, count(*) AS d FROM bidir GROUP BY u),
       |ed AS MATERIALIZED (SELECT bidir.u, v, d FROM bidir JOIN deg USING (u)),
       |r0 AS MATERIALIZED (SELECT doc_id, CAST(150 AS BIGINT) AS r FROM ids),
       |$rounds
       |SELECT b.doc_id AS doc_id, r$PrOracleRounds.r AS rank_x1000,
       |  CAST(coalesce(deg.d, 0) AS BIGINT) AS deg
       |FROM ids b
       |JOIN r$PrOracleRounds ON r$PrOracleRounds.doc_id = b.doc_id
       |LEFT JOIN deg ON deg.u = b.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }

  val RrfK = 60        // the standard RRF dampening constant
  val RrfTopK = 20
  val RrfCandK = 200   // per-system candidate truncation, ≫ RrfTopK
  val RrfTerms: Seq[String] = Seq("spark", "query", "window")

  /** q63: hybrid retrieval with reciprocal-rank fusion — a keyword
    * system (total occurrences of the query terms, one kernel pass)
    * and a vector system (exact integer dot against a fixed query
    * embedding) each rank the corpus; per-doc RRF =
    * Σ 1e6/(60+rank) in truncating integer math, top-[[RrfTopK]] by
    * fused score.
    *
    * Scale shape — NO corpus-wide window anywhere: each system is
    * truncated to its global top-[[RrfCandK]] via
    * TakeOrderedAndProject (per-partition heaps, one tiny result);
    * the ≤ 2·[[RrfCandK]] candidate union is broadcast back against
    * the score table and each candidate's EXACT global rank is
    * recovered as `1 + #rows ordering before it` in one conditional
    * aggregation (the ann_brute map-side-join shape). The fused
    * top-[[RrfTopK]] is provably inside the candidate set: a
    * non-candidate has both ranks > [[RrfCandK]], so
    * rrf ≤ 2·⌊1e6/(60+201)⌋ = 7662, while each of the keyword top-20
    * alone scores ≥ ⌊1e6/(60+20)⌋ = 12500 — so the output (and the
    * oracle hash, which ranks globally) is bit-identical. The score
    * table is three longs/doc behind a lazy localCheckpoint so the
    * text kernel and dot product run once, not once per pass. */
  def q63RrfFusion(s: SparkSession, dir: String): DataFrame = {
    import Similarity.{idot, ivec}
    val kw = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"),
        TextStatFunctions.tokenSetCounts(col("text"), Seq(RrfTerms))
          .getItem(0).as("kw_score"))
    val vecs = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), ivec(col("embedding")).as("v"))
    val qv = vecs.filter(col("vec_id") === 0)
      .select(col("v").as("qv"))
    val vs = vecs.join(broadcast(qv))
      .select(col("vec_id"), idot(col("v"), col("qv")).as("vec_score"))
    val base = kw.join(vs, kw("doc_id") === vs("vec_id"))
      .select(col("doc_id"), col("kw_score"), col("vec_score"))
      .localCheckpoint(false)
    val cand = base
      .orderBy(col("kw_score").desc, col("doc_id").asc).limit(RrfCandK)
      .unionByName(
        base.orderBy(col("vec_score").desc, col("doc_id").asc).limit(RrfCandK))
      .dropDuplicates("doc_id")
      .select(col("doc_id").as("c_id"), col("kw_score").as("c_kw"),
        col("vec_score").as("c_vec"))
    val kwBeats = col("kw_score") > col("c_kw") ||
      (col("kw_score") === col("c_kw") && col("doc_id") < col("c_id"))
    val vecBeats = col("vec_score") > col("c_vec") ||
      (col("vec_score") === col("c_vec") && col("doc_id") < col("c_id"))
    val beats = base.join(broadcast(cand), kwBeats || vecBeats)
      .groupBy(col("c_id"))
      .agg(sum(when(kwBeats, 1L).otherwise(0L)).as("kw_before"),
        sum(when(vecBeats, 1L).otherwise(0L)).as("vec_before"))
    cand.join(beats, Seq("c_id"), "left")
      .select(col("c_id").as("doc_id"),
        col("c_kw").as("kw_score"), col("c_vec").as("vec_score"),
        (coalesce(col("kw_before"), lit(0L)) + lit(1L)).as("kw_rank"),
        (coalesce(col("vec_before"), lit(0L)) + lit(1L)).as("vec_rank"))
      .withColumn("rrf",
        expr(s"1000000 div ($RrfK + kw_rank) + 1000000 div ($RrfK + vec_rank)"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(RrfTopK)
  }

  val q63RrfFusionOracle: String = {
    val terms = RrfTerms.map(t => s"'$t'").mkString(",")
    s"""WITH kw AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter($tokensSql, t -> t IN ($terms)))
       |      AS BIGINT) AS kw_score
       |  FROM documents),
       |iv AS (SELECT vec_id, ${Similarity.ivecSql} AS v FROM embeddings),
       |qv AS (SELECT v AS q FROM iv WHERE vec_id = 0),
       |vs AS (
       |  SELECT vec_id,
       |    CAST(list_sum(list_transform(range(1, len(v) + 1),
       |      i -> v[i] * q[i])) AS BIGINT) AS vec_score
       |  FROM iv CROSS JOIN qv),
       |base AS (
       |  SELECT doc_id, kw_score, vec_score
       |  FROM kw JOIN vs ON doc_id = vec_id),
       |ranked AS (
       |  SELECT *,
       |    row_number() OVER (ORDER BY kw_score DESC, doc_id) AS kw_rank,
       |    row_number() OVER (ORDER BY vec_score DESC, doc_id) AS vec_rank
       |  FROM base)
       |SELECT doc_id, kw_score, vec_score, kw_rank, vec_rank,
       |  CAST(1000000 // ($RrfK + kw_rank)
       |    + 1000000 // ($RrfK + vec_rank) AS BIGINT) AS rrf
       |FROM ranked
       |ORDER BY rrf DESC, doc_id LIMIT $RrfTopK""".stripMargin
  }

  val HistBucketWidth = 20
  val HistMaxBucket = 19

  /** q56: corpus length profiling — a fixed-width histogram of
    * whitespace token counts per language, with each bucket's share of
    * its language. One (lang, bucket) shuffle over kernel-counted
    * lengths + a lang-partitioned window on the tiny aggregate;
    * map-only otherwise. */
  def q56LengthHist(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("lang"),
        TextStatFunctions.wsTokenCount(col("text")).as("n_tokens"))
      .withColumn("bucket",
        least(expr(s"n_tokens div $HistBucketWidth"), lit(HistMaxBucket.toLong)))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("lang_total",
        sum(col("n_docs")).over(Window.partitionBy(col("lang"))))
      .withColumn("pct_of_lang", expr("n_docs * 100 div lang_total"))
      .select(col("lang"), col("bucket"),
        (col("bucket") * HistBucketWidth).as("bucket_lo"),
        col("n_docs"), col("sum_tokens"), col("pct_of_lang"))
      .orderBy(col("lang"), col("bucket"))

  val q56LengthHistOracle: String =
    s"""WITH lens AS (
       |  SELECT lang,
       |    CAST(len($tokensSql) AS BIGINT) AS n_tokens
       |  FROM documents),
       |buckets AS (
       |  SELECT lang,
       |    least(n_tokens // $HistBucketWidth, $HistMaxBucket) AS bucket,
       |    count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
       |  FROM lens GROUP BY 1, 2)
       |SELECT lang, bucket,
       |  CAST(bucket * $HistBucketWidth AS BIGINT) AS bucket_lo,
       |  n_docs, sum_tokens,
       |  CAST(n_docs * 100 // sum(n_docs) OVER (PARTITION BY lang)
       |    AS BIGINT) AS pct_of_lang
       |FROM buckets
       |ORDER BY lang, bucket""".stripMargin
}
