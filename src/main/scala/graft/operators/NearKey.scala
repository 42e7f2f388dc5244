package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** One-edit near-key detection — the FastSS/SymSpell deletion-
  * neighborhood scheme (Bocek, Hunt, Stiller & Hasse 2007, "Fast
  * Similarity Search in Large Dictionaries"), run as a fat-finger
  * audit over `customer.c_name` (digit typos in entered IDs, the
  * classic ER hazard) — the exact-recall counterpart to q101's
  * sorted-neighborhood blocking.
  *
  * Two scale lessons are baked into this shape, both measured on the
  * first cut (which joined raw id rows position-blind — the textbook
  * FastSS candidate set — and emitted one row per ID PAIR):
  *
  *  1. REPORT AT THE NAME GRAIN. A duplicated-name corpus makes the
  *     id-pair stream quadratic in the duplication factor (the ×10
  *     corpus replicates every name 10×: 262k → 26M output rows,
  *     ×100 → 2.6G — 54 s at sf1 was almost entirely output). The
  *     audit answer is per distinct NAME pair with group sizes and
  *     the implied id-pair count; ONE corpus exchange (the name
  *     groupBy, map-side combined) collapses everything after to
  *     name-vocabulary scale.
  *
  *  2. POSITION-AWARE CANDIDATES. For edit distance ≤ 1 the shared
  *     deletion variant is never arbitrary:
  *       substitution at i  ⟺ del_i(A) = del_i(B)  (same position),
  *       deletion/insertion ⟺ B = del_i(A)         (identity key
  *                                                  meets deletion),
  *     so the substitution arm equi-joins on (key, position) and the
  *     deletion arm on (identity key × deletion key) — provably
  *     complete for distance 1 and output-proportional, where the
  *     position-blind join admits every "delete at DIFFERENT
  *     positions" shift coincidence (all distance-2 junk). The
  *     ORACLE deliberately keeps the position-blind formulation +
  *     levenshtein filter: the gate cross-checks two independent
  *     exact algorithms (the q134 discipline).
  *
  * Keys ride the shuffle as fixed-width xxhash64 values, never
  * strings; hash collisions only ever ADD candidates and the
  * `levenshtein ≤ 1` confirm removes them (load-bearing for
  * collisions, belt-and-braces for the candidate math). Bucket
  * fan-out is alphabet-bounded. Distance-0 groups (several ids
  * sharing one name) are reported too — they need no join at all.
  */
object NearKey {

  /** Deletion positions considered per name (keys = 1 + this). Names
    * longer than the cap only block on their first 64 positions —
    * recall degrades gracefully (a typo past position 64 is missed),
    * never fan-out. TPC-H-style names are length 18, far inside. */
  val MaxDelPos = 64

  /** q160: every distinct customer-name pair within edit distance 1,
    * with group sizes and the implied id-pair count; plus one row per
    * duplicated name (distance 0, name_a = name_b). Columns:
    * (name_a, name_b, n_a, n_b, id_pairs), name_a ≤ name_b, ordered.
    */
  def q160NearkeyPairs(s: SparkSession, dir: String): DataFrame = {
    // keys + the dup arm read the checkpoint. The explicit-N
    // repartition pins its partition count (round 14): the groupBy's
    // AQE-coalesced 1–2 partitions froze into the checkpoint, and the
    // deletion-key explode + xxhash kernel downstream inherited them —
    // a 3.6 s near-serial stage at sf0.1 where 32 tasks take ~0.3 s.
    val names = Tables.load(s, dir, "customer")
      .groupBy(col("c_name")).agg(count(lit(1)).as("n"))
      .repartition(s.sparkContext.defaultParallelism, col("c_name"))
      .localCheckpoint(false)
    val keys = names
      .select(col("c_name"), col("n"),
        explode(expr(s"sequence(0, least(length(c_name), $MaxDelPos))"))
          .as("p"))
      .select(col("c_name"), col("n"), col("p"),
        xxhash64(expr("""IF(p = 0, c_name,
          concat(substring(c_name, 1, p - 1),
            substring(c_name, p + 1, length(c_name))))""")).as("kh"))
    def side(df: DataFrame, sfx: String): DataFrame =
      df.select(col("c_name").as(s"name_$sfx"), col("n").as(s"n_$sfx"),
        col("kh"), col("p").as(s"p_$sfx"))
    val delk = keys.filter(col("p") >= 1)
    val idk = keys.filter(col("p") === 0)
    // substitution arm: same deletion position on both sides
    val subsPairs = side(delk, "a")
      .join(side(delk, "b").withColumnRenamed("kh", "kh_b"),
        col("kh") === col("kh_b") && col("p_a") === col("p_b") &&
          col("name_a") < col("name_b"))
    // deletion/insertion arm: an identity key meets a deletion key of
    // another name (canonicalized — both orientations arrive here)
    val delPairs = side(idk, "a")
      .join(side(delk, "b").withColumnRenamed("kh", "kh_b"),
        col("kh") === col("kh_b") && col("name_a") =!= col("name_b"))
      .select(when(col("name_a") < col("name_b"),
          struct(col("name_a").as("na"), col("n_a").as("ca"),
            col("name_b").as("nb"), col("n_b").as("cb")))
        .otherwise(
          struct(col("name_b").as("na"), col("n_b").as("ca"),
            col("name_a").as("nb"), col("n_a").as("cb"))).as("pr"))
      .select(col("pr.na").as("name_a"), col("pr.ca").as("n_a"),
        col("pr.nb").as("name_b"), col("pr.cb").as("n_b"))
    val onePairs = subsPairs
      .select(col("name_a"), col("n_a"), col("name_b"), col("n_b"))
      .unionByName(delPairs)
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      // repeated chars emit the same deletion key at two positions
      // ("…0012" minus either '0') — dedup is the query's one
      // pair-keyed exchange, over the name vocabulary only
      .distinct()
      .withColumn("id_pairs", col("n_a") * col("n_b"))
    val dupGroups = names.filter(col("n") >= 2)
      .select(col("c_name").as("name_a"), col("n").as("n_a"),
        col("c_name").as("name_b"), col("n").as("n_b"),
        expr("n * (n - 1) div 2").as("id_pairs"))
    onePairs.unionByName(dupGroups)
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"),
        col("id_pairs"))
      .orderBy(col("name_a"), col("name_b"))
  }

  val q160NearkeyPairsOracle: String =
    s"""WITH nm AS MATERIALIZED (
       |  SELECT c_name, CAST(count(*) AS BIGINT) AS n
       |  FROM customer GROUP BY 1),
       |keys AS MATERIALIZED (
       |  SELECT c_name, n, unnest(list_prepend(c_name,
       |    [substr(c_name, 1, i - 1) || substr(c_name, i + 1)
       |     FOR i IN generate_series(1, least(len(c_name), $MaxDelPos))]))
       |    AS k
       |  FROM nm),
       |p1 AS (
       |  SELECT DISTINCT a.c_name AS name_a, b.c_name AS name_b,
       |    a.n AS n_a, b.n AS n_b
       |  FROM keys a JOIN keys b ON a.k = b.k AND a.c_name < b.c_name
       |  WHERE levenshtein(a.c_name, b.c_name) <= 1)
       |SELECT name_a, name_b, n_a, n_b,
       |  CAST(n_a * n_b AS BIGINT) AS id_pairs FROM p1
       |UNION ALL
       |SELECT c_name, c_name, n, n, n * (n - 1) // 2
       |FROM nm WHERE n >= 2
       |ORDER BY name_a, name_b""".stripMargin
}
