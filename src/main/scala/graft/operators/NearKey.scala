package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** One-edit near-key detection — the FastSS/SymSpell deletion-
  * neighborhood scheme (Bocek, Hunt, Stiller & Hasse 2007, "Fast
  * Similarity Search in Large Dictionaries"): two strings are within
  * edit distance 1 ONLY IF they share a member of their deletion
  * neighborhoods {s} ∪ {s minus one char}, so blocking on those keys
  * is a complete candidate generator for distance ≤ 1 — the exact-
  * recall counterpart to q101's sorted-neighborhood blocking (which
  * trades far-apart-in-sort-order recall for bounded fan-out).
  *
  * Run here as a fat-finger audit over `customer.c_name`: every pair
  * of customer names one edit apart (digit typos in entered IDs, the
  * classic ER hazard) is reported with both keys. Candidates sharing
  * a deletion key include some distance-2 pairs (deletions at two
  * DIFFERENT positions), so a `levenshtein ≤ 1` confirm runs on the
  * candidate stream — both engines implement the same unit-cost DP,
  * so the gate is engine-exact.
  *
  * 100 TB posture: one corpus-scale key explode (≤ len+1 keys/row,
  * capped at [[NearKey.MaxDelPos]]) behind ONE barrier feeds both
  * sides of an equi-join on the deletion key; a key of length m can
  * only match the key itself plus its one-char insertions, so bucket
  * fan-out is bounded by (m+1)·|alphabet| + 1 — alphabet-bounded,
  * never corpus-bounded, no all-pairs stage anywhere. The confirmed
  * pair stream then takes the query's only pair-keyed exchange (the
  * dedup). Output grows linearly in the corpus (each record has an
  * alphabet-bounded neighbor count).
  */
object NearKey {

  /** Deletion positions considered per name (keys = 1 + this). Names
    * longer than the cap only block on their first 64 positions —
    * recall degrades gracefully (a typo past position 64 is missed),
    * never fan-out. TPC-H-style names are length 18, far inside. */
  val MaxDelPos = 64

  /** q160: all customer-name pairs within edit distance 1, with both
    * custkeys. Columns: (cust_a, name_a, cust_b, name_b), cust_a <
    * cust_b, ordered by the key pair. */
  def q160NearkeyPairs(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        explode(expr(s"sequence(0, least(length(c_name), $MaxDelPos))"))
          .as("p"))
      .select(col("c_custkey"), col("c_name"),
        expr("""IF(p = 0, c_name,
            concat(substring(c_name, 1, p - 1),
              substring(c_name, p + 1, length(c_name))))""").as("k"))
      .localCheckpoint(false) // both self-join sides read it
    keys.select(col("c_custkey").as("cust_a"),
        col("c_name").as("name_a"), col("k"))
      .join(keys.select(col("c_custkey").as("cust_b"),
        col("c_name").as("name_b"), col("k")), Seq("k"))
      .filter(col("cust_a") < col("cust_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 1)
      // repeated chars make one name emit the same deletion key twice
      // ("…11" minus either '1') — dedup is the query's one pair
      // exchange
      .select(col("cust_a"), col("name_a"), col("cust_b"), col("name_b"))
      .distinct()
      .orderBy(col("cust_a"), col("cust_b"))
  }

  val q160NearkeyPairsOracle: String =
    s"""WITH keys AS MATERIALIZED (
       |  SELECT c_custkey, c_name, unnest(list_prepend(c_name,
       |    [substr(c_name, 1, i - 1) || substr(c_name, i + 1)
       |     FOR i IN generate_series(1, least(len(c_name), $MaxDelPos))]))
       |    AS k
       |  FROM customer)
       |SELECT DISTINCT a.c_custkey AS cust_a, a.c_name AS name_a,
       |  b.c_custkey AS cust_b, b.c_name AS name_b
       |FROM keys a JOIN keys b ON a.k = b.k AND a.c_custkey < b.c_custkey
       |WHERE levenshtein(a.c_name, b.c_name) <= 1
       |ORDER BY cust_a, cust_b""".stripMargin
}
