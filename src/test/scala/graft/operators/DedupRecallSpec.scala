package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q153/q154 MinHash-LSH recall calibration: the truth side must
  * count exactly the probe pairs at shingle-Jaccard ≥ 50% over the
  * PLANTED corpus (originals ∪ prefix-truncation variants of every
  * probe doc — cross-checked against a plain-Scala brute force over
  * the same planting + shingling), exact duplicates — whose
  * signatures band identically — must be found with certainty, and
  * the planted variants must populate PARTIAL-recall deciles (the
  * round-10 gate was vacuous below bin 10). */
class DedupRecallSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  // doc_ids 0 and 97 are probes (≡ 0 mod SetSim.ProbeMod)
  private val corpus: Seq[(Long, String)] = Seq(
    (0L, "a b c d e f"), // shingles {abc,bcd,cde,def}
    (1L, "a b c d e f"), // exact dup of the probe → J = 1
    (2L, "a b c d x y"), // shares {abc,bcd}: J = 2/6 < 0.5 → excluded
    (3L, "q r s t u v"), // unrelated
    (97L, "m n o p q r"),
    (98L, "m n o p q r")) // exact dup of the second probe

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedup-recall")
    rows.map { case (id, text) => (id, text, "en", "t", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  // ---- plain-Scala replica of the planting + shingling chain ------

  /** Replica of [[Dedup.plantedDocs]]: probe originals spawn prefix
    * variants keeping ceil((10k+5)%) of tokens, k = 5..10, under
    * id −(doc_id·16+k). */
  private def plant(rows: Seq[(Long, String)]): Seq[(Long, String)] =
    rows ++ rows.filter(_._1 % SetSim.ProbeMod == 0).flatMap {
      case (id, t) =>
        val toks = t.toLowerCase.trim.split("\\s+").toSeq
        (5 to 10).map { k =>
          val m = math.min(toks.size, (toks.size * (k * 10 + 5) + 99) / 100)
          (-(id * 16 + k), toks.take(m).mkString(" "))
        }
    }

  private def shingleSet(t: String): Set[String] = {
    val toks = t.toLowerCase.trim.split("\\s+").toSeq
    if (toks.size < 3) Set(t.toLowerCase.trim.replaceAll("\\s+", " "))
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  private def isProbe(id: Long): Boolean =
    id < 0 || id % SetSim.ProbeMod == 0

  /** Exact truth pairs with their jacc_e6, over the planted corpus. */
  private def bruteTruth(rows: Seq[(Long, String)])
      : Map[(Long, Long), Long] = {
    val sets = plant(rows).map { case (id, t) => id -> shingleSet(t) }
    (for {
      (p, sp) <- sets if isProbe(p)
      (c, sc) <- sets if c != p && (!isProbe(c) || c > p)
      inter = (sp & sc).size
      union = (sp | sc).size
      if union > 0 && inter * 2 >= union
    } yield (math.min(p, c), math.max(p, c)) ->
        inter.toLong * 1000000L / union).toMap
  }

  test("q153: truth side ≡ brute force over the planted corpus; " +
      "every exact-dup pair is found (banding certainty)") {
    val truth = bruteTruth(corpus)
    // the natural probe pairs survive planting as a subset
    assert(truth.contains((0L, 1L)) && truth.contains((97L, 98L)))
    // planted variants contribute partial-Jaccard pairs
    assert(truth.values.exists(j => j >= 500000L && j < 1000000L))
    val r = Dedup.q153DedupRecall(s, docsDir(corpus)).collect().head
    assert(r.getLong(0) == truth.size) // n_truth exact
    assert(r.getLong(1) <= r.getLong(0)) // found ⊆ truth
    assert(r.getLong(2) == r.getLong(0) - r.getLong(1)) // missed
    // every J=1 pair must be found: recall can only be lost on
    // partial pairs, so n_missed ≤ #partial pairs
    val partial = truth.values.count(_ < 1000000L)
    assert(r.getLong(2) <= partial)
  }

  test("q154: planted variants populate partial-recall deciles AND " +
      "exact duplicates stay certain (bin 10 recall = 1e6)") {
    val truth = bruteTruth(corpus)
    val wantBins = truth.values.groupBy(_ / 100000L)
      .map { case (b, js) => b -> js.size.toLong }
    val rows = Dedup.q154MinhashScurve(s, docsDir(corpus)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == wantBins.keySet)
    // the gate is non-vacuous below bin 10: at least two partial bins
    assert(rows.keySet.count(_ < 10L) >= 2)
    for ((b, nTruth) <- wantBins) {
      val (nt, nf, recall, _) = rows(b)
      assert(nt == nTruth, s"bin $b n_truth")
      assert(nf <= nt && recall == nf * 1000000L / nt, s"bin $b recall")
    }
    // exact duplicates band identically → full recall with certainty
    val (nt10, nf10, rec10, exp10) = rows(10L)
    assert(nf10 == nt10 && rec10 == 1000000L && exp10 == 1000000L)
  }

  test("q153: a corpus with no probe docs reports vacuous full " +
      "recall, not a division by zero") {
    // no doc_id ≡ 0 mod ProbeMod → nothing is planted either
    val lonely = Seq(
      (5L, "a b c d e f"), (1L, "q r s t u v"),
      (2L, "m n o p w z"), (3L, "m n o p w z")) // dup pair, no probe
    assert(bruteTruth(lonely).isEmpty)
    val r = Dedup.q153DedupRecall(s, docsDir(lonely)).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((0L, 0L, 0L, 1000000L)))
  }
}
