package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** BPE merge-training semantics: the documented 3-pass replace
  * behavior (including its divergence from canonical greedy BPE on
  * odd runs), and structural invariants of the learned merge table
  * (values themselves are oracle-gated in CORRECTNESS). */
class BpeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val s = SparkSpec.spark

  private def applied(ws: String, l: String, r: String): String =
    s.range(1).select(Bpe.applyMerge(lit(ws), l, r).as("ws"))
      .head.getString(0)

  test("applyMerge completes boundary-sharing runs in two passes") {
    assert(applied(" a b a b a b ", "a", "b") == " ab ab ab ")
    assert(applied(" x a b y ", "a", "b") == " x ab y ")
    assert(applied(" a b ", "c", "d") == " a b ")
  }

  test("applyMerge on odd identical runs: documented non-greedy split") {
    // canonical greedy BPE would give [aa, aa, a]; the fixed-pass
    // replace semantics (identical in both engines) give [aa, a, aa]
    assert(applied(" a a a a a ", "a", "a") == " aa a aa ")
    assert(applied(" a a a a ", "a", "a") == " aa aa ")
  }

  test("encode counts pieces under a fixed merge cascade") {
    import s.implicits._
    // merges (a,b) then (ab,c): "abc" → " ab c " → " abc " = 1 piece;
    // "xy" untouched = 2 pieces; "ab" → 1 piece
    val docs = Seq((1L, "abc xy"), (2L, "ab abc")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, Seq(("a", "b"), ("ab", "c")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 3L), (2L, 2L, 2L)))
  }

  test("q72 learns Merges ranked merges; rank 1 is the corpus argmax") {
    val out = Bpe.q72BpeMerges(s, sf).collect()
    assert(out.length == Bpe.Merges)
    assert(out.map(_.getLong(0)).toSeq == (1L to Bpe.Merges).toSeq)
    assert(out.forall(r => r.getString(1).nonEmpty && r.getString(2).nonEmpty))
    // independent rank-1 check: most frequent adjacent char pair,
    // frequency-weighted by word count, ties to smallest pair string
    val top = Tables.topPairIndependent(s, sf)
    val r1 = out.head
    assert((r1.getString(1), r1.getString(2), r1.getLong(3)) == top,
      s"rank-1 merge ${r1.mkString(",")} != independent argmax $top")
  }

  test("q90 fertility totals reconcile with q74's per-doc encode") {
    val byLang = Bpe.q90TokenizerFertility(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(byLang.nonEmpty)
    assert(byLang.forall { case (_, nw, nv, np, ns, fert, split) =>
      np >= nw && nv <= nw && ns <= nw &&
        fert == np * 1000000L / nw && split == ns * 1000000L / nw })
    // every doc has a lang, so per-lang totals must equal per-doc ones
    val docs = Bpe.q74BpeEncode(s, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(byLang.map(_._2).sum == docs.map(_._1).sum)
    assert(byLang.map(_._4).sum == docs.map(_._2).sum)
  }

  test("q90 plans no cartesian, no BNLJ, no global window") {
    val a = graft.tools.PlanAudit.of(Bpe.q90TokenizerFertility(s, sf))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }

  private object Tables {
    def topPairIndependent(s2: org.apache.spark.sql.SparkSession,
        dir: String): (String, String, Long) = {
      import s2.implicits._
      val words = graft.Tables.load(s2, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
        .as[String].collect()
      val freq = words.groupBy(identity).view.mapValues(_.size.toLong)
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, f) <- freq; Array(a, b) <- w.toSeq.map(_.toString).sliding(2)
          .map(_.toArray))
        pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + f
      val ((l, r), f) = pairCounts.toSeq
        .minBy { case ((a, b), c) => (-c, s"$a|$b") }
      (l, r, f)
    }
  }
}
