package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q135 Misra–Gries heavy hitters — the published guarantee (every
  * token with count > N/k survives the summary) and the gated
  * output's partition-independence, pinned on fixtures where the
  * exact answer is computable by hand. */
class HeavyHitterSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  test("mgCandidates keeps every item above n/k even against " +
      "adversarial arrival order") {
    // 200 'hot' + 320 distinct cold items, hot delivered FIRST so
    // every later unseen arrival pressures its counter with
    // decrements: 520 arrivals, n/k = 520/64 ≈ 8 < 200
    val stream = Seq.fill(200)("hot") ++ (1 to 320).map(i => s"cold$i")
    val kept = Sketch.mgCandidates(stream.iterator).toSet
    assert(kept.contains("hot"), "guaranteed heavy item evicted")
    assert(kept.size <= Sketch.MgK, "summary exceeded its k budget")
  }

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mg-docs")
    rows.map { case (id, text) => (id, text, "en", "t", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q135 returns exactly the tokens above N/k with exact counts") {
    // 'the': 120 of 360 tokens (33%); 'data': 60 (16.7%); everything
    // else unique -> threshold N/64 = 5.625, so a token needs > 5
    val filler = (1 to 180).map(i => s"u$i")
    val words = Seq.fill(120)("the") ++ Seq.fill(60)("data") ++ filler
    // spread across 3 docs so several input partitions see each token
    val docs = words.grouped(120).zipWithIndex
      .map { case (w, i) => (i.toLong + 1L, w.mkString(" ")) }.toSeq
    val dir = docsDir(docs)
    val rows = Sketch.q135HeavyHitters(s, dir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("the", "data"),
      s"expected the(120) data(60), got ${rows.toSeq}")
    assert(rows.map(_.getLong(1)).toSeq == Seq(120L, 60L))
    assert(rows.forall(_.getLong(2) == 360L))
  }
}
