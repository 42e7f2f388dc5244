package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hand-computed BM25 on a three-doc corpus: N=3, T=12,
  * df(spark)=2, df(vector)=df(merge)=1 ⇒
  * idf_e6(spark)=round(1e6·ln 1.6)=470004,
  * idf_e6(vector)=idf_e6(merge)=round(1e6·ln(8/3))=980829; each
  * contribution is (idf·44·tf·T) div (20·tf·T + 6·T + 18·dl·N). */
class RetrievalSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25-docs")
    rows.map { case (id, text) => (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q83: hand-computed scores, longer docs penalized, " +
      "rarer terms worth more") {
    val dir = docsDir(Seq(
      (1L, "spark spark vector x"), // tf=(2,1,0), dl=4
      (2L, "spark merge"),          // tf=(1,0,1), dl=2
      (3L, "a b c d e f")))         // tf=0, dl=6
    val rows = Retrieval.q83Bm25(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc1: spark (470004·44·2·12) div (480+72+216=768) = 646255;
    //       vector (980829·528) div 528 = 980829 ⇒ 1627084
    // doc2: spark (470004·528) div (240+72+108=420) = 590862;
    //       merge (980829·528) div 420 = 1233042 ⇒ 1823904
    assert(rows === Seq((2L, 2L, 1823904L), (1L, 4L, 1627084L),
      (3L, 6L, 0L)))
  }

  test("q83 plans the intended shape: constant-side broadcast only") {
    import graft.tools.PlanAudit
    val a = PlanAudit.of(Retrieval.q83Bm25(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.globalWindow && a.takeOrdered)
    assert(PlanAudit.intendedNonEqui("q83_bm25"))
  }
}
