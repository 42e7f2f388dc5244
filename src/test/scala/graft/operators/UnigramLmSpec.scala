package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q174 — the full Viterbi-EM chain pinned against a hand-computed
  * vocabulary on "ababab ababab cd". Hand trace: seed total 39
  * (a:6 b:6 ab:6 ba:4 aba:4 bab:4 abab:4 baba:2 c:1 d:1 cd:1);
  * round-1 Viterbi picks abab+ab for "ababab" (1025·1538·10¹⁶ beats
  * ab·ab·ab = 1538³·10¹² and aba·bab = 1025²·10¹⁶) and cd for "cd";
  * M-step keeps {ab:2, abab:2, cd:1} + floored chars, total 9; round
  * 2 reproduces the same segmentation; final p_e4 = 2222 for the
  * winners, 1111 for the rest. */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(text: String): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ulm-fix")
    Seq((0L, text, "en", "src", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("hand-traced EM: ababab segments as abab+ab, dead substrings " +
      "die, characters survive with floored counts") {
    val dir = docsDir("ababab ababab cd")
    val rows = UnigramLm.q174UnigramLm(s, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val expected = Seq(
      ("ab", 2, 2L, 2222L), ("abab", 4, 2L, 2222L),
      ("a", 1, 1L, 1111L), ("b", 1, 1L, 1111L), ("c", 1, 1L, 1111L),
      ("cd", 2, 1L, 1111L), ("d", 1, 1L, 1111L))
    assert(rows.toSeq === expected)
  }

  test("words past the length cap are excluded; a too-long word " +
      "leaves only the short word's pieces") {
    val dir = docsDir("abcdefghi xy")
    val rows = UnigramLm.q174UnigramLm(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    // 9-char word excluded; "xy" alone: seed {x:1, y:1, xy:1},
    // Viterbi picks xy, chars floored to 1 → total 3
    assert(rows.map(_._1).sorted.toSeq === Seq("x", "xy", "y"))
    assert(rows.toMap.apply("xy") === 1L)
  }

  test("the trained vocabulary is deterministic across runs") {
    val dir = docsDir("ababab ababab cd")
    val a = UnigramLm.q174UnigramLm(s, dir).collect().toSeq
    val b = UnigramLm.q174UnigramLm(s, dir).collect().toSeq
    assert(a === b)
  }
}
