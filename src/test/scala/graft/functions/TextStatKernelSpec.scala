package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The single-pass text-stat kernels must stay bit-identical to the
  * declarative HOF forms they replaced (which is also what the DuckDB
  * oracle runs) — checked on real document text plus hand-picked
  * whitespace/empty edge cases. */
class TextStatKernelSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  val docs = "/root/testdata/sf0.001/documents.parquet"

  private def normHof = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
  private def toksHof = split(normHof, " ")

  /** Real corpus rows plus whitespace edge cases the corpus lacks. */
  private def corpus = {
    import spark.implicits._
    spark.read.parquet(docs).select(col("text"))
      .union(Seq("", "  ", " a\t b\n", "one", "a  b   c", "A BC",
        "the the the of", "x1y2z 42 !?").toDF("text"))
  }

  test("NormText / WsTokenCount / BagNorm ≡ HOF forms") {
    val d = corpus.select(
      TextStatFunctions.normText(col("text")).as("kn"), normHof.as("hn"),
      TextStatFunctions.wsTokenCount(col("text")).as("kw"),
      size(toksHof).cast("long").as("hw"),
      TextStatFunctions.bagNorm(col("text")).as("kb"),
      concat_ws(" ", array_sort(toksHof)).as("hb"))
      .filter(col("kn") =!= col("hn") || col("kw") =!= col("hw") ||
        col("kb") =!= col("hb"))
      .count()
    assert(d == 0)
  }

  test("TokenStats ≡ length/size/array_distinct/filter HOFs") {
    val stop = Seq("the", "a", "of", "and", "in", "is", "to")
    val d = corpus.select(
      TextStatFunctions.tokenStats(col("text"), stop).as("k"),
      array(
        length(normHof).cast("long"),
        size(toksHof).cast("long"),
        size(array_distinct(toksHof)).cast("long"),
        size(filter(toksHof, t => t.isin(stop.map(x => x: Any): _*)))
          .cast("long")).as("h"))
      .filter(not(col("k") === col("h"))).count()
    assert(d == 0)
  }

  test("TokenSetCounts ≡ per-set filter HOFs (incl. overlapping sets)") {
    val sets = Seq(
      Seq("the", "a", "is", "and", "of"),
      Seq("der", "die", "das", "und", "ist"),
      Seq("the", "value", "of")) // overlaps set 0 → bitmask dispatch
    val hof = array(sets.map(ms =>
      size(filter(toksHof, t => t.isin(ms.map(x => x: Any): _*)))
        .cast("long")): _*)
    val d = corpus.select(
      TextStatFunctions.tokenSetCounts(col("text"), sets).as("k"),
      hof.as("h"))
      .filter(not(col("k") === col("h"))).count()
    assert(d == 0)
  }

  test("BpeCount ≡ regexp_count over the normal form") {
    val d = corpus.select(
      TextStatFunctions.bpeCount(col("text")).as("k"),
      regexp_count(normHof, lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")
        .as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(d == 0)
  }

  test("IntersectCount ≡ size(array_intersect) on distinct arrays") {
    val cs = TextFunctions.charShingles(col("text"))
    val pairs = spark.read.parquet(docs).select(col("doc_id"), cs.as("cs"))
      .filter(col("doc_id") < 40)
    val a = pairs.select(col("doc_id").as("ia"), col("cs").as("ca"))
    val b = pairs.select(col("doc_id").as("ib"), col("cs").as("cb"))
    val d = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(
        TextStatFunctions.intersectCount(col("ca"), col("cb")).as("k"),
        size(array_intersect(col("ca"), col("cb"))).cast("long").as("h"),
        (size(col("ca")) + size(col("cb"))).cast("long").as("nb"),
        size(array_union(col("ca"), col("cb"))).cast("long").as("hu"))
      .filter(col("k") =!= col("h") || (col("nb") - col("k")) =!= col("hu"))
      .count()
    assert(d == 0)
  }

  test("TokenNgrams ≡ transform over token windows; RepetitionStats consistent") {
    val n2 = transform(sequence(lit(1), greatest(size(toksHof) - 1, lit(0))),
      i => concat_ws(" ", element_at(toksHof, i), element_at(toksHof, i + 1)))
    val d = corpus
      .select(TextStatFunctions.tokenNgrams(col("text"), 2).as("k"),
        when(size(toksHof) >= 2, n2)
          .otherwise(array().cast("array<string>")).as("h"))
      .filter(not(col("k") === col("h"))).count()
    assert(d == 0)

    // repetitionStats invariants vs declarative counts
    val st = TextStatFunctions.repetitionStats(col("text"))
    val bad = corpus.select(st.as("st"),
      size(toksHof).cast("long").as("n"),
      size(array_distinct(TextStatFunctions.tokenNgrams(col("text"), 3)))
        .cast("long").as("ntd"))
      .filter(
        col("st").getItem(0) =!= col("n") ||
          col("st").getItem(1) > col("n") || col("st").getItem(1) < 1 ||
          col("st").getItem(3) =!= greatest(col("n") - 2, lit(0L)) ||
          col("st").getItem(4) =!= col("ntd"))
      .count()
    assert(bad == 0)
  }

  test("MinHexWindows ≡ per-window array_min(transform) HOFs") {
    val hashes = TextFunctions.shingleHashes(
      TextFunctions.shingleSet(col("text")))
    val hof = array((0 until 8).map(k =>
      array_min(transform(hashes, h => substring(h, k * 8 + 1, 8)))): _*)
    val d = spark.read.parquet(docs)
      .select(TextFunctions.minHexWindows(hashes, 8, 8).as("k"),
        hof.as("h"))
      .filter(not(col("k") === col("h"))).count()
    assert(d == 0)
  }

  test("CharShingleSketch ≡ min-md5/min-window HOFs over charShingles") {
    val cs = TextFunctions.charShingles(col("text"))
    val windows = 4
    val hof = array(
      array_min(transform(cs, x => md5(x))) +:
        (1 to windows).map(k =>
          array_min(transform(cs, x =>
            substring(md5(x), (k - 1) * 6 + 1, 6)))): _*)
    val d = corpus.select(
      TextFunctions.charShingleSketch(col("text"), windows).as("k"),
      hof.as("h"))
      .filter(not(col("k") === col("h"))).count()
    assert(d == 0)
  }
}
