package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The codegen'd kernel expressions must stay bit-identical to the
  * composable HOF forms they replaced (which is also what the DuckDB
  * oracle runs) — checked on real document text. */
class KernelSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  val docs = "/root/testdata/sf0.001/documents.parquet"

  test("ShingleSet ≡ HOF shingle expression") {
    val toks = split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")
    val hof = array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2), i =>
          concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
            element_at(toks, i + 2))))
        .otherwise(array(lower(trim(regexp_replace(col("text"), "\\s+", " "))))))
    val diff = SparkSpec.spark.read.parquet(docs)
      .select(TextFunctions.shingleSet(col("text")).as("k"), hof.as("h"))
      .filter(not(col("k") === col("h"))).count()
    assert(diff == 0)
  }

  test("ShingleHashes ≡ md5 HOF; Simhash16 ≡ per-bit aggregates") {
    val sh = TextFunctions.shingleSet(col("text"))
    val hofHashes = transform(sh, s => concat(md5(s), md5(concat(lit("x:"), s))))
    val d1 = spark.read.parquet(docs)
      .select(TextFunctions.shingleHashes(sh).as("k"), hofHashes.as("h"))
      .filter(not(col("k") === col("h"))).count()
    assert(d1 == 0)

    def bitExpr(j: Int): String =
      s"CASE WHEN substring(md5(t), ${j + 1}, 1) IN " +
        "('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END"
    val bitCols = (0 until 16).map { j =>
      expr(s"CASE WHEN aggregate(toks, 0, (acc, t) -> acc + ${bitExpr(j)}) > 0" +
        s" THEN ${1 << j} ELSE 0 END")
    }
    val toks = split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")
    val d2 = spark.read.parquet(docs)
      .select(toks.as("toks"))
      .select(TextFunctions.simhash16(col("toks")).as("k"),
        bitCols.reduce(_ + _).cast("long").as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(d2 == 0)
  }

  test("LongArrayDot ≡ aggregate(zip_with); LshBucket ≡ plane folds") {
    val v = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), v.as("v"))
    val hofDot = expr(
      "aggregate(zip_with(v, v, (x, y) -> x * y), 0L, (acc, x) -> acc + x)")
    val d1 = emb.select(VectorFunctions.longDot(col("v"), col("v")).as("k"),
      hofDot.as("h")).filter(col("k") =!= col("h")).count()
    assert(d1 == 0)

    def lshBitExpr(j: Int): String =
      s"""CASE WHEN aggregate(zip_with(v, sequence(0, size(v)-1),
         | (x, i) -> CASE WHEN substring(md5(concat('p$j:', i)), 1, 1)
         |   IN ('1','3','5','7','9','b','d','f') THEN x ELSE -x END),
         | 0L, (acc, x) -> acc + x) > 0 THEN ${1 << j} ELSE 0 END"""
        .stripMargin.replace("\n", "")
    val hofBucket = (0 until 8).map(j => expr(lshBitExpr(j))).reduce(_ + _)
    val d2 = emb.select(TextFunctions.lshBucket(col("v"), 8).as("k"),
      hofBucket.as("h")).filter(col("k") =!= col("h")).count()
    assert(d2 == 0)
  }

  test("SignedProjections ≡ folded ±getItem sums (q78's original form)") {
    // the exact folded-Column formulation q78 shipped before round 11
    // (the one that blew the 64 KB codegen method limit at 16 planes —
    // here only 4 planes so it compiles and serves as the reference)
    val planes = 4
    val dims = 64
    val md = java.security.MessageDigest.getInstance("MD5")
    val signs = Array.tabulate(planes, dims) { (j, i) =>
      val h = md.digest(s"p$j:$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 1) 1 else -1
    }
    val masks = signs.toSeq.map(_.zipWithIndex.foldLeft(0L) {
      case (m, (sgn, i)) => if (sgn > 0) m | (1L << i) else m
    })
    val folded = array((0 until planes).map { j =>
      (0 until dims).map { i =>
        val t = col("v").getItem(i)
        if (signs(j)(i) > 0) t else -t
      }.reduce(_ + _)
    }: _*)
    val v = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), v.as("v"))
    val d = emb.select(
      VectorFunctions.signedProjections(col("v"), masks).as("k"),
      folded.as("h")).filter(not(col("k") === col("h"))).count()
    assert(d == 0)
  }

  test("PrefixDots ≡ per-cut slice+aggregate HOFs (incl. short vectors)") {
    val cuts = Seq(8, 16, 32, 64)
    val hof = array(cuts.map { c =>
      expr(s"aggregate(zip_with(slice(a, 1, $c), slice(b, 1, $c)," +
        " (x, y) -> x * y), 0L, (acc, x) -> acc + x)")
    }: _*)
    val v = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(v.as("a"), reverse(v).as("b"))
    val d = emb.select(
      VectorFunctions.prefixDots(col("a"), col("b"), cuts).as("k"),
      hof.as("h")).filter(not(col("k") === col("h"))).count()
    assert(d == 0)
    // vectors shorter than the last cut: trailing cuts repeat the
    // full dot (slice past the end is the same prefix)
    import spark.implicits._
    val short = Seq((Seq(2L, 3L, 4L), Seq(5L, 6L, 7L)))
      .toDF("a", "b")
    val got = short.select(
      VectorFunctions.prefixDots(col("a"), col("b"), cuts))
      .collect().head.getSeq[Long](0)
    assert(got == Seq(56L, 56L, 56L, 56L))
  }

  test("OuterProducts ≡ flattened nested-transform HOF on real vectors") {
    val d = 64
    val hof = expr(s"flatten(transform(v, x -> transform(v, y -> x * y)))")
    val v = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val diff = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(v.as("v"))
      .select(VectorFunctions.outerProducts(col("v"), d).as("k"), hof.as("h"))
      .filter(not(col("k") === col("h"))).count()
    assert(diff == 0)
    // a short vector zero-pads the remaining cells
    import spark.implicits._
    val got = Seq(Tuple1(Seq(2L, 3L))).toDF("v")
      .select(VectorFunctions.outerProducts(col("v"), 3))
      .collect().head.getSeq[Long](0)
    assert(got == Seq(4L, 6L, 0L, 6L, 9L, 0L, 0L, 0L, 0L))
  }
}
