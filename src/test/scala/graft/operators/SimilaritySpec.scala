package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** dedup_embedding scale-shape and recall: the banded-LSH candidate
  * stage must never materialize all pairs (no cartesian in the plan),
  * and — the property a dedup pass actually needs — PLANTED near-dups
  * at cos ≈ 0.999 must be recovered through the banding. On a
  * random-vector corpus (top pair cosine only ≈ 0.5, far below any
  * dedup threshold) band collisions are rare BY DESIGN with 20-bit
  * bands — random candidates ≈ 6·n²/2²¹ is exactly the linearity the
  * sf10 gate demanded; that case only pins determinism and shape. */
class SimilaritySpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val s = SparkSpec.spark

  test("q78: projection is linear and uses the shared sign convention") {
    import s.implicits._
    // proj is a fixed linear map: proj(2v) must be exactly 2*proj(v),
    // and proj(e_0) must equal the md5("p<j>:0")-parity sign itself
    // (the lshBucket/planeBitSql convention) — ±1 in milli-space 1000
    val dir = java.nio.file.Files.createTempDirectory("q78")
    val v = Array.tabulate(64)(i => (i % 7).toFloat / 1000f)
    val e0 = Array.tabulate(64)(i => if (i == 0) 0.001f else 0f)
    Seq((1L, v, 0), (2L, v.map(_ * 2), 0), (3L, e0, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    val rows = Similarity.q78RandomProjection(s, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.size == 3 * Similarity.ProjDims)
    (0L until Similarity.ProjDims.toLong).foreach { j =>
      assert(rows((2L, j)) == 2 * rows((1L, j)), s"plane $j not linear")
      assert(math.abs(rows((3L, j))) == 1L, s"plane $j basis-vector image")
    }
  }

  test("dedup_embedding plan has no cartesian / broadcast nested loop") {
    val plan = Similarity.dedupEmbedding(s, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("dedup_embedding: planted near-dups at cos≈0.999 are recovered") {
    import s.implicits._
    // 100 random base vectors + 20 tiny-perturbation copies: the
    // copies are the only true near-dups (cos ≈ 0.999); every planted
    // pair must survive the 6×20-bit banding (predicted recall
    // ≈ 1 - (1 - 0.9857^20)^6 ≈ 0.9998 at this similarity)
    val rnd = new scala.util.Random(42)
    val dim = 64
    val baseVecs = (0 until 100).map { i =>
      (i.toLong, "b", Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }
    val dups = (0 until 20).map { j =>
      val v = baseVecs(j)._3.clone()
      v(j % dim) += 0.01f
      ((100 + j).toLong, "d", v)
    }
    val dir = java.nio.file.Files.createTempDirectory("planted-emb")
    (baseVecs ++ dups).toDF("vec_id", "label", "embedding")
      .write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    val pairs = Similarity.dedupEmbedding(s, dir.toString)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 20).map(j => (j.toLong, (100 + j).toLong)).toSet
    val found = planted.count(pairs.contains)
    assert(found >= 18, s"planted recall $found/20 through the banding")
  }

  test("dedup_embedding: deterministic, distinct, bounded output on " +
      "the random corpus") {
    // a random corpus has (almost) no true near-dups, and 20-bit bands
    // admit almost no random collisions — so the output is SMALL here
    // (that selectivity is the scale property); it must still be
    // ≤ limit, duplicate-free, and bit-stable across runs
    val banded = Similarity.dedupEmbedding(s, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(banded.length <= 50 && banded.nonEmpty)
    assert(banded.distinct.length == banded.length)
    // run-to-run determinism (hash partitioning / band order must not
    // leak into the result)
    val again = Similarity.dedupEmbedding(s, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(banded.sameElements(again))
  }
}
