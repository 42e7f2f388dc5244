package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q144 Poisson bootstrap — the properties that make a deterministic
  * resampler trustworthy: the md5-derived draws match an independent
  * JVM reimplementation (pinning the exact hash→weight chain both
  * engines share), the interval brackets the point estimate, and the
  * whole query is bit-stable across runs. */
class BootstrapCiSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  /** Independent reimplementation of the draw: 48-bit md5 prefix of
    * "doc:b" against the Poisson CDF thresholds. */
  private def drawWeight(docId: Long, b: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$docId:$b".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val u = java.lang.Long.parseLong(hex, 16)
    val k = Stats.PoissonCdfE48.indexWhere(u < _)
    if (k < 0) 8 else k
  }

  test("q144: resample means are the exact weighted means under the " +
      "pinned md5 draw chain") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bootstrap")
    val docs = Seq((1L, 100L), (2L, 200L), (7L, 400L), (40L, 1000L))
    docs.map { case (id, n) => (id, "x", "en", "t", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    // expected resample means from the independent draw chain
    val means = (0 until Stats.BootstrapB).flatMap { b =>
      val ws = docs.map { case (id, n) => (drawWeight(id, b), n) }
      val nw = ws.map(_._1).sum
      if (nw == 0) None
      else Some(ws.map { case (w, n) => w.toLong * n }.sum * 1000000L / nw)
    }.sorted
    // ranks over the SURVIVING resamples (zero-weight ones dropped;
    // with 4 docs P(all-zero) = e⁻⁴ per replicate, so some are)
    val lo = means(math.max(1, means.size * 25 / 1000) - 1)
    val hi = means(math.max(1, means.size * 975 / 1000) - 1)
    val r = Stats.q144BootstrapCi(s, dir.toString).collect().head
    assert(r.getLong(0) == Stats.BootstrapB.toLong)
    assert(r.getLong(1) == docs.length.toLong)
    assert(r.getLong(2) == docs.map(_._2).sum * 1000000L / docs.length)
    assert(r.getLong(3) == lo, s"ci_lo ${r.getLong(3)} != $lo")
    assert(r.getLong(4) == hi, s"ci_hi ${r.getLong(4)} != $hi")
  }

  test("q144: interval brackets the point estimate and is " +
      "deterministic across runs") {
    val a = Stats.q144BootstrapCi(s, sf).collect().head
    val b = Stats.q144BootstrapCi(s, sf).collect().head
    assert(a == b, "non-deterministic bootstrap")
    assert(a.getLong(3) <= a.getLong(2) && a.getLong(2) <= a.getLong(4),
      s"CI [${a.getLong(3)}, ${a.getLong(4)}] misses point " +
        s"${a.getLong(2)}")
    assert(a.getLong(3) < a.getLong(4), "degenerate interval")
  }
}
