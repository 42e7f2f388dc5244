package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hand-computed semantics for the Pipeline3 block: packing math on a
  * crafted corpus, MERGE latest-wins/delete/insert law on the real
  * table, planted-near-dup recovery through the SemDeDup sorted
  * neighborhood, and exact dup-span counts on a crafted overlap. */
class Pipeline3Spec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p3-docs")
    rows.map { case (id, text, lang) =>
      (id, text, lang, "src", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q66: greedy overflow packing lands docs by running offset") {
    // doc_ids ≡ 0 (mod 8) → one (lang, shard) chain; token counts
    // 300/300/300/100 against budget 512 ⇒ offsets 0/300/600/900 ⇒
    // sequences 0/0/1/1
    val words = (n: Int) => Seq.fill(n)("w").mkString(" ")
    val dir = docsDir(Seq(
      (0L, words(300), "en"), (8L, words(300), "en"),
      (16L, words(300), "en"), (24L, words(100), "en")))
    val rows = Pipeline3.q66Pack(s, dir)
      .select("seq", "n_docs", "n_tokens", "first_doc", "last_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rows === Seq((0L, 2L, 600L, 0L, 8L), (1L, 2L, 400L, 16L, 24L)))
  }

  test("q67: latest change wins, deletes drop, inserts land, " +
      "untouched rows pass through") {
    import s.implicits._
    val base = graft.Tables.load(s, sf, "orders")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Pipeline3.q67CdcMerge(s, sf)
      .select($"o_orderkey", $"price_cents").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    base.keys.foreach { k =>
      k % 7 match {
        case 0L => assert(merged(k) === base(k) + 200000L, s"key $k: seq-2 update must win")
        case 1L => assert(!merged.contains(k), s"key $k: latest op is D")
        case 2L => assert(merged(-k - 1) === base(k), s"insert for $k")
          assert(merged(k) === base(k), s"source row of an insert is untouched")
        case _ => assert(merged(k) === base(k), s"key $k untouched")
      }
    }
    val nDel = base.keys.count(_ % 7 == 1)
    val nIns = base.keys.count(_ % 7 == 2)
    assert(merged.size === base.size - nDel + nIns)
  }

  test("q68: a planted near-dup pair surfaces at the top of the " +
      "evidence list") {
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 64
    val baseVecs = (0 until 100).map { i =>
      (i.toLong, i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }
    val dup = {
      val v = baseVecs(40)._3.clone(); v(3) += 0.01f
      Seq((100L, 40, v))
    }
    val dir = java.nio.file.Files.createTempDirectory("p3-emb")
    (baseVecs ++ dup).toDF("vec_id", "label", "embedding")
      .write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    val top = Pipeline3.q68SemDedup(s, dir.toString)
      .select("vec_id", "best_cos_e6").collect()
    // the pair lands in one cluster, adjacent in centroid-cos order;
    // the later-ranked member reports the other as its best match
    assert(top.nonEmpty)
    val first = top.minBy(r => -r.getLong(1))
    assert(Set(40L, 100L).contains(first.getLong(0)), first.toString)
    assert(first.getLong(1) >= 990000L, s"planted cos was ${first.getLong(1)}")
  }

  test("q69: shared 8-gram spans count exactly; unique docs report 0") {
    // A and B share their first 8 tokens (1 of each doc's 2 grams);
    // C is disjoint (3 grams, none duplicated)
    val dir = docsDir(Seq(
      (1L, "a b c d e f g h i", "en"),
      (2L, "a b c d e f g h x", "en"),
      (3L, "p q r s t u v w y z", "en")))
    val rows = Pipeline3.q69DupSpans(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(rows === Seq((1L, 2L, 1L, 50L), (2L, 2L, 1L, 50L),
      (3L, 3L, 0L, 0L)))
  }

  test("q80: duplicated spans are cut, overlapping marks merge, " +
      "unique docs survive verbatim") {
    // docs 1/2 share exactly their first 8 tokens → island [1,8],
    // kept text is the 9th token; doc 3 is untouched; docs 4/5 share
    // 9 tokens → grams [1,8] and [2,9] overlap → merged island [1,9]
    val dir = docsDir(Seq(
      (1L, "a b c d e f g h i", "en"),
      (2L, "a b c d e f g h x", "en"),
      (3L, "p q r s t u v w y z", "en"),
      (4L, "m n o p q r s t u zz", "en"),
      (5L, "m n o p q r s t u ww", "en")))
    val rows = Pipeline3.q80DedupCut(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(rows === Seq(
      (1L, 9L, 8L, "i"), (2L, 9L, 8L, "x"),
      (3L, 10L, 0L, "p q r s t u v w y z"),
      (4L, 10L, 9L, "zz"), (5L, 10L, 9L, "ww")))
  }

  test("q81: weighted sample draws K docs, keys match the E-S " +
      "definition, and the sample is length-biased") {
    val out = Pipeline3.q81WeightedSample(s, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === Pipeline3.SampleK)
    assert(out.map(_._3).toSeq === out.map(_._3).sortBy(identity).toSeq,
      "keys must arrive ascending")
    // recompute one key from the written definition (md5 hex → 24-bit
    // uniform → quantized exponential race), independently of Spark
    val (id, w, key) = out.head
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 6)
    val u = (java.lang.Long.parseLong(hex, 16) + 1) / 16777217.0d
    assert(key === math.round(1e9 * -math.log(u) / w))
    // inclusion probability ∝ token count ⇒ the sample must skew long.
    // At a 100-of-500 sampling fraction the without-replacement bias
    // is modest (measured 1.13× on this corpus); 1.05× is the
    // direction check with headroom against data regeneration.
    import s.implicits._
    val corpusMean = graft.Tables.load(s, sf, "documents")
      .select(size(graft.operators.TextAnalysis.tokens($"text")))
      .as[Int].collect().map(_.toDouble).sum / 500
    val sampleMean = out.map(_._2.toDouble).sum / out.length
    assert(sampleMean > corpusMean * 1.05,
      s"sample mean $sampleMean vs corpus mean $corpusMean")
  }

  test("q84: the curation funnel composes — exact dups elect one " +
      "survivor, low-quality docs drop, shared spans are cut") {
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val dir = docsDir(Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12", "en"),
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12", "en"), // exact dup
      (3L, s"$shared b1 b2 b3 b4", "en"),
      (4L, s"$shared c1 c2 c3 c4", "en"),
      (5L, "w w w w w w w w w w w w", "en"),  // ttr 8% < 30 → dropped
      (6L, "too short here now", "en")))      // 4 tokens < 10 → dropped
    val rows = Pipeline3.q84CurationFunnel(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(t => (t._1, t._2, t._3, t._4)).toSet ===
      Set((1L, 12L, 0L, 12L), (3L, 12L, 8L, 4L), (4L, 12L, 8L, 4L)))
    val keys = rows.map(_._5).toSeq
    assert(keys === keys.sorted, "sample keys must arrive ascending")
  }

  test("q73: DSIR weighting — hand-computed ratios, target-only grams") {
    // Corpus: the:raw=4,tgt=2 → 500000; cat/dog:1/1 → 1000000;
    // le/chat: tgt=0 → excluded (contribute 0 via the left join).
    // doc1 = doc2 = 500000+1000000; doc4 (fr, shares "the" twice) =
    // 2×500000; doc3 (fully out-of-domain) = 0.
    val dir = docsDir(Seq(
      (1L, "the cat", "en"), (2L, "the dog", "en"),
      (3L, "le chat", "fr"), (4L, "the the chat", "fr")))
    val rows = Pipeline3.q73DsirWeight(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 1500000L, 2L -> 1500000L,
      3L -> 0L, 4L -> 1000000L))
  }

  test("q75: bigram LM scoring — hand-computed probabilities and means") {
    // uni: a=4 b=4 z=1; bi: "a b"=3 → 3e6 div 4 = 750000,
    // "b a"=2 → 2e6 div 4 = 500000. doc1 mean = 2e6 div 3 = 666666;
    // doc3 (single token) surfaces as (0, 0), never dropped.
    val dir = docsDir(Seq(
      (1L, "a b a b", "en"), (2L, "a b", "en"),
      (3L, "z", "en"), (4L, "b a", "en")))
    val rows = Pipeline3.q75LmScore(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 3L, 666666L), (2L, 1L, 750000L),
      (3L, 0L, 0L), (4L, 1L, 500000L)))
  }

  test("q77: hand-computed cohort frequencies and drift ordering") {
    import s.implicits._
    // A={src1: "a a b"} tot_a=3, B={src15: "a c"} tot_b=2; drifts:
    // c |0-500000|, b |333333-0|, a |666666-500000| — c, b, a order
    val dir = java.nio.file.Files.createTempDirectory("q77")
    Seq((1L, "a a b", "en", "src1", 5L), (2L, "a c", "en", "src15", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val rows = Pipeline3.q77CorpusDrift(s, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(rows == Seq(("c", 0L, 1L, 500000L), ("b", 1L, 0L, 333333L),
      ("a", 2L, 1L, 166666L)))
  }

  test("q66/q68 windows are partitioned; q67/q69 plan no cartesian") {
    import graft.tools.PlanAudit
    // q68's codebook-assignment BNLJ (broadcast 32-row centroid table,
    // same shape as ann_ivf) is the INTENDED plan — allowlisted in
    // PlanAudit.intendedNonEqui; everything else in the block must be
    // equi-join only.
    Seq("q66_pack" -> Pipeline3.q66Pack _,
        "q67_cdc_merge" -> Pipeline3.q67CdcMerge _,
        "q68_semdedup" -> Pipeline3.q68SemDedup _,
        "q69_dup_spans" -> Pipeline3.q69DupSpans _,
        "q80_dedup_cut" -> Pipeline3.q80DedupCut _,
        "q81_weighted_sample" -> Pipeline3.q81WeightedSample _,
        "q84_curation_funnel" -> Pipeline3.q84CurationFunnel _,
        "q73_dsir_weight" -> Pipeline3.q73DsirWeight _,
        "q75_lm_score" -> Pipeline3.q75LmScore _,
        "q77_corpus_drift" -> Pipeline3.q77CorpusDrift _).foreach {
      case (name, fn) =>
        val a = PlanAudit.of(fn(s, sf))
        val bnljOk = !a.bnlj || PlanAudit.intendedNonEqui(name)
        assert(!a.cartesian && bnljOk && !a.globalWindow,
          s"$name: cartesian=${a.cartesian} bnlj=${a.bnlj} " +
            s"globalWindow=${a.globalWindow}")
    }
  }
}
