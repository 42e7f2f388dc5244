package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

/** Property tests: every regex-free kernel must agree with the
  * declarative (regex / collection) reference implementation on
  * ADVERSARIAL input — whitespace runs of every Java-`\s` character,
  * control chars, unicode, empties — not just the well-behaved bench
  * corpus. This is the contract that lets the kernels replace the
  * interpreted forms without an oracle gap. */
class KernelPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(gen) { a => f(a); true })
    assert(res.passed, res.status.toString)
  }

  /** Strings heavy in whitespace variants, digits, symbols, unicode. */
  private val nastyChar: Gen[Char] = Gen.frequency(
    6 -> Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r'),
    6 -> Gen.alphaChar,
    2 -> Gen.numChar,
    2 -> Gen.oneOf('!', '?', '.', ',', '@', '#', '\u0001', '\u007F'),
    1 -> Gen.oneOf('Ä', 'ß', 'É', 'λ', '中'))
  private val nastyString: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.stringOfN(n, nastyChar))

  private def refNorm(s: String): String =
    s.replaceAll("\\s+", " ").trim.toLowerCase(java.util.Locale.ROOT)

  test("normalize ≡ replaceAll/trim/toLowerCase on adversarial strings") {
    forAll(nastyString) { s =>
      assert(TextStatKernels.normalize(UTF8String.fromString(s)) ==
        refNorm(s), s"input=${s.map(_.toInt).mkString(",")}")
    }
  }

  test("wsTokenCount / bagNorm ≡ split-based references") {
    forAll(nastyString) { s =>
      val u = UTF8String.fromString(s)
      val toks = refNorm(s).split(" ", -1)
      assert(TextStatKernels.wsTokenCount(u) == toks.length.toLong)
      assert(TextStatKernels.bagNorm(u).toString ==
        toks.sorted.mkString(" "))
    }
  }

  test("bpeCount ≡ regex match count over the normal form") {
    val p = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9 ]")
    forAll(nastyString) { s =>
      val m = p.matcher(refNorm(s))
      var n = 0L
      while (m.find()) n += 1
      assert(TextStatKernels.bpeCount(UTF8String.fromString(s)) == n)
    }
  }

  test("repetitionStats agrees with brute-force counting") {
    forAll(nastyString) { s =>
      val st = TextStatKernels.repetitionStats(UTF8String.fromString(s))
      val toks = refNorm(s).split(" ", -1).toSeq
      def grams(n: Int) = toks.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq
      assert(st.getLong(0) == toks.length.toLong)
      assert(st.getLong(1) ==
        toks.groupBy(identity).values.map(_.length).max.toLong)
      val bi = grams(2)
      assert(st.getLong(2) == (if (bi.isEmpty) 0L
        else bi.groupBy(identity).values.map(_.length).max.toLong))
      val tri = grams(3)
      assert(st.getLong(3) == tri.length.toLong)
      assert(st.getLong(4) == tri.distinct.length.toLong)
    }
  }

  test("intersectCount ≡ set intersection size on distinct arrays") {
    val arrGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
      .map(_.distinct)
    forAll(Gen.zip(arrGen, arrGen)) { case (a, b) =>
      def ad(xs: List[String]) =
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          xs.map(x => UTF8String.fromString(x): Any).toArray)
      assert(TextStatKernels.intersectCount(ad(a), ad(b)) ==
        a.toSet.intersect(b.toSet).size.toLong)
    }
  }
}
