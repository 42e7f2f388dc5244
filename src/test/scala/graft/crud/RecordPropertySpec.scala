package graft.crud

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Property tests for the strict record validator — the reference has
  * no property-based coverage (SURVEY §5), so this is the rebuild's
  * cheap win: every structurally-valid record parses and round-trips
  * through JSON; every type-violating mutation is rejected.
  */
class RecordPropertySpec extends AnyFunSuite {

  /** scalatest+scalacheck bridge is not in the offline cache; run
    * properties through ScalaCheck's own runner. */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100),
      Prop.forAll(gen) { a => f(a); true })
    assert(res.passed, res.status.toString)
  }

  val movie: ModelDefinition = Registry.parseDefinition(
    """{"model_name":"movie","storage_type":"json",
      |"attributes":{"id":"Integer","name":"String","year":"Integer",
      |"actors":["String"],"recommended":"Boolean"},
      |"primary_key":"id","required":["id","name","recommended"]}"""
      .stripMargin.replace("\n", "")).toOption.get

  // printable strings without JSON-breaking chars handled by quoting
  private val genStr: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '"', '\\', 'ü', '道')))
      .map(_.mkString)

  private case class Rec(id: Long, name: String, year: Option[Long],
      actors: Option[List[String]], recommended: Boolean)

  private val genRec: Gen[Rec] = for {
    id <- Arbitrary.arbitrary[Long]
    name <- genStr
    year <- Gen.option(Arbitrary.arbitrary[Long])
    actors <- Gen.option(Gen.listOf(genStr))
    rec <- Arbitrary.arbitrary[Boolean]
  } yield Rec(id, name, year, actors, rec)

  private def json(r: Rec): String = {
    val parts = Seq(
      s""""id":${r.id}""",
      s""""name":${JsonUtil.quote(r.name)}""",
      s""""year":${r.year.map(_.toString).getOrElse("null")}""",
      s""""actors":${r.actors.map(_.map(JsonUtil.quote).mkString("[", ",", "]"))
        .getOrElse("null")}""",
      s""""recommended":${r.recommended}""")
    parts.mkString("{", ",", "}")
  }

  test("every well-typed record parses, null-pads, and round-trips") {
    forAll(genRec) { r =>
      val parsed = Records.parseRecord(json(r), movie)
      assert(parsed.isRight, s"${json(r)} -> $parsed")
      val rec = Records.addNullValues(parsed.toOption.get, movie)
      assert(rec("id") == TrueValue.Prim(PrimValue.IntVal(r.id)))
      assert(rec("name") == TrueValue.Prim(PrimValue.StrVal(r.name)))
      // serialization round-trip: toJson → parseRecord → same record
      val reparsed = Records.parseRecord(Records.toJson(rec, movie), movie)
      assert(reparsed.map(Records.addNullValues(_, movie)) == Right(rec))
    }
  }

  test("wrong-typed values are always rejected") {
    // stringify the id (Integer → String violation)
    forAll(genRec) { r =>
      val bad = json(r).replaceFirst("\"id\":(-?\\d+)", "\"id\":\"$1\"")
      assert(Records.parseRecord(bad, movie).isLeft)
    }
    // boolean as string
    forAll(genRec) { r =>
      val bad = json(r).replace(s""""recommended":${r.recommended}""",
        s""""recommended":"${r.recommended}"""")
      assert(Records.parseRecord(bad, movie).isLeft)
    }
    // unknown attribute injected
    forAll(genRec) { r =>
      val bad = json(r).dropRight(1) + ""","director":"x"}"""
      assert(Records.parseRecord(bad, movie).isLeft)
    }
  }

  test("missing or null required attributes are always rejected") {
    forAll(genRec) { r =>
      val noName = json(r).replaceFirst(""""name":[^,]*,""", "")
      assert(Records.parseRecord(noName, movie).isLeft)
      val nullName = json(r).replaceFirst(""""name":[^,]*,""", """"name":null,""")
      assert(Records.parseRecord(nullName, movie).isLeft)
    }
  }

  test("identifier grammar acceptance is exactly the four casings") {
    val valid = Gen.oneOf("movie", "movieTitle", "MovieTitle",
      "movie_title", "movie-title", "m")
    forAll(valid)(n => assert(ModelValidation.validAttrName(n)))
    val invalid = Gen.oneOf("Movie_title", "movie-Title", "9movie",
      "_movie", "movie title", "", "mövie", "movie2")
    forAll(invalid)(n => assert(!ModelValidation.validAttrName(n)))
  }
}
