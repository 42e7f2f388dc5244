package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class InflectSpec extends AnyFunSuite {
  test("regular plural/singular: movie") {
    assert(Inflect.pluralize("movie") == "movies")
    assert(Inflect.singularize("movies") == "movie")
    assert(Inflect.singularize("movie") == "movie")
    assert(Inflect.pluralize("movies") == "movies")
  }
  test("snake vocabulary collides after pluralize+camelize") {
    assert(ModelName("cloned_movie").pluralCamel == "clonedMovies")
    assert(ModelName("cloned_movies").pluralCamel == "clonedMovies")
  }
  test("yoga has no plural variant (uncountable)") {
    assert(Inflect.pluralize("yoga") == "yoga")
    assert(Inflect.singularize("yoga") == "yoga")
  }
  test("casing") {
    assert(Inflect.camelize("cloned_movie") == "clonedMovie")
    assert(Inflect.pascalize("cloned_movie") == "ClonedMovie")
    assert(Inflect.camelize("Movie") == "movie")
    assert(Inflect.pascalize("movie") == "Movie")
  }
}

class CoreSpec extends AnyFunSuite {

  val movieJson: String =
    """{
      |  "model_name": "movie",
      |  "storage_type": "json",
      |  "attributes": {
      |    "id": "Integer", "name": "String", "year": "Integer",
      |    "actors": ["String"], "recommended": "Boolean"
      |  },
      |  "primary_key": "id",
      |  "required": ["id", "name", "recommended"]
      |}""".stripMargin

  test("canonical movie model parses with correct schema") {
    val m = Registry.parseDefinition(movieJson).toOption.get
    assert(m.modelName.raw == "movie")
    assert(m.primaryKey == "id")
    val s = m.schema
    assert(!s("id").nullable && !s("name").nullable && !s("recommended").nullable)
    assert(s("year").nullable && s("actors").nullable)
    assert(s("id").dataType.typeName == "long")
    assert(s("actors").dataType.typeName == "array")
  }

  // FIXTURES.md §2 — the invalid-model gauntlet
  def reject(json: String, clue: String): Unit =
    assert(Registry.parseDefinition(json).isLeft, clue)

  test("array primary key rejected") {
    reject(movieJson.replace("\"id\": \"Integer\"", "\"id\": [\"Integer\"]"),
      "pk must not be Array")
  }
  test("nonexistent primary key rejected") {
    reject(movieJson.replace("\"primary_key\": \"id\"",
      "\"primary_key\": \"nonexistent\""), "pk must exist")
  }
  test("pk not required rejected") {
    reject(movieJson.replace("[\"id\", \"name\", \"recommended\"]",
      "[\"name\", \"recommended\"]"), "pk must be required")
  }
  test("required attr that doesn't exist rejected") {
    reject(movieJson.replace("[\"id\", \"name\", \"recommended\"]",
      "[\"id\", \"name\", \"recommended\", \"ghost\"]"), "required must exist")
  }
  test("invalid storage type rejected") {
    reject(movieJson.replace("\"json\"", "\"invalid\""), "storage enum")
  }
  test("multivalued array type rejected") {
    reject(movieJson.replace("[\"String\"]", "[\"String\", \"Integer\"]"),
      "array type is exactly one primitive")
  }
  test("model with no plural variant rejected") {
    reject(movieJson.replace("\"movie\"", "\"yoga\""), "singular == plural")
  }
  test("invalid identifier grammar rejected") {
    reject(movieJson.replace("\"movie\"", "\"Movie2\""), "digits not allowed")
    reject(movieJson.replace("\"name\": \"String\"", "\"Bad_Name\": \"String\""),
      "mixed case with underscore not allowed")
  }
  test("non-JSON input rejected") { reject("no json", "not JSON") }

  test("Float type accepted (capability extension)") {
    val m = Registry.parseDefinition(
      movieJson.replace("\"year\": \"Integer\"", "\"year\": \"Float\""))
    assert(m.isRight)
    assert(m.toOption.get.schema("year").dataType.typeName == "double")
  }

  test("registry drops plural-camel duplicates and keeps survivors") {
    val dir = Files.createTempDirectory("models")
    def write(name: String, content: String): Unit =
      Files.writeString(dir.resolve(name), content)
    write("movie.json", movieJson)
    write("dup1.json", movieJson.replace("\"movie\"", "\"movie_clone\""))
    write("dup2.json", movieJson.replace("\"movie\"", "\"movie_clone\""))
    write("inf1.json", movieJson.replace("\"movie\"", "\"cloned_movie\""))
    write("inf2.json", movieJson.replace("\"movie\"", "\"cloned_movies\""))
    write("no json.json", "no json")
    write("yoga.json", movieJson.replace("\"movie\"", "\"yoga\""))
    val reg = Registry.load(dir).toOption.get
    assert(reg.all.map(_.modelName.raw) == Vector("movie"),
      s"expected exactly movie to survive, got ${reg.all.map(_.modelName.raw)}")
  }

  test("lookup by inflection; singular addressing enforced") {
    val dir = Files.createTempDirectory("models2")
    Files.writeString(dir.resolve("movie.json"), movieJson)
    val reg = Registry.load(dir).toOption.get
    assert(reg.lookup("movies").isRight)
    assert(reg.lookup("movie").isRight)
    assert(reg.lookupSingular("movie").isRight)
    assert(reg.lookupSingular("movies").isLeft)
    assert(reg.lookup("book").isLeft)
  }

  test("empty registry is an error") {
    val dir = Files.createTempDirectory("models3")
    Files.writeString(dir.resolve("no json.json"), "no json")
    assert(Registry.load(dir).isLeft)
  }
}
