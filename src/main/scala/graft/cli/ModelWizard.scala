package graft.cli

import java.io.{BufferedReader, PrintStream}

import graft.core.{JsonUtil, Registry}

/** The reference's interactive `create-model` dialog
  * (`src/cli/server/model/model_cli.rs:36-199`) re-expressed as a
  * teletype stdin/stdout wizard (the reference uses `dialoguer`
  * arrow-key menus; over a plain pipe the equivalent is numbered
  * selects). Same sequence and rules:
  *
  *   1. `Model Name:` — identifier grammar + must have a distinct
  *      plural (re-prompts with the error, like dialoguer's
  *      `validate_with`);
  *   2. `Storage Type:` — select (the reference offers only `json`);
  *   3. attribute loop: `Attribute Name:` (validated), `Data Type:`
  *      select over String/Integer/Float/Boolean/Array — `Array` asks
  *      `Array Type:` over the primitives and the attribute is NOT a
  *      primary-key candidate (`model_cli.rs:86-96`); the
  *      `add another attribute?` confirm is only offered once at least
  *      one key candidate exists (`model_cli.rs:117-127`);
  *   4. `Primary Key:` — select among non-array attributes;
  *   5. `Set required attributes:` — multi-select (comma-separated
  *      indices) over everything EXCEPT the primary key, which is
  *      auto-required and not unselectable (`model_cli.rs:140-144`).
  *
  * The reference comments `Float` out of its menu (`model_cli.rs:74`);
  * it is included here because this engine implements the Float type
  * end-to-end (capability extension, SURVEY §2.1).
  *
  * Returns the model-definition JSON; the caller validates it through
  * the same [[Registry.parseDefinition]] path as the flag-driven form
  * and writes `<out>/<name>.json`. IO is injected so specs can script
  * the dialog over a pipe.
  */
final class ModelWizard(in: BufferedReader, out: PrintStream) {

  private val Primitives = Seq("String", "Integer", "Float", "Boolean")

  /** Runs the dialog; returns the pretty model-definition JSON. */
  def run(): String = {
    val name = promptValidated("Model Name:", validateModelName)
    val storage = select("Storage Type:", Seq("json"))
    var attrs = Vector.empty[(String, String, Boolean)] // name, type-json, isArray
    var done = false
    while (!done) {
      val attrName = promptValidated("Attribute Name:", validateAttrName)
      val ty = select("Data Type:", Primitives :+ "Array")
      if (ty == "Array") {
        val inner = select("Array Type:", Primitives)
        attrs = attrs.filterNot(_._1 == attrName) :+
          ((attrName, "[" + JsonUtil.quote(inner) + "]", true))
      } else {
        attrs = attrs.filterNot(_._1 == attrName) :+
          ((attrName, JsonUtil.quote(ty), false))
      }
      // the dialog cannot end while no primary-key candidate exists
      if (attrs.exists(!_._3))
        done = !confirm("Do you want to add another attribute?")
    }
    val pkOpts = attrs.filterNot(_._3).map(_._1)
    val pk = select("Primary Key:", pkOpts)
    val requiredOpts = attrs.map(_._1).filterNot(_ == pk)
    val required = pk +: multiSelect("Set required attributes:", requiredOpts)
    s"""{
       |    "model_name": ${JsonUtil.quote(name)},
       |    "storage_type": ${JsonUtil.quote(storage)},
       |    "attributes": { ${attrs.map(a => JsonUtil.quote(a._1) + ": " + a._2).mkString(", ")} },
       |    "primary_key": ${JsonUtil.quote(pk)},
       |    "required": [ ${required.map(JsonUtil.quote).mkString(", ")} ]
       |}""".stripMargin
  }

  // ---- dialog primitives --------------------------------------------

  private def readLineOrFail(): String = {
    val l = in.readLine()
    if (l == null) throw new java.util.NoSuchElementException(
      "input ended mid-dialog")
    l.trim
  }

  private def promptValidated(prompt: String,
      validate: String => Either[String, Unit]): String = {
    var res: Option[String] = None
    while (res.isEmpty) {
      out.print(s"$prompt ")
      out.flush()
      val line = readLineOrFail()
      validate(line) match {
        case Right(()) => res = Some(line)
        case Left(err) => out.println(s"error: $err")
      }
    }
    res.get
  }

  /** Numbered select; empty input = default 0 (dialoguer's
    * `.default(0)`). */
  private def select(prompt: String, items: Seq[String]): String = {
    out.println(prompt)
    items.zipWithIndex.foreach { case (it, i) => out.println(s"  $i) $it") }
    var res: Option[String] = None
    while (res.isEmpty) {
      out.print("> ")
      out.flush()
      readLineOrFail() match {
        case "" => res = Some(items.head)
        case s if s.toIntOption.exists(i => i >= 0 && i < items.size) =>
          res = Some(items(s.toInt))
        case other => out.println(s"error: no item $other")
      }
    }
    res.get
  }

  /** Comma-separated indices; empty input = none selected. */
  private def multiSelect(prompt: String, items: Seq[String]): Seq[String] = {
    if (items.isEmpty) return Nil
    out.println(prompt)
    items.zipWithIndex.foreach { case (it, i) => out.println(s" [ ] $i) $it") }
    var res: Option[Seq[String]] = None
    while (res.isEmpty) {
      out.print("> ")
      out.flush()
      val line = readLineOrFail()
      if (line.isEmpty) res = Some(Nil)
      else {
        val idx = line.split(",").map(_.trim).toSeq
        if (idx.forall(s => s.toIntOption.exists(i => i >= 0 && i < items.size)))
          res = Some(idx.map(s => items(s.toInt)).distinct)
        else out.println("error: expected comma-separated indices")
      }
    }
    res.get
  }

  private def confirm(prompt: String): Boolean = {
    var res: Option[Boolean] = None
    while (res.isEmpty) {
      out.print(s"$prompt [y/n] ")
      out.flush()
      readLineOrFail().toLowerCase match {
        case "y" | "yes" => res = Some(true)
        case "n" | "no" => res = Some(false)
        case _ => out.println("error: expected y or n")
      }
    }
    res.get
  }

  // ---- validators (the same rules the flag path enforces via
  // Registry.parseDefinition; here they run per-field so the dialog
  // can re-prompt like the reference's dialoguer validators) ---------

  private def validateAttrName(s: String): Either[String, Unit] =
    // the dummy pk must itself satisfy the purely-alphabetic identifier
    // grammar; duplicate-key JSON (user typing "zzz") still parses
    probeDefinition(s"""{"model_name": "probe", "storage_type": "json",
      |"attributes": {${JsonUtil.quote(s)}: "Integer", "zzz": "Integer"},
      |"primary_key": "zzz", "required": ["zzz"]}""".stripMargin)

  private def validateModelName(s: String): Either[String, Unit] =
    probeDefinition(s"""{"model_name": ${JsonUtil.quote(s)},
      |"storage_type": "json", "attributes": {"id": "Integer"},
      |"primary_key": "id", "required": ["id"]}""".stripMargin)

  private def probeDefinition(json: String): Either[String, Unit] =
    Registry.parseDefinition(json).map(_ => ())
}
