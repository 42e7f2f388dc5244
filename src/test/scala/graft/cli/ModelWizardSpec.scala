package graft.cli

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{AttrType, PrimitiveType, Registry}

/** Drives the interactive create-model dialog over a scripted pipe and
  * checks the reference's dialog rules (model_cli.rs:36-199): per-field
  * re-prompt on invalid input, array attributes excluded from the
  * primary-key candidates, the "add another?" confirm withheld until a
  * pk candidate exists, pk auto-required and absent from the
  * required-multiselect, defaults on empty input.
  */
class ModelWizardSpec extends AnyFunSuite {

  /** Runs the wizard over scripted input lines; returns (json, transcript). */
  private def drive(lines: String*): (String, String) = {
    // every line newline-terminated: a trailing empty answer must reach
    // readLine as "" rather than vanishing into EOF
    val in = new BufferedReader(new StringReader(lines.map(_ + "\n").mkString))
    val bytes = new ByteArrayOutputStream()
    val out = new PrintStream(bytes, true, "UTF-8")
    val json = new ModelWizard(in, out).run()
    (json, bytes.toString("UTF-8"))
  }

  test("happy path: primitive pk + array attribute, default storage") {
    val (json, _) = drive(
      "user",   // Model Name:
      "",       // Storage Type: default 0 = json
      "id",     // Attribute Name:
      "1",      // Data Type: Integer
      "y",      // add another?
      "tags",   // Attribute Name:
      "4",      // Data Type: Array
      "0",      // Array Type: String
      "n",      // add another?
      "0",      // Primary Key: id
      ""        // required multiselect: none beyond pk
    )
    val m = Registry.parseDefinition(json).toOption.get
    assert(m.modelName.raw == "user")
    assert(m.storageType == "json")
    assert(m.primaryKey == "id")
    assert(m.required == Vector("id"))
    assert(m.attrType("id").contains(AttrType.Primitive(PrimitiveType.PInteger)))
    assert(m.attrType("tags").contains(AttrType.ArrayOf(PrimitiveType.PString)))
  }

  test("invalid model name re-prompts with the validation error") {
    val (json, transcript) = drive(
      "9bad", "user",       // first name rejected, second accepted
      "", "id", "1", "n", "0", "")
    assert(transcript.contains("error:"))
    assert(Registry.parseDefinition(json).toOption.get.modelName.raw == "user")
  }

  test("array-only model cannot end: confirm withheld until a pk candidate exists") {
    // after "tags" (Array) there is NO y/n in the script — the wizard
    // must go straight back to "Attribute Name:"; if it wrongly asked
    // the confirm it would consume "id" as a y/n answer and diverge
    val (json, transcript) = drive(
      "post", "",
      "tags", "4", "0",     // Array[String] — not a pk candidate
      "id", "1",            // now a candidate exists
      "n",
      "0",                  // Primary Key: only candidate is id
      "0")                  // required: select tags
    val m = Registry.parseDefinition(json).toOption.get
    assert(m.primaryKey == "id")
    assert(m.required.sorted == Vector("id", "tags"))
    // pk select offered exactly the non-array attribute
    val pkSection = transcript.split("Primary Key:")(1)
      .split("Set required attributes:")(0)
    assert(pkSection.contains("id") && !pkSection.contains("tags"))
  }

  test("pk is auto-required and not offered in the required multiselect") {
    val (json, transcript) = drive(
      "item", "",
      "sku", "0",           // String
      "y",
      "qty", "1",           // Integer
      "n",
      "0",                  // pk = sku
      "")                   // select none
    val m = Registry.parseDefinition(json).toOption.get
    assert(m.required == Vector("sku"))
    val reqSection = transcript.split("Set required attributes:")(1)
    assert(reqSection.contains("qty") && !reqSection.contains("sku"))
  }

  test("re-entered attribute name replaces the earlier definition") {
    val (json, _) = drive(
      "doc", "",
      "id", "0",            // String first
      "y",
      "id", "1",            // redefined as Integer
      "n",
      "0", "")
    val m = Registry.parseDefinition(json).toOption.get
    assert(m.attributes.map(_._1) == Vector("id"))
    assert(m.attrType("id").contains(AttrType.Primitive(PrimitiveType.PInteger)))
  }

  test("out-of-range select and malformed confirm re-prompt") {
    val (json, transcript) = drive(
      "thing", "",
      "id", "9", "1",       // 9 invalid -> re-prompt -> Integer
      "maybe", "n",         // invalid confirm -> re-prompt
      "0", "")
    assert(transcript.contains("error: no item 9"))
    assert(transcript.contains("error: expected y or n"))
    assert(Registry.parseDefinition(json).isRight)
  }

  test("input ending mid-dialog fails loudly") {
    intercept[java.util.NoSuchElementException] {
      drive("user", "", "id")
    }
  }
}
