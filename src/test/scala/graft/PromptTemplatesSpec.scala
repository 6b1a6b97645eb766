package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PromptTemplates

/** X3 registry over the fixture template (same structure as the
  * reference's YAML templates: scalars, block scalars, list, nested map). */
class PromptTemplatesSpec extends AnyFunSuite {

  private val tpl = PromptTemplates.fromYaml(
    java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/repo/fixtures/template_sample.yaml")))

  test("scalar, list and nested-map fields parse") {
    assert(tpl.templateType === "bibliographic")
    assert(tpl.name === "Bibliographic abstract analysis")
    assert(tpl.fields === Seq("summary", "methods"))
    assert(tpl.defaults === Map("summary" -> "", "methods" -> "not stated"))
  }

  test("block scalars keep inner structure incl. blank lines and braces") {
    assert(tpl.system.startsWith("You are a literature analysis assistant."))
    assert(tpl.userTemplate.contains("{abstract}"))
    assert(tpl.userTemplate.contains("\"methods\": \"study methods\""))
  }

  test("messages substitute the abstract into the user template") {
    val msgs = tpl.messages("THE ABSTRACT TEXT")
    assert(msgs.head._1 === "system")
    assert(msgs(1)._2.contains("THE ABSTRACT TEXT"))
    assert(!msgs(1)._2.contains("{abstract}"))
  }

  test("registry select falls back to first template for unknown type") {
    val reg = PromptTemplates.loadDir("/root/repo/fixtures")
    assert(reg.contains("bibliographic"))
    assert(PromptTemplates.select(reg, "nope").templateType === "bibliographic")
    assert(PromptTemplates.select(reg, "bibliographic") === tpl)
  }
}
