package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConfigManager
import graft.operators.ConfigManager._

/** S7 — config load + defaulting vs the reference's config_manager.py
  * behavior (extension dispatch, full default tree, per-backend llm
  * resolution). */
class ConfigManagerSpec extends AnyFunSuite {

  private val sample = "/root/repo/fixtures/config/config_sample.yaml"

  test("parses the reference config.yaml.example shape: nesting, lists, " +
    "lists of maps, inline comments, typed scalars") {
    val conf = ConfigManager.load(sample)
    assert(getString(conf, "easyscholar_api_key") === "TEST_KEY")
    assert(getBoolean(conf, "journal_metrics.enabled"))
    assert(getSeq(conf, "journal_metrics.metrics_to_fetch") ===
      Seq("sciif", "sci", "sciUp"))
    assert(getString(conf, "journal_metrics.metrics_column_mapping.sciif")
      === "impact_factor")
    val sources = getSeq(conf, "sources")
    assert(sources.size === 2)
    val pubmed = sources.head.asInstanceOf[Conf]
    assert(pubmed("type") === "pubmed")
    assert(pubmed("path") === "data/input/pubmed-data.txt")
    assert(pubmed("enabled") === true)
    assert(sources(1).asInstanceOf[Conf]("enabled") === false)
    assert(getBoolean(conf, "output.separate_sheets"))
    assert(getLong(conf, "processing.batch_size") === 32L)
  }

  test("defaulting fills the reference tree and deep merge keeps loaded " +
    "values winning with sibling defaults intact") {
    val conf = ConfigManager.load(sample)
    // loaded wins
    assert(getDouble(conf, "llm.model_parameters.temperature") === 0.2)
    assert(getLong(conf, "llm.model_parameters.max_tokens") === 1024L)
    // omitted sibling gets the reference default
    assert(getDouble(conf, "llm.model_parameters.top_p") === 0.9)
    // untouched sections fully defaulted
    assert(getLong(conf, "processing.max_workers") === 4L)
    assert(getBoolean(conf, "processing.disable_summary") === false)
    assert(getString(conf, "llm.ollama_model") === "llama3")
    assert(getLong(conf, "llm.siliconflow_rpm") === 3000L)
  }

  test("an empty config defaults the entire tree " +
    "(config_manager.py:47-176)") {
    val conf = ConfigManager.applyDefaults(Map.empty)
    assert(getBoolean(conf, "journal_metrics.enabled"))
    assert(getSeq(conf, "journal_metrics.metrics_to_fetch").isEmpty)
    assert(getBoolean(conf, "llm.enabled") === false)
    assert(getString(conf, "llm.type") === "vllm")
    assert(getDouble(conf, "llm.model_parameters.temperature") === 0.7)
    assert(getLong(conf, "llm.model_parameters.max_tokens") === 4096L)
    assert(getLong(conf, "processing.batch_size") === 16L)
    assert(getString(conf, "prompt.default_type") === "medical")
  }

  test("JSON configs load through the same defaulting (extension " +
    "dispatch)") {
    val f = Files.createTempFile("graft_conf", ".json")
    Files.writeString(f,
      """{"llm": {"enabled": true, "type": "ollama",
        |         "ollama_model": "mistral"},
        | "processing": {"batch_size": 8}}""".stripMargin)
    val conf = ConfigManager.load(f.toString)
    assert(getBoolean(conf, "llm.enabled"))
    assert(getString(conf, "llm.ollama_model") === "mistral")
    assert(getLong(conf, "processing.batch_size") === 8L)
    assert(getDouble(conf, "llm.model_parameters.top_p") === 0.9) // default
  }

  test("unquoted scalar list items containing colons stay scalars") {
    val conf = ConfigManager.parseYaml(
      """endpoints:
        |  - http://example.com/a
        |  - 10:30
        |  - plain
        |""".stripMargin)
    assert(ConfigManager.getSeq(conf, "endpoints") ===
      Seq("http://example.com/a", "10:30", "plain"))
  }

  test("list-of-maps item keys follow the same grammar as top-level map " +
    "keys: dashes and quoted forms") {
    // pre-fix, `- file-path: ...` parsed as the scalar string
    // "file-path: a.csv" because the inline-map key grammar disallowed '-'
    val conf = ConfigManager.parseYaml(
      """sources:
        |  - file-path: a.csv
        |    source-type: wos
        |  - "quoted-key": b.txt
        |    kind: pubmed
        |""".stripMargin)
    val items = ConfigManager.getSeq(conf, "sources")
    assert(items.length === 2)
    assert(items(0) === Map("file-path" -> "a.csv", "source-type" -> "wos"))
    assert(items(1) === Map("quoted-key" -> "b.txt", "kind" -> "pubmed"))
  }

  test("list-item continuation lines accept colon-without-space values " +
    "exactly like map level") {
    val conf = ConfigManager.parseYaml(
      """sources:
        |  - name: a
        |    timeout:30
        |""".stripMargin)
    assert(ConfigManager.getSeq(conf, "sources") ===
      Seq(Map("name" -> "a", "timeout" -> 30L)))
  }

  test("dotted keys (log.level style) parse at map level, in list items " +
    "and in continuation lines") {
    val conf = ConfigManager.parseYaml(
      """log.level: debug
        |sources:
        |  - source.type: pubmed
        |    retry.max: 3
        |""".stripMargin)
    // dotted key is stored as a LITERAL key (path getters navigate by
    // dots, so access the raw map here)
    assert(conf("log.level") === "debug")
    assert(ConfigManager.getSeq(conf, "sources") ===
      Seq(Map("source.type" -> "pubmed", "retry.max" -> 3L)))
  }

  test("ollama routes to the OpenAI-compatible surface, not /api/chat") {
    val conf = ConfigManager.applyDefaults(Map("llm" -> Map(
      "type" -> "ollama")))
    val (cfg, model) = ConfigManager.llmHttpConfig(conf)
    assert(cfg.baseUrl === "http://localhost:11434/v1/chat/completions")
    assert(model === "llama3")
  }

  test("a key-less hosted backend is rejected (reference hard exit)") {
    intercept[IllegalArgumentException] {
      ConfigManager.applyDefaults(
        Map("llm" -> Map("type" -> "siliconflow")))
    }
  }

  test("property: rendered nested maps/lists round-trip through the " +
    "parser") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val key = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))
    val scalarV = Gen.oneOf(Gen.alphaNumStr.map(_.take(12)),
      Gen.choose(-999L, 999L).map(_.toString), Gen.oneOf("true", "false"))
    val leaf: Gen[Map[String, String]] =
      Gen.mapOf(Gen.zip(key, scalarV)).map(_.take(4))
    // a YAML emitter must QUOTE a string scalar whose plain rendering
    // would parse as a different value — e.g. alphaNumStr's occasional
    // leading-zero digit string "01" canonically parses as the integer 1
    // (this was a rare-seed flake until quoted here)
    def render(v: String): String =
      if (v.matches("-?\\d+") && BigInt(v).toString != v) "\"" + v + "\""
      else v
    val prop = forAll(Gen.mapOf(Gen.zip(key, leaf)).map(_.take(4))) { tree =>
      val yaml = tree.map { case (k, inner) =>
        s"$k:\n" + inner.map { case (ik, iv) =>
          s"  $ik: ${render(iv)}" }.mkString("\n")
      }.mkString("\n")
      val parsed = ConfigManager.parseYaml(yaml)
      tree.forall { case (k, inner) =>
        inner.isEmpty || // "k:" with nothing under it parses as ""
          inner.forall { case (ik, iv) =>
            ConfigManager.getString(parsed, s"$k.$ik") == iv
          }
      }
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200),
      prop)
    assert(result.passed, result.status.toString)
  }

  test("llmHttpConfig resolves backend endpoint, auth, model, and rate " +
    "budget from the llm section") {
    val (vllmCfg, vllmModel) = ConfigManager.llmHttpConfig(
      ConfigManager.load(sample))
    assert(vllmCfg.baseUrl === "http://127.0.0.1:8000/v1/chat/completions")
    assert(vllmCfg.apiKey.isEmpty) // empty key -> no auth header
    assert(vllmModel === "qwen")

    val hosted = ConfigManager.applyDefaults(Map("llm" -> Map(
      "type" -> "siliconflow", "siliconflow_api_key" -> "k",
      "siliconflow_rpm" -> 600L)))
    val (hc, hm) = ConfigManager.llmHttpConfig(hosted)
    assert(hc.baseUrl.endsWith("/chat/completions"))
    assert(hc.apiKey === Some("k"))
    assert(hc.ratePerSec === 10.0) // 600 rpm
    assert(hm === "deepseek-ai/DeepSeek-V3")
    // the DECLARED dual budget reaches the client config — without these
    // the DualBudget enforcement never engages for config-driven clients
    assert(hc.rpm === 600)
    assert(hc.tpm === 200000) // the reference's default siliconflow_tpm
  }

  test("zero-indent block sequences under a key parse as the key's " +
    "list (the 'fields:\\n- a\\n- b' YAML style), not as \"\"") {
    val conf = ConfigManager.parseYaml(
      "fields:\n- summary\n- methods\nother: 1\n")
    assert(ConfigManager.getSeq(conf, "fields") ===
      Seq("summary", "methods"))
    assert(ConfigManager.getLong(conf, "other") === 1L)
    // nested form: same-indent sequence under a nested key
    val nested = ConfigManager.parseYaml(
      "llm:\n  fields:\n  - a\n  - b\n  model: m\n")
    assert(ConfigManager.getSeq(nested, "llm.fields") === Seq("a", "b"))
    assert(ConfigManager.getString(nested, "llm.model") === "m")
  }

  test("an apostrophe inside a bare scalar does not swallow the " +
    "trailing comment; quoted strings still protect their hashes") {
    val conf = ConfigManager.parseYaml(
      "name: O'Brien  # maintainer\ntag: \"a # not-a-comment\"  # real\n")
    assert(ConfigManager.getString(conf, "name") === "O'Brien")
    assert(ConfigManager.getString(conf, "tag") === "a # not-a-comment")
    // the '' escape form still parses as a quoted string
    val esc = ConfigManager.parseYaml("who: 'O''Brien'  # c\n")
    assert(ConfigManager.getString(conf, "name") === "O'Brien")
    assert(ConfigManager.getString(esc, "who").startsWith("O"))
  }
}
