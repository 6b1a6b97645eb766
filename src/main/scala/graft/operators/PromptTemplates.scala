package graft.operators

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** X3 — prompt-template registry (SURVEY.md §2.9; reference
  * `prompt_templates.py:50-216`): YAML template files define the LLM
  * extraction's output schema (`fields`), per-field defaults, and the
  * two-message prompt (`system`, `user_template` with an `{abstract}`
  * placeholder).
  *
  * Driver-side only — the registry fixes X2's output StructType before
  * any executor work starts. The parser handles exactly the subset the
  * reference's templates use (scalars, `|` block scalars, string lists,
  * one-level nested maps); no YAML dependency exists in the offline
  * build, and the reference's files stay loadable as-is.
  */
object PromptTemplates {

  case class Template(templateType: String, name: String,
                      system: String, userTemplate: String,
                      fields: Seq[String],
                      defaults: Map[String, String]) {
    /** The reference's message build (`prompt_templates.py:128-133`):
      * system + user with the abstract substituted. */
    def messages(abstractText: String): Seq[(String, String)] = Seq(
      "system" -> system,
      "user" -> userTemplate.replace("{abstract}", abstractText))
  }

  /** Parse the template YAML subset — delegates to ConfigManager's
    * recursive parser (one YAML parser in the repo; the template files
    * are a strict subset of what it accepts). */
  def parseYaml(text: String): Map[String, Any] =
    ConfigManager.parseYaml(text)

  def fromYaml(text: String): Template = {
    val m = parseYaml(text)
    def str(k: String): String = m.get(k).map(_.toString).getOrElse("")
    Template(
      templateType = str("type"),
      name = str("name"),
      system = str("system"),
      userTemplate = str("user_template"),
      fields = m.get("fields").collect { case s: Seq[_] =>
        s.map(_.toString) }.getOrElse(Seq.empty),
      defaults = m.get("default_values").collect { case mm: Map[_, _] =>
        mm.map { case (k, v) => k.toString -> v.toString } }
        .getOrElse(Map.empty))
  }

  /** Load every .yaml in a directory into a type-keyed registry
    * (`prompt_templates.py:172-189`). Insertion-ordered (files sorted by
    * name) so `select`'s fallback-to-first is deterministic, and the
    * directory stream is closed (Files.list holds a file descriptor). */
  def loadDir(dir: String): Map[String, Template] = {
    val stream = Files.list(Paths.get(dir))
    val paths =
      try stream.iterator().asScala.toVector.sortBy(_.toString)
      finally stream.close()
    val entries = paths
      .filter(_.toString.endsWith(".yaml"))
      .map((p: Path) => fromYaml(Files.readString(p)))
      .map(t => t.templateType -> t)
    scala.collection.immutable.ListMap(entries: _*)
  }

  /** Factory with fallback-to-first-loaded (`prompt_templates.py:191-216`;
    * first = alphabetically-first file, made deterministic above). */
  def select(registry: Map[String, Template],
             templateType: String): Template =
    registry.getOrElse(templateType,
      registry.values.headOption.getOrElse(
        throw new IllegalStateException("empty template registry")))
}
