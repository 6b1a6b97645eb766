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

  /** Parse the template YAML subset: top-level `key: value` scalars
    * (quoted or bare), `key: |` block scalars, `key:` + `- item` lists,
    * and `key:` + indented `k: v` maps. */
  def parseYaml(text: String): Map[String, Any] = {
    val lines = text.split("\n")
    val out = collection.mutable.LinkedHashMap[String, Any]()
    var i = 0
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
        (t.head == '\'' && t.last == '\''))) t.substring(1, t.length - 1)
      else t
    }
    val keyLine = "^([A-Za-z_][A-Za-z0-9_]*):\\s*(.*)$".r
    while (i < lines.length) {
      val line = lines(i)
      keyLine.findFirstMatchIn(line) match {
        case Some(m) if !line.startsWith(" ") =>
          val key = m.group(1)
          val rest = m.group(2).trim
          if (rest == "|" || rest == "|-") {
            // block scalar: subsequent lines indented >=2 (or blank inside
            // the block), until the next non-indented non-empty line
            val block = collection.mutable.Buffer[String]()
            var j = i + 1
            while (j < lines.length &&
              (lines(j).startsWith("  ") || lines(j).trim.isEmpty)) {
              block += lines(j).stripPrefix("  ")
              j += 1
            }
            while (block.nonEmpty && block.last.trim.isEmpty)
              block.remove(block.length - 1)
            val body = block.mkString("\n")
            out(key) = if (rest == "|-") body else body + "\n"
            i = j - 1
          } else if (rest.isEmpty) {
            // list or nested map follows
            val items = collection.mutable.Buffer[String]()
            val nested = collection.mutable.LinkedHashMap[String, String]()
            var j = i + 1
            while (j < lines.length &&
              (lines(j).startsWith(" ") || lines(j).trim.isEmpty)) {
              val t = lines(j).trim
              if (t.startsWith("- ")) items += unquote(t.substring(2))
              else if (t.nonEmpty && t.contains(":")) {
                val Array(k, v) = t.split(":", 2)
                nested(k.trim) = unquote(v)
              }
              j += 1
            }
            out(key) = if (items.nonEmpty) items.toSeq else nested.toMap
            i = j - 1
          } else out(key) = unquote(rest)
        case _ => ()
      }
      i += 1
    }
    out.toMap
  }

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
