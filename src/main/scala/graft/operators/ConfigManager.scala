package graft.operators

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** S7 — configuration manager (reference `config_manager.py:7-180`):
  * load a YAML or JSON config file (dispatched on extension, like the
  * reference), then fill the reference's full defaulting tree —
  * journal_metrics / llm (incl. per-backend endpoint defaults and
  * model_parameters) / processing / prompt. Driver-side only; nothing
  * here touches executors.
  *
  * The YAML subset parser is RECURSIVE (indentation-scoped): nested maps
  * to any depth, lists of scalars, lists of flat maps (the `sources:`
  * shape), `|`/`|-` block scalars, quoted/bare scalars with typed
  * booleans/longs/doubles, and `#` comments outside quotes. That covers
  * the reference's `config.yaml.example` and every prompt template file;
  * PromptTemplates delegates here so the repo has ONE parser. No YAML
  * library exists in the offline build — and the subset is small enough
  * that a dependency would be the bigger liability.
  */
object ConfigManager {

  type Conf = Map[String, Any]

  // ---- YAML subset parser ---------------------------------------------------

  private case class Line(raw: String, indent: Int, content: String)

  /** Strip a `#` comment that sits outside single/double quotes and is
    * either at the start or preceded by whitespace. A quote only OPENS
    * a string when it can start a scalar (line start, after `:`, `-`,
    * `,`, `[`, or an adjacent quote — the `''` escape); an apostrophe
    * inside a bare scalar (`name: O'Brien  # x`) is plain text and must
    * not swallow the comment. */
  private def stripComment(s: String): String = {
    var inD = false; var inS = false
    var prevNonWs: Char = 0 // 0 = line start
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      def opens = prevNonWs == 0 || prevNonWs == ':' ||
        prevNonWs == '-' || prevNonWs == ',' || prevNonWs == '[' ||
        prevNonWs == c
      c match {
        case '"' if inD => inD = false
        case '"' if !inS && opens => inD = true
        case '\'' if inS => inS = false
        case '\'' if !inD && opens => inS = true
        case '#' if !inD && !inS &&
          (i == 0 || s.charAt(i - 1).isWhitespace) =>
          return s.substring(0, i)
        case _ => ()
      }
      if (!c.isWhitespace) prevNonWs = c
      i += 1
    }
    s
  }

  private def unquote(s: String): Any = {
    val t = s.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
      (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1) // quoted: always a string
    else t match {
      case "true" => true
      case "false" => false
      // toLongOption: an unquoted numeric wider than Long (a 23-digit
      // key) must stay a STRING, not kill the whole config load
      case _ if t.matches("-?\\d+") =>
        t.toLongOption.getOrElse(t): Any
      case _ if t.matches("-?\\d+\\.\\d+") => t.toDouble
      case _ => t
    }
  }

  def parseYaml(text: String): Conf = {
    val raw = text.split("\n", -1)
    val lines = raw.map { l =>
      val c = stripComment(l)
      Line(l, c.takeWhile(_ == ' ').length, c.trim)
    }
    def isBlank(i: Int) = lines(i).content.isEmpty

    /** Block scalar: consume raw lines more indented than the key (or
      * blank), strip the block's own minimum indent, rejoin. */
    def parseBlock(start: Int, keyIndent: Int, keep: Boolean): (String, Int) = {
      var j = start
      val buf = collection.mutable.Buffer[String]()
      while (j < lines.length &&
        (raw(j).trim.isEmpty ||
          raw(j).takeWhile(_ == ' ').length > keyIndent)) {
        buf += raw(j)
        j += 1
      }
      while (buf.nonEmpty && buf.last.trim.isEmpty) buf.remove(buf.length - 1)
      val nonBlank = buf.filter(_.trim.nonEmpty)
      val strip =
        if (nonBlank.isEmpty) 0
        else nonBlank.map(_.takeWhile(_ == ' ').length).min
      val body = buf.map(l => if (l.length >= strip) l.substring(strip) else l)
        .mkString("\n")
      (if (keep && body.nonEmpty) body + "\n" else body, j)
    }

    def parseNode(start: Int, indent: Int): (Any, Int) = {
      // dispatch on the first NON-BLANK content line and use ITS indent:
      // a top-level list behind a comment/blank line, or a uniformly
      // indented document, would otherwise fall into parseMap(0,0) and
      // silently parse to an empty map (every default would win)
      var first = start
      while (first < lines.length && lines(first).content.isEmpty)
        first += 1
      if (first >= lines.length) (Map.empty[String, Any], first)
      else if (lines(first).content.startsWith("- "))
        parseList(first, lines(first).indent)
      else {
        // the TOP-level call adopts the document's own base indent;
        // internal calls already pass their content line's indent
        val mapIndent =
          if (start == 0 && indent == 0) lines(first).indent else indent
        parseMap(first, mapIndent)
      }
    }

    def parseList(start: Int, indent: Int): (Seq[Any], Int) = {
      val items = collection.mutable.Buffer[Any]()
      var i = start
      while (i < lines.length &&
        (isBlank(i) || (lines(i).indent == indent &&
          lines(i).content.startsWith("- ")))) {
        if (isBlank(i)) i += 1
        else {
          val rest = lines(i).content.substring(2).trim
          // a map item needs ": " (or trailing ":") after the key — YAML
          // mandates the space, and without this check scalar items
          // containing a colon ("- http://x", "- 10:30") would misparse
          // as single-entry maps. The key grammar is the SAME as
          // parseMap's keyLine (dashes allowed, quoted forms allowed) —
          // a narrower grammar here silently parsed `- my-source: x`
          // items as scalar strings instead of maps.
          // the INLINE key (on the "- " line itself) requires YAML's
          // space-after-colon so scalar items containing colons
          // ("- http://x", "- 10:30") stay scalars; CONTINUATION lines
          // below the dash have no scalar ambiguity and use parseMap's
          // exact keyLine grammar (value side included — "timeout:30" is
          // accepted there just like at map level)
          val itemKey =
            "^(\"[^\"]+\"|'[^']+'|[A-Za-z_][A-Za-z0-9_.-]*):(|\\s.*)$".r
          val contKey =
            "^(\"[^\"]+\"|'[^']+'|[A-Za-z_][A-Za-z0-9_.-]*):\\s*(.*)$".r
          rest match {
            case itemKey(k, v) =>
              // list of maps: first pair inline on the "- " line, the rest
              // on following lines indented past the dash (the `sources:`
              // shape)
              val m = collection.mutable.LinkedHashMap[String, Any](
                unquote(k).toString -> unquote(v))
              var j = i + 1
              while (j < lines.length && (isBlank(j) ||
                (lines(j).indent > indent &&
                  !lines(j).content.startsWith("- ")))) {
                if (!isBlank(j)) {
                  lines(j).content match {
                    case contKey(k2, v2) => m(unquote(k2).toString) = unquote(v2)
                    case other =>
                      // a continuation line matching no key grammar would
                      // be DROPPED — misparsed config must be visible, not
                      // silently absent (the easyscholar key shape bug
                      // class)
                      org.slf4j.LoggerFactory.getLogger(getClass).warn(
                        s"config list item: dropping unparseable " +
                          s"continuation line '$other'")
                  }
                }
                j += 1
              }
              items += m.toMap
              i = j
            case _ =>
              items += unquote(rest)
              i += 1
          }
        }
      }
      // a trailing blank run beyond the list belongs to the parent
      (items.toSeq, i)
    }

    def parseMap(start: Int, indent: Int): (Conf, Int) = {
      val out = collection.mutable.LinkedHashMap[String, Any]()
      var i = start
      // bare or quoted keys ("sciif": v — the metrics-mapping shape);
      // bare keys admit dots (log.level-style config keys), same grammar
      // as the list-item/continuation keys
      val keyLine =
        ("^(\"[^\"]+\"|'[^']+'|[A-Za-z_][A-Za-z0-9_.-]*):\\s*(.*)$").r
      while (i < lines.length &&
        (isBlank(i) || lines(i).indent >= indent)) {
        if (isBlank(i)) i += 1
        else if (lines(i).indent > indent ||
          !keyLine.pattern.matcher(lines(i).content).matches()) {
          // same visibility rule as the list-continuation branch: a
          // skipped line means a config value is silently absent
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"config map: dropping unparseable line " +
              s"'${lines(i).content}'")
          i += 1
        }
        else {
          val m = keyLine.findFirstMatchIn(lines(i).content).get
          val key = unquote(m.group(1)).toString
          val rest = m.group(2).trim
          if (rest == "|" || rest == "|-") {
            val (body, j) = parseBlock(i + 1, indent, keep = rest == "|")
            out(key) = body
            i = j
          } else if (rest.isEmpty) {
            // nested node if the next content line is deeper — OR a
            // block sequence at the SAME indent as the key, the common
            // zero-indent "key:\n- a\n- b" YAML style (a map never
            // holds bare "- " entries itself, so the dash can only be
            // this key's sequence); else ""
            var j = i + 1
            while (j < lines.length && isBlank(j)) j += 1
            if (j < lines.length && (lines(j).indent > indent ||
                (lines(j).indent == indent &&
                  lines(j).content.startsWith("- ")))) {
              val (node, k) = parseNode(j, lines(j).indent)
              out(key) = node
              i = k
            } else {
              out(key) = ""
              i += 1
            }
          } else {
            out(key) = unquote(rest)
            i += 1
          }
        }
      }
      (out.toMap, i)
    }

    parseNode(0, 0)._1 match {
      case m: Map[_, _] => m.asInstanceOf[Conf]
      case other => Map("value" -> other)
    }
  }

  // ---- JSON loading (extension dispatch, reference lines 34-41) -------------

  private def jsonToScala(n: JsonNode): Any =
    if (n.isObject) {
      val it = n.properties().iterator()
      val m = collection.mutable.LinkedHashMap[String, Any]()
      while (it.hasNext) { val e = it.next(); m(e.getKey) = jsonToScala(e.getValue) }
      m.toMap
    }
    else if (n.isArray) (0 until n.size()).map(i => jsonToScala(n.get(i)))
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else if (n.isNull) null
    else n.asText()

  def load(path: String): Conf = {
    val text = Files.readString(Paths.get(path))
    val parsed =
      if (path.endsWith(".yaml") || path.endsWith(".yml")) parseYaml(text)
      else jsonToScala(new ObjectMapper().readTree(text)) match {
        case m: Map[_, _] => m.asInstanceOf[Conf]
        case _ => throw new IllegalArgumentException(
          s"config root must be a map: $path")
      }
    applyDefaults(parsed)
  }

  // ---- defaulting tree (reference lines 47-176) -----------------------------

  /** The reference's full default tree, applied by deep merge (loaded
    * values win; nested maps merge key-wise). Values mirror
    * `config_manager.py:47-176` exactly, including the per-backend
    * endpoint defaults. */
  val referenceDefaults: Conf = Map(
    "journal_metrics" -> Map(
      "enabled" -> true,
      "metrics_to_fetch" -> Seq.empty[Any],
      "metrics_column_mapping" -> Map.empty[String, Any]),
    "llm" -> Map(
      "enabled" -> false,
      "type" -> "vllm",
      "vllm_api_url" -> "http://localhost:8000/v1/completions",
      "vllm_api_key" -> "",
      "vllm_model" -> "qwen",
      "siliconflow_api_key" -> "",
      "siliconflow_base_url" -> "https://api.siliconflow.cn/v1",
      "siliconflow_model" -> "deepseek-ai/DeepSeek-V3",
      "siliconflow_rpm" -> 3000L,
      "siliconflow_tpm" -> 200000L,
      "ollama_api_url" -> "http://localhost:11434/api",
      "ollama_model" -> "llama3",
      "ollama_api_key" -> "",
      "model_parameters" -> Map(
        "temperature" -> 0.7,
        "top_p" -> 0.9,
        "max_tokens" -> 4096L)),
    "processing" -> Map(
      "disable_summary" -> false,
      "batch_size" -> 16L,
      "max_workers" -> 4L),
    "prompt" -> Map(
      "default_type" -> "medical",
      "templates_dir" -> "config/prompts"))

  def deepMerge(defaults: Conf, loaded: Conf): Conf = {
    val keys = defaults.keys ++ loaded.keys
    keys.map { k =>
      k -> ((defaults.get(k), loaded.get(k)) match {
        case (Some(d: Map[_, _]), Some(l: Map[_, _])) =>
          deepMerge(d.asInstanceOf[Conf], l.asInstanceOf[Conf])
        case (_, Some(l)) => l
        case (Some(d), None) => d
        case _ => throw new IllegalStateException("unreachable")
      })
    }.toMap
  }

  def applyDefaults(conf: Conf): Conf = {
    val merged = deepMerge(referenceDefaults, conf)
    // the one hard validation the reference enforces (lines 112-114): a
    // key-less hosted backend cannot work at all
    if (getString(merged, "llm.type").toLowerCase == "siliconflow")
      require(getString(merged, "llm.siliconflow_api_key").nonEmpty,
        "llm.type=siliconflow requires llm.siliconflow_api_key")
    merged
  }

  // ---- dotted-path accessors ------------------------------------------------

  def get(conf: Conf, path: String): Option[Any] =
    path.split("\\.").foldLeft(Option[Any](conf)) {
      case (Some(m: Map[_, _]), k) => m.asInstanceOf[Conf].get(k)
      case _ => None
    }

  def getString(conf: Conf, path: String): String =
    get(conf, path).map(_.toString).getOrElse("")
  def getBoolean(conf: Conf, path: String): Boolean =
    get(conf, path).exists { case b: Boolean => b; case s => s == "true" }
  def getLong(conf: Conf, path: String): Long = get(conf, path) match {
    case Some(l: Long) => l
    case Some(d: Double) => d.toLong
    case Some(s: String) if s.matches("-?\\d+") => s.toLong
    case _ => 0L
  }
  def getDouble(conf: Conf, path: String): Double = get(conf, path) match {
    case Some(d: Double) => d
    case Some(l: Long) => l.toDouble
    case Some(s: String) if s.matches("-?\\d+(\\.\\d+)?") => s.toDouble
    case _ => 0.0
  }
  def getSeq(conf: Conf, path: String): Seq[Any] = get(conf, path) match {
    case Some(s: Seq[_]) => s
    case _ => Seq.empty
  }

  // ---- bridge into the production clients -----------------------------------

  /** Resolve the `llm` section into an (HttpConfig, model) pair for
    * `HttpClients.HttpLlmClient`, dispatching on `llm.type` exactly like
    * the reference's client factory (`llm_api.py` backend selection):
    * url/key/model come from the per-backend keys; hosted backends get
    * their request budget as a token-bucket rate (rpm/60) AND the
    * declared rpm/tpm dual budget (config_manager.py:121-125 defaults
    * them to 3000/200000), so `External.DualBudget` enforcement
    * engages for config-driven clients — not just hand-built ones. */
  def llmHttpConfig(conf: Conf): (HttpClients.HttpConfig, String) = {
    def key(k: String): Option[String] = {
      val v = getString(conf, s"llm.$k")
      if (v.isEmpty) None else Some(v)
    }
    getString(conf, "llm.type").toLowerCase match {
      case "siliconflow" =>
        (HttpClients.HttpConfig(
          baseUrl = getString(conf, "llm.siliconflow_base_url")
            .stripSuffix("/") + "/chat/completions",
          apiKey = key("siliconflow_api_key"),
          ratePerSec = getLong(conf, "llm.siliconflow_rpm") / 60.0,
          rpm = getLong(conf, "llm.siliconflow_rpm").toInt,
          tpm = getLong(conf, "llm.siliconflow_tpm").toInt),
          getString(conf, "llm.siliconflow_model"))
      case "ollama" =>
        // route to the server's OpenAI-compatible surface (/v1/chat/
        // completions), NOT the native /api/chat — the native endpoint
        // streams NDJSON and answers {"message":{"content":...}}, which
        // the chat-completions client would silently read as ""
        (HttpClients.HttpConfig(
          baseUrl = getString(conf, "llm.ollama_api_url")
            .stripSuffix("/").stripSuffix("/api") + "/v1/chat/completions",
          apiKey = key("ollama_api_key")),
          getString(conf, "llm.ollama_model"))
      case _ =>
        // same routing fix as ollama: HttpLlmClient speaks the CHAT
        // completions protocol ({"messages":[...]} in,
        // choices[0].message.content out); the reference default URL is
        // the legacy /v1/completions, which rejects that payload (or
        // answers choices[0].text, read as "") — every row would
        // silently degrade to JsonRepair defaults
        (HttpClients.HttpConfig(
          baseUrl = {
            val raw = getString(conf, "llm.vllm_api_url").stripSuffix("/")
            if (raw.endsWith("/v1/chat/completions")) raw
            else raw.stripSuffix("/v1/completions").stripSuffix("/v1") +
              "/v1/chat/completions"
          },
          apiKey = key("vllm_api_key")),
          getString(conf, "llm.vllm_model"))
    }
  }
}
