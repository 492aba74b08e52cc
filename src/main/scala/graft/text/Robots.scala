package graft.text

/** robots.txt (Robots Exclusion Protocol, RFC 9309) parsing + rule
  * evaluation — the crawl-politeness primitive a URL census joins
  * against before any fetch is scheduled.
  *
  * Semantics implemented (the RFC 9309 / Google-parser consensus):
  *
  *  - **Groups**: consecutive `User-agent:` lines form one group header;
  *    the first rule line closes the header. Blank lines are NOT
  *    significant (RFC 9309 dropped the old blank-line-delimits-records
  *    reading); `#` starts a comment; keys are case-insensitive.
  *  - **Group selection**: a group matches when its agent token is a
  *    case-insensitive PREFIX of the crawler's product token, or is
  *    `*`. The most specific (longest) named match wins; ALL groups
  *    tied at that specificity merge, in document order (RFC 9309 §2.2.1
  *    — rules for one agent may be split across the file). `*` groups
  *    apply only when no named group matches.
  *  - **Rule precedence**: among rules whose path pattern matches, the
  *    LONGEST pattern (octet length, the RFC's specificity measure)
  *    wins; an exact tie is resolved in favor of `allow`. No matching
  *    rule = allowed. An empty `Disallow:` is a no-op (the classic
  *    "allow everything" form).
  *  - **Patterns**: `*` matches any byte run; `$` anchors the pattern
  *    end when it is the pattern's LAST byte (elsewhere it is literal).
  *    Patterns implicitly anchor at the path start.
  *  - **Crawl-delay**: non-standard but ubiquitous; taken from the first
  *    selected group that declares one (document order).
  *
  * Percent-encoding normalization is NOT applied — callers should
  * canonicalize paths the way they canonicalize their census
  * ([[TextAnalysis.canonicalUrl]]); a parser-side decode would have to
  * guess which side is encoded.
  */
object Robots {

  final case class Group(
      agents: Seq[String],
      rules: Seq[(Boolean, String)], // (isAllow, pattern), document order
      crawlDelay: Option[Double])

  /** (allowed, winning rule or null, crawl delay or null). */
  final case class Decision(allowed: Boolean, rule: String, crawlDelay: java.lang.Double)

  def parse(robots: String): Seq[Group] = {
    val groups = Seq.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[(Boolean, String)]
    var delay: Option[Double] = None
    var inHeader = true
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
    }
    robots.split("\n", -1).foreach { raw =>
      val noComment = { val h = raw.indexOf('#'); if (h < 0) raw else raw.substring(0, h) }
      val line = noComment.trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!inHeader) { flush(); inHeader = true }
              if (value.nonEmpty) agents :+= value.toLowerCase(java.util.Locale.ROOT)
            case "allow" | "disallow" =>
              inHeader = false
              // rules before any user-agent line are ignored (RFC);
              // an empty pattern matches nothing (classic allow-all)
              if (agents.nonEmpty && value.nonEmpty)
                rules :+= ((key == "allow", value))
            case "crawl-delay" =>
              inHeader = false
              if (agents.nonEmpty && delay.isEmpty)
                delay = value.toDoubleOption
            case _ => () // sitemap etc.: tolerated, not modeled
          }
        }
      }
    }
    flush()
    groups.result()
  }

  /** Greedy leftmost wildcard match: pattern anchors at path START;
    * `*` = any run; trailing `$` = end anchor. Leftmost placement of the
    * middle segments is optimal — matching a middle later only consumes
    * more path, never less, so it cannot turn a failure into a success.
    */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val segs = pat.split("\\*", -1)
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    var k = 1
    while (k < segs.length - 1) {
      val s = segs(k)
      if (s.nonEmpty) {
        val j = path.indexOf(s, pos)
        if (j < 0) return false
        pos = j + s.length
      }
      k += 1
    }
    if (segs.length == 1) !anchored || pos == path.length
    else {
      val last = segs(segs.length - 1)
      if (anchored) path.length - last.length >= pos && path.endsWith(last)
      else last.isEmpty || path.indexOf(last, pos) >= 0
    }
  }

  /** Evaluate `agent`'s access to `path` under `robots`. */
  def evaluate(robots: String, agent: String, path: String): Decision =
    evaluate(parse(robots), agent, path)

  /** [[evaluate]] over pre-parsed groups — the per-row entry point for
    * [[graft.functions.RobotsCheckKernel]], whose memo amortizes the
    * parse across a host's many census rows.
    */
  def evaluate(groups: Seq[Group], agent: String, path: String): Decision = {
    val token = agent.toLowerCase(java.util.Locale.ROOT)
    val named = groups.filter(g => g.agents.exists(a => a != "*" && token.startsWith(a)))
    val selected =
      if (named.nonEmpty) {
        val best = named.flatMap(_.agents.filter(a => a != "*" && token.startsWith(a)))
          .map(_.length).max
        named.filter(_.agents.exists(a => a != "*" && token.startsWith(a) && a.length == best))
      } else groups.filter(_.agents.contains("*"))
    val delay: java.lang.Double =
      selected.flatMap(_.crawlDelay).headOption.map(Double.box).orNull
    val applicable = selected.flatMap(_.rules).filter { case (_, pat) => matches(pat, path) }
    if (applicable.isEmpty) Decision(allowed = true, rule = null, delay)
    else {
      // longest pattern wins; exact tie -> allow
      val (isAllow, pat) = applicable.maxBy { case (a, p) => (p.length, a) }
      Decision(isAllow, (if (isAllow) "allow:" else "disallow:") + pat, delay)
    }
  }
}
