package graft

import graft.text.Robots

class RobotsSpec extends SparkTestBase {

  test("parse: groups, comments, blank lines, case, rules before UA ignored") {
    val txt =
      "# top comment\n" +
        "Disallow: /ignored-no-group\n" +
        "User-Agent: BotA\nUSER-AGENT: botb\n" +
        "Disallow: /a/ # trailing comment\n" +
        "Allow: /a/b\n" +
        "\n" + // blank line does NOT close the group
        "Crawl-Delay: 2.5\n" +
        "Sitemap: http://x/sitemap.xml\n" + // unknown key tolerated
        "User-agent: *\nDisallow:\n" // empty disallow = allow-all no-op
    val gs = Robots.parse(txt)
    assert(gs.length === 2)
    assert(gs(0).agents === Seq("bota", "botb"))
    assert(gs(0).rules === Seq((false, "/a/"), (true, "/a/b")))
    assert(gs(0).crawlDelay === Some(2.5))
    assert(gs(1).agents === Seq("*"))
    assert(gs(1).rules === Seq.empty) // the empty Disallow added no rule
  }

  test("matcher: wildcards, anchors, start anchoring") {
    assert(Robots.matches("/a/", "/a/b"))
    assert(!Robots.matches("/a/", "/b/a/")) // patterns anchor at path start
    assert(Robots.matches("/w*z", "/wxyz"))
    assert(Robots.matches("/w*z", "/wz"))
    assert(Robots.matches("/w*z", "/wzzz")) // prefix semantics past the match
    assert(!Robots.matches("/w*z", "/w"))
    assert(Robots.matches("/c$", "/c"))
    assert(!Robots.matches("/c$", "/cc"))
    assert(Robots.matches("/*.php$", "/x/y.php"))
    assert(!Robots.matches("/*.php$", "/x/y.php?q=1"))
    assert(Robots.matches("/a*b*c", "/a-b-c-d"))
    assert(!Robots.matches("/a*b*c", "/a-c-b"))
    // greedy-leftmost middles with an anchored tail
    assert(Robots.matches("/*ab*ab$", "/abab"))
    assert(!Robots.matches("/*aa*aa$", "/aaa"))
    assert(Robots.matches("", "/anything")) // degenerate empty pattern
  }

  test("matcher property: literal patterns (no * or $) are prefix tests (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab/.x"
    def str(): String =
      (0 until rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0 until 2000).foreach { _ =>
      val (pat, path) = (str(), str())
      assert(Robots.matches(pat, path) === path.startsWith(pat), s"pat='$pat' path='$path'")
    }
  }

  test("evaluate: specificity, merge, ties, wildcard group, delays") {
    val txt =
      "User-agent: graftbot\nUser-agent: newsbot\n" +
        "Disallow: /a/\nAllow: /a/b\nAllow: /t/\nCrawl-delay: 1.5\n" +
        "user-agent: graftbot\nDisallow: /c$\nDisallow: /t/\n" +
        "User-agent: graft\nDisallow: /short/\n" + // shorter prefix: must LOSE
        "User-agent: *\nDisallow: /\n"
    def d(agent: String, path: String) = Robots.evaluate(txt, agent, path)
    // longest pattern wins
    assert(d("graftbot", "/a/b/c") === Robots.Decision(true, "allow:/a/b", 1.5))
    assert(d("graftbot", "/a/x") === Robots.Decision(false, "disallow:/a/", 1.5))
    // same-agent groups merge across the file
    assert(d("graftbot", "/c") === Robots.Decision(false, "disallow:/c$", 1.5))
    // exact-length tie -> allow
    assert(d("graftbot", "/t/q") === Robots.Decision(true, "allow:/t/", 1.5))
    // the less specific 'graft' group is NOT merged in
    assert(d("graftbot", "/short/x").allowed)
    // but a bare 'graft' agent gets it
    assert(!d("graft", "/short/x").allowed)
    // partial group membership: newsbot shares group 1 only
    assert(d("newsbot", "/c").allowed)
    assert(!d("newsbot", "/a/x").allowed)
    // case-insensitive agent match
    assert(!d("GraftBot", "/a/x").allowed)
    // unmatched agent falls to *, whose group has no delay
    assert(d("randombot", "/a/x") === Robots.Decision(false, "disallow:/", null))
    // no matching rule -> allowed, null rule
    assert(d("graftbot", "/zz") === Robots.Decision(true, null, 1.5))
  }

  test("evaluate: no groups / no star group / empty text") {
    assert(Robots.evaluate("", "bot", "/x").allowed)
    assert(Robots.evaluate("User-agent: other\nDisallow: /", "bot", "/x").allowed)
    // delay parse failure is a missing delay, not a crash
    val g = Robots.parse("User-agent: a\nCrawl-delay: soon\nDisallow: /d/")
    assert(g.head.crawlDelay === None)
  }

  test("RobotsCheck expression: memo-backed kernel through the session + SQL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctionRegistry.register(spark)
    val robots = "User-agent: bot\nDisallow: /no/\nAllow: /no/yes\nCrawl-delay: 3"
    val df = Seq("/ok", "/no/way", "/no/yes/deep").toDF("path")
      .select(col("path"),
        graft.text.TextAnalysis.robotsCheck(lit(robots), lit("bot"), col("path")).as("r"))
      .select(col("path"), col("r.allowed"), col("r.rule"), col("r.crawl_delay"))
    val rows = df.collect().map(r => (r.getString(0), r.getBoolean(1),
      Option(r.getString(2)).orNull, r.getDouble(3))).sortBy(_._1)
    assert(rows === Array(
      ("/no/way", false, "disallow:/no/", 3.0),
      ("/no/yes/deep", true, "allow:/no/yes", 3.0),
      ("/ok", true, null, 3.0)))
    val viaSql = spark.sql(
      "SELECT robots_check('User-agent: *\nDisallow: /x', 'any', '/xy').allowed AS a").collect()
    assert(viaSql.head.getBoolean(0) === false)
  }
}
