package graft

import graft.ops.Graph
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** PageRank on graphs small enough to hand-verify, plus the
  * registered-domain PSL cascade branch by branch.
  */
class GraphSpec extends SparkTestBase {

  private def ranks(edges: Seq[(String, String)], iters: Int = 10): Map[String, Double] = {
    import spark.implicits._
    Graph.pagerank(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("pagerank: symmetric cycle is uniform, total mass 1") {
    // a -> b -> c -> a: perfectly symmetric, rank must stay exactly uniform
    val r = ranks(Seq("a" -> "b", "b" -> "c", "c" -> "a"))
    assert(r.size === 3)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("pagerank: star concentrates on the hub; mass conserved with a dangling hub") {
    // three spokes all link to hub; hub has NO out-edges (dangling)
    val r = ranks(Seq("s1" -> "hub", "s2" -> "hub", "s3" -> "hub"))
    assert(r("hub") > r("s1"))
    assert(r("s1") === r("s2") && r("s2") === r("s3")) // identical by symmetry
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // dangling mass redistributed, not leaked
  }

  test("pagerank: matches a hand-rolled reference iteration") {
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a", "d" -> "a")
    // d is a pure source; every node has out-edges except none — no dangling here
    val nodes = Seq("a", "b", "c", "d")
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var ref = nodes.map(_ -> 0.25).toMap
    for (_ <- 1 to 10) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => ref(s) / out(s) }.sum).toMap
      val dangling = nodes.filterNot(out.contains).map(ref).sum
      ref = nodes.map(n =>
        n -> (0.15 / 4 + 0.85 * (contrib.getOrElse(n, 0.0) + dangling / 4))).toMap
    }
    val r = ranks(edges)
    nodes.foreach(n => assert(math.abs(r(n) - ref(n)) < 1e-12, s"node $n"))
  }

  test("pagerank: multi-edges collapse; validation rejects bad params") {
    // duplicate a->b must count once: identical to the deduped graph
    val dup = ranks(Seq("a" -> "b", "a" -> "b", "b" -> "a"))
    val ded = ranks(Seq("a" -> "b", "b" -> "a"))
    assert(dup === ded)
    import spark.implicits._
    val df = Seq("a" -> "b").toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pagerank(df, iterations = 0))
    intercept[IllegalArgumentException](Graph.pagerank(df, damping = 1.0))
  }

  test("registeredDomain: every PSL cascade branch") {
    import spark.implicits._
    val cases = Seq(
      ("news.bbc.co.uk", "bbc.co.uk"), // 2-label ccTLD registry
      ("a.b.github.io", "b.github.io"), // private registry
      ("media.s3.amazonaws.com", "media.s3.amazonaws.com"), // 3-label suffix + registrant
      ("x.blogspot.co.uk", "x.blogspot.co.uk"), // 3-label suffix + registrant
      ("co.uk", null), // bare suffix
      ("github.io", null), // bare private suffix
      ("localhost", null), // single label
      ("192.168.0.1", null), // IPv4 literal
      ("foo.bar.unknowntld", "bar.unknowntld"), // PSL default * rule
      ("a.b.c.d.example.com", "example.com"), // deep chain collapses
      ("WWW.Example.CO.UK:8080", "example.co.uk"), // port + case fold
      ("example.com.", "example.com")) // trailing dot
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), TextAnalysis.registeredDomain(col("host")).as("rd"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1)).orNull).toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"host $h: got ${got(h)}, want $want")
    }
  }
}
