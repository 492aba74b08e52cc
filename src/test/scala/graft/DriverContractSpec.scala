package graft

/** Simulates the driver's interactions with SparkEntry: entry() smoke on a
  * plain session, every declared oracle having a matching query, and
  * query/oracle key discipline.
  */
class DriverContractSpec extends SparkTestBase {

  test("entry() returns rows on sf0.001 with a vanilla session (driver smoke)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every oracle key has a query; keys are stable identifiers") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
    assert(q.forall(_.matches("[a-z0-9_]+")))
    // every query carries an oracle — the approximate ANN entries emit
    // self-verifying recall summaries with closed-form oracles
    assert(q.diff(o) === Set.empty[String])
  }

  test("SURVEY.md's 'Full catalog: N query keys' matches SparkEntry.queries.size") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val m = """Full catalog:\s*(\d+) query keys, (\d+) DuckDB-oracled""".r
      .findFirstMatchIn(survey)
      .getOrElse(fail("SURVEY.md lacks the 'Full catalog: N query keys, N DuckDB-oracled' line"))
    assert(m.group(1).toInt === SparkEntry.queries.size,
      "SURVEY.md's catalog count drifted from SparkEntry.queries — update the prose")
    assert(m.group(2).toInt === SparkEntry.oracleSql.size,
      "SURVEY.md's oracled count drifted from SparkEntry.oracleSql — update the prose")
  }

  test("all queries execute against sf0.001 (cold smallest-SF run)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
      assert(n >= 0, name) // executes without throwing; row counts validated by oracles
    }
  }
}
