package graft

import graft.functions.vec
import org.apache.spark.sql.functions._

/** Mirrors the reference's distance/algebra unit tests:
  * `/root/reference/index/space/native_impl_test.go:11,26,41` and
  * `/root/reference/math/vector_test.go`.
  */
class VectorFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def pair(a: Seq[Float], b: Seq[Float]) =
    Seq((a, b)).toDF("a", "b")

  private def one(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column): Double =
    df.select(c.cast("double")).as[Double].head()

  test("euclidean distance matches native_impl_test.go:11") {
    assert(one(pair(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)), vec.distEuclidean($"a", $"b")) === 0.0)
    assert(one(pair(Seq(1f, 2f, 2f), Seq(0f, 0f, 0f)), vec.distEuclidean($"a", $"b")) === 3.0)
  }

  test("manhattan distance matches native_impl_test.go:26") {
    assert(one(pair(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)), vec.distManhattan($"a", $"b")) === 0.0)
    assert(one(pair(Seq(1f, 2f, 3f), Seq(0f, 0f, 0f)), vec.distManhattan($"a", $"b")) === 6.0)
  }

  test("cosine distance matches native_impl_test.go:41 (with space.go:73 abs)") {
    assert(math.abs(one(pair(Seq(1f, 1f), Seq(1f, 1f)), vec.distCosine($"a", $"b"))) <= 1e-5)
    assert(math.abs(1 - one(pair(Seq(0f, 1f), Seq(1f, 0f)), vec.distCosine($"a", $"b"))) <= 1e-5)
    assert(math.abs(2 - one(pair(Seq(-1f, 0f), Seq(1f, 0f)), vec.distCosine($"a", $"b"))) <= 1e-5)
  }

  test("SIMD distance expression agrees with the exact fold within relative tolerance (all metrics)") {
    val rnd = new scala.util.Random(97)
    val rows = Seq.fill(200)((Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b").select($"a".cast("array<float>").as("a"), $"b".cast("array<float>").as("b"))
    Seq("euclidean", "manhattan", "cosine").foreach { metric =>
      val bad = df.select(
          vec.distSimd($"a", $"b", metric).as("s"),
          vec.dist($"a", $"b", metric).as("x"))
        .where(org.apache.spark.sql.functions.abs($"s" - $"x") >
          org.apache.spark.sql.functions.lit(1e-4) * org.apache.spark.sql.functions.abs($"x") +
            org.apache.spark.sql.functions.lit(1e-9))
        .count()
      assert(bad === 0L, s"$metric: $bad rows outside tolerance (simd=${graft.core.DistKernel.isSimd})")
    }
  }

  test("dot and norm match math/vector.go:75-85") {
    assert(one(pair(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)), vec.dot($"a", $"b")) === 32.0)
    assert(one(pair(Seq(3f, 4f), Seq(0f, 0f)), vec.norm($"a")) === 5.0)
  }

  test("elementwise algebra matches math/vector.go:87-158") {
    val df = pair(Seq(2f, 4f, 6f), Seq(1f, 2f, 3f))
    def arr(c: org.apache.spark.sql.Column): Seq[Double] =
      df.select(c.cast("array<double>")).as[Seq[Double]].head()
    assert(arr(vec.add($"a", $"b")) === Seq(3.0, 6.0, 9.0))
    assert(arr(vec.sub($"a", $"b")) === Seq(1.0, 2.0, 3.0))
    assert(arr(vec.mul($"a", $"b")) === Seq(2.0, 8.0, 18.0))
    assert(arr(vec.div($"a", $"b")) === Seq(2.0, 2.0, 2.0))
    assert(arr(vec.scalarMul($"a", lit(2f))) === Seq(4.0, 8.0, 12.0))
    assert(one(df, vec.elemSum($"a")) === 12.0)
  }

  test("big-endian float32 codec round-trips (math/vector.go:25-61)") {
    val df = Seq(Tuple1(Seq(1.5f, -2.25f, 0f, Float.MinPositiveValue))).toDF("a")
    val back = df.select(vec.fromBytes(vec.toBytes($"a"))).as[Seq[Float]].head()
    assert(back === Seq(1.5f, -2.25f, 0f, Float.MinPositiveValue))
    // Byte layout check: 1.0f big-endian is 3F 80 00 00
    val bytes = Seq(Tuple1(Seq(1.0f))).toDF("a").select(vec.toBytes($"a")).as[Array[Byte]].head()
    assert(bytes.toSeq === Seq(0x3f.toByte, 0x80.toByte, 0x00.toByte, 0x00.toByte))
  }

  test("rolling hash is deterministic and order-sensitive") {
    val h = Seq(("abc", "acb")).toDF("x", "y")
      .select(vec.rollingHash($"x"), vec.rollingHash($"y")).as[(Long, Long)].head()
    assert(h._1 !== h._2)
    val h2 = Seq(Tuple1("abc")).toDF("x").select(vec.rollingHash($"x")).as[Long].head()
    assert(h._1 === h2)
  }

  test("random vector generators: deterministic, right shape and moments (math/random.go)") {
    val ids = spark.range(2000).toDF("id")
    val u = ids.select(vec.randomUniformVec($"id", 16).as("v"))
    val flat = u.select(explode($"v").as("x")).agg(avg("x"), min("x"), max("x"))
      .as[(Double, Float, Float)].head()
    assert(math.abs(flat._1 - 0.5) < 0.02, s"uniform mean ${flat._1}")
    assert(flat._2 >= 0f && flat._3 < 1f)

    val n = ids.select(vec.randomNormalVec($"id", 16).as("v"))
      .select(explode($"v").as("x"))
      .agg(avg("x"), stddev("x")).as[(Double, Double)].head()
    assert(math.abs(n._1) < 0.05, s"normal mean ${n._1}")
    assert(math.abs(n._2 - 1.0) < 0.05, s"normal std ${n._2}")

    // deterministic
    val a = u.as[Seq[Float]].head()
    val b = ids.select(vec.randomUniformVec($"id", 16).as("v")).as[Seq[Float]].head()
    assert(a === b)

    assert(Seq(Tuple1(1)).toDF("x").select(vec.zeros(4)).as[Seq[Float]].head() === Seq(0f, 0f, 0f, 0f))
    assert(Seq(Tuple1(1)).toDF("x").select(vec.sort(typedLit(Seq(3f, 1f, 2f)))).as[Seq[Float]].head() === Seq(1f, 2f, 3f))
  }

  test("codec round-trip property: random vectors incl. specials survive") {
    val rnd = new scala.util.Random(99)
    val vectors = (0 until 200).map { _ =>
      Seq.fill(rnd.nextInt(20) + 1)(
        java.lang.Float.intBitsToFloat(rnd.nextInt())
      ).map(f => if (f.isNaN) 1.5f else f) // NaN bit patterns aren't stable through parquet float compare; test separately
    } :+ Seq(Float.MaxValue, Float.MinValue, Float.PositiveInfinity, Float.NegativeInfinity, -0.0f)
    val df = vectors.map(Tuple1(_)).toDF("a")
    val bad = df.select(
        zip_with($"a", vec.fromBytes(vec.toBytes($"a")), (x, y) => when(x === y, 0).otherwise(1))
          .as("diff"))
      .select(aggregate($"diff", lit(0), (acc, v) => acc + v).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(bad === 0L)
  }

  test("SQL registration: functions callable from SQL text") {
    graft.functions.GraftFunctionRegistry.register(spark)
    val d = spark.sql("SELECT dist_euclidean(array(1.0F, 2.0F, 2.0F), array(0.0F, 0.0F, 0.0F)) AS d")
      .as[Double].head()
    assert(d === 3.0)
    val s = spark.sql("SELECT dist_simd(array(1.0F, 2.0F, 2.0F), array(0.0F, 0.0F, 0.0F)) AS d")
      .as[Double].head()
    assert(math.abs(s - 3.0) < 1e-6)
    val sm = spark.sql("SELECT dist_simd(array(1.0F, 2.0F, 3.0F), array(0.0F, 0.0F, 0.0F), 'manhattan') AS d")
      .as[Double].head()
    assert(math.abs(sm - 6.0) < 1e-6)
    val h = spark.sql("SELECT nibble_histogram(X'00F0', 2) AS h").as[Seq[Long]].head()
    assert(h(0) === 1L && h(15) === 1L && h.sum === 2L)
    // real BPE from SQL text, demo merges: 'the cat' = [the] + [Ġc, at]
    val bpe = spark.sql("SELECT bpe_token_count('the cat') AS n").as[Long].head()
    assert(bpe === 3L)
    // byte-level mode agrees on ASCII, byte-fallbacks on CJK (3 bytes/char)
    val bb = spark.sql("SELECT bpe_token_count_bytes('the cat') AS n").as[Long].head()
    assert(bb === 3L)
    val bcjk = spark.sql("SELECT bpe_token_count_bytes('我有一个') AS n").as[Long].head()
    assert(bcjk === 12L)
    // Aho–Corasick blocklist from SQL text (comma-separated literal)
    val bl = spark.sql(
      "SELECT blocklist_hits('Contraband and e-mail here', 'contraband,e-mail') AS n")
      .as[Long].head()
    assert(bl === 2L)
  }

  test("spark.sql.extensions=GraftExtensions injects functions at session build") {
    import org.apache.spark.sql.SparkSession
    val shared = spark // force the lazy shared session BEFORE clearing
    // a session built over an existing context reads spark.sql.extensions
    // from the CONTEXT conf (builder options don't reach it), so plant the
    // key there; and force getOrCreate to BUILD a session rather than
    // return the shared one — newSession() would clone the shared
    // (extension-less) state instead
    val confField = classOf[org.apache.spark.SparkContext].getDeclaredField("_conf")
    confField.setAccessible(true)
    val scConf = confField.get(shared.sparkContext).asInstanceOf[org.apache.spark.SparkConf]
    scConf.set("spark.sql.extensions", "graft.functions.GraftExtensions")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(s2 ne shared, "getOrCreate returned the shared session; extensions untested")
      // no GraftFunctionRegistry.register(s2) anywhere: resolution proves
      // the conf-driven injection path
      val d = s2.sql("SELECT vec_norm(CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS d")
        .collect().head.getDouble(0)
      assert(d === 5.0)
      val dist = s2.sql(
        "SELECT round(dist_euclidean(array(0.0F, 0.0F), array(3.0F, 4.0F)), 4) AS d")
        .collect().head.getDouble(0)
      assert(dist === 5.0)
    } finally {
      scConf.remove("spark.sql.extensions")
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
