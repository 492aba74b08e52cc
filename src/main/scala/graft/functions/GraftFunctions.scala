package graft.functions

import graft.internal.SqlBridge
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions._

/** Public column API for graft's native vector expressions, plus elementwise
  * algebra composed from Spark's codegen'd higher-order functions.
  *
  * Distance/dot/norm are custom codegen Catalyst expressions (see
  * [[VectorDistance]]); add/sub/mul/div are `zip_with`, scalar forms are
  * `transform` — all stay inside WholeStageCodegen. Mirrors the reference's
  * `math/vector.go:75-158` + `index/space/space.go:40-73` surface.
  */
object vec {
  private def c(e: Expression): Column = SqlBridge.column(e)
  private def e(col: Column): Expression = SqlBridge.expression(col)

  def distEuclidean(a: Column, b: Column): Column = c(VectorDistance(e(a), e(b), VectorDistance.Euclidean))
  def distManhattan(a: Column, b: Column): Column = c(VectorDistance(e(a), e(b), VectorDistance.Manhattan))
  def distCosine(a: Column, b: Column): Column = c(VectorDistance(e(a), e(b), VectorDistance.Cosine))
  def dist(a: Column, b: Column, metric: String): Column = metric match {
    case "euclidean" => distEuclidean(a, b)
    case "manhattan" => distManhattan(a, b)
    case "cosine" => distCosine(a, b)
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  /** SIMD-dispatched distance over `array<float>` (relaxed precision —
    * O(dim·ulp) off the exact fold; see [[SimdDistance]]). Falls back to the
    * scalar kernel on JVMs without the vector module.
    */
  def distSimd(a: Column, b: Column, metric: String): Column =
    c(SimdDistance(e(a), e(b), graft.core.Distances.metricId(metric)))

  def dot(a: Column, b: Column): Column = c(VectorDot(e(a), e(b)))
  def norm(a: Column): Column = c(VectorNorm(e(a)))

  /** ColBERT MaxSim over token-vector lists: Σ_q max_d dot(q, d). */
  def maxSim(docVectors: Column, queryVectors: Column): Column =
    c(MaxSimScore(e(docVectors), e(queryVectors)))

  /** Fused SQ8 encode — struct(codes, q_scale, q_offset, q_err, q_err_l1);
    * `normalize = true` L2-normalizes first (NULL for zero-norm vectors).
    */
  def sq8Encode(a: Column, normalize: Boolean = false): Column =
    c(Sq8Encode(e(a), normalize))

  /** Fused SQ4 (4-bit) encode — struct(codes packed 2/byte, q_scale,
    * q_offset, q_err, q_err_l1, q_dim).
    */
  def sq4Encode(a: Column): Column = c(Sq4Encode(e(a)))

  /** 1-bit signature pack: bit i set iff a(i) > thresholds(i); 64 dims
    * per long word (32× smaller than float32).
    */
  def binaryPack(a: Column, thresholds: Column): Column =
    c(BinaryPack(e(a), e(thresholds)))

  /** Pop-count Hamming distance between [[binaryPack]] signatures. */
  def hammingWords(a: Column, b: Column): Column =
    c(HammingWords(e(a), e(b)))

  def toBytes(a: Column): Column = c(VecToBytes(e(a)))
  def fromBytes(a: Column): Column = c(VecFromBytes(e(a)))

  def rollingHash(a: Column): Column = c(RollingHash(e(a)))

  // Elementwise algebra (reference math/vector.go:87-158), via codegen'd HOFs.
  def add(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)
  def sub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)
  def mul(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x * y)
  def div(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x / y)
  def scalarAdd(a: Column, s: Column): Column = transform(a, x => x + s)
  def scalarSub(a: Column, s: Column): Column = transform(a, x => x - s)
  def scalarMul(a: Column, s: Column): Column = transform(a, x => x * s)
  def scalarDiv(a: Column, s: Column): Column = transform(a, x => x / s)

  /** Sum of array elements in element order (left fold, double). */
  def elemSum(a: Column): Column =
    aggregate(transform(a, x => x.cast("double")), lit(0.0), (acc, x) => acc + x)

  // Reference math surface completeness (math/vector.go:20 Sort,
  // vector.go:63-73 Zeros/Ones, math/random.go generators — deterministic,
  // id-seeded, so distributed generation is reproducible).
  def sort(a: Column): Column = array_sort(a)
  def zeros(dim: Int): Column = array_repeat(lit(0f), dim)
  def ones(dim: Int): Column = array_repeat(lit(1f), dim)

  /** Uniform [0,1) vector derived from an id column (splitmix-style via
    * xxhash64) — the distributed analog of `RandomUniformVector`.
    */
  def randomUniformVec(id: Column, dim: Int, seed: Long = 42L): Column =
    transform(sequence(lit(0), lit(dim - 1)), j =>
      (pmod(xxhash64(id, j, lit(seed)), lit(1L << 40)).cast("double") / lit((1L << 40).toDouble))
        .cast("float"))

  /** Standard-normal vector via Box-Muller over two uniform lanes —
    * the distributed analog of `RandomStandardNormalVector`.
    */
  def randomNormalVec(id: Column, dim: Int, seed: Long = 42L): Column = {
    val u1 = transform(sequence(lit(0), lit(dim - 1)), j =>
      (pmod(xxhash64(id, j, lit(seed)), lit(1L << 40)).cast("double") + 1.0) / lit((1L << 40).toDouble + 1.0))
    val u2 = transform(sequence(lit(0), lit(dim - 1)), j =>
      pmod(xxhash64(id, j, lit(seed ^ 0x5DEECE66DL)), lit(1L << 40)).cast("double") / lit((1L << 40).toDouble))
    zip_with(u1, u2, (a, b) =>
      (sqrt(lit(-2.0) * log(a)) * cos(lit(2.0 * math.Pi) * b)).cast("float"))
  }
}

/** Named-function registration so graft expressions are callable from SQL
  * text (`SELECT dist_euclidean(a, b) ...`) on any session.
  */
object GraftFunctionRegistry {
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dist_euclidean" -> ((args: Seq[Expression]) => VectorDistance(args(0), args(1), VectorDistance.Euclidean)),
    "dist_manhattan" -> ((args: Seq[Expression]) => VectorDistance(args(0), args(1), VectorDistance.Manhattan)),
    "dist_cosine" -> ((args: Seq[Expression]) => VectorDistance(args(0), args(1), VectorDistance.Cosine)),
    "vec_dot" -> ((args: Seq[Expression]) => VectorDot(args(0), args(1))),
    "maxsim_score" -> ((args: Seq[Expression]) => MaxSimScore(args(0), args(1))),
    "vec_norm" -> ((args: Seq[Expression]) => VectorNorm(args(0))),
    "vec_to_bytes" -> ((args: Seq[Expression]) => VecToBytes(args(0))),
    "vec_from_bytes" -> ((args: Seq[Expression]) => VecFromBytes(args(0))),
    "rolling_hash" -> ((args: Seq[Expression]) => RollingHash(args(0))),
    "simhash_text" -> ((args: Seq[Expression]) => SimHashText(args(0))),
    "simhash64" -> ((args: Seq[Expression]) => SimHash64(args(0))),
    "shingle_hash_set" -> ((args: Seq[Expression]) => ShingleHashSet(args(0), 3)),
    "sorted_intersect_count" -> ((args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    // optional 3rd arg: metric name as a string literal (default euclidean)
    "dist_simd" -> ((args: Seq[Expression]) => {
      val metric =
        if (args.length < 3) graft.core.Distances.Euclidean
        else args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, _: org.apache.spark.sql.types.StringType) =>
            graft.core.Distances.metricId(String.valueOf(s))
          case other =>
            throw new IllegalArgumentException(s"dist_simd metric must be a string literal, got $other")
        }
      SimdDistance(args(0), args(1), metric)
    }),
    "nibble_histogram" -> ((args: Seq[Expression]) => NibbleHistogram(args(0), args(1))),
    // real BPE under the in-repo demo merges table (SQL can't ship a
    // merges file; the Scala API takes any standard merges.txt lines)
    "bpe_token_count" -> ((args: Seq[Expression]) => BpeTokenCount(args(0), graft.text.Bpe.DemoMerges)),
    // the byte-level (GPT-2/tiktoken-convention) mode under the same table
    "bpe_token_count_bytes" -> ((args: Seq[Expression]) =>
      BpeTokenCount(args(0), graft.text.Bpe.DemoMerges, byteLevel = true)),
    // Aho–Corasick blocklist hits; entries as a comma-separated string
    // (any FOLDABLE string expression — a literal, or e.g. a concat of
    // literals; SQL can't ship a list, the Scala API takes any Seq)
    "blocklist_hits" -> ((args: Seq[Expression]) => {
      if (args.length != 2)
        throw new IllegalArgumentException(
          s"blocklist_hits takes exactly 2 arguments (text, 'entry1,entry2,...'), got ${args.length}")
      val words = args(1) match {
        case e if e.foldable && e.dataType == org.apache.spark.sql.types.StringType =>
          val v = e.eval()
          if (v == null)
            throw new IllegalArgumentException(
              "blocklist_hits entries must be a non-null comma-separated string")
          String.valueOf(v).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        case other =>
          throw new IllegalArgumentException(
            s"blocklist_hits entries must be a foldable comma-separated string, got $other")
      }
      BlocklistHitsAho(args(0), words)
    }),
    // charset cascade over a raw body; 2nd arg = Content-Type value ('' = none)
    "charset_decode" -> ((args: Seq[Expression]) => {
      if (args.length != 2)
        throw new IllegalArgumentException(
          s"charset_decode takes exactly 2 arguments (payload binary, content_type string), got ${args.length}")
      CharsetDecode(args(0), args(1))
    }),
    // byte-level HTTP envelope split + charset decode in one pass
    "http_decode" -> ((args: Seq[Expression]) => {
      if (args.length != 1)
        throw new IllegalArgumentException(
          s"http_decode takes exactly 1 argument (payload binary), got ${args.length}")
      HttpDecode(args(0))
    }),
    // RFC 9309 robots.txt rule evaluation
    "robots_check" -> ((args: Seq[Expression]) => {
      if (args.length != 3)
        throw new IllegalArgumentException(
          s"robots_check takes exactly 3 arguments (robots, agent, path), got ${args.length}")
      RobotsCheck(args(0), args(1), args(2))
    }),
  )

  /** Idempotently register all graft functions on a session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => SqlBridge.registerFunction(spark, name, b) }
}

/** `SparkSessionExtensions` hook — functions + the kNN planner strategy.
  * Use `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    GraftFunctionRegistry.builders.foreach { case (name, b) =>
      ext.injectFunction((new FunctionIdentifier(name), new ExpressionInfo("graft", name), b))
    }
    ext.injectPlannerStrategy(_ => new graft.plans.KnnStrategy)
    ext.injectOptimizerRule(_ => new graft.plans.KnnSqlRewrite)
  }
}
