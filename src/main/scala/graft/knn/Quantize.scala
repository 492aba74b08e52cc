package graft.knn

import graft.functions.vec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQ8 scalar quantization: `array<float>` → per-vector (binary codes,
  * scale, offset) at 4× smaller storage — the working-set lever for 100 TB
  * embedding corpora (scan/shuffle 1 byte per dimension, rescore only the
  * top candidates at full precision).
  *
  * Codes: `code_i = round((v_i - min) / (max - min) * 255)`, stored with
  * (offset = min, scale = (max-min)/255) for dequantization
  * `v̂_i = code_i * scale + offset`. Constant vectors get scale 0.
  */
object Quantize {

  /** Add (codes: array<tinyint>, q_scale: float, q_offset: float) per row. */
  def sq8(data: DataFrame, vectorCol: String = "vector"): DataFrame = {
    val v = col(vectorCol)
    val mn = array_min(v)
    val mx = array_max(v)
    val scale = ((mx - mn) / lit(255f)).cast("float")
    // stored as signed tinyint (code - 128) for true 1-byte-per-dim storage
    val codes = transform(v, x =>
      (when(scale === 0f, lit(0))
        .otherwise(round((x - mn) / scale).cast("int")) - 128)
        .cast("tinyint"))
    data
      .withColumn("q_offset", mn.cast("float"))
      .withColumn("q_scale", scale)
      .withColumn("codes", codes)
  }

  /** Reconstruct an `array<float>` from SQ8 columns. */
  def dequantize(codes: org.apache.spark.sql.Column, scale: org.apache.spark.sql.Column, offset: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(codes, c => ((c.cast("int") + 128).cast("float") * scale + offset).cast("float"))

  /** Two-stage ANN: coarse top-(k·overscan) on dequantized vectors, exact
    * rescoring of those candidates at full precision. The full-precision
    * side is only touched for candidate ids (broadcast-join sized).
    */
  def search(
      spark: SparkSession,
      quantized: DataFrame, // output of sq8 (id, vector, codes, q_scale, q_offset)
      queries: Array[(Long, Array[Float])],
      k: Int,
      overscan: Int = 4,
      metric: String = "euclidean"): DataFrame = {
    import spark.implicits._
    val approxVec = dequantize(col("codes"), col("q_scale"), col("q_offset"))
    val coarseData = quantized.select(col("id"), approxVec.as("vector"))
    val coarse = Knn.partitioned(spark, coarseData, queries, k * overscan, metric)
      .select("qid", "id")

    val queriesDf = queries.toSeq.toDF("qid", "qvec")
    val rescored = coarse
      .join(quantized.select(col("id"), col("vector")), Seq("id"))
      .join(broadcast(queriesDf), Seq("qid"))
      .select(col("qid"), col("id"), vec.dist(col("vector"), col("qvec"), metric).as("dist"))

    val w = Window.partitionBy("qid").orderBy(col("dist"), col("id"))
    rescored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
