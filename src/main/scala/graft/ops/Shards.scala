package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, integrity-guarded TRAINING-SHARD export — the last step
  * of a curation pipeline, where "the data we trained on" must be exactly
  * reproducible and provably complete. Shard membership is a pure
  * function of the row id (the same engine-portable md5 rule as
  * [[Sampling.bucket]]), so a re-export on different hardware or
  * partitioning produces the identical shard contents; a completeness
  * manifest (file set + lengths, written LAST) makes a torn or tampered
  * export fail loudly at read time instead of silently training on
  * partial data; and a per-shard order-independent content digest
  * (xor of row hashes) lets a consumer verify the bytes they read are
  * the bytes the exporter wrote — end-to-end, through any copy.
  *
  * Layout: `dir/data/shard=K/part-*.parquet` (parquet partition dirs),
  * `dir/stats/` (one row per shard: n_rows + digest), `dir/_manifest`.
  */
object Shards {

  /** Shard id in [0, nShards) from the row id — engine-portable md5
    * arithmetic, identical to the oracle's SQL. */
  def shardOf(id: Column, nShards: Int, seed: String = "s"): Column =
    pmod(conv(substring(md5(concat(lit(seed), id.cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(nShards.toLong))

  /** Order-independent per-shard content digest: xor of xxhash64 over the
    * canonical JSON of each row's DATA columns (sorted by name, so column
    * order never changes the digest). Row order within a shard is a
    * layout artifact; xor makes the digest a SET property.
    */
  private def digestExpr(dataCols: Seq[String]): Column =
    expr(s"bit_xor(xxhash64(to_json(struct(${dataCols.sorted.map(c => s"`$c`").mkString(", ")}))))")

  /** Export `df` as `nShards` deterministic shards under `dir` (must not
    * already exist — exports are immutable; re-export to a fresh path).
    * Stats and manifest are derived from a fresh read of what LANDED on
    * storage, not from the in-memory plan, so they attest the artifact
    * itself; the manifest is written LAST — a crash at any earlier point
    * leaves a directory [[validate]] and [[read]] refuse.
    */
  def write(df: DataFrame, dir: String, idCol: String, nShards: Int, seed: String = "s"): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(!df.columns.contains("shard"), "input already has a 'shard' column")
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    require(!graft.io.HadoopIO.exists(dir, hconf),
      s"shard export target $dir already exists — exports are immutable, pick a fresh path")
    df.withColumn("shard", shardOf(col(idCol), nShards, seed))
      .repartition(nShards, col("shard"))
      .write.partitionBy("shard").parquet(s"$dir/data")
    val landed = spark.read.parquet(s"$dir/data")
    val dataCols = landed.columns.filterNot(_ == "shard").toSeq
    landed.groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), digestExpr(dataCols).as("digest"))
      .coalesce(1)
      .write.parquet(s"$dir/stats")
    graft.io.Manifest.write(dir,
      listFiles(dir, hconf).map { case (name, len) => graft.io.ManifestEntry(name, len, 0L) },
      hconf)
  }

  private def listFiles(
      dir: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val qualified = p.getFileSystem(conf).makeQualified(p).toString
    Seq("data/*/*.parquet", "stats/*.parquet")
      .flatMap(pat => graft.io.HadoopIO.globWithLength(dir, pat, conf))
      .map { case (uri, len) => (uri.stripPrefix(qualified + "/"), len) }
      .sortBy(_._1)
  }

  /** File-level completeness check (manifest exists, every listed file
    * present at its recorded length, no foreign files) — cheap: a
    * listing, no data read. Loud on every violation. */
  def validateFiles(spark: SparkSession, dir: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val entries = graft.io.Manifest.read(dir, hconf).getOrElse(
      throw new IllegalStateException(
        s"shard export at $dir has no manifest — torn export (the manifest is written last) " +
          "or foreign directory; refusing to read unverifiable training data"))
    val present = listFiles(dir, hconf).toMap
    val missing = entries.filterNot(e => present.contains(e.name))
    require(missing.isEmpty,
      s"shard export at $dir is INCOMPLETE: missing [${missing.map(_.name).mkString(", ")}]")
    val extra = present.keySet -- entries.map(_.name).toSet
    require(extra.isEmpty,
      s"shard export at $dir has foreign files: [${extra.toSeq.sorted.mkString(", ")}]")
    entries.foreach { e =>
      require(present(e.name) == e.length,
        s"shard file ${e.name} at $dir is ${present(e.name)}B, manifest says ${e.length}B (torn)")
    }
  }

  /** Full verification: file completeness PLUS per-shard row counts and
    * content digests recomputed from the data and required to equal the
    * stats written at export time. Returns (shard, n_rows) of the
    * verified export. One full scan — the price of proving content.
    */
  def validate(spark: SparkSession, dir: String): DataFrame = {
    validateFiles(spark, dir)
    val landed = spark.read.parquet(s"$dir/data")
    val dataCols = landed.columns.filterNot(_ == "shard").toSeq
    val recomputed = landed.groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), digestExpr(dataCols).as("digest"))
    val stored = spark.read.parquet(s"$dir/stats")
      .withColumnRenamed("n_rows", "stored_rows").withColumnRenamed("digest", "stored_digest")
    val joined = recomputed.join(stored, Seq("shard"), "full").cache()
    try {
      val bad = joined.filter(
        col("n_rows").isNull || col("stored_rows").isNull ||
          col("n_rows") =!= col("stored_rows") || col("digest") =!= col("stored_digest"))
        .select("shard").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
      require(bad.isEmpty,
        s"shard export at $dir FAILED content verification for shards [${bad.sorted.mkString(", ")}] " +
          "— data was modified, truncated, or duplicated after export")
      joined.select(col("shard"), col("n_rows"))
    } finally joined.unpersist()
  }

  /** Read a shard export. Always file-completeness-checked;
    * `verifyContent = true` additionally recomputes and compares the
    * per-shard digests (one extra scan). */
  def read(spark: SparkSession, dir: String, verifyContent: Boolean = false): DataFrame = {
    if (verifyContent) validate(spark, dir) else validateFiles(spark, dir)
    spark.read.parquet(s"$dir/data")
  }
}
