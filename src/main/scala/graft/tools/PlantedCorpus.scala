package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic planted-cluster embedding corpus — the clustered
  * geometry the driver's synthetic corpus deliberately lacks.
  *
  * The driver's embeddings are near-ISOTROPIC (uniform entries, no
  * cluster structure), which defeats every sublinear ANN tier BY
  * CONSTRUCTION: true-neighbor cosine gaps sit inside the quantizer /
  * projection distortion (the OPQ-probe finding), so round-11's honest
  * measurement "no mutual-kNN tier beats the exact scan" is a property
  * of that corpus, not of the operator. Real embedding corpora (text,
  * image) are heavily clustered — this generator builds that geometry
  * reproducibly so the sublinear tiers can be measured on the corpus
  * class they exist for.
  *
  * Construction (all codegen'd deterministic expressions — xxhash64
  * uniforms, no RNG state): `clusters` centers with entries uniform in
  * [-1, 1]; vector i belongs to cluster i % clusters and reads
  * center + sigma·noise per entry. sigma controls separation:
  * at dim 64, sigma 0.3 gives intra-cluster cosines ≫ inter-cluster
  * (same-cluster neighbors dominate every top-k list). Schema matches
  * the driver's embeddings table exactly (vec_id BIGINT,
  * embedding FLOAT[dim], label INT = the planted cluster id).
  *
  * Usage as a main: outDir n dim clusters sigma → writes
  * outDir/embeddings.parquet. As a library: [[generate]].
  */
object PlantedCorpus {
  /** xxhash64 → uniform double in [0, 1), deterministic per salt. */
  private def u(salt: Column*): Column =
    pmod(xxhash64(salt: _*), lit(1 << 20)).cast("double") / (1 << 20)

  def generate(spark: SparkSession, n: Long, dim: Int = 64,
      clusters: Int = 50, sigma: Double = 0.3, seed: Long = 42L): DataFrame = {
    val base = spark.range(n).select(col("id").as("vec_id"),
      (col("id") % clusters).cast("int").as("label"))
    val entries = (0 until dim).map { d =>
      val center = u(lit(seed), lit("c"), col("label"), lit(d)) * 2 - 1
      val noise = u(lit(seed), lit("n"), col("vec_id"), lit(d)) * 2 - 1
      (center + lit(sigma) * noise).cast("float")
    }
    base.select(col("vec_id"), array(entries: _*).as("embedding"), col("label"))
  }

  def main(args: Array[String]): Unit = {
    val Array(out, nS, dimS, clustersS, sigmaS) = args.take(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("planted-corpus")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, nS.toLong, dimS.toInt, clustersS.toInt, sigmaS.toDouble)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"RESULT n=${spark.read.parquet(s"$out/embeddings.parquet").count()}")
    spark.stop()
  }
}
