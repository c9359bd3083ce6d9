package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch measurement: does SemDeDup soft assignment (each vector in its
  * m nearest clusters) recover boundary pairs? Window-based prototype —
  * NOT the scale shape; decides whether the min_by two-pass is worth
  * building. */
object D9RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("d9-recall-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.expressions.GraftFunctions.init(spark)
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val n = emb.count()
    val k = math.max(1, math.ceil(n / 256.0).toInt)
    val exact = graft.functions.Similarity.cosineDuplicates(emb, threshold = 0.35,
        dim = 64, exhaustive = true)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = graft.functions.Similarity.ivfCentroids(emb, k).localCheckpoint(true)
    def ncos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("graft_dot", a, b) /
        (sqrt(call_function("graft_dot", a, a)) * sqrt(call_function("graft_dot", b, b)))
    for (m <- Seq(1, 2, 3)) {
      val t0 = System.nanoTime()
      val w = Window.partitionBy("vec_id").orderBy(col("d"), col("cid"))
      val assigned = emb.crossJoin(broadcast(cents))
        .withColumn("d", -ncos(col("embedding"), col("centroid")))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= m)
        .select(col("vec_id").as("id"), col("embedding").as("v"),
          col("cid").as("centroid_id"))
      val a = assigned.select(col("centroid_id"), col("id").as("doc_a"), col("v").as("av"))
      val b = assigned.select(col("centroid_id"), col("id").as("doc_b"), col("v").as("bv"))
      val pairs = a.join(b, "centroid_id")
        .filter(col("doc_a") < col("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
        .withColumn("cosine", ncos(col("av"), col("bv")))
        .filter(col("cosine") >= 0.35)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = (pairs & exact).size.toDouble / exact.size
      println(f"RESULT m=$m k=$k pairs=${pairs.size} recall=$rec%.3f wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
