package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Filesystem-agnostic "read parquet or empty" for append-only state dirs
  * (streaming dictionaries, signature stores): a dir that does not exist
  * yet — or exists but holds no committed files (crash before the first
  * append's job commit) — reads as an EMPTY DataFrame of the given schema
  * instead of throwing. A `java.io.File.exists` probe would be wrong on
  * hdfs:// or s3a:// paths; attempting the read and classifying the
  * AnalysisException is the portable form.
  */
object ParquetIO {
  def readOrEmpty(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    try spark.read.parquet(dir)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage != null &&
            (e.getMessage.contains("Path does not exist") ||
             e.getMessage.contains("Unable to infer schema")) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
}
