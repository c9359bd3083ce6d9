package graft.util

import org.apache.spark.sql.SparkSession

/** Tiny single-value metadata files next to on-disk datasets (store
  * layout modulus, coverage watermarks, index build parameters). One long
  * per file, newline-terminated UTF-8 — readable with `cat`, writable by
  * hand when an operator's scaladoc says to. Absence is `None`, never an
  * error: every reader chooses its own fallback (fail fast for required
  * layout stamps, a documented default for optional knobs). */
object MetaFiles {

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  def readLong(spark: SparkSession, path: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else scala.util.Try {
      val in = f.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }.toOption
  }

  def writeLong(spark: SparkSession, path: String, v: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = fs(spark, p).create(p, /*overwrite=*/ true)
    try out.writeBytes(s"$v\n") finally out.close()
  }
}
