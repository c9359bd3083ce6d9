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

  /** [[readLong]] that distinguishes file-absent from file-present-but-
    * unreadable: absent is still `None` (the caller's documented
    * fallback applies), but a file that EXISTS and fails to read or
    * parse THROWS instead of quietly collapsing to the fallback. For
    * required layout stamps the distinction is the whole point — a
    * corrupt `_format_version` collapsing to None would silently open a
    * dir of unknown layout as "legacy compatible", the exact guess the
    * stamp exists to forbid. */
  def readLongStrict(spark: SparkSession, path: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val raw = try {
        val in = f.open(p)
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"metadata file $path exists but cannot be read", e)
      }
      try Some(raw.trim.toLong)
      catch {
        case e: NumberFormatException => throw new IllegalStateException(
          s"metadata file $path exists but holds ${raw.trim.take(80).inspect} " +
            "instead of a long", e)
      }
    }
  }

  private implicit class Inspect(private val s: String) extends AnyVal {
    def inspect: String = "\"" + s.flatMap {
      case c if c >= ' ' && c <= '~' => c.toString
      case c => f"\\u$c%04x"
    } + "\""
  }

  def writeLong(spark: SparkSession, path: String, v: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = fs(spark, p).create(p, /*overwrite=*/ true)
    try out.writeBytes(s"$v\n") finally out.close()
  }
}
