package graft.util

import org.apache.hadoop.conf.Configuration

/** Ship the session's Hadoop configuration to executor-side file IO.
  *
  * A bare `new Configuration()` on an executor loads only the XML
  * defaults — every `spark.hadoop.*` setting (S3 credentials,
  * defaultFS, filesystem impls) is silently dropped, which breaks
  * exactly the hdfs:/s3a: support the Hadoop-FS writers exist for.
  * Spark's own SerializableConfiguration is private[spark], so the
  * overlay is captured as a plain Map on the driver (a Configuration
  * is a few hundred k/v strings) and replayed on the executor.
  */
object HadoopConfs {

  def capture(conf: Configuration): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    conf.iterator().asScala.map(e => e.getKey -> e.getValue).toMap
  }

  def restore(overlay: Map[String, String]): Configuration = {
    val c = new Configuration()
    overlay.foreach { case (k, v) => c.set(k, v) }
    c
  }
}
