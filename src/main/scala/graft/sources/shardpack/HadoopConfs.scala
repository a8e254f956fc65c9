package graft.sources.shardpack

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Hadoop configuration plumbing for the DSv2 source/sink.
  *
  * A bare `new Configuration()` drops every `spark.hadoop.*` setting the
  * user configured (S3 credentials, endpoints, custom defaultFS), so all
  * driver-side code paths resolve the session's Hadoop conf and ship it to
  * executors via [[SerializableHadoopConf]] (Configuration is a Hadoop
  * Writable, not java-Serializable).
  */
object HadoopConfs {
  /** The active session's Hadoop conf (includes spark.hadoop.* overrides);
    * falls back to a default conf outside a session (unit tests of the
    * codec layer).
    */
  def session(): Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def serializable(): SerializableHadoopConf =
    new SerializableHadoopConf(session())
}

/** java-Serializable wrapper for a Hadoop Configuration (standard Spark
  * pattern; Configuration only implements Hadoop's Writable).
  */
final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {
  def value: Configuration = conf

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}
