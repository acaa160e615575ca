package graft.util

/** Ship the DRIVER's Hadoop configuration into task closures.
  *
  * `org.apache.hadoop.conf.Configuration` is not `java.io.Serializable`,
  * so executor-side code that needs a `FileSystem` is tempted to build a
  * fresh `new Configuration()` — which silently DROPS every setting the
  * session carries only in memory (`spark.hadoop.*` object-store
  * credentials, endpoints, custom `fs.<scheme>.impl` bindings): a path
  * that lists fine on the driver then fails to open — or opens with the
  * wrong credentials — inside tasks. This wrapper serializes the conf's
  * KEY/VALUE state through Hadoop's own `Writable` protocol (the same
  * pattern Spark's internal sources use), so `conf.value` on an executor
  * sees exactly what the driver session saw. */
class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    // loadDefaults = false: the driver conf already folded the defaults
    // in; re-reading executor-local XMLs here could differ from it
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
