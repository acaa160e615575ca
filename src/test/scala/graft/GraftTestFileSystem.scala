package graft

/** A local filesystem registered under its OWN scheme (`grafttest://`),
  * bindable ONLY through a `fs.grafttest.impl` conf key — the probe for
  * "did the driver session's Hadoop configuration actually reach the
  * executors?": the key is set programmatically on the session conf
  * (never in any XML default), so a task that builds a fresh
  * `Configuration()` cannot resolve the scheme and fails, while a task
  * holding the shipped session conf opens it fine. Mirrors how real
  * deployments bind s3a/gs credentials via `spark.hadoop.*`. */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("grafttest:///")
}
