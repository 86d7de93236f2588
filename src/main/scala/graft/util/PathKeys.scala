package graft.util

/** Canonical spelling of a store path, used wherever two independently
  * supplied spellings of ONE store must compare equal — the loader
  * schedule's cursor stamps ([[graft.operators.LoaderSchedule]]) and the
  * writer-lease key ([[graft.sources.StoreLease]]). A trailing slash or
  * a relative-vs-absolute spelling must not read as a different store
  * (ADVICE r16), and the two consumers must never drift apart, so the
  * rule lives in exactly one place.
  */
object PathKeys {

  /** Local paths absolutize + normalize; URI-style paths
    * (`hdfs://...`, `s3a://...`) only lose a trailing slash — resolving
    * them against the local working directory would corrupt them.
    */
  def normalize(p: String): String =
    if (p.contains("://")) p.stripSuffix("/")
    else java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString
}
