package graft.util

/** Structured JSON log lines over slf4j — the engine's counterpart of the
  * reference's JSON logging setup (reference: src/logging_config.py:10-41,
  * which formats every record as a JSON object). One event per line:
  * `{"event":"...","key":value,...}`; string values are JSON-escaped,
  * numbers/booleans render bare, anything else via toString.
  *
  * Driver-side only by design: executors never log through this (logging
  * in hot row paths is an anti-pattern at scale), so there is no
  * serialization concern.
  */
object JsonLog {

  private val logger = org.slf4j.LoggerFactory.getLogger("graft")

  /** JSON string-escape (shared — e.g. Verify's oracle_sql.json dump). */
  private[graft] def esc(s: String): String = s.flatMap {
    case '"'           => "\\\""
    case '\\'          => "\\\\"
    case '\n'          => "\\n"
    case '\r'          => "\\r"
    case '\t'          => "\\t"
    case c if c < ' '  => f"\\u${c.toInt}%04x"
    case c             => c.toString
  }

  private def render(v: Any): String = v match {
    case null                                      => "null"
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    // NaN/Infinity are not JSON literals — quote them so lines stay parseable
    case d: Double if java.lang.Double.isFinite(d) => d.toString
    case f: Float if java.lang.Float.isFinite(f)   => f.toString
    case b: Boolean                                => b.toString
    case other                                     => "\"" + esc(other.toString) + "\""
  }

  /** Render one event line (exposed for tests). */
  def line(event: String, fields: (String, Any)*): String =
    (("event" -> (event: Any)) +: fields)
      .map { case (k, v) => "\"" + esc(k) + "\":" + render(v) }
      .mkString("{", ",", "}")

  def info(event: String, fields: (String, Any)*): Unit = logger.info(line(event, fields: _*))
  def warn(event: String, fields: (String, Any)*): Unit = logger.warn(line(event, fields: _*))
}
