package graft.tools

/** Plumbing shared by the standalone bench mains — one definition for
  * the pieces that would otherwise drift across five copies. */
object BenchUtil {

  /** Keep graft's own INFO sizing/decision lines (sketch load factor,
    * stitch-edge counts) visible under the WARN root the benches set,
    * so a bench log carries the numbers its walls depend on. */
  def enableOperatorInfoLogs(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft", org.apache.logging.log4j.Level.INFO)

  /** Minimal JSON string escape for the one-line-JSON bench contract:
    * backslash first, then quote and the control characters that can
    * realistically appear in paths/callsites. */
  def jsonEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")
}
