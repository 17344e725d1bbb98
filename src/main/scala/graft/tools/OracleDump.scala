package graft.tools

import java.nio.file.{Files, Paths}

/** Dev-only: dump ALL of [[graft.SparkEntry.oracleSql]] as JSON without
  * running any query, so scripts/oracle_typescan.py can statically
  * audit every oracle's DuckDB result types (the r14 HUGEINT defect
  * class) in seconds. Usage: runMain graft.tools.OracleDump <outFile> */
object OracleDump {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(args(0)), json)
  }
}
