package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Regex-based SQL usage parsing: extract join (ON/USING) and filter
  * (WHERE/HAVING) condition strings from raw query text.
  *
  * Behavior-parity reimplementation of the reference's audit-log SQL parser
  * (reference: plugins/extractors/bigquery/sqlparser/parser.go:8-95) — the
  * grammar (comment stripping, ON/USING join conditions, WHERE/HAVING
  * terminals incl. LIKE / BETWEEN / IN / IS [NOT]) is preserved; the
  * execution is a codegen'd `regexp_extract_all` column expression, so the
  * parse distributes over the log table instead of running row-at-a-time on
  * a single node.
  */
object SqlParse {

  private val joinChars = "[a-zA-Z0-9@_\\.`-]*"
  private val joinExpr = s"(?:DATE\\($joinChars\\)|$joinChars)"
  private val joinTerm = s"$joinExpr\\s*=\\s*$joinExpr"
  /** ON a.x = b.y [AND|OR ...]  |  USING (col, ...) */
  val joinPattern: String =
    s"(?i)(?:ON)\\s+$joinTerm(?:\\s+(?:AND|OR)\\s+$joinTerm)*" +
      "|(?i)(?:USING)\\s*\\(\\s*([a-zA-Z0-9,@_\\s`-]*)\\s*\\)"

  private val fChars = "[a-zA-Z0-9@_\"',\\.`-]*"
  private val fCharsWs = "[a-zA-Z0-9@_:\"',\\s\\.`-]*"
  private val fRHS = s"(?:CURRENT_TIMESTAMP\\(\\)|TIMESTAMP\\($fCharsWs\\)|$fChars)"
  private val fTerm = "(?:" +
    s"$fChars\\s*(?:<=|>=|!=|<>|=|<|>)\\s*$fRHS" +
    s"|$fChars\\s+(?:LIKE|NOT LIKE)\\s+$fRHS" +
    s"|$fChars\\s+(?:BETWEEN|NOT BETWEEN)\\s+$fRHS\\s+AND\\s+$fRHS" +
    s"|$fChars\\s+IS (?:NOT)?\\s?(?:NULL|TRUE|FALSE)" +
    s"|$fChars\\s+(?:IN|NOT IN)\\s?\\($fCharsWs\\)" +
    ")"
  /** WHERE/HAVING condition chains. */
  val filterPattern: String =
    s"(?i)(?:WHERE|HAVING)\\s+$fTerm(?:\\s+(?:AND|OR)\\s+$fTerm)*"

  private val commentPattern = "(--[^\\n]*)|(/\\*[\\w\\W]*?\\*/)"

  /** Strip comments, collapse whitespace, drop semicolons
    * (parser.go:79-95 semantics).
    */
  def cleanQuery(sql: String): String =
    sql.replaceAll(commentPattern, " ")
      .trim
      .split("\\s+").mkString(" ")
      .replace(";", "")

  // --- driver-side (small inputs, e.g. one recipe's SQL) ---

  def parseJoinConditions(sql: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(joinPattern).matcher(cleanQuery(sql))
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (m.find()) out += m.group(0)
    out.toSeq
  }

  def parseFilterConditions(sql: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(filterPattern).matcher(cleanQuery(sql))
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (m.find()) out += m.group(0)
    out.toSeq
  }

  // --- distributed (column expressions over a query-log table) ---

  /** Comment-stripped, whitespace-collapsed query text. */
  def cleanQueryCol(sql: Column): Column =
    regexp_replace(
      regexp_replace(trim(regexp_replace(sql, commentPattern, " ")), "\\s+", " "),
      ";", "")

  def joinConditionsCol(sql: Column): Column =
    regexp_extract_all(cleanQueryCol(sql), lit(joinPattern), lit(0))

  def filterConditionsCol(sql: Column): Column =
    regexp_extract_all(cleanQueryCol(sql), lit(filterPattern), lit(0))
}
