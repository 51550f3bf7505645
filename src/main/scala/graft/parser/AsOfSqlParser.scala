package graft.parser

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.operators.AsOfJoin

/** Parser-tier engine extension (`SparkSessionExtensions.injectParser`) —
  * `ASOF LEFT JOIN` as SQL sugar, the syntax DuckDB ships natively and the
  * reference's pandas users reach via `merge_asof` (my_alpaca.py's
  * bar/quote alignment): each left row joined to the latest right row with
  * the same key whose timestamp is `<=` the left's.
  *
  * Scoped grammar (anything else falls through to the stock parser; a
  * structurally-ASOF text that fails the scope delegates too, so stock
  * Spark raises its ordinary syntax error):
  *
  * {{{
  * SELECT <col refs, optionally qualified/aliased | *>
  * FROM <relation or (subquery)> [alias]
  * ASOF LEFT JOIN <relation or (subquery)> [alias]
  * ON <l>.<k> = <r>.<k'> AND <r>.<rts> <= <l>.<lts>
  * }}}
  *
  * (the inequality also accepted flipped as `<l>.<lts> >= <r>.<rts>`; the
  * two ON predicates accepted in either order).
  *
  * The sugar does NOT lower to a range join: it parses onto the existing
  * [[graft.operators.AsOfJoin]] operator — union + one ordered window
  * forward-fill, one shuffle by key, no O(left×right) candidate blowup —
  * so a SQL user gets the same 100 TB-safe plan the DataFrame API user
  * gets (j7/j13). Keyword detection is a cheap word-boundary scan over a
  * comment-stripped copy of the text, outside string literals,
  * double-quoted strings, and backquoted identifiers — so every non-ASOF
  * statement pays one linear scan and delegates untouched (negative space
  * pinned by `AsOfSqlParserSpec`), and comments or quoted names inside an
  * in-scope statement cannot desync the scan.
  *
  * Sub-relations are parsed and analyzed by re-entering `session.sql`
  * (they contain no ASOF by scope, so they hit the stock parser);
  * qualified projection refs are resolved by stripping the two join
  * aliases after validating them. Output columns of `*` are the left
  * columns followed by the right payload (right columns minus its key and
  * timestamp), the `merge_asof` column convention.
  */
class AsOfSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import AsOfSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    rewriteAsOf(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    rewriteAsOf(sqlText).getOrElse(delegate.parseQuery(sqlText))

  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    rewriteAsOf(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  /** Some(plan) when the text is an in-scope ASOF statement; None → stock.
    *
    * The scoped scan runs on a comment-stripped copy of the text (so line
    * and block comments — and parens or keywords inside them — cannot
    * desync keyword detection), while an out-of-scope statement delegates
    * with its ORIGINAL text untouched. Contract violations surface as
    * [[org.apache.spark.sql.AnalysisException]] (Spark's convention for
    * semantic errors found after parsing), not IllegalArgumentException. */
  private def rewriteAsOf(text: String): Option[LogicalPlan] = {
    val clean = stripComments(text)
    if (topLevelKeyword(clean, "ASOF", 0) < 0) return None
    def checked(ok: Boolean, msg: => String): Unit =
      if (!ok) throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
    parseScoped(clean).map { q =>
      val leftDf = session.sql(s"SELECT * FROM ${q.leftRel}")
      val rightDf0 = session.sql(s"SELECT * FROM ${q.rightRel}")
      checked(rightDf0.columns.contains(q.rightKey) &&
        rightDf0.columns.contains(q.rightTs),
        s"asof right side has no column ${q.rightKey}/${q.rightTs}")
      checked(leftDf.columns.contains(q.leftKey) &&
        leftDf.columns.contains(q.leftTs),
        s"asof left side has no column ${q.leftKey}/${q.leftTs}")
      // operator contract: one shared key name; right ts must not shadow
      // a left column on the union
      var rightDf = rightDf0
      var rts = q.rightTs
      if (q.rightKey != q.leftKey)
        rightDf = rightDf.withColumnRenamed(q.rightKey, q.leftKey)
      if (leftDf.columns.contains(rts)) {
        val fresh = s"__asof_${rts}"
        rightDf = rightDf.withColumnRenamed(rts, fresh)
        rts = fresh
      }
      val payload = rightDf.columns.toSeq
        .filterNot(c => c == q.leftKey || c == rts)
      val clash = payload.toSet.intersect(leftDf.columns.toSet)
      checked(clash.isEmpty,
        s"asof payload column(s) ${clash.mkString(", ")} collide with the " +
          "left side — alias them apart in the right subquery")
      val joined = AsOfJoin.backward(leftDf, rightDf,
        key = q.leftKey, leftTs = q.leftTs, rightTs = rts,
        payload = payload)
      val projected =
        if (q.select == Seq(("*", None))) joined
        else joined.select(q.select.map { case (name, as) =>
          val c = col(stripAlias(name, q.leftAlias, q.rightAlias))
          as.fold(c)(c.as)
        }: _*)
      projected.queryExecution.logical
    }
  }
}

object AsOfSqlParser {

  /** One parsed in-scope statement. */
  private[parser] final case class AsOfQuery(
      select: Seq[(String, Option[String])],
      leftRel: String, leftAlias: Option[String],
      rightRel: String, rightAlias: Option[String],
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String)

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*"
  private val QualRef = s"($Ident)\\.($Ident)".r
  private val SelItem =
    s"(?i)^((?:$Ident\\.)?$Ident)(?:\\s+AS\\s+($Ident))?$$".r

  /** Remove SQL comments (`-- …` to end of line, `/* … */`) outside
    * string literals and quoted identifiers, replacing each with a space
    * so token boundaries survive. Quote spans (single, double, backtick)
    * pass through verbatim — a `--` inside a literal is content, not a
    * comment. Run BEFORE the keyword scan so parens or keywords inside
    * comments cannot desync it. */
  private[parser] def stripComments(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    var inS = false; var inD = false; var inB = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inS) { sb.append(c); if (c == '\'') inS = false; i += 1 }
      else if (inD) { sb.append(c); if (c == '"') inD = false; i += 1 }
      else if (inB) { sb.append(c); if (c == '`') inB = false; i += 1 }
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
        sb.append(' ') // the newline (or end) terminates the comment
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < s.length &&
          !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, s.length)
        sb.append(' ')
      } else {
        if (c == '\'') inS = true
        else if (c == '"') inD = true
        else if (c == '`') inB = true
        sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Index of a whole-word keyword at paren depth 0, outside single-quoted
    * literals, double-quoted strings, and backquoted identifiers; −1 when
    * absent. Case-insensitive. (Comments are the caller's job —
    * [[stripComments]] runs first on every rewrite path.) */
  private[parser] def topLevelKeyword(s: String, word: String,
                                      from: Int): Int = {
    val u = s.toUpperCase(java.util.Locale.ROOT)
    val w = word.toUpperCase(java.util.Locale.ROOT)
    var i = from; var depth = 0
    var inStr = false; var inD = false; var inB = false
    while (i < u.length) {
      val c = u.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inD) { if (c == '"') inD = false }
      else if (inB) { if (c == '`') inB = false }
      else c match {
        case '\'' => inStr = true
        case '"' => inD = true
        case '`' => inB = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && u.startsWith(w, i) &&
            (i == 0 || !u.charAt(i - 1).isLetterOrDigit &&
              u.charAt(i - 1) != '_') &&
            (i + w.length == u.length ||
              !u.charAt(i + w.length).isLetterOrDigit &&
                u.charAt(i + w.length) != '_'))
            return i
      }
      i += 1
    }
    -1
  }

  /** Split on a top-level separator keyword (e.g. AND) — same scoping
    * rules as [[topLevelKeyword]]. */
  private def topLevelSplit(s: String, word: String): Seq[String] = {
    var rest = s; var out = List.empty[String]
    var idx = topLevelKeyword(rest, word, 0)
    while (idx >= 0) {
      out ::= rest.substring(0, idx)
      rest = rest.substring(idx + word.length)
      idx = topLevelKeyword(rest, word, 0)
    }
    (rest :: out).reverse.map(_.trim)
  }

  /** `relation [AS] [alias]` → (relation text, alias). The relation is a
    * bare (possibly dotted) name or a balanced parenthesized subquery. */
  private def splitRelAlias(s: String): Option[(String, Option[String])] = {
    val t = s.trim
    if (t.isEmpty) None
    else if (t.startsWith("(")) {
      var depth = 0; var i = 0; var end = -1
      while (i < t.length && end < 0) {
        t.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) end = i
          case _ =>
        }
        i += 1
      }
      if (end < 0) None
      else {
        val rel = t.substring(0, end + 1)
        aliasOf(t.substring(end + 1)).map(a => (rel, a))
      }
    } else {
      val parts = t.split("\\s+").toSeq
      parts match {
        case Seq(rel) if rel.matches(s"$Ident(\\.$Ident)?") =>
          Some((rel, None))
        case rel +: tail if rel.matches(s"$Ident(\\.$Ident)?") =>
          aliasOf(tail.mkString(" ")).map(a => (rel, a))
        case _ => None
      }
    }
  }

  private def aliasOf(s: String): Option[Option[String]] = {
    val t = s.trim.replaceAll("(?i)^AS\\s+", "")
    if (t.isEmpty) Some(None)
    else if (t.matches(Ident)) Some(Some(t))
    else None
  }

  /** Structural parse of the scoped grammar; None → out of scope. */
  private[parser] def parseScoped(text: String): Option[AsOfQuery] = {
    val t = text.trim.stripSuffix(";").trim
    if (!t.toUpperCase(java.util.Locale.ROOT).startsWith("SELECT")) None
    else {
      val fromIdx = topLevelKeyword(t, "FROM", 0)
      val asofIdx = topLevelKeyword(t, "ASOF", 0)
      val onIdx = if (asofIdx < 0) -1 else topLevelKeyword(t, "ON", asofIdx)
      if (fromIdx < 0 || asofIdx < fromIdx || onIdx < asofIdx) None
      else {
        val selText = t.substring("SELECT".length, fromIdx).trim
        val afterAsof = t.substring(asofIdx + "ASOF".length, onIdx).trim
        // require the LEFT JOIN form — AsOfJoin.backward is the left
        // outer operator; plain ASOF JOIN (inner) is out of scope
        val joinRe = "(?is)^LEFT\\s+JOIN\\s+(.*)$".r
        for {
          rightPart <- afterAsof match {
            case joinRe(r) => Some(r)
            case _ => None
          }
          sel <- parseSelect(selText)
          (leftRel, leftAlias) <-
            splitRelAlias(t.substring(fromIdx + "FROM".length, asofIdx))
          (rightRel, rightAlias) <- splitRelAlias(rightPart)
          conds = topLevelSplit(t.substring(onIdx + "ON".length), "AND")
          if conds.length == 2
          q <- buildQuery(sel, leftRel, leftAlias, rightRel, rightAlias,
            conds)
        } yield q
      }
    }
  }

  private def parseSelect(s: String)
      : Option[Seq[(String, Option[String])]] = {
    if (s.trim == "*") Some(Seq(("*", None)))
    else {
      val items = s.split(",").map(_.trim).toSeq
      val parsed = items.map {
        case SelItem(ref, as) => Some((ref, Option(as)))
        case _ => None
      }
      if (parsed.forall(_.isDefined)) Some(parsed.flatten) else None
    }
  }

  private def buildQuery(sel: Seq[(String, Option[String])],
                         leftRel: String, leftAlias: Option[String],
                         rightRel: String, rightAlias: Option[String],
                         conds: Seq[String]): Option[AsOfQuery] = {
    val la = leftAlias.getOrElse("")
    val ra = rightAlias.getOrElse("")
    if (la.isEmpty || ra.isEmpty || la == ra) return None
    def sides(p: String, op: String): Option[((String, String), (String, String))] =
      p.split(java.util.regex.Pattern.quote(op), 2) match {
        case Array(x, y) => (x.trim, y.trim) match {
          case (QualRef(a1, c1), QualRef(a2, c2)) => Some(((a1, c1), (a2, c2)))
          case _ => None
        }
        case _ => None
      }
    val eq = conds.flatMap(c =>
      if (c.contains("<=") || c.contains(">=")) None else sides(c, "="))
    val ineq = conds.flatMap { c =>
      if (c.contains("<=")) sides(c, "<=").map { case (r, l) => (l, r) }
      else if (c.contains(">=")) sides(c, ">=")
      else None
    }
    (eq, ineq) match {
      case (Seq(((a1, k1), (a2, k2))), Seq(((la2, lts), (ra2, rts))))
          if la2 == la && ra2 == ra =>
        val (lk, rk) =
          if (a1 == la && a2 == ra) (k1, k2)
          else if (a1 == ra && a2 == la) (k2, k1)
          else return None
        Some(AsOfQuery(sel, leftRel, leftAlias, rightRel, rightAlias,
          lk, rk, lts, rts))
      case _ => None
    }
  }

  private def stripAlias(ref: String, la: Option[String],
                         ra: Option[String]): String = ref match {
    case QualRef(a, c)
        if la.contains(a) || ra.contains(a) => c
    case QualRef(a, _) =>
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" ->
          s"asof projection references unknown alias '$a' in '$ref'"))
    case other => other
  }
}
