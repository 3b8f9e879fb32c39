package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Identifier escaping — the Spark-native analog of the reference's
  * `dynamic.escape` / T-SQL QUOTENAME (mssql_dataframe/core/dynamic.py:14-58).
  * Backtick-quotes (Spark's delimiter) and enforces the 128-char object
  * name limit the reference enforces via QUOTENAME returning NULL. */
object Identifiers {
  def quote(name: String): String = {
    if (name.length > 128) throw errors.InvalidLengthObjectName(name)
    "`" + name.replace("`", "``") + "`"
  }

  /** Strip any of the quoting styles users write: [x], `x`, "x", 'x'. */
  def unquote(raw: String): String = {
    val s = raw.trim
    if (s.length >= 2 && (
        (s.head == '[' && s.last == ']') ||
        (s.head == '`' && s.last == '`') ||
        (s.head == '"' && s.last == '"') ||
        (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
  }
}

/** String-filter parser — the Spark-native analog of the reference's
  * `dynamic.where` (mssql_dataframe/core/dynamic.py:60-137): turns a raw
  * user filter string into a validated Catalyst predicate.
  *
  * Unlike the reference (which interpolates QUOTENAME'd fragments back
  * into T-SQL), the output here is a `Column` tree, so the filter takes
  * part in Catalyst optimization — in particular predicate pushdown to
  * the parquet scan, which is what makes a user-supplied `where` cheap
  * at 100 TB.
  *
  * Grammar (superset of the reference's):
  *   expr     := andExpr (OR andExpr)*
  *   andExpr  := primary (AND primary)*
  *   primary  := '(' expr ')' | condition
  *   condition:= column (>=|<=|<>|!=|!>|!<|=|>|<) literal
  *             | column IS [NOT] NULL
  *             | column [NOT] LIKE literal
  *             | column [NOT] IN '(' literal (',' literal)* ')'
  * Column names are validated against the DataFrame schema
  * (→ ColumnDoesNotExist), literals are cast to the column's type.
  */
object Filters {

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object AND extends Tok
  private case object OR extends Tok
  private final case class Frag(text: String) extends Tok

  /** Lex into grouping parens, AND/OR connectors, and raw condition
    * fragments. Quote-aware; parens that open mid-fragment (IN lists)
    * belong to the fragment. */
  private def lex(where: String): List[Tok] = {
    val toks = scala.collection.mutable.ListBuffer.empty[Tok]
    val buf = new StringBuilder
    var i = 0
    var inFragParens = 0
    def flush(): Unit = {
      val t = buf.toString.trim
      if (t.nonEmpty) toks += Frag(t)
      buf.clear()
    }
    val n = where.length
    while (i < n) {
      val ch = where.charAt(i)
      if (ch == '\'') { // quoted literal: copy verbatim incl '' escapes
        buf.append(ch); i += 1
        var done = false
        while (i < n && !done) {
          buf.append(where.charAt(i))
          if (where.charAt(i) == '\'') {
            if (i + 1 < n && where.charAt(i + 1) == '\'') { buf.append('\''); i += 1 }
            else done = true
          }
          i += 1
        }
      } else if (ch == '(') {
        if (buf.toString.trim.isEmpty && inFragParens == 0) { flush(); toks += LP }
        else { inFragParens += 1; buf.append(ch) }
        i += 1
      } else if (ch == ')') {
        if (inFragParens > 0) { inFragParens -= 1; buf.append(ch) }
        else { flush(); toks += RP }
        i += 1
      } else {
        val rest = where.substring(i)
        val mAnd = "(?i)^AND\\b".r.findFirstIn(rest)
        val mOr = "(?i)^OR\\b".r.findFirstIn(rest)
        val boundary = i == 0 || !Character.isLetterOrDigit(where.charAt(i - 1)) && where.charAt(i - 1) != '_'
        // BETWEEN's inner AND belongs to the fragment, but BETWEEN is
        // not in the grammar — treat any AND/OR at a word boundary
        // outside quotes/frag-parens as a connector (as the reference does).
        if (boundary && inFragParens == 0 && mAnd.isDefined) { flush(); toks += AND; i += 3 }
        else if (boundary && inFragParens == 0 && mOr.isDefined) { flush(); toks += OR; i += 2 }
        else { buf.append(ch); i += 1 }
      }
    }
    flush()
    toks.toList
  }

  private val CompareOps: Seq[String] =
    Seq(">=", "<=", "<>", "!=", "!>", "!<", "=", ">", "<")

  private def columnOf(df: DataFrame, raw: String): (String, DataType) = {
    val name = Identifiers.unquote(raw)
    df.schema.fields.find(_.name == name)
      .orElse(df.schema.fields.find(_.name.equalsIgnoreCase(name)))
      .map(f => (f.name, f.dataType))
      .getOrElse(throw errors.ColumnDoesNotExist("<dataframe>", Seq(name)))
  }

  private def unquoteLiteral(text: String): String = {
    val t = text.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'')
      t.substring(1, t.length - 1).replace("''", "'")
    else t
  }

  private def literal(text: String, dt: DataType): Column = {
    val raw = unquoteLiteral(text)
    if (raw.equalsIgnoreCase("null")) lit(null).cast(dt) else lit(raw).cast(dt)
  }

  /** Instant micros of a datetimeoffset literal (normalized: naive
    * forms localize as UTC, short fractions pad to 6 digits). */
  private def dtoLiteral(text: String): Column = {
    val raw = unquoteLiteral(text)
    if (raw.equalsIgnoreCase("null"))
      graft.types.SqlType.dtoInstantMicros(lit(null).cast(StringType))
    else
      graft.types.SqlType.dtoInstantMicros(
        lit(graft.types.SqlType.dtoNormalizeLiteral(raw)))
  }

  private def condition(df: DataFrame, frag: String, dtoCols: Set[String]): Column = {
    val upper = frag.toUpperCase
    // IS [NOT] NULL
    val isNotNull = "(?i)\\s+IS\\s+NOT\\s+NULL\\s*$".r
    val isNull = "(?i)\\s+IS\\s+NULL\\s*$".r
    isNotNull.findFirstIn(frag) match {
      case Some(m) => val (n, _) = columnOf(df, frag.dropRight(m.length)); return col(Identifiers.quote(n)).isNotNull
      case None =>
    }
    isNull.findFirstIn(frag) match {
      case Some(m) => val (n, _) = columnOf(df, frag.dropRight(m.length)); return col(Identifiers.quote(n)).isNull
      case None =>
    }
    // [NOT] IN (...) — the keyword must sit OUTSIDE quoted literals, so
    // "c_name = 'we in it'" falls through to the comparison scan
    val inIdx = indexOfKeywordOutsideQuotes(frag, "IN")
    if (inIdx > 0) {
      val rest = frag.substring(inIdx + 2).trim
      if (rest.startsWith("(") && rest.endsWith(")")) {
        val (lhs, not) = stripTrailingNot(frag.substring(0, inIdx))
        val (n, dt) = columnOf(df, lhs)
        val raws = splitCsv(rest.substring(1, rest.length - 1))
        val c =
          if (dtoCols.contains(n))
            graft.types.SqlType.dtoInstantMicros(col(Identifiers.quote(n)))
              .isin(raws.map(dtoLiteral): _*)
          else col(Identifiers.quote(n)).isin(raws.map(v => literal(v, dt)): _*)
        return if (not) !c else c
      }
    }
    // [NOT] LIKE — same quote-aware keyword scan
    val likeIdx = indexOfKeywordOutsideQuotes(frag, "LIKE")
    if (likeIdx > 0) {
      val (lhs, not) = stripTrailingNot(frag.substring(0, likeIdx))
      val (n, _) = columnOf(df, lhs)
      val p = Identifiers.unquote(frag.substring(likeIdx + 4).trim)
      val c = col(Identifiers.quote(n)).like(p)
      return if (not) !c else c
    }
    // comparison operators, longest first; operator must sit outside quotes
    val opIdx = CompareOps.iterator.map(op => (op, indexOfOutsideQuotes(frag, op))).find(_._2 >= 0)
    opIdx match {
      case Some((op, idx)) =>
        val (n, dt) = columnOf(df, frag.substring(0, idx))
        // SQL identifier resolution: an UNQUOTED rhs that names an
        // existing column is a column reference (`lo <= hi` — the shape
        // CHECK constraints live on); quoted text stays a literal, so
        // `status = 'status'` is unambiguous. Matches T-SQL, where a
        // bare word matching a column is the column, never a string.
        val rhsRaw = frag.substring(idx + op.length).trim
        val rhsIsQuoted = rhsRaw.length >= 2 && rhsRaw.head == '\'' && rhsRaw.last == '\''
        val rhsCol = if (rhsIsQuoted) None else
          df.schema.fields.find(_.name == Identifiers.unquote(rhsRaw))
            .orElse(df.schema.fields.find(_.name.equalsIgnoreCase(Identifiers.unquote(rhsRaw))))
        // a datetimeoffset lhs compares INSTANTS when the rhs is a
        // literal or another datetimeoffset column; a mixed-type
        // column pair falls back to the raw comparison
        val asInstants = dtoCols.contains(n) &&
          rhsCol.forall(f => dtoCols.contains(f.name))
        def side(raw: Column): Column =
          if (asInstants) graft.types.SqlType.dtoInstantMicros(raw) else raw
        val c = side(col(Identifiers.quote(n)))
        val v = rhsCol.map(f => side(col(Identifiers.quote(f.name))))
          .getOrElse(if (asInstants) dtoLiteral(rhsRaw) else literal(rhsRaw, dt))
        op match {
          case "="          => c === v
          case ">"          => c > v
          case "<"          => c < v
          case ">="         => c >= v
          case "<="         => c <= v
          case "<>" | "!=" => c =!= v
          case "!>"         => c <= v // T-SQL not-greater-than
          case "!<"         => c >= v // T-SQL not-less-than
        }
      case None =>
        throw errors.InvalidSyntax(s"no comparison operator in condition: $frag")
    }
  }

  /** Index of a whitespace-delimited keyword outside single-quoted
    * literals (case-insensitive); -1 if absent. The following char must
    * be whitespace or '(' so column names containing the keyword as a
    * substring don't match. */
  private def indexOfKeywordOutsideQuotes(s: String, kw: String): Int = {
    var i = 0
    var inQ = false
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\'') inQ = !inQ
      else if (!inQ && i > 0 && s.charAt(i - 1).isWhitespace &&
          i + kw.length <= s.length && s.regionMatches(true, i, kw, 0, kw.length) &&
          (i + kw.length == s.length || s.charAt(i + kw.length).isWhitespace ||
            s.charAt(i + kw.length) == '('))
        return i
      i += 1
    }
    -1
  }

  /** Split "lhs [NOT]" into (lhs, hadNot). */
  private def stripTrailingNot(lhs: String): (String, Boolean) = {
    val t = lhs.trim
    if (t.length > 4 && t.regionMatches(true, t.length - 3, "NOT", 0, 3) &&
        t.charAt(t.length - 4).isWhitespace)
      (t.dropRight(3).trim, true)
    else (t, false)
  }

  private def indexOfOutsideQuotes(s: String, needle: String): Int = {
    var i = 0
    var inQ = false
    while (i <= s.length - needle.length) {
      val ch = s.charAt(i)
      if (ch == '\'') inQ = !inQ
      else if (!inQ && s.startsWith(needle, i)) return i
      i += 1
    }
    -1
  }

  private def splitCsv(s: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val buf = new StringBuilder
    var inQ = false
    s.foreach { ch =>
      if (ch == '\'') { inQ = !inQ; buf.append(ch) }
      else if (ch == ',' && !inQ) { out += buf.toString; buf.clear() }
      else buf.append(ch)
    }
    out += buf.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Parse a raw where string into a Catalyst predicate over df.
    *
    * `dtoCols` names columns of SQL type DATETIMEOFFSET: comparisons
    * and IN lists on those compare UTC INSTANTS (SQL Server's
    * semantics for the type — the stored render orders by wall clock,
    * which is a different order whenever offsets vary), via the native
    * [[graft.plans.DtoInstant]] decode on both sides. Literals may be
    * a full canonical render, or a naive `yyyy-MM-dd HH:mm:ss[.f…]`
    * (localized as UTC, the reference's naive-means-UTC rule).
    * IS NULL and LIKE stay on the stored string. */
  def parseWhere(df: DataFrame, where: String, dtoCols: Set[String] = Set.empty): Column = {
    val toks = lex(where)
    if (toks.isEmpty) throw errors.InvalidSyntax(s"empty where: $where")
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def primary(): Column = next() match {
      case LP =>
        val c = orExpr()
        if (peek.contains(RP)) { next(); c }
        else throw errors.InvalidSyntax(s"unbalanced parentheses in: $where")
      case Frag(f) => condition(df, f, dtoCols)
      case other => throw errors.InvalidSyntax(s"unexpected token $other in: $where")
    }
    def andExpr(): Column = {
      var c = primary()
      while (peek.contains(AND)) { next(); c = c && primary() }
      c
    }
    def orExpr(): Column = {
      var c = andExpr()
      while (peek.contains(OR)) { next(); c = c || andExpr() }
      c
    }
    val result = orExpr()
    if (pos != toks.length) throw errors.InvalidSyntax(s"trailing tokens in: $where")
    result
  }
}
