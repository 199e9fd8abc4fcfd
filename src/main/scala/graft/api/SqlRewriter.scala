package graft.api

/** Pre-rewriter closing the two reference SQL-surface extensions that Spark's
  * parser lacks (both already exist as API calls; this gives them SQL-text
  * form, SURVEY §2.7):
  *
  *   - `(q1) UNION BY UPDATE k1, k2 (q2)` (reference SQLParser.scala:328-336):
  *     keyed upsert-union — rows of q2 replace same-keyed rows of q1,
  *     unmatched rows of both survive (the `unionByUpdate` API op,
  *     binaryOperators.scala:155-171). Rewritten in place to
  *     `SELECT * FROM (q2) UNION ALL SELECT * FROM (q1) WHERE NOT EXISTS
  *     (same-key match in q2)`, so it composes inside a larger statement.
  *
  *   - `MATCH(graph, pattern)` as a FROM-clause table (SQLParser.scala:240-246):
  *     replaced by a temp view holding the pattern's matches (the
  *     `patternView` API op). The graph name resolves through the session's
  *     named-graph catalog.
  *
  * Both rewrites are purely textual (token-level, paren-balanced) and leave
  * any other SQL untouched; Spark's parser/analyzer then owns the result.
  */
object SqlRewriter {

  def rewrite(input: String, session: EngineSession): String =
    rewriteUnionByUpdate(rewriteMatch(input, session))

  /** Positions inside single/double-quoted string literals: parens, commas
    * and keywords there are content, not syntax — every scan below consults
    * this mask.
    */
  private def literalMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s(i)
      if (quote == 0) {
        if (c == '\'' || c == '"') { quote = c; mask(i) = true }
      } else {
        mask(i) = true
        if (c == quote) quote = 0
      }
      i += 1
    }
    mask
  }

  /* ---- MATCH(graph, pattern) ---- */

  private val MatchRe = "(?i)\\bMATCH\\s*\\(".r

  private def rewriteMatch(input: String, session: EngineSession): String = {
    val mask = literalMask(input)
    MatchRe.findAllMatchIn(input).find(m => !mask(m.start)) match {
      case None => input
      case Some(m) =>
        val open = input.indexOf('(', m.start)
        var depth = 1
        var i = open + 1
        var comma = -1
        while (i < input.length && depth > 0) {
          if (!mask(i)) input(i) match {
            case '('                                => depth += 1
            case ')'                                => depth -= 1
            case ',' if depth == 1 && comma < 0     => comma = i
            case _                                  =>
          }
          i += 1
        }
        require(depth == 0 && comma > 0,
          s"malformed MATCH(graph, pattern) in: $input")
        val gName = input.substring(open + 1, comma).trim
        val patText = stripQuotes(input.substring(comma + 1, i - 1).trim)
        val view = s"__match_${(gName + patText).hashCode.toHexString}"
        session.graph(gName).patternView(view, patText)
        rewriteMatch(input.substring(0, m.start) + view + input.substring(i), session)
    }
  }

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && (s.head == '\'' || s.head == '"') && s.last == s.head)
      s.substring(1, s.length - 1)
    else s

  /* ---- (q1) UNION BY UPDATE cols (q2) ---- */

  private val UbuRe = "(?i)\\bUNION\\s+BY\\s+UPDATE\\b".r

  private def rewriteUnionByUpdate(input: String): String = {
    val mask = literalMask(input)
    UbuRe.findAllMatchIn(input).find(m => !mask(m.start)) match {
      case None => input
      case Some(m) =>
        // left operand: the parenthesized query ending just before the keyword
        val leftEnd = lastNonWs(input, m.start - 1)
        require(leftEnd >= 0 && input(leftEnd) == ')',
          "UNION BY UPDATE: left operand must be a parenthesized query")
        var depth = 1
        var i = leftEnd - 1
        while (i >= 0 && depth > 0) {
          if (!mask(i)) input(i) match {
            case ')' => depth += 1
            case '(' => depth -= 1
            case _   =>
          }
          if (depth > 0) i -= 1
        }
        require(depth == 0, "UNION BY UPDATE: unbalanced left operand")
        val leftStart = i
        val leftQ = input.substring(leftStart + 1, leftEnd)

        // key columns: between the keyword and the right operand's '('
        val rOpen = input.indexOf('(', m.end)
        require(rOpen > m.end, "UNION BY UPDATE: right operand must be a parenthesized query")
        val cols = input.substring(m.end, rOpen).split(",").map(_.trim).filter(_.nonEmpty)
        require(cols.nonEmpty && cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
          "UNION BY UPDATE: expected a simple key column list")

        var d2 = 1
        var j = rOpen + 1
        while (j < input.length && d2 > 0) {
          if (!mask(j)) input(j) match {
            case '(' => d2 += 1
            case ')' => d2 -= 1
            case _   =>
          }
          j += 1
        }
        require(d2 == 0, "UNION BY UPDATE: unbalanced right operand")
        val rightQ = input.substring(rOpen + 1, j - 1)

        val cond = cols.map(c => s"__ubu_r.$c = __ubu_l.$c").mkString(" AND ")
        val rewritten =
          s"SELECT * FROM ($rightQ) __ubu_u " +
            s"UNION ALL " +
            s"SELECT * FROM ($leftQ) __ubu_l WHERE NOT EXISTS " +
            s"(SELECT 1 FROM ($rightQ) __ubu_r WHERE $cond)"
        rewriteUnionByUpdate(
          input.substring(0, leftStart) + rewritten + input.substring(j))
    }
  }

  private def lastNonWs(s: String, from: Int): Int = {
    var i = from
    while (i >= 0 && s(i).isWhitespace) i -= 1
    i
  }
}
