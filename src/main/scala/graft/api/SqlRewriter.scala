package graft.api

/** Pre-rewriter closing the SQL-surface extensions that Spark's parser
  * lacks (all already exist as API calls; this gives them SQL-text form,
  * SURVEY §2.7): the three reference grammar extensions (UNION BY UPDATE,
  * MATCH, WITH RECURSIVE) plus two analytics-dialect clauses built on this
  * engine's own operators (QUALIFY → windowed-subquery rewrite, ASOF JOIN →
  * the AsofJoin operator; see their method docs below):
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
  *   - `WITH RECURSIVE[(n)] name [(cols)] AS (base UNION [ALL] step) query`
  *     (reference SQLParser.scala:366-374 → `With(query, withList, recursive)`,
  *     multiwayOperators.scala:306-326): the recursive CTE, with the
  *     reference's optional round cap `(n)`. The base branches must not
  *     reference `name` (a branch "references" the CTE when the name appears
  *     in a table position — after FROM/JOIN or a FROM-list comma — or is
  *     used anywhere as a `name.` qualifier); the step branches may.
  *     Semantics follow the SQL-standard working-table scheme: each round the
  *     step branches see ONLY the previous round's new rows. With `UNION`
  *     that is semi-naive set evaluation — rows are deduplicated against
  *     everything derived so far and iteration stops when a round adds
  *     nothing (guaranteed for the standard's monotone step bodies; a cap
  *     `(n)` bounds the rounds explicitly). With `UNION ALL` rows accumulate
  *     bag-style until a round's step yields nothing (default cap 100, since
  *     a bag body has no intrinsic fixpoint). The result is registered under
  *     a query-scoped internal view name — the user-visible CTE name is
  *     never registered, so it cannot clobber a same-named session temp
  *     view — and every occurrence of the CTE name in the step branches and
  *     the trailing query is substituted with it. (Consequently a column or
  *     alias that coincidentally shares the CTE's name inside those texts is
  *     not supported.) The trailing query text is returned.
  *
  * The MATCH/UBU rewrites are purely textual (token-level, paren-balanced);
  * the recursive CTE additionally executes the iteration (it has no
  * single-statement Spark SQL equivalent). Anything else is left untouched;
  * Spark's parser/analyzer then owns the result.
  */
object SqlRewriter {

  def rewrite(input: String, session: EngineSession): String =
    rewriteTracked(input, session)._1

  /** [[rewrite]] plus a cleanup thunk that drops the internal temp views and
    * releases the intermediate per-round checkpoints a recursive CTE
    * registered. Call it after the rewritten text has been through
    * `spark.sql` — analysis resolves the views into the plan, so dropping
    * them afterwards is safe ([[EngineSession.sql]] does exactly this).
    */
  def rewriteTracked(input: String, session: EngineSession): (String, () => Unit) = {
    val cleanups = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    val runCleanups = () => cleanups.reverseIterator.foreach { f =>
      try f() catch { case _: Exception => () }
    }
    try {
      val out = rewriteQualify(rewriteAsofJoin(rewriteUnionByUpdate(
        rewriteMatch(rewriteRecursiveWith(input, session, cleanups), session)),
        session, cleanups))
      (out, runCleanups)
    } catch { case t: Throwable => runCleanups(); throw t }
  }

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

  /** Paren nesting depth at every position (literal-masked). */
  private def parenDepths(s: String, mask: Array[Boolean]): Array[Int] = {
    val d = new Array[Int](s.length)
    var depth = 0
    var i = 0
    while (i < s.length) {
      if (!mask(i)) {
        if (s(i) == '(') depth += 1
        else if (s(i) == ')') depth -= 1
      }
      d(i) = depth
      i += 1
    }
    d
  }

  /* ---- SELECT … [WHERE|GROUP BY|HAVING …] QUALIFY pred [ORDER BY|LIMIT …] ---- */

  private val QualifyRe = "(?i)\\bQUALIFY\\b".r
  private val QualifyTailRe = "(?i)\\b(ORDER\\s+BY|LIMIT)\\b".r
  private val qualifyCounter = new java.util.concurrent.atomic.AtomicInteger

  /** `QUALIFY <pred>` — filter on window functions, evaluated after
    * grouping (the window-function analog of HAVING; DuckDB/Snowflake/BigQuery
    * surface). Rewritten purely textually to the standard-SQL equivalent:
    * the pre-QUALIFY query becomes a subquery, the predicate (window
    * functions and all — lateral column aliases make it legal in a SELECT
    * list) is computed as one extra column, filtered on, and dropped again
    * via `SELECT * EXCEPT`. Window expressions in the predicate therefore
    * see the query's OUTPUT columns (projected aliases included); a window
    * over a column the select list dropped is not supported — project it or
    * rewrite manually. Supported at statement top level (the depth-0 text);
    * a QUALIFY inside a subquery fails with a clear message rather than
    * reaching Spark's parser.
    */
  private def rewriteQualify(input: String): String = {
    val mask = literalMask(input)
    val depths = parenDepths(input, mask)
    QualifyRe.findAllMatchIn(input).find(m => !mask(m.start)) match {
      case None => input
      case Some(m) =>
        require(depths(m.start) == 0,
          "QUALIFY inside a subquery is not supported; apply it at the top level or rewrite to a windowed subquery manually")
        val head = input.substring(0, m.start).trim
        require("(?i)^\\s*(WITH|SELECT)\\b".r.findFirstIn(head).isDefined && head.nonEmpty,
          "QUALIFY: expected a SELECT query before the keyword")
        val tailStart = QualifyTailRe.findAllMatchIn(input)
          .filter(t => t.start > m.end && !mask(t.start) && depths(t.start) == 0)
          .map(_.start).minOption.getOrElse(input.length)
        val pred = input.substring(m.end, tailStart).trim
        require(pred.nonEmpty, "QUALIFY: empty predicate")
        val tail = input.substring(tailStart)
        val q = s"__qualify_${qualifyCounter.incrementAndGet()}"
        s"SELECT * EXCEPT ($q) FROM " +
          s"(SELECT *, ($pred) AS $q FROM ($head) ${q}_src) ${q}_flt " +
          s"WHERE $q $tail"
    }
  }

  /* ---- lt [la] ASOF [LEFT] JOIN rt [ra] ON la.k = ra.k AND la.t >= ra.t ---- */

  // the lookbehinds stop the left/right captures from matching the bare
  // suffix of a qualified name (`db.tbl ASOF JOIN …` must not resolve `tbl`)
  private val AsofRe = "(?i)(?<![\\w.])([A-Za-z_][\\w]*)(?:\\s+(?:AS\\s+)?([A-Za-z_][\\w]*))?\\s+ASOF\\s+(?:LEFT\\s+)?JOIN\\s+(?<![\\w.])([A-Za-z_][\\w]*)(?:\\s+(?:AS\\s+)?([A-Za-z_][\\w]*))?\\s+ON\\b".r
  private val AsofKeywordRe = "(?i)\\bASOF\\s+(?:LEFT\\s+)?JOIN\\b".r
  private val AsofCondRe = "(?is)^\\s*([A-Za-z_][\\w]*)\\.([A-Za-z_][\\w]*)\\s*=\\s*([A-Za-z_][\\w]*)\\.([A-Za-z_][\\w]*)\\s+AND\\s+([A-Za-z_][\\w]*)\\.([A-Za-z_][\\w]*)\\s*>=\\s*([A-Za-z_][\\w]*)\\.([A-Za-z_][\\w]*)\\s*$".r
  private val AsofCondEndRe = "(?i)\\b(WHERE|GROUP\\s+BY|HAVING|QUALIFY|ORDER\\s+BY|LIMIT|UNION|INTERSECT|EXCEPT)\\b".r
  private val asofCounter = new java.util.concurrent.atomic.AtomicInteger

  /** `left [la] ASOF [LEFT] JOIN right [ra] ON la.k = ra.k AND la.t >= ra.t`
    * (DuckDB/QuestDB/kdb surface): each left row picks the right row with
    * the greatest time at-or-before its own, per key — lowered onto the
    * [[graft.operators.AsofJoin]] operator (union-marker + one running
    * window, one shuffle, no N×M probe) and registered as a query-scoped
    * temp view substituted into the FROM clause.
    *
    * Surface restrictions (each fails with a message, not a wrong answer):
    * both sides must be named tables/views; the condition must be exactly
    * one key equality AND one `left.time >= right.time`; the right side's
    * other columns surface as `asof_<name>` (null when unmatched — the
    * LEFT variant; ASOF and ASOF LEFT are therefore synonyms here, and a
    * WHERE on a non-null asof column recovers inner semantics).
    *
    * `ASOF` is a RESERVED word in this dialect (as in DuckDB): a table
    * alias literally named `asof` is read as the join keyword, so
    * `FROM t asof JOIN u ON asof.k = u.k` is not a plain aliased join
    * here — both condition checks below recognize an `asof.`-qualified
    * condition and fail with the rename advice instead of a shape error.
    */
  private def rewriteAsofJoin(input: String, session: EngineSession,
      cleanups: scala.collection.mutable.ArrayBuffer[() => Unit]): String = {
    val mask = literalMask(input)
    AsofRe.findAllMatchIn(input).find(m => !mask(m.start)) match {
      case None =>
        // an ASOF JOIN the surface regex could not bind (e.g. qualified
        // `db.tbl` operands or a subquery operand) must fail HERE with the
        // real reason, not reach Spark's parser as mystery syntax
        require(!AsofKeywordRe.findAllMatchIn(input).exists(m => !mask(m.start)),
          "ASOF JOIN: operands must be simple unqualified table/view names " +
            "with optional aliases (register a temp view for qualified names or subqueries)")
        input
      case Some(m) =>
        val (lt, la) = (m.group(1), Option(m.group(2)).getOrElse(m.group(1)))
        val (rt, ra) = (m.group(3), Option(m.group(4)).getOrElse(m.group(3)))
        val condEnd = AsofCondEndRe.findAllMatchIn(input)
          .filter(t => t.start > m.end && !mask(t.start))
          .map(_.start).minOption.getOrElse(input.length)
        val cond = input.substring(m.end, condEnd)
        // a condition qualified by the identifier `asof` means the query
        // aliased a table as the reserved word — say so, not "wrong shape"
        def reservedCheck(): Unit = require(
          !"(?i)\\basof\\s*\\.".r.findFirstIn(cond).isDefined,
          "ASOF JOIN: `asof` is a reserved join keyword in this dialect; " +
            s"rename the `asof` table alias, got condition: $cond")
        val (lk, rk, ltm, rtm) = cond match {
          case AsofCondRe(a1, c1, a2, c2, a3, c3, a4, c4) =>
            val eq = Map(a1 -> c1, a2 -> c2)
            val ge = Map(a3 -> c3, a4 -> c4)
            if (eq.keySet != Set(la, ra) || a3 != la || a4 != ra) reservedCheck()
            require(eq.keySet == Set(la, ra) && a3 == la && a4 == ra,
              s"ASOF JOIN: condition must be one `$la.k = $ra.k` AND `$la.t >= $ra.t`, got: $cond")
            (eq(la), eq(ra), ge(la), ge(ra))
          case _ =>
            reservedCheck()
            throw new IllegalArgumentException(
              s"ASOF JOIN: expected `a.k = b.k AND a.t >= b.t`, got: $cond")
        }
        val l = session.spark.table(lt)
        val r = session.spark.table(rt)
        val valueCols = r.columns.toIndexedSeq.filterNot(c => c == rk || c == rtm)
        val view = s"__asof_${asofCounter.incrementAndGet()}"
        graft.operators.AsofJoin.asofJoin(l, r, lk, rk, ltm, rtm, valueCols)
          .createOrReplaceTempView(view)
        cleanups += (() => session.spark.catalog.dropTempView(view))
        rewriteAsofJoin(
          input.substring(0, m.start) + s"$view $la " + input.substring(condEnd),
          session, cleanups)
    }
  }

  /* ---- WITH RECURSIVE[(n)] name [(cols)] AS (body) query ---- */

  private val RecursiveRe = "(?i)^\\s*WITH\\s+RECURSIVE\\b".r
  private val RecursiveAnywhereRe = "(?i)\\bWITH\\s+RECURSIVE\\b".r

  /** Default round cap for `UNION ALL` bodies when `(n)` is omitted — a bag
    * body has no intrinsic fixpoint, so an unbounded generator must be
    * stopped somewhere. Set-semantics (`UNION`) bodies terminate on their
    * own fixpoint and default to no cap, matching the uncapped engines.
    */
  private val DefaultBagRounds = 100

  /** Query-scoped internal view names: the CTE result is registered under
    * one of these, never under the user-visible CTE name (see class doc).
    */
  private val rcteCounter = new java.util.concurrent.atomic.AtomicInteger

  private def rewriteRecursiveWith(input: String, session: EngineSession,
      cleanups: scala.collection.mutable.ArrayBuffer[() => Unit]): String = {
    val m = RecursiveRe.findFirstMatchIn(input).getOrElse(return input)
    val mask = literalMask(input)
    var i = m.end
    def skipWs(): Unit = { while (i < input.length && input(i).isWhitespace) i += 1 }
    def ident(): String = {
      val s = i
      while (i < input.length && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
      input.substring(s, i)
    }
    skipWs()
    // optional (n) round cap — the reference's `Recursive ~> opt(Lp ~> intLit <~ Rp)`
    var maxRounds: Option[Int] = None
    if (i < input.length && input(i) == '(') {
      val close = input.indexOf(')', i)
      require(close > i, "WITH RECURSIVE: unterminated round cap")
      val n = input.substring(i + 1, close).trim.toInt
      require(n >= 0, "WITH RECURSIVE: negative round cap")
      maxRounds = Some(n)
      i = close + 1
      skipWs()
    }
    val name = ident()
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"WITH RECURSIVE: expected a CTE name, got '$name'")
    skipWs()
    // optional (col, ...) schema rename
    var cols: Seq[String] = Nil
    if (i < input.length && input(i) == '(') {
      val close = input.indexOf(')', i)
      require(close > i, "WITH RECURSIVE: unterminated column list")
      cols = input.substring(i + 1, close).split(",").map(_.trim).toSeq
      require(cols.nonEmpty && cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
        "WITH RECURSIVE: expected a simple column list")
      i = close + 1
      skipWs()
    }
    require(i + 2 <= input.length && input.regionMatches(true, i, "AS", 0, 2),
      "WITH RECURSIVE: expected AS")
    i += 2
    skipWs()
    require(i < input.length && input(i) == '(',
      "WITH RECURSIVE: expected parenthesized CTE body")
    val bodyStart = i + 1
    var depth = 1
    i += 1
    while (i < input.length && depth > 0) {
      if (!mask(i)) input(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _   =>
      }
      i += 1
    }
    require(depth == 0, "WITH RECURSIVE: unbalanced CTE body")
    val body = input.substring(bodyStart, i - 1)
    val rest = input.substring(i).trim
    require(!rest.startsWith(","),
      "WITH RECURSIVE: a single recursive CTE element is supported")
    require(rest.nonEmpty,
      "WITH RECURSIVE: missing trailing query after the CTE definition")
    require(!RecursiveAnywhereRe.findAllMatchIn(body)
        .exists(m => !literalMask(body)(m.start)),
      "WITH RECURSIVE: a recursive CTE nested inside the CTE body is not supported")

    val view = s"__graft_rcte_${rcteCounter.incrementAndGet()}_$name"
    executeRecursiveCte(view, name, cols, body, maxRounds, session, cleanups)
    cleanups += (() => session.spark.catalog.dropTempView(view))

    // the trailing query sees the result under the internal name; a trailing
    // query that is itself a recursive WITH recurses, anything deeper is
    // rejected rather than silently left as unparseable text
    val restSub = substName(rest, name, view)
    val out =
      if (RecursiveRe.findFirstMatchIn(restSub).isDefined)
        rewriteRecursiveWith(restSub, session, cleanups)
      else restSub
    require(!RecursiveAnywhereRe.findAllMatchIn(out)
        .exists(m => !literalMask(out)(m.start)),
      "WITH RECURSIVE: only supported as the statement's leading clause")
    out
  }

  /** Split `body` into top-level branches at UNION / UNION ALL connectors
    * (paren depth 0, outside literals; `UNION BY UPDATE` is NOT a split
    * point). Returns the branches and whether every connector was UNION ALL.
    */
  private def splitTopLevelUnion(body: String): (Seq[String], Boolean) = {
    val mask = literalMask(body)
    val depthAt = new Array[Int](body.length)
    var d = 0
    for (i <- body.indices) {
      if (!mask(i) && body(i) == '(') d += 1
      depthAt(i) = d
      if (!mask(i) && body(i) == ')') d -= 1
    }
    val branches = scala.collection.mutable.ArrayBuffer.empty[String]
    var allBag = true
    var start = 0
    "(?i)\\bUNION\\b".r.findAllMatchIn(body)
      .filter(m => !mask(m.start) && depthAt(m.start) == 0)
      .foreach { m =>
        var j = m.end
        while (j < body.length && body(j).isWhitespace) j += 1
        var k = j
        while (k < body.length && body(k).isLetter) k += 1
        body.substring(j, k).toUpperCase match {
          case "BY" => // UNION BY UPDATE — a different operator, not a split
          case "ALL" =>
            branches += body.substring(start, m.start)
            start = k
          case _ =>
            branches += body.substring(start, m.start)
            start = m.end
            allBag = false
        }
      }
    branches += body.substring(start)
    (branches.toSeq, allBag)
  }

  /** Per-index flag: is this position inside a FROM list (the innermost
    * clause at this paren depth is FROM/JOIN, before WHERE/GROUP/…)? Used to
    * tell a table-list comma (`FROM a, b`) from a select-list comma
    * (`SELECT a, b`), so a column coincidentally named like the CTE does not
    * misclassify a base branch as a step branch.
    */
  private def fromListMask(s: String): Array[Boolean] = {
    val mask = literalMask(s)
    val out = new Array[Boolean](s.length)
    val stack = scala.collection.mutable.Stack.empty[Boolean]
    var inFrom = false
    var i = 0
    while (i < s.length) {
      if (!mask(i)) {
        val c = s(i)
        if (c == '(') { stack.push(inFrom); inFrom = false }
        else if (c == ')') inFrom = if (stack.nonEmpty) stack.pop() else false
        else if (c.isLetter || c == '_') {
          val st = i
          while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
          s.substring(st, i).toUpperCase match {
            case "FROM" | "JOIN"                                    => inFrom = true
            case "SELECT" | "WHERE" | "GROUP" | "HAVING" | "ORDER" |
                 "LIMIT" | "WINDOW" | "ON" | "USING" | "UNION" |
                 "INTERSECT" | "EXCEPT"                             => inFrom = false
            case _                                                  =>
          }
          i -= 1 // outer loop advances past the word's last char
        }
      }
      if (i < s.length) out(i) = inFrom
      i += 1
    }
    out
  }

  /** Does `text` reference the CTE `name` — i.e. use it in a table position
    * (right after FROM/JOIN or a FROM-list comma) or as a `name.` column
    * qualifier anywhere? A bare occurrence elsewhere (a column or alias that
    * happens to share the name) does not count.
    */
  private def referencesName(text: String, name: String): Boolean = {
    val mask = literalMask(text)
    lazy val fromMask = fromListMask(text)
    ("(?i)\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
      .findAllMatchIn(text).exists { m =>
        if (mask(m.start)) false
        else if (m.end < text.length && text(m.end) == '.') true // qualifier
        else {
          val p = lastNonWs(text, m.start - 1)
          if (p < 0) false
          else if (text(p) == ',') fromMask(p)
          else {
            var ws = p
            while (ws >= 0 && (text(ws).isLetterOrDigit || text(ws) == '_')) ws -= 1
            val w = text.substring(ws + 1, p + 1).toUpperCase
            w == "FROM" || w == "JOIN"
          }
        }
      }
  }

  /** Number of TABLE-POSITION uses of `name` (after FROM/JOIN or a
    * FROM-list comma; `name.` qualifiers do not count) — distinguishes
    * linear recursion (one self-join operand) from non-linear (the step
    * joins the CTE to itself), which semi-naive deltas cannot serve.
    */
  private def tableRefCount(text: String, name: String): Int = {
    val mask = literalMask(text)
    lazy val fromMask = fromListMask(text)
    ("(?i)\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
      .findAllMatchIn(text).count { m =>
        if (mask(m.start)) false
        else {
          val p = lastNonWs(text, m.start - 1)
          if (p < 0) false
          else if (text(p) == ',') fromMask(p)
          else {
            var ws = p
            while (ws >= 0 && (text(ws).isLetterOrDigit || text(ws) == '_')) ws -= 1
            val w = text.substring(ws + 1, p + 1).toUpperCase
            w == "FROM" || w == "JOIN"
          }
        }
      }
  }

  /** Replace every word-boundary occurrence of `name` outside string
    * literals with `repl` (table refs and `name.` qualifiers alike — see the
    * class doc for the implied name-collision restriction).
    */
  private def substName(text: String, name: String, repl: String): String = {
    val mask = literalMask(text)
    val sb = new StringBuilder
    var last = 0
    ("(?i)\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
      .findAllMatchIn(text).foreach { m =>
        if (!mask(m.start)) {
          sb.append(text.substring(last, m.start)).append(repl)
          last = m.end
        }
      }
    sb.append(text.substring(last)).toString
  }

  /** Run the working-table iteration and register the result under the
    * query-scoped internal view `view`; self-references spelled `name` in
    * the step branches are substituted first.
    *
    * Per-round lineage truncation goes through a persisted `RDD[Row]` +
    * `createDataFrame` rather than `localCheckpoint`: a localCheckpointed
    * frame carries its origin plan's constraints, and when the same
    * checkpoint leaf lands on both sides of the round's anti-join (the
    * frontier is part of the accumulated total), relation deduplication
    * re-instances the leaf without remapping those constraints — Union's
    * constraint rewrite then fails analysis on the stale attribute ids.
    * The RDD round-trip mints fresh attributes and carries no constraints.
    * Intermediate rounds' caches are released via `cleanups` once the
    * statement is analyzed; the final result keeps its cache (the view's
    * backing data) until the context cleaner collects it.
    */
  private def executeRecursiveCte(view: String, name: String, cols: Seq[String],
      body: String, maxRounds: Option[Int], session: EngineSession,
      cleanups: scala.collection.mutable.ArrayBuffer[() => Unit]): Unit = {
    val spark = session.spark
    // the body may itself use the other SQL extensions
    val cooked = rewriteUnionByUpdate(rewriteMatch(body, session))
    val (branches, allBag) = splitTopLevelUnion(cooked)
    val (stepRaw, baseB) = branches.partition(referencesName(_, name))
    // NON-LINEAR branches (the CTE joined to itself, e.g. `FROM tc a JOIN
    // tc b`) must see the full accumulated total every round — a frontier
    // delta would miss pairs combining rows from different rounds. They
    // substitute a second view tracking the total (plain naive evaluation
    // for that branch); linear branches keep the semi-naive delta.
    val viewTotal = s"${view}_total"
    val hasNonLinear = stepRaw.exists(b => tableRefCount(b, name) >= 2)
    val stepB = stepRaw.map { b =>
      if (tableRefCount(b, name) >= 2) substName(b, name, viewTotal)
      else substName(b, name, view)
    }
    def rename(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      if (cols.nonEmpty) df.toDF(cols: _*) else df

    if (stepRaw.isEmpty) { // no self-reference: an ordinary CTE
      rename(spark.sql(cooked)).createOrReplaceTempView(view)
      return
    }
    require(baseB.nonEmpty,
      s"WITH RECURSIVE: CTE '$name' needs at least one base branch not referencing itself")

    val interim = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]
    cleanups += (() => interim.foreach { r =>
      try r.unpersist(false) catch { case _: Exception => () }
    })
    // (rowCount, truncated frame); count doubles as full materialization
    def materialize(df: org.apache.spark.sql.DataFrame): (Long, org.apache.spark.sql.DataFrame) = {
      val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      interim += rdd
      (rdd.count(), spark.createDataFrame(rdd, df.schema))
    }

    if (allBag) {
      // UNION ALL: standard working-table accumulation — each round the step
      // sees only the previous round's rows; stop on an empty step or cap.
      // Non-linear self-joins have no well-defined bag multiplicity under
      // the working-table scheme (the SQL standard requires exactly one
      // recursive reference) — reject rather than answer wrongly.
      require(!hasNonLinear,
        s"WITH RECURSIVE: CTE '$name' is referenced more than once in a UNION ALL step branch; bag-semantics non-linear recursion is not supported (use UNION)")
      val cap = maxRounds.getOrElse(DefaultBagRounds)
      var working = materialize(rename(spark.sql(baseB.mkString(" UNION ALL "))))._2
      var acc = working
      var round = 0
      var done = false
      while (!done && round < cap) {
        working.createOrReplaceTempView(view)
        val (stepN, step) = materialize(rename(spark.sql(stepB.mkString(" UNION ALL "))))
        if (stepN == 0) done = true
        else { acc = acc.union(step); working = step; round += 1 }
      }
      materialize(acc)._2.createOrReplaceTempView(view)
    } else {
      // UNION: semi-naive set evaluation. Each round the step sees only the
      // previous round's genuinely-new rows (the frontier delta) and new
      // rows are deduplicated against everything derived so far — on a
      // transitive closure this joins the frontier against the edges instead
      // of re-deriving the whole closure, and termination is the natural
      // empty-delta fixpoint (monotone bodies only, per the SQL standard).
      // EXCEPT is spelled as a null-safe anti-join with the step side on the
      // left, so only step-side constraints survive into the round's frame.
      val cap = maxRounds.getOrElse(Int.MaxValue)
      var total = materialize(rename(spark.sql(baseB.mkString(" UNION "))).distinct())._2
      var delta = total
      var round = 0
      var done = false
      while (!done && round < cap) {
        delta.createOrReplaceTempView(view)
        if (hasNonLinear) total.createOrReplaceTempView(viewTotal)
        val stepped = rename(spark.sql(stepB.mkString(" UNION "))).distinct()
        val minus = stepped.columns
          .map(c => org.apache.spark.sql.functions.col(s"__rcte_s.`$c`") <=>
            org.apache.spark.sql.functions.col(s"__rcte_t.`$c`"))
          .reduce(_ && _)
        val (freshN, fresh) = materialize(stepped.as("__rcte_s")
          .join(total.as("__rcte_t"), minus, "left_anti"))
        if (freshN == 0) done = true
        else { total = total.union(fresh); delta = fresh; round += 1 }
      }
      materialize(total)._2.createOrReplaceTempView(view)
      if (hasNonLinear) {
        try spark.catalog.dropTempView(viewTotal) catch { case _: Exception => () }
      }
    }
    // the final frame's cache is the view's backing data — keep it
    if (interim.nonEmpty) interim.remove(interim.length - 1)
  }
}
