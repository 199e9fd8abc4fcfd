package graft.api

/** Pre-rewriter closing the three reference SQL-surface extensions that
  * Spark's parser lacks (all already exist as API calls; this gives them
  * SQL-text form, SURVEY §2.7):
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
  *     reference `name`; the step branches may. Semantics follow the SQL
  *     standard working-table scheme: with `UNION` the body is iterated to a
  *     set fixpoint (each round re-derives `base ∪ step(T)`, stopping when
  *     the multiset stops changing or after n rounds — the `iterateToFixpoint`
  *     API op); with `UNION ALL` rows accumulate bag-style until a round's
  *     step yields nothing (or n rounds). The final relation is registered as
  *     a temp view under `name` and the trailing query text is returned.
  *
  * The MATCH/UBU rewrites are purely textual (token-level, paren-balanced);
  * the recursive CTE additionally executes the iteration (it has no
  * single-statement Spark SQL equivalent). Anything else is left untouched;
  * Spark's parser/analyzer then owns the result.
  */
object SqlRewriter {

  def rewrite(input: String, session: EngineSession): String =
    rewriteUnionByUpdate(rewriteMatch(rewriteRecursiveWith(input, session), session))

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

  /* ---- WITH RECURSIVE[(n)] name [(cols)] AS (body) query ---- */

  private val RecursiveRe = "(?i)^\\s*WITH\\s+RECURSIVE\\b".r

  /** Default round cap when `(n)` is omitted — set-semantics bodies usually
    * reach their fixpoint long before this; bag bodies stop on an empty step.
    */
  private val DefaultMaxRounds = 100

  private def rewriteRecursiveWith(input: String, session: EngineSession): String = {
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
    var maxRounds = DefaultMaxRounds
    if (i < input.length && input(i) == '(') {
      val close = input.indexOf(')', i)
      require(close > i, "WITH RECURSIVE: unterminated round cap")
      maxRounds = input.substring(i + 1, close).trim.toInt
      require(maxRounds >= 0, "WITH RECURSIVE: negative round cap")
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

    executeRecursiveCte(name, cols, body, maxRounds, session)
    rest
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

  private def referencesName(text: String, name: String): Boolean = {
    val mask = literalMask(text)
    ("(?i)\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
      .findAllMatchIn(text).exists(m => !mask(m.start))
  }

  /** Run the working-table iteration and register the result under `name`. */
  private def executeRecursiveCte(name: String, cols: Seq[String], body: String,
      maxRounds: Int, session: EngineSession): Unit = {
    val spark = session.spark
    // the body may itself use the other SQL extensions
    val cooked = rewriteUnionByUpdate(rewriteMatch(body, session))
    val (branches, allBag) = splitTopLevelUnion(cooked)
    val (stepB, baseB) = branches.partition(referencesName(_, name))
    def rename(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      if (cols.nonEmpty) df.toDF(cols: _*) else df

    if (stepB.isEmpty) { // no self-reference: an ordinary CTE
      rename(spark.sql(cooked)).createOrReplaceTempView(name)
      return
    }
    require(baseB.nonEmpty,
      s"WITH RECURSIVE: CTE '$name' needs at least one base branch not referencing itself")

    if (allBag) {
      // UNION ALL: standard working-table accumulation — each round the step
      // sees only the previous round's rows; stop on an empty step or cap.
      // Lineage is truncated per round (localCheckpoint) like iterate().
      var working = rename(spark.sql(baseB.mkString(" UNION ALL "))).localCheckpoint(true)
      var acc = working
      var round = 0
      var done = false
      while (!done && round < maxRounds) {
        working.createOrReplaceTempView(name)
        val step = rename(spark.sql(stepB.mkString(" UNION ALL "))).localCheckpoint(true)
        if (step.isEmpty) done = true
        else { acc = acc.union(step); working = step; round += 1 }
      }
      acc.localCheckpoint(true).createOrReplaceTempView(name)
    } else {
      // UNION: re-derive `base ∪ step(T)` to a set fixpoint (the
      // iterateToFixpoint semantics, EngineDataFrame.scala) with cap n
      var cur = rename(spark.sql(baseB.mkString(" UNION "))).distinct().localCheckpoint(true)
      var round = 0
      var done = false
      while (!done && round < maxRounds) {
        cur.createOrReplaceTempView(name)
        val next = rename(spark.sql(cooked)).localCheckpoint(true)
        done = next.exceptAll(cur).limit(1).count() +
          cur.exceptAll(next).limit(1).count() == 0
        cur = next
        round += 1
      }
      cur.createOrReplaceTempView(name)
    }
  }
}
