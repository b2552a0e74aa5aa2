package graft.engine

/** Hand-written lexer + recursive-descent parser for the reference SQL
  * dialect (SURVEY.md §3.1). The reference parses in a single pass with
  * string scanning (`OSQLFilter.extractConditions:167-302`,
  * `OCommandExecutorSQLSelect.parse:89-149`); we produce an explicit
  * [[Ast]] so translation to Catalyst is a pure function.
  *
  * Deviations from the reference (deliberate, documented):
  *  - AND/OR have standard precedence (reference gives every operator
  *    uniform precedence 5, `OQueryOperator.java:29-38`);
  *  - LIMIT with ORDER BY applies after the sort (reference truncates
  *    pre-sort, SURVEY.md §2.8).
  */
object Parser {

  // ---------------------------------------------------------------- lexer
  sealed trait Tok
  final case class TIdent(s: String) extends Tok // raw case preserved
  final case class TStr(s: String) extends Tok
  final case class TNum(s: String) extends Tok
  final case class TRid(cluster: Int, pos: Long) extends Tok
  final case class TPunct(s: String) extends Tok // ( ) [ ] , . @ : #
  final case class TOp(s: String) extends Tok // = <> < <= > >=
  case object TEnd extends Tok

  final case class ParseException(msg: String) extends RuntimeException(msg)

  def lex(input: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') { // string literal, backslash escapes
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done) {
          if (i >= n) throw ParseException("unterminated string literal")
          input(i) match {
            case '\\' if i + 1 < n => sb.append(input(i + 1)); i += 2
            case '\'' => done = true; i += 1
            case ch => sb.append(ch); i += 1
          }
        }
        out += TStr(sb.toString)
      } else if (c == '#' && i + 1 < n && input(i + 1).isDigit) {
        // #<cluster>:<pos> RID literal (ORecordId.java:32-33)
        i += 1
        val (tok, j) = lexRid(input, i)
        out += tok; i = j
      } else if (c.isDigit &&
          ridAhead(input, i)) { // bare 10:3 RID (OSQLFilter.java:102-112)
        val (tok, j) = lexRid(input, i)
        out += tok; i = j
      } else if (c.isDigit || (c == '-' && i + 1 < n && input(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < n && (input(i).isDigit || input(i) == '.' ||
            input(i) == 'e' || input(i) == 'E' ||
            ((input(i) == '+' || input(i) == '-') &&
              (input(i - 1) == 'e' || input(i - 1) == 'E')))) i += 1
        out += TNum(input.substring(start, i))
      } else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_' ||
            input(i) == '$')) i += 1
        out += TIdent(input.substring(start, i))
      } else if (c == '<' || c == '>') {
        if (i + 1 < n && (input(i + 1) == '=' ||
            (c == '<' && input(i + 1) == '>'))) {
          out += TOp(input.substring(i, i + 2)); i += 2
        } else { out += TOp(c.toString); i += 1 }
      } else if (c == '=') { out += TOp("="); i += 1 }
      else if (c == '!' && i + 1 < n && input(i + 1) == '=') {
        out += TOp("<>"); i += 2
      } else if ("()[],.@:#*".indexOf(c) >= 0) {
        out += TPunct(c.toString); i += 1
      } else throw ParseException(s"unexpected character '$c' at $i")
    }
    (out += TEnd).result()
  }

  /** digits ':' digits with a non-ident boundary before — a RID literal. */
  private def ridAhead(s: String, i: Int): Boolean = {
    var j = i
    while (j < s.length && s(j).isDigit) j += 1
    j < s.length && s(j) == ':' && j + 1 < s.length && s(j + 1).isDigit &&
      (i == 0 || !s(i - 1).isLetterOrDigit)
  }

  private def lexRid(s: String, i0: Int): (TRid, Int) = {
    var i = i0
    val c0 = i
    while (i < s.length && s(i).isDigit) i += 1
    // the '#' entry point checks only the first digit — validate the
    // full digits ':' digits shape here (and numeric range) so inputs
    // like `#3I` or a 30-digit cluster fail as parse errors, not as
    // NumberFormatException crashes
    if (i >= s.length || s(i) != ':')
      throw ParseException(s"malformed RID literal at $c0")
    val cluster = s.substring(c0, i).toIntOption.getOrElse(
      throw ParseException(s"RID cluster out of range at $c0"))
    i += 1 // ':'
    val p0 = i
    while (i < s.length && s(i).isDigit) i += 1
    if (i == p0) throw ParseException(s"malformed RID literal at $c0")
    val p = s.substring(p0, i).toLongOption.getOrElse(
      throw ParseException(s"RID position out of range at $c0"))
    (TRid(cluster, p), i)
  }

  // --------------------------------------------------------------- parser
  import Ast._

  def parseSelect(sql: String): SelectStmt = new P(lex(sql)).selectStmt()
  def parseCondition(sql: String): Cond = new P(lex(sql)).conditionOnly()
  def parseStatement(sql: String): Stmt = new P(lex(sql)).statement()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def fail(msg: String): Nothing = {
      // `next()` may already have consumed TEnd when the caller
      // fails — the error report itself must not index past the
      // token vector
      val at = if (pos < toks.length) toks(pos).toString else "<end>"
      throw ParseException(s"$msg (at token $pos: $at)")
    }

    private def isKw(t: Tok, kw: String): Boolean = t match {
      case TIdent(s) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    private def eatKw(kw: String): Unit =
      if (isKw(peek, kw)) pos += 1 else fail(s"expected $kw")
    private def tryKw(kw: String): Boolean =
      if (isKw(peek, kw)) { pos += 1; true } else false
    private def eatPunct(p: String): Unit = peek match {
      case TPunct(`p`) => pos += 1
      case _ => fail(s"expected '$p'")
    }
    private def tryPunct(p: String): Boolean = peek match {
      case TPunct(`p`) => pos += 1; true
      case _ => false
    }
    private def ident(): String = next() match {
      case TIdent(s) => s
      case t => fail(s"expected identifier, got $t")
    }

    def statement(): Stmt = {
      val st = peek match {
        case t if isKw(t, "select") => selectStmt()
        case t if isKw(t, "insert") => insertStmt()
        case t if isKw(t, "update") => updateStmt()
        case t if isKw(t, "delete") => deleteStmt()
        case t if isKw(t, "create") || isKw(t, "remove") ||
            isKw(t, "drop") => ddlStmt()
        case t if isKw(t, "grant") || isKw(t, "revoke") =>
          val revoke = isKw(t, "revoke")
          pos += 1
          val perm = ident()
          eatKw("on")
          // resource segments are identifiers, except a trailing `*`
          // wildcard (`database.class.*` covers every class)
          def seg(): String =
            if (tryPunct("*")) "*" else ident()
          val sb = new StringBuilder(seg())
          while (tryPunct(".")) { sb.append('.').append(seg()) }
          // GRANT … TO role / REVOKE … FROM role (reference syntax)
          eatKw(if (revoke) "from" else "to")
          GrantStmt(perm.toUpperCase, sb.toString, ident(), revoke)
        case t => fail(s"unknown statement start $t")
      }
      // every statement must consume its whole input: a typo'd WHERE
      // must be a parse error, not a silent whole-table UPDATE/DELETE
      peek match { case TEnd => st; case t => fail(s"trailing input $t") }
    }

    def conditionOnly(): Cond = {
      val c = cond()
      peek match { case TEnd => c; case t => fail(s"trailing input $t") }
    }

    // SELECT [proj,…] FROM target [WHERE c] [ORDER BY …] [RANGE …] [LIMIT n]
    def selectStmt(): SelectStmt = {
      eatKw("select")
      val projections =
        if (isKw(peek, "from")) Nil
        else if (tryPunct("*")) Nil
        else {
          val items = scala.collection.mutable.ListBuffer[Projection]()
          var more = true
          while (more) {
            items += projection()
            more = tryPunct(",")
          }
          items.toList
        }
      eatKw("from")
      val tgt = target()
      val where = if (tryKw("where")) Some(cond()) else None
      // trailing clauses accepted in any order (the reference scans for
      // each keyword independently, OCommandExecutorSQLSelect.parse)
      var orderBy: Seq[OrderItem] = Nil
      var range: Option[(RidLit, Option[RidLit])] = None
      var limit: Option[Int] = None
      var more = true
      while (more) {
        if (tryKw("order")) {
          eatKw("by")
          val items = scala.collection.mutable.ListBuffer[OrderItem]()
          var m2 = true
          while (m2) {
            val e = expr()
            val asc =
              if (tryKw("desc")) false
              else { tryKw("asc"); true }
            items += OrderItem(e, asc)
            m2 = tryPunct(",")
          }
          orderBy = items.toList
        } else if (tryKw("range")) {
          val from = ridLit()
          val to = if (tryPunct(",")) Some(ridLit()) else None
          range = Some((from, to))
        } else if (tryKw("limit")) limit = Some(intLit())
        else more = false
      }
      peek match { case TEnd => (); case t => fail(s"trailing input $t") }
      SelectStmt(projections, tgt, where, orderBy, range, limit)
    }

    private def projection(): Projection = {
      // FLATTEN(expr) unnests (OCommandExecutorSQLSelect.applyFlatten)
      if (isKw(peek, "flatten") && toks(pos + 1) == TPunct("(")) {
        pos += 2
        val e = expr()
        eatPunct(")")
        val alias = if (tryKw("as")) Some(ident()) else None
        Projection(e, alias, flatten = true)
      } else {
        val e = expr()
        val alias = if (tryKw("as")) Some(ident()) else None
        Projection(e, alias)
      }
    }

    private def target(): Target = peek match {
      case TRid(c, p) => // FROM 10:3
        pos += 1
        RidsTarget(Seq(RidLit(c, p)))
      case TPunct("[") => // FROM [10:0, 10:1]
        pos += 1
        val rids = scala.collection.mutable.ListBuffer[RidLit]()
        var more = true
        while (more) { rids += ridLit(); more = tryPunct(",") }
        eatPunct("]")
        RidsTarget(rids.toList)
      case TIdent(s) if s.equalsIgnoreCase("cluster") &&
          toks(pos + 1) == TPunct(":") =>
        pos += 2
        ClusterTarget(ident())
      case TIdent(s) if toks(pos + 1) == TPunct("(") =>
        // FROM fn(args…) — pipeline table function target
        pos += 1
        PipelineTarget(s.toLowerCase, argList().toList)
      case TIdent(s) => pos += 1; ClassTarget(s)
      case t => fail(s"bad FROM target $t")
    }

    private def ridLit(): RidLit = next() match {
      case TRid(c, p) => RidLit(c, p)
      case t => fail(s"expected RID, got $t")
    }
    private def intLit(): Int = next() match {
      case TNum(s) => s.toIntOption.getOrElse(
        fail(s"integer literal out of range: $s"))
      case t => fail(s"expected integer, got $t")
    }

    // ------------------------------------------------------- conditions
    // or-expr := and-expr (OR and-expr)*
    private def cond(): Cond = {
      var left = andCond()
      while (tryKw("or")) left = Or(left, andCond())
      left
    }
    private def andCond(): Cond = {
      var left = notCond()
      while (tryKw("and")) left = And(left, notCond())
      left
    }
    private def notCond(): Cond =
      if (tryKw("not")) Not(notCond()) else primaryCond()

    private def primaryCond(): Cond = {
      if (tryPunct("(")) { val c = cond(); eatPunct(")"); return c }
      val left = expr()
      peek match {
        case TOp(op) => pos += 1; Cmp(left, op, expr())
        case t if isKw(t, "like") => pos += 1; Cmp(left, "like", expr())
        case t if isKw(t, "matches") => pos += 1; Cmp(left, "matches", expr())
        case t if isKw(t, "in") => pos += 1; Cmp(left, "in", expr())
        case t if isKw(t, "is") =>
          pos += 1
          val neg = tryKw("not")
          if (tryKw("null")) IsNull(left, neg)
          else if (tryKw("defined")) IsNull(left, !neg) // defined = not null
          else fail("expected NULL or DEFINED after IS")
        case t if isKw(t, "containsall") =>
          pos += 1
          containsBody(left, all = true)
        case t if isKw(t, "contains") =>
          pos += 1
          containsBody(left, all = false)
        case t if isKw(t, "containskey") =>
          pos += 1; Cmp(left, "containskey", expr())
        case t if isKw(t, "containsvalue") =>
          pos += 1; Cmp(left, "containsvalue", expr())
        case t if isKw(t, "containstext") =>
          pos += 1; Cmp(left, "containstext", expr())
        case t if isKw(t, "traverse") =>
          pos += 1
          eatPunct("(")
          val start = intLit()
          eatPunct(",")
          val end = intLit()
          val fields: Seq[String] = if (tryPunct(",")) {
            next() match {
              case TStr(s) => s.split(",").map(_.trim).toSeq
              case t2 => fail(s"expected field list string, got $t2")
            }
          } else Nil
          eatPunct(")")
          eatPunct("(")
          val inner = cond()
          eatPunct(")")
          val lp = left match {
            case p: Path => p
            case _ => fail("TRAVERSE needs a field on the left")
          }
          TraverseCond(lp, start, end, fields, inner)
        case _ =>
          // bare boolean field: `where active`
          BareBool(left)
      }
    }

    /** CONTAINS (inner cond) | CONTAINS <literal> | CONTAINS (v, v…)
      * (OQueryOperatorContains.java:31-67) */
    private def containsBody(left: SqlExpr, all: Boolean): Cond = {
      val op = if (all) "containsall" else "contains"
      val lp = left match {
        case p: Path => p
        case _ => fail("CONTAINS needs a field on the left")
      }
      if (peek == TPunct("(")) {
        val save = pos
        pos += 1
        // `(name = 'x')` = inner condition; `('a')` / `('a','b')` =
        // literal membership (a bare expression parses as BareBool)
        try {
          val inner = cond()
          peek match {
            case TPunct(",") => // it was a value list after all
              pos = save
              Cmp(left, op, parenList())
            case _ =>
              eatPunct(")")
              inner match {
                case BareBool(e) => Cmp(left, op, e)
                case c => ContainsCond(lp, c, all)
              }
          }
        } catch {
          case _: ParseException =>
            pos = save
            Cmp(left, op, parenList())
        }
      } else Cmp(left, op, expr())
    }

    /** `( e [, e…] )` → single expr or ListLit */
    private def parenList(): SqlExpr = {
      eatPunct("(")
      val items = scala.collection.mutable.ListBuffer[SqlExpr]()
      var more = true
      while (more) { items += expr(); more = tryPunct(",") }
      eatPunct(")")
      if (items.size == 1) items.head else ListLit(items.toList)
    }

    // ----------------------------------------------------- expressions
    private def expr(): SqlExpr = peek match {
      case TStr(s) => pos += 1; Lit(s)
      case TNum(s) =>
        pos += 1
        if (s.contains('.') || s.contains('e') || s.contains('E'))
          Lit(s.toDoubleOption.getOrElse(
            fail(s"numeric literal out of range: $s")))
        else Lit(s.toLongOption.getOrElse(
          fail(s"numeric literal out of range: $s")))
      case TRid(c, p) => pos += 1; RidLit(c, p)
      case TPunct("[") =>
        pos += 1
        val items = scala.collection.mutable.ListBuffer[SqlExpr]()
        if (!tryPunct("]")) {
          var more = true
          while (more) { items += expr(); more = tryPunct(",") }
          eatPunct("]")
        }
        ListLit(items.toList)
      case TPunct("@") => // record attribute head: @rid, @class, …
        pos += 1
        val name = ident()
        Path(AttrSeg(name.toLowerCase) :: tailSegs())
      case TIdent(s)
          if s.equalsIgnoreCase("null") => pos += 1; Lit(null)
      case TIdent(s) if s.equalsIgnoreCase("true") => pos += 1; Lit(true)
      case TIdent(s) if s.equalsIgnoreCase("false") => pos += 1; Lit(false)
      case TIdent(_) =>
        val name = ident()
        val head: Seg =
          if (peek == TPunct("(")) MethodSeg(name.toLowerCase, argList())
          else FieldSeg(name)
        Path(head :: tailSegs())
      case t => fail(s"expected expression, got $t")
    }

    private def tailSegs(): List[Seg] = {
      val segs = scala.collection.mutable.ListBuffer[Seg]()
      while (peek == TPunct(".")) {
        pos += 1
        val name = ident()
        segs +=
          (if (peek == TPunct("(")) MethodSeg(name.toLowerCase, argList())
           else FieldSeg(name))
      }
      segs.toList
    }

    private def argList(): Seq[SqlExpr] = {
      eatPunct("(")
      val args = scala.collection.mutable.ListBuffer[SqlExpr]()
      if (!tryPunct(")")) {
        var more = true
        while (more) { args += expr(); more = tryPunct(",") }
        eatPunct(")")
      }
      args.toList
    }

    // ------------------------------------------------------------- DML
    // INSERT INTO <class> (f,…) VALUES (v,…)  (OCommandExecutorSQLInsert)
    private def insertStmt(): InsertStmt = {
      eatKw("insert"); eatKw("into")
      val cls = ident()
      eatPunct("(")
      val fields = scala.collection.mutable.ListBuffer[String]()
      var more = true
      while (more) { fields += ident(); more = tryPunct(",") }
      eatPunct(")")
      eatKw("values")
      eatPunct("(")
      val values = scala.collection.mutable.ListBuffer[SqlExpr]()
      more = true
      while (more) { values += expr(); more = tryPunct(",") }
      eatPunct(")")
      InsertStmt(cls, fields.toList, values.toList)
    }

    // UPDATE <class> SET f=v,… / ADD f=v / PUT f=k,v / REMOVE f[=v] [WHERE]
    private def updateStmt(): UpdateStmt = {
      eatKw("update")
      val cls = ident()
      val sets = scala.collection.mutable.ListBuffer[SetOp]()
      var more = true
      while (more) {
        if (tryKw("set")) {
          var inner = true
          while (inner) {
            val f = ident()
            peek match { case TOp("=") => pos += 1; case t => fail(s"expected = got $t") }
            sets += SetField(f, expr())
            inner = tryPunct(",")
          }
        } else if (tryKw("add")) {
          val f = ident()
          peek match { case TOp("=") => pos += 1; case t => fail(s"expected = got $t") }
          sets += AddToCollection(f, expr())
        } else if (tryKw("put")) {
          val f = ident()
          peek match { case TOp("=") => pos += 1; case t => fail(s"expected = got $t") }
          val k = expr(); eatPunct(","); sets += PutToMap(f, k, expr())
        } else if (tryKw("remove")) {
          val f = ident()
          if (peek == TOp("=")) { pos += 1; sets += RemoveFromCollection(f, Some(expr())) }
          else sets += RemoveFromCollection(f, None)
        } else more = false
      }
      val where = if (tryKw("where")) Some(cond()) else None
      UpdateStmt(cls, sets.toList, where)
    }

    private def deleteStmt(): DeleteStmt = {
      eatKw("delete"); eatKw("from")
      val cls = ident()
      val where = if (tryKw("where")) Some(cond()) else None
      DeleteStmt(cls, where)
    }

    // CREATE CLASS/PROPERTY/INDEX/LINK, REMOVE PROPERTY/INDEX (§2.9)
    private def ddlStmt(): Stmt = {
      val create = tryKw("create")
      if (!create && !tryKw("remove")) eatKw("drop")
      if (tryKw("class")) {
        val name = ident()
        if (create) {
          val sup = if (tryKw("extends")) Some(ident()) else None
          CreateClassStmt(name, sup)
        } else RemoveClassStmt(name)
      } else if (tryKw("property")) {
        val cls = ident(); eatPunct("."); val f = ident()
        if (create) {
          val tpe = ident()
          val linked = peek match {
            case TIdent(_) => Some(ident())
            case _ => None
          }
          CreatePropertyStmt(cls, f, tpe.toUpperCase, linked)
        } else RemovePropertyStmt(cls, f)
      } else if (tryKw("index")) {
        val cls = ident(); eatPunct("."); val f = ident()
        if (create) {
          val kind = peek match {
            case TIdent(k) if Set("unique", "notunique", "fulltext")
                .contains(k.toLowerCase) => pos += 1; k.toUpperCase
            case _ => "NOTUNIQUE"
          }
          CreateIndexStmt(cls, f, kind)
        } else RemoveIndexStmt(cls, f)
      } else if (tryKw("link")) {
        // CREATE LINK [name] FROM c1.f1 TO c2.f2 [INVERSE]
        if (!create) fail("REMOVE LINK is not supported")
        val name = if (!isKw(peek, "from")) Some(ident()) else None
        eatKw("from")
        val c1 = ident(); eatPunct("."); val f1 = ident()
        eatKw("to")
        val c2 = ident(); eatPunct("."); val f2 = ident()
        val inverse = tryKw("inverse")
        CreateLinkStmt(name, c1, f1, c2, f2, inverse)
      } else fail("expected CLASS, PROPERTY, INDEX or LINK")
    }
  }
}
