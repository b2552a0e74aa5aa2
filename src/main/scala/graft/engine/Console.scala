package graft.engine

import java.io.{BufferedReader, PrintWriter}

import org.apache.spark.sql.DataFrame

/** Interactive console over [[GraftSession]] — the user-facing REPL the
  * reference ships as `tools/.../console/OConsoleDatabaseApp.java`
  * (connect / select / DML / DDL / browse / classes / info class /
  * dictionary ops / export-import / tx verbs, results printed as an
  * aligned table). This is a thin text loop over the session surface:
  * every statement goes through `command()` (parser + ACL + hooks), so
  * the console adds NO new engine behavior — exactly the reference's
  * design, where the console delegates to the database API.
  *
  * Scripted-input friendly (reads one verb per line until EOF), which
  * is also how the spec drives it. Interactive entry point:
  * {{{ sbt "runMain graft.Console [durable-dir]" }}}
  */
final class Console(spark: org.apache.spark.sql.SparkSession,
    in: BufferedReader, out: PrintWriter) {

  private var session: Option[GraftSession] = None
  /** rows printed per result table (reference console caps displays;
    * `set maxrows N` adjusts). */
  private var maxRows = 20

  private def p(s: String): Unit = { out.println(s); out.flush() }

  private def need: GraftSession = session.getOrElse(
    throw new IllegalStateException(
      "no database open — use: connect <dir> [user password]"))

  /** aligned tabular rendering (the reference prints padded columns —
    * OConsoleDatabaseApp.printRecord); driver-side take() is bounded
    * by [[maxRows]]. */
  private def table(df: DataFrame): String = {
    val rows = df.take(maxRows + 1)
    val shown = rows.take(maxRows)
    val header = df.columns.toSeq
    val cells = shown.map(_.toSeq.map {
      case null => "null"
      case b: Array[Byte] => s"<${b.length} bytes>"
      case a: Array[_] => a.mkString("[", ",", "]")
      case s: Seq[_] => s.mkString("[", ",", "]")
      case v => v.toString
    })
    val widths = header.indices.map(i =>
      (header(i).length +: cells.map(_(i).length)).max)
    def line(vs: Seq[String]) = vs.zip(widths)
      .map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    val body = (Seq(sep, line(header), sep) ++
      cells.map(c => line(c.toSeq)) :+ sep).mkString("\n")
    val more = if (rows.length > maxRows)
      s"\n(truncated at $maxRows rows — `set maxrows N` to raise)" else ""
    body + more
  }

  private def show(df: DataFrame): Unit = p(table(df))

  /** one console line; returns false on quit. */
  def dispatch(lineRaw: String): Boolean = {
    val line = lineRaw.trim
    if (line.isEmpty || line.startsWith("#")) return true
    val lower = line.toLowerCase
    val words = line.split("\\s+").toSeq
    try {
      lower match {
        case "quit" | "exit" => return false
        case "help" | "?" => p(help)
        case _ if lower.startsWith("connect ") =>
          val args = words.tail
          val g0 = GraftSession.openDurable(spark, args.head)
          session = Some(args match {
            case Seq(_, user, pass) => g0.authenticate(user, pass)
            case _ => g0
          })
          p(s"connected to '${args.head}'")
        case "disconnect" | "close database" =>
          session = None; p("disconnected")
        case _ if lower.startsWith("user ") =>
          // re-bind the session to a principal (authenticate parity)
          session = Some(need.authenticate(words(1), words(2)))
          p(s"bound to user '${words(1)}'")
        case _ if lower.startsWith("set maxrows ") =>
          maxRows = words.last.toInt; p(s"maxrows = $maxRows")
        case _ if lower.startsWith("create user ") =>
          // console-level verb (the dialect has no CREATE USER; the
          // reference manages users as OUser documents)
          need.createUser(words(2), words(3),
            words.drop(4).flatMap(_.split(',')))
          p(s"user '${words(2)}' created")
        case "classes" =>
          need.catalog.all.foreach(d => p(
            s"${d.name}${d.superClass.fold("")(s => s" extends $s")}"))
        case _ if lower.startsWith("info class ") =>
          val cls = words.last
          val props = need.catalog.propsOf(cls)
          p(s"class ${need.catalog.get(cls).name}: " +
            s"${props.size} declared properties")
          props.foreach(pr => p(s"  ${pr.name} ${pr.tpe}" +
            (if (pr.mandatory) " mandatory" else "") +
            (if (pr.notNull) " notnull" else "")))
        case _ if lower.startsWith("browse class ") =>
          show(need.browseClass(words.last))
        case _ if lower.startsWith("explain ") =>
          p(need.explain(line.substring("explain ".length)))
        case "dictionary keys" =>
          need.dictionary.keys.sorted.foreach(p)
        case _ if lower.startsWith("dictionary get ") =>
          need.dictionary.get(words.last) match {
            case Some(df) => show(df)
            case None => p(s"no entry '${words.last}'")
          }
        case _ if lower.startsWith("dictionary put ") =>
          need.dictionary.put(words(2), words(3), words(4).toLong)
          p("ok")
        case _ if lower.startsWith("dictionary remove ") =>
          need.dictionary.remove(words.last); p("ok")
        case _ if lower.startsWith("export database ") =>
          need.exportDatabase(words.last); p(s"exported to ${words.last}")
        case _ if lower.startsWith("import database ") =>
          need.importDatabase(words.last); p(s"imported from ${words.last}")
        case "begin" => need.begin(); p("transaction begun")
        case "commit" => need.commit(); p("committed")
        case "rollback" => need.rollback(); p("rolled back")
        case _ =>
          // everything else IS the dialect: select/insert/update/
          // delete/create/remove/grant/revoke/traverse…
          show(need.command(line))
      }
    } catch {
      case e: Exception => p(s"error: ${e.getMessage}")
    }
    true
  }

  def run(): Unit = {
    p("graft console — `help` for commands, `quit` to exit")
    var go = true
    while (go) {
      out.print("graft> "); out.flush()
      val line = in.readLine()
      if (line == null) go = false else go = dispatch(line)
    }
  }

  private def help: String =
    """connect <dir> [user pass]   open a durable database directory
      |user <name> <pass>          re-bind the session to a principal
      |<sql>                       any dialect statement (select/insert/
      |                            update/delete/create/grant/…)
      |explain <select …>          formatted physical plan
      |browse class <name>         all records of a class
      |classes / info class <n>    schema listing
      |dictionary keys|get|put|remove
      |export database <dir> / import database <dir>
      |begin / commit / rollback   transaction control
      |set maxrows <n>             table row cap
      |disconnect / quit""".stripMargin
}
