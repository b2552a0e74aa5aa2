package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSON export/import + fetch-plan materialization (SURVEY.md §2.1
  * `ODatabaseExport/Import`, §2.10 `OFetchHelper` fetch plans).
  *
  * Export writes one JSON dataset per class plus a manifest with the
  * schema metadata (classes, superclasses, links, properties, indexes)
  * — the whole-db dump the reference produces as a single JSON file,
  * reshaped for distributed write (a directory per class).
  *
  * Fetch plans (`field:depth` pairs, `*:n` wildcard, `-1` unbounded)
  * control how deep link fields are resolved into nested documents
  * when materializing JSON — the reference uses them to pre-ship
  * linked records over the wire (`ONetworkProtocolBinary.java:478-515`);
  * here they bound the join expansion.
  */
object JsonTools {

  // -------------------------------------------------------- export
  def exportDatabase(session: GraftSession, dir: String): Unit = {
    val cat = session.catalog
    cat.all.foreach { cls =>
      cls.provider(session.spark).write.mode("overwrite")
        .json(s"$dir/${cls.name.toLowerCase}")
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def jopt(o: Option[String]): String = o.map(jstr).getOrElse("null")
    val manifest = cat.all.map { cls =>
      val clsKey = cls.name.toLowerCase
      val links = cls.links.map(l =>
        s"""{"field":${jstr(l.field)},"target":${jstr(l.target)},""" +
          s""""srcKey":${jstr(l.srcKey)},"dstKey":${jstr(l.dstKey)},""" +
          s""""multi":${l.multi},"srcIsArray":${l.srcIsArray}}""")
        .mkString("[", ",", "]")
      // own properties only (superclass props are exported with the
      // superclass), full constraint fidelity
      val props = cat.properties.collect {
        case ((c, _), p) if c == clsKey =>
          s"""{"name":${jstr(p.name)},"type":${jstr(p.tpe)},""" +
            s""""mandatory":${p.mandatory},"notNull":${p.notNull},""" +
            s""""min":${jopt(p.min)},"max":${jopt(p.max)},""" +
            s""""regexp":${jopt(p.regexp)},""" +
            s""""linkedClass":${jopt(p.linkedClass)}}"""
      }.mkString("[", ",", "]")
      val idx = cat.indexes.collect {
        case ((c, f), kind) if c == clsKey =>
          s"""{"field":${jstr(f)},"kind":${jstr(kind)}}"""
      }.mkString("[", ",", "]")
      s"""{"name":${jstr(cls.name)},"superClass":${jopt(cls.superClass)},""" +
        s""""clusterId":${cls.clusterId},""" +
        s""""ridPosCol":${jopt(cls.ridPosCol)},"links":$links,""" +
        s""""properties":$props,"indexes":$idx}"""
    }.mkString("[", ",\n", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/manifest.json"), manifest)
  }

  // -------------------------------------------------------- import
  def importDatabase(session: GraftSession, dir: String): Unit = {
    val spark = session.spark
    val cat = session.catalog
    val manifest = spark.read.option("multiLine", true)
      .json(s"$dir/manifest.json")
    manifest.collect().foreach { r =>
      val name = r.getAs[String]("name")
      val data = spark.read.json(s"$dir/${name.toLowerCase}")
      def rows(field: String): Seq[org.apache.spark.sql.Row] =
        Option(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](field))
          .getOrElse(scala.collection.Seq()).toSeq
      val links = rows("links").map { l =>
        LinkSpec(l.getAs[String]("field"), l.getAs[String]("target"),
          l.getAs[String]("srcKey"), l.getAs[String]("dstKey"),
          l.getAs[Boolean]("multi"), l.getAs[Boolean]("srcIsArray"))
      }
      cat.register(ClassDef(name, _ => data,
        Option(r.getAs[String]("superClass")), links,
        r.getAs[Long]("clusterId").toInt,
        Option(r.getAs[String]("ridPosCol"))))
      // JSON inference may drop fields that are null in every record —
      // read optional columns defensively
      def strOpt(row: org.apache.spark.sql.Row, f: String): Option[String] =
        if (row.schema.fieldNames.contains(f)) Option(row.getAs[String](f))
        else None
      def boolOf(row: org.apache.spark.sql.Row, f: String): Boolean =
        row.schema.fieldNames.contains(f) && row.getAs[Boolean](f)
      rows("properties").foreach { p =>
        cat.setProperty(PropertyDef(name, p.getAs[String]("name"),
          p.getAs[String]("type"), boolOf(p, "mandatory"),
          boolOf(p, "notNull"), strOpt(p, "min"), strOpt(p, "max"),
          strOpt(p, "regexp"), strOpt(p, "linkedClass")))
      }
      rows("indexes").foreach { i =>
        cat.indexes((name.toLowerCase,
          i.getAs[String]("field").toLowerCase)) = i.getAs[String]("kind")
      }
    }
  }

  // ---------------------------------------------- fetch-plan JSON
  /** parse "field:depth field2:depth2 *:n" (space- or comma-separated). */
  def parseFetchPlan(plan: String): Map[String, Int] =
    plan.split("[,\\s]+").filter(_.nonEmpty).map { part =>
      val Array(f, d) = part.split(":")
      f.trim -> d.trim.toInt
    }.toMap

  private val MaxUnbounded = 5 // cap for `-1` plans (cycle safety)

  /** materialize a class as JSON documents with link fields expanded to
    * nested objects per the fetch plan. Returns (key, json). */
  def fetchJson(session: GraftSession, clsName: String,
      fetchPlan: String = ""): DataFrame = {
    val plan = parseFetchPlan(fetchPlan)
    val cat = session.catalog
    val cls = cat.get(clsName)
    val keyCol = cls.ridPosCol.getOrElse(
      throw new IllegalStateException(s"class ${cls.name} has no key"))
    val doc = docFrame(session, cls, plan, Set(cls.name.toLowerCase))
    doc.select(col("__key").as("key"), to_json(col("__doc")).as("json"))
  }

  /** recursive document struct builder: (row key, __doc struct with
    * links of positive remaining depth expanded). Each expansion level
    * is one equi-join (aggregated pre-join for multi-links); visited
    * classes stop cycles. */
  private def docFrame(session: GraftSession, cls: ClassDef,
      plan: Map[String, Int], visited: Set[String]): DataFrame = {
    val cat = session.catalog
    val base = cat.table(cls.name)
    val keyCol = cls.ridPosCol.get
    val ownCols = base.columns.filterNot(c =>
      c == "_rid" || c == "_class" || c.startsWith("__"))

    var df = base
    val nested = scala.collection.mutable.ListBuffer[(String, Column)]()
    cls.links.foreach { l =>
      val depth = plan.getOrElse(l.field,
        plan.getOrElse("*", 0)) match {
        case -1 => MaxUnbounded
        case d => d
      }
      val target = cat.get(l.target)
      if (depth > 0 && !visited.contains(target.name.toLowerCase) &&
          target.ridPosCol.isDefined) {
        val subPlan = plan.map { case (k, v) =>
          k -> (if (v == -1) -1 else v - 1) }
        val sub = docFrame(session, target, subPlan,
          visited + target.name.toLowerCase)
        val pfx = s"__f_${l.field}_"
        if (l.multi) {
          // pre-aggregate the many side BEFORE joining (1:1 join)
          val tKey = cat.table(target.name)
            .select(col(l.dstKey).as(s"${pfx}k"),
              col(target.ridPosCol.get).as(s"${pfx}tk"))
          val items = tKey.join(sub, col(s"${pfx}tk") === sub("__key"))
            .groupBy(col(s"${pfx}k"))
            .agg(collect_list(col("__doc")).as(s"${pfx}docs"))
          df = df.join(items, col(l.srcKey) === col(s"${pfx}k"), "left")
          nested += l.field -> col(s"${pfx}docs")
        } else {
          val tKey = cat.table(target.name)
            .select(col(l.dstKey).as(s"${pfx}k"),
              col(target.ridPosCol.get).as(s"${pfx}tk"))
          val one = tKey.join(sub, col(s"${pfx}tk") === sub("__key"))
            .select(col(s"${pfx}k"), col("__doc").as(s"${pfx}doc"))
          df = df.join(one, col(l.srcKey) === col(s"${pfx}k"), "left")
          nested += l.field -> col(s"${pfx}doc")
        }
      }
    }
    val fields = ownCols.map(c => col(c).as(c)) ++
      nested.map { case (n, c) => c.as(n) }
    df.select(col(keyCol).cast("long").as("__key"),
      struct(fields: _*).as("__doc"))
  }
}
