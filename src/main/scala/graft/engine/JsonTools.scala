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
    val manifest = cat.all.map { cls =>
      val links = cls.links.map(l =>
        s"""{"field":"${l.field}","target":"${l.target}","srcKey":"${l.srcKey}","dstKey":"${l.dstKey}","multi":${l.multi}}""")
        .mkString("[", ",", "]")
      val props = cat.propsOf(cls.name).map(p =>
        s"""{"name":"${p.name}","type":"${p.tpe}"}""").mkString("[", ",", "]")
      s"""{"name":"${cls.name}","superClass":${cls.superClass.map(s => "\"" + s + "\"").getOrElse("null")},"clusterId":${cls.clusterId},"ridPosCol":${cls.ridPosCol.map(s => "\"" + s + "\"").getOrElse("null")},"links":$links,"properties":$props}"""
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
      val links = Option(
          r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("links"))
        .getOrElse(scala.collection.Seq()).toSeq.map { l =>
          LinkSpec(l.getAs[String]("field"), l.getAs[String]("target"),
            l.getAs[String]("srcKey"), l.getAs[String]("dstKey"),
            l.getAs[Boolean]("multi"))
        }
      cat.register(ClassDef(name, _ => data,
        Option(r.getAs[String]("superClass")), links,
        r.getAs[Long]("clusterId").toInt,
        Option(r.getAs[String]("ridPosCol"))))
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
