package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** JSON export/import + fetch-plan materialization (SURVEY.md §2.1
  * `ODatabaseExport/Import`, §2.10 `OFetchHelper` fetch plans).
  *
  * Export writes one JSON dataset per class plus a manifest carrying
  * the schema metadata (classes, superclasses, links, properties,
  * indexes, AND each class's exact Spark schema) — the whole-db dump
  * the reference produces as a single JSON file, reshaped for
  * distributed write (a directory per class). Import reads data with
  * the recorded schema, so all-null columns and empty classes survive
  * the roundtrip (JSON inference would drop both). The manifest is
  * written through the Hadoop FileSystem of `dir`, landing beside the
  * data on whatever store it names.
  *
  * Fetch plans (`field:depth` pairs, `*:n` wildcard, `-1` unbounded
  * but capped) control how deep link fields are resolved into nested
  * documents; recursion is bounded by remaining depth, so
  * self-referential links expand to exactly the requested depth.
  */
object JsonTools {

  // ------------------------------------------------------- compare
  /** Database deep-compare (reference `ODatabaseCompare.java:47-124`:
    * shallow cluster-count pass, then record-by-record content
    * compare). Spark-first reshape: per class, a row count plus an
    * ORDER-FREE content hash — the sum of a 60-bit hash of each
    * record's canonical JSON (columns sorted by name) — so record
    * identity, not storage position, decides equality; the reference
    * walks cluster positions because its records live at positions,
    * ours are unordered datasets by design. `_rid`/`_class`/`_version`
    * metadata is excluded (documented deviation: storage metadata is
    * engine-local; content decides). One distributed aggregation per
    * class; the report is one row per class name — control-plane
    * sized. Returns (cls, n_a, n_b, equal), ordered by class name. */
  def compareDatabases(a: GraftSession, b: GraftSession): DataFrame = {
    def content(s: GraftSession, name: String): Option[(Long, Long)] =
      if (!s.catalog.contains(name)) None
      else {
        val full = s.catalog.table(name)
        val df = full.drop("_rid", "_class", "_version")
        // metadata-only class: no content to hash, but the ROW COUNT
        // still distinguishes databases (two empty-schema classes with
        // different record counts are not equal)
        if (df.columns.isEmpty) Some((full.count(), 0L))
        else {
          val canon = graft.ops.TextOps.hash60(
            to_json(struct(df.columns.sorted.map(col): _*)))
          val r = df.agg(count(lit(1)), sum(canon)).collect().head
          Some((r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
        }
      }
    val names = (a.catalog.all.map(_.name.toLowerCase) ++
      b.catalog.all.map(_.name.toLowerCase)).distinct.sorted
    val rows = names.map { n =>
      val ca = content(a, n)
      val cb = content(b, n)
      (n, ca.map(_._1).getOrElse(-1L), cb.map(_._1).getOrElse(-1L),
        ca.isDefined && cb.isDefined && ca == cb)
    }
    import a.spark.implicits._
    rows.toDF("cls", "n_a", "n_b", "equal")
  }

  // -------------------------------------------------------- export
  /** whole-db JSON dump (reference `ODatabaseExport`). `includeClasses`
    * mirrors the reference exporter's class filter: when given, only
    * the named classes (case-insensitive) are dumped. */
  def exportDatabase(session: GraftSession, dir: String,
      includeClasses: Option[Set[String]] = None): Unit = {
    val cat = session.catalog
    val include = includeClasses.map(_.map(_.toLowerCase))
    val chosen = cat.all.filter(c =>
      include.forall(_.contains(c.name.toLowerCase)))
    val schemas = chosen.map { cls =>
      val df = cls.provider(session.spark)
      if (df.schema.nonEmpty)
        df.write.mode("overwrite").json(s"$dir/${cls.name.toLowerCase}")
      cls.name.toLowerCase -> df.schema
    }.toMap
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def jopt(o: Option[String]): String = o.map(jstr).getOrElse("null")
    val manifest = chosen.map { cls =>
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
        s""""properties":$props,"indexes":$idx,""" +
        s""""schemaJson":${jstr(schemas(clsKey).json)}}"""
    }.mkString("[", ",\n", "]")
    // write through the dir's own FileSystem (hdfs://, s3a://, file:…)
    // so the manifest lands beside the data, not on the driver disk
    val path = new org.apache.hadoop.fs.Path(dir, "manifest.json")
    val fs = path.getFileSystem(
      session.spark.sessionState.newHadoopConf())
    val out = fs.create(path, true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  // -------------------------------------------------------- import
  def importDatabase(session: GraftSession, dir: String): Unit = {
    val spark = session.spark
    val cat = session.catalog
    val manifest = spark.read.option("multiLine", true)
      .json(s"$dir/manifest.json")
    manifest.collect().foreach { r =>
      val name = r.getAs[String]("name")
      val schema = DataType.fromJson(r.getAs[String]("schemaJson"))
        .asInstanceOf[StructType]
      // explicit schema: empty classes and all-null columns roundtrip
      val data =
        if (schema.isEmpty) spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        else spark.read.schema(schema).json(s"$dir/${name.toLowerCase}")
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
      part.split(":") match {
        case Array(f, d) if d.trim.matches("-?\\d+") =>
          f.trim -> d.trim.toInt
        case _ => throw new IllegalArgumentException(
          s"bad fetch plan token '$part' (expected field:depth)")
      }
    }.toMap

  private val MaxUnbounded = 3 // cap for `-1` plans (self-links expand per level)

  /** materialize a class as JSON documents with link fields expanded to
    * nested objects per the fetch plan. Returns (key, json). */
  def fetchJson(session: GraftSession, clsName: String,
      fetchPlan: String = ""): DataFrame = {
    // normalize unbounded depths up front: recursion is then bounded by
    // strictly-decreasing depth alone, so self-links expand correctly
    val plan = parseFetchPlan(fetchPlan).map { case (k, v) =>
      k -> (if (v == -1) MaxUnbounded else math.min(v, MaxUnbounded))
    }
    val cat = session.catalog
    val cls = cat.get(clsName)
    cls.ridPosCol.getOrElse(
      throw new IllegalStateException(s"class ${cls.name} has no key"))
    val doc = docFrame(session, cls, plan)
    doc.select(col("__key").as("key"), to_json(col("__doc")).as("json"))
  }

  /** recursive document struct builder: (row key, __doc struct with
    * links of positive remaining depth expanded). Each expansion level
    * is one equi-join (aggregated pre-join for multi-links and
    * RID-collection links). */
  private def docFrame(session: GraftSession, cls: ClassDef,
      plan: Map[String, Int]): DataFrame = {
    val cat = session.catalog
    val base = cat.table(cls.name)
    val keyCol = cls.ridPosCol.get
    val ownCols = base.columns.filterNot(c =>
      c == "_rid" || c == "_class" || c.startsWith("__"))

    var df = base
    val nested = scala.collection.mutable.ListBuffer[(String, Column)]()
    cls.links.foreach { l =>
      val depth = plan.getOrElse(l.field, plan.getOrElse("*", 0))
      val target = cat.get(l.target)
      if (depth > 0 && target.ridPosCol.isDefined) {
        val subPlan = plan.map { case (k, v) => k -> (v - 1) }
        val sub = docFrame(session, target, subPlan)
        val pfx = s"__f_${l.field}_"
        val tKey = cat.table(target.name)
          .select(col(l.dstKey).as(s"${pfx}k"),
            col(target.ridPosCol.get).as(s"${pfx}tk"))
        if (l.srcIsArray) {
          // RID-collection link: explode the key array on a fresh scan,
          // aggregate sub-docs per source row, join back by pk
          val src = cat.table(cls.name)
            .select(col(keyCol).as(s"${pfx}pk"),
              explode_outer(col(l.srcKey)).as(s"${pfx}ek"))
          val items = src
            .join(tKey, col(s"${pfx}ek") === col(s"${pfx}k"))
            .join(sub, col(s"${pfx}tk") === sub("__key"))
            .groupBy(col(s"${pfx}pk"))
            .agg(collect_list(col("__doc")).as(s"${pfx}docs"))
          df = df.join(items, col(keyCol) === col(s"${pfx}pk"), "left")
            .drop(s"${pfx}pk")
          nested += l.field -> col(s"${pfx}docs")
        } else if (l.multi) {
          // pre-aggregate the many side BEFORE joining (1:1 join)
          val items = tKey.join(sub, col(s"${pfx}tk") === sub("__key"))
            .groupBy(col(s"${pfx}k"))
            .agg(collect_list(col("__doc")).as(s"${pfx}docs"))
          df = df.join(items, col(l.srcKey) === col(s"${pfx}k"), "left")
          nested += l.field -> col(s"${pfx}docs")
        } else {
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
