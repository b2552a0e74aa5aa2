package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Exporter producing the REFERENCE engine's whole-database JSON dump
  * layout (`core/.../db/tool/ODatabaseExport.java:77-103`: one JSON
  * object with `info` / `clusters` / `schema` / `records` /
  * `dictionary` sections; records carry `@type`/`@rid`/`@version`/
  * `@class`, link fields as `"#<cluster>:<pos>"` strings, link
  * collections as arrays of those, dates in
  * `ORecordSerializerJSON.DEF_DATE_FORMAT:58` `yyyy-MM-dd HH:mm:ss:SSS`
  * UTC) — the reverse of [[RefDumpImport]], closing the migration
  * loop: `RefDumpImport.importDatabase ∘ exportDatabase` reproduces
  * rows, link navigation and the dictionary (spec-pinned), and the
  * emitted stream is the shape the reference's own
  * `ODatabaseImport.java:75-113` reader walks.
  *
  * Mapping from the Spark-first model back to the reference layout:
  *  - each class → one PHYSICAL cluster (its `clusterId`) + a schema
  *    class entry (super-class, declared properties with
  *    min/max/index-type, plus synthesized LINK/LINKLIST properties
  *    for the class's [[LinkSpec]]s);
  *  - record position = the class's `ridPosCol` value; classes
  *    WITHOUT a rid surface export with sequential synthetic
  *    positions (documented: they can't be link targets, so nothing
  *    references those positions);
  *  - single links where the link FIELD differs from its key column
  *    (the key-join model, e.g. customer.nation via c_nationkey)
  *    export BOTH: the raw key column and a LINK field named after
  *    the link, so a re-import navigates by the same name — that is
  *    exactly the reference's model, where the link IS a field;
  *    links whose field == column (prior [[RefDumpImport]] output)
  *    export once, as the rid form;
  *  - multi-links export as LINKLIST rid arrays when the target has
  *    a rid surface (one set-oriented collect per link, ordered by
  *    target position); multi-links to keyless targets are skipped
  *    with the navigation re-derivable from the inverse single link;
  *  - timestamps/dates → DEF_DATE_FORMAT strings (UTC, matching
  *    [[RefDumpImport.parseDate]]); binary → base64 with a declared
  *    BINARY property so the import coerces it back; arrays of
  *    primitives → JSON arrays; structs/maps → compact JSON text
  *    (the embedded-document convention both directions share).
  *
  * Scale posture: the reference format is BY DESIGN one sequential
  * JSON stream (see [[RefDumpImport]]'s Scaladoc) — records stream
  * through `toLocalIterator`, one partition resident at a time; the
  * per-multi-link rid maps are collected per HOST KEY (small: ids,
  * not payloads). This is the 2010-era migration/interop path, not a
  * bulk path — 100 TB corpora move as parquet.
  */
object RefDumpExport {

  private val DateFmt = "yyyy-MM-dd HH:mm:ss:SSS"

  def exportDatabase(session: GraftSession, file: String,
      classNames: Option[Seq[String]] = None): Unit = {
    val cat = session.catalog
    val classes = classNames
      .map(_.map(cat.get))
      .getOrElse(cat.all.filterNot(_.name.startsWith("_model_")))
    classes.foreach(c => session.checkClassRead(c.name))

    val w = new java.io.BufferedWriter(new java.io.FileWriter(file))
    try {
      w.write("{")
      // ---- info + clusters ------------------------------------
      w.write(s""""info": {"name": ${js("graft")}, """ +
        s""""default-cluster-id": ${classes.headOption
          .map(_.clusterId).getOrElse(0)}},""")
      w.write(""""clusters": [""")
      w.write(classes.map(c =>
        s"""{"name": ${js(c.name.toLowerCase)}, "id": ${c.clusterId}, """ +
          """"type": "PHYSICAL"}""").mkString(", "))
      w.write("],")
      // ---- schema ---------------------------------------------
      w.write(""""schema": {"version": 4, "classes": [""")
      w.write(classes.zipWithIndex.map { case (c, i) =>
        classJson(session, c, i)
      }.mkString(", "))
      w.write("]},")
      // ---- records --------------------------------------------
      w.write(""""records": [""")
      var firstRec = true
      classes.foreach { c =>
        // pre-collect multi-link rid lists per host key: (hostKey →
        // sorted target positions) — ids only, never payloads
        val multiMaps: Seq[(LinkSpec, Int, Map[Any, Seq[Long]])] =
          c.links.filter(l => l.multi && !l.srcIsArray).flatMap { l =>
            val t = cat.get(l.target)
            t.ridPosCol.map { pc =>
              import org.apache.spark.sql.functions._
              val m = cat.table(t.name)
                .groupBy(col(l.dstKey).as("__k"))
                .agg(sort_array(collect_list(col(pc).cast("long")))
                  .as("__ps"))
                .collect()
                .map(r => r.get(0) -> r.getSeq[Long](1).toSeq).toMap
              (l, t.clusterId, m)
            }
          }
        val df = cat.table(c.name)
        val cols = df.schema.fields.filterNot(f => internal(f.name))
        val hasVersion = df.columns.contains("_version")
        // single links rendered as an EXTRA rid field (field name !=
        // key column) or replacing the column (field == column)
        val singles = c.links.filter(l => !l.multi && !l.srcIsArray)
        val arrays = c.links.filter(_.srcIsArray)
        val it = df.toLocalIterator()
        var syntheticPos = 0L
        while (it.hasNext) {
          val r: Row = it.next()
          if (!firstRec) w.write(",")
          firstRec = false
          val pos = c.ridPosCol match {
            case Some(pc) => toLong(r.get(r.fieldIndex(pc)))
            case None => { syntheticPos += 1; syntheticPos - 1 }
          }
          val version =
            if (hasVersion) toLong(r.get(r.fieldIndex("_version"))) else 0L
          val sb = new StringBuilder
          sb.append(s"""{"@type": "d", "@rid": "#${c.clusterId}:$pos", """)
          sb.append(s""""@version": $version, "@class": ${js(c.name)}""")
          cols.foreach { f =>
            val v = r.get(r.fieldIndex(f.name))
            val asArrayLink = arrays.find(_.srcKey
              .equalsIgnoreCase(f.name))
            val asSingleSelf = singles.find(l =>
              l.field.equalsIgnoreCase(f.name) &&
                l.srcKey.equalsIgnoreCase(f.name))
            (asArrayLink, asSingleSelf) match {
              case (Some(l), _) if v != null =>
                val tc = cat.get(l.target).clusterId
                val rids = v.asInstanceOf[Seq[Any]]
                  .map(x => js(s"#$tc:${toLong(x)}")).mkString(", ")
                sb.append(s", ${js(f.name)}: [$rids]")
              case (_, Some(l)) if v != null =>
                val tc = cat.get(l.target).clusterId
                sb.append(s", ${js(f.name)}: " +
                  js(s"#$tc:${toLong(v)}"))
              case _ if v != null =>
                sb.append(s", ${js(f.name)}: ${valueJson(v, f.dataType)}")
              case _ => () // null fields: omitted, the reference way
            }
          }
          // key-join single links: an extra rid field named after the
          // link (skipped when it would shadow a real column)
          singles.filterNot(l =>
            l.srcKey.equalsIgnoreCase(l.field) ||
              cols.exists(_.name.equalsIgnoreCase(l.field))).foreach { l =>
            val kv = r.get(r.fieldIndex(l.srcKey))
            if (kv != null) {
              val tc = cat.get(l.target).clusterId
              sb.append(s", ${js(l.field)}: ${js(s"#$tc:${toLong(kv)}")}")
            }
          }
          multiMaps.foreach { case (l, tc, m) =>
            val kv = r.get(r.fieldIndex(l.srcKey))
            m.get(kv).foreach { ps =>
              sb.append(s", ${js(l.field)}: [" +
                ps.map(p => js(s"#$tc:$p")).mkString(", ") + "]")
            }
          }
          sb.append("}")
          w.write(sb.toString)
        }
      }
      w.write("],")
      // ---- dictionary (repeated key/value attribute pairs —
      // ODatabaseExport.exportDictionary:224-242) ------------------
      w.write(""""dictionary": {""")
      val dictParts = session.dictionary.keys.flatMap { name =>
        session.dictionary.entry(name).flatMap { case (cls, key) =>
          classes.find(_.name.equalsIgnoreCase(cls)).map(cd =>
            s""""key": ${js(name)}, "value": ${js(s"#${cd.clusterId}:$key")}""")
        }
      }
      w.write(dictParts.mkString(", "))
      w.write("}")
      w.write("}")
    } finally w.close()
  }

  // ---- schema rendering ---------------------------------------
  private def classJson(session: GraftSession, c: ClassDef,
      id: Int): String = {
    val cat = session.catalog
    val declared = cat.properties.collect {
      case ((cls, _), p) if cls == c.name.toLowerCase => p
    }.toSeq.sortBy(_.name)
    val declaredNames = declared.map(_.name.toLowerCase).toSet
    // synthesized link properties: LINK for single links named apart
    // from their key column, LINKLIST for array/multi links
    val linkProps = c.links.flatMap { l =>
      val target = cat.get(l.target)
      val tpe =
        if (l.srcIsArray || l.multi) "LINKLIST"
        else "LINK"
      val name =
        if (!l.multi || l.srcIsArray || target.ridPosCol.isDefined)
          Some(l.field)
        else None // keyless multi target: records skip it too
      name.filterNot(n => declaredNames.contains(n.toLowerCase))
        .map(n => (n, tpe, Some(target.name), None: Option[String],
          None: Option[String], None: Option[String]))
    }
    val propJsons = declared.map { p =>
      val idx = cat.indexes.get((c.name.toLowerCase, p.name.toLowerCase))
      propJson(p.name, p.tpe.toUpperCase, p.linkedClass, p.min, p.max, idx)
    } ++ linkProps.map { case (n, t, lc, mn, mx, ix) =>
      propJson(n, t, lc, mn, mx, ix)
    }
    s"""{"name": ${js(c.name)}, "id": $id, """ +
      s""""default-cluster-id": ${c.clusterId}, """ +
      s""""cluster-ids": [${c.clusterId}]""" +
      c.superClass.map(s => s""", "super-class": ${js(s)}""").getOrElse("") +
      s""", "properties": [${propJsons.mkString(", ")}]}"""
  }

  private def propJson(name: String, tpe: String, linked: Option[String],
      min: Option[String], max: Option[String],
      idx: Option[String]): String =
    s"""{"name": ${js(name)}, "type": ${js(tpe)}""" +
      linked.map(l => s""", "linked-class": ${js(l)}""").getOrElse("") +
      min.map(m => s""", "min": ${js(m)}""").getOrElse("") +
      max.map(m => s""", "max": ${js(m)}""").getOrElse("") +
      idx.map(i => s""", "index-type": ${js(i)}""").getOrElse("") +
      "}"

  // ---- value rendering ------------------------------------------
  private def internal(c: String): Boolean =
    c == "_rid" || c == "_class" || c == "_version" || c == "_extra"

  private def toLong(v: Any): Long = v match {
    case n: java.lang.Number => n.longValue
    case s: String => s.toLong
    case other => throw new IllegalArgumentException(
      s"cannot use $other as a record position")
  }

  private def fmtDate(millis: Long): String = {
    val f = new java.text.SimpleDateFormat(DateFmt)
    f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    f.format(new java.util.Date(millis))
  }

  private def valueJson(v: Any, t: DataType): String = (v, t) match {
    case (null, _) => "null"
    case (b: Boolean, _) => b.toString
    case (n: java.lang.Number, _: DecimalType) => js(n.toString)
    case (n: Byte, _) => n.toString
    case (n: Short, _) => n.toString
    case (n: Int, _) => n.toString
    case (n: Long, _) => n.toString
    case (n: Float, _) => floatJson(n.toDouble)
    case (n: Double, _) => floatJson(n)
    case (s: String, _) => js(s)
    case (ts: java.sql.Timestamp, _) => js(fmtDate(ts.getTime))
    case (d: java.sql.Date, _) => js(fmtDate(d.getTime))
    case (i: java.time.Instant, _) => js(fmtDate(i.toEpochMilli))
    case (d: java.time.LocalDate, _) =>
      js(fmtDate(d.atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli))
    case (b: Array[Byte], _) =>
      js(java.util.Base64.getEncoder.encodeToString(b))
    case (s: Seq[_], ArrayType(et, _)) =>
      s.map(x => valueJson(x, et)).mkString("[", ", ", "]")
    case (m: Map[_, _], MapType(_, vt, _)) =>
      m.map { case (k, x) => s"${js(k.toString)}: ${valueJson(x, vt)}" }
        .mkString("{", ", ", "}")
    case (r: Row, st: StructType) =>
      st.fields.zipWithIndex.map { case (f, i) =>
        s"${js(f.name)}: ${valueJson(r.get(i), f.dataType)}"
      }.mkString("{", ", ", "}")
    case (other, _) => js(other.toString)
  }

  private def floatJson(d: Double): String =
    if (d.isNaN || d.isInfinite) js(d.toString)
    else if (d == d.floor && math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  private def js(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
