package graft.engine

import scala.collection.mutable

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Importer for the REFERENCE engine's whole-database JSON dump format
  * (`core/.../db/tool/ODatabaseExport.java:77-103`: one JSON object
  * with `info` / `clusters` / `schema` / `records` / `dictionary`
  * sections; records serialized by `ORecordSerializerJSON.toString`
  * with `rid,type,version,class,attribSameRow` — `@type`/`@rid`/
  * `@version`/`@class` annotations, link fields as `"#<cluster>:<pos>"`
  * strings, link collections as arrays of those, dates as
  * `yyyy-MM-dd HH:mm:ss:SSS` strings per
  * `ORecordSerializerJSON.DEF_DATE_FORMAT:58`).
  *
  * [[JsonTools.exportDatabase]]/[[JsonTools.importDatabase]] give
  * capability parity (own-format round-trip); THIS gives byte-format
  * compatibility, so a dump produced by the reference's exporter (the
  * `DbImportExportTest.java` flow) loads directly instead of forcing a
  * re-write of the migrating database.
  *
  * Mapping onto the Spark-first model:
  *  - schema classes → catalog [[ClassDef]]s (super-class preserved,
  *    `default-cluster-id` becomes the class's `clusterId` so `@rid`
  *    reconstructs for default-cluster records);
  *  - record `@rid` position → a `_ridpos` LONG key column
  *    (`ridPosCol`), `@version` → `_version`;
  *  - LINK fields → LONG key columns + [[LinkSpec]]s targeting the
  *    class that owns the linked cluster (declared `linked-class`
  *    wins; otherwise inferred — only when every rid in the column
  *    agrees on one class), so dot-navigation and TRAVERSE work
  *    post-import;
  *  - LINKLIST/LINKSET arrays → `array<long>` + `srcIsArray` specs;
  *  - embedded documents/maps → their JSON text (documented: the
  *    engine's JSON functions query them; there is no row identity to
  *    link to);
  *  - the dictionary section → the engine dictionary (name → class+key).
  *
  * Scale posture: the reference format is BY DESIGN one sequential JSON
  * stream (its own importer is a single-threaded reader,
  * `ODatabaseImport.java:75-113`), so the parse is a one-pass driver
  * read; everything after (the per-class DataFrames) is distributed.
  * This is a migration path for 2010-era databases, not a bulk-load
  * path — 100 TB corpora arrive as parquet, not as one JSON file.
  */
object RefDumpImport {

  private val RidRe = "#?(-?\\d+):(-?\\d+)".r
  private val DateFmtLen = "yyyy-MM-dd HH:mm:ss:SSS".length

  private final case class RefProp(name: String, tpe: String,
      linkedClass: Option[String], min: Option[String],
      max: Option[String], indexType: Option[String])

  private final case class RefClass(name: String, defClusterId: Int,
      clusterIds: Seq[Int], superClass: Option[String],
      props: Seq[RefProp])

  /** one parsed record: (className, ridCluster, ridPos, version,
    * fieldName → raw value). Raw values are java Long/Double/Boolean/
    * String/null, Seq[Any] for arrays, or a JSON string for embedded
    * objects (pre-rendered during the parse). */
  private final case class RefRecord(cls: String, ridCluster: Int,
      ridPos: Long, version: Long, fields: mutable.LinkedHashMap[String, Any])

  def importDatabase(session: GraftSession, file: String): Unit = {
    val (classes, records, dictionary) = parse(file)
    val cat = session.catalog

    // cluster-id → class-name (a class owns its default cluster plus
    // any extras in cluster-ids — ODatabaseExport.exportSchema:253-258)
    val clusterOwner: Map[Int, String] = classes.flatMap(c =>
      (c.clusterIds :+ c.defClusterId).distinct.map(_ -> c.name)).toMap

    val byClass = records.groupBy(_.cls.toLowerCase)

    // register classes in dump order so superclasses usually precede
    // subclasses; each class carries its LinkSpecs on its own ClassDef
    // (link TARGETS may register later — navigation resolves by name
    // at query time, so forward references are fine)
    classes.foreach { rc =>
      val recs = byClass.getOrElse(rc.name.toLowerCase, Nil)
      val (schema, rows, links) = shape(rc, recs, clusterOwner)
      val df = session.spark.createDataFrame(
        new java.util.ArrayList[Row](rows.asJava), schema)
        .localCheckpoint(true) // materialize: the dump text is gone
      cat.register(ClassDef(rc.name, _ => df, rc.superClass,
        links, rc.defClusterId, Some("_ridpos")))
      rc.props.foreach { p =>
        cat.setProperty(PropertyDef(rc.name, p.name, p.tpe,
          min = p.min, max = p.max, linkedClass = p.linkedClass))
        p.indexType.foreach(kind =>
          cat.indexes((rc.name.toLowerCase, p.name.toLowerCase)) =
            kind.toUpperCase)
      }
    }

    dictionary.foreach { case (name, (cl, pos)) =>
      clusterOwner.get(cl).foreach(cls =>
        session.dictionary.put(name, cls, pos))
    }
  }

  private implicit class SeqAsJava[A](private val s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.length)
      s.foreach(l.add)
      l
    }
  }

  // ------------------------------------------------ column shaping
  /** record positions key rows within a class; a class whose records
    * span multiple clusters can repeat positions — refuse loudly
    * rather than silently merge two records under one key. */
  private def checkKeyUnique(rc: RefClass, recs: Seq[RefRecord]): Unit = {
    val dup = recs.groupBy(_.ridPos).find(_._2.length > 1)
    dup.foreach { case (pos, rs) =>
      throw new IllegalArgumentException(
        s"reference dump: class '${rc.name}' has colliding record " +
          s"positions (#${rs.map(_.ridCluster).mkString("/#")}:$pos) " +
          "across clusters — cannot key by position")
    }
  }

  /** decide each column's Spark type + link spec from declared schema
    * and observed values, and coerce rows to it. */
  private def shape(rc: RefClass, recs: Seq[RefRecord],
      clusterOwner: Map[Int, String])
      : (StructType, Seq[Row], Seq[LinkSpec]) = {
    checkKeyUnique(rc, recs)
    val declared = rc.props.map(p => p.name.toLowerCase -> p).toMap
    val fieldNames = (rc.props.map(_.name) ++
      recs.flatMap(_.fields.keys)).foldLeft(Vector.empty[String])(
      (acc, f) => if (acc.exists(_.equalsIgnoreCase(f))) acc else acc :+ f)

    def valuesOf(f: String): Seq[Any] = recs.flatMap(r =>
      r.fields.collectFirst {
        case (k, v) if k.equalsIgnoreCase(f) && v != null => v
      })

    /** the one class every rid in `vs` lives in, if consistent. */
    def ridCluster(v: Any): Option[Int] = v match {
      case s: String => s match {
        case RidRe(c, _) => Some(c.toInt)
        case _ => None
      }
      case _ => None
    }
    def ridTarget(vs: Seq[Any]): Option[String] = {
      val clusters = vs.flatMap(ridCluster)
      val cls = clusters.flatMap(clusterOwner.get(_)).distinct
      if (vs.nonEmpty && clusters.length == vs.length && cls.length == 1)
        Some(cls.head)
      else None
    }

    val links = mutable.ListBuffer[LinkSpec]()
    val colTypes: Seq[(String, DataType)] = fieldNames.map { f =>
      val decl = declared.get(f.toLowerCase)
      val vs = valuesOf(f)
      val tpe: DataType = decl.map(_.tpe.toUpperCase) match {
        case Some("LINK") =>
          val tgt = decl.flatMap(_.linkedClass).orElse(ridTarget(vs))
          tgt match {
            case Some(t) =>
              links += LinkSpec(f, t, f, "_ridpos")
              LongType
            case None => StringType // unresolvable: keep the rid text
          }
        case Some("LINKLIST") | Some("LINKSET") =>
          val flat = vs.collect { case s: Seq[_] => s }.flatten
          val tgt = decl.flatMap(_.linkedClass).orElse(ridTarget(flat))
          tgt match {
            case Some(t) =>
              links += LinkSpec(f, t, f, "_ridpos",
                multi = true, srcIsArray = true)
              ArrayType(LongType)
            case None => ArrayType(StringType)
          }
        case Some("STRING") => StringType
        case Some("INTEGER") | Some("LONG") | Some("SHORT") |
            Some("BYTE") => LongType
        case Some("FLOAT") | Some("DOUBLE") => DoubleType
        case Some("BOOLEAN") => BooleanType
        case Some("DATE") => TimestampType
        case Some("BINARY") => BinaryType
        case Some("EMBEDDEDLIST") | Some("EMBEDDEDSET") =>
          ArrayType(StringType)
        case Some("EMBEDDED") | Some("EMBEDDEDMAP") => StringType
        case _ => // undeclared: infer from observed values
          // r14 (ADVICE): classify ALL observed values, not just the
          // first — a schemaless dump can mix types within one field,
          // and typing from record one silently nulled later
          // mismatched values. Disagreement widens: Long+Double →
          // DoubleType, anything else → StringType (coerce stringifies
          // losslessly).
          def kindOf(v: Any): Int = v match {
            case _: java.lang.Long => 1
            case _: java.lang.Double => 2
            case _: java.lang.Boolean => 3
            case _: Seq[_] => 4
            case s: String if looksLikeDate(s) => 5
            case _ => 6
          }
          if (vs.isEmpty) StringType
          else if (ridTarget(vs).isDefined) {
            links += LinkSpec(f, ridTarget(vs).get, f, "_ridpos")
            LongType
          } else {
            val kinds = vs.map(kindOf).distinct
            if (kinds.length > 1) {
              if (kinds.forall(k => k == 1 || k == 2)) DoubleType
              else StringType
            } else kinds.head match {
              case 1 => LongType
              case 2 => DoubleType
              case 3 => BooleanType
              case 4 =>
                val flat = vs.collect { case x: Seq[_] => x }.flatten
                if (ridTarget(flat).isDefined) {
                  links += LinkSpec(f, ridTarget(flat).get, f, "_ridpos",
                    multi = true, srcIsArray = true)
                  ArrayType(LongType)
                } else ArrayType(StringType)
              case 5 => TimestampType
              case _ => StringType
            }
          }
      }
      f -> tpe
    }

    val schema = StructType(
      colTypes.map { case (f, t) => StructField(f, t, nullable = true) } ++
        Seq(StructField("_ridpos", LongType, nullable = false),
          StructField("_version", LongType, nullable = false)))

    val rows = recs.map { r =>
      val cells = colTypes.map { case (f, t) =>
        val raw = r.fields.collectFirst {
          case (k, v) if k.equalsIgnoreCase(f) => v
        }.orNull
        coerce(raw, t)
      }
      Row.fromSeq(cells ++ Seq(r.ridPos, r.version))
    }
    (schema, rows, links.toSeq)
  }

  private def looksLikeDate(s: String): Boolean =
    s.length == DateFmtLen && s.matches(
      "\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}:\\d{3}")

  private def parseDate(s: String): java.sql.Timestamp = {
    // DEF_DATE_FORMAT yyyy-MM-dd HH:mm:ss:SSS (note the ':' before ms)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss:SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    new java.sql.Timestamp(fmt.parse(s).getTime)
  }

  private def ridPos(s: String): Option[Long] = s match {
    case RidRe(_, p) => Some(p.toLong)
    case _ => None
  }

  private def coerce(raw: Any, t: DataType): Any = (raw, t) match {
    case (null, _) => null
    case (v, LongType) => v match {
      case n: java.lang.Long => n
      case n: java.lang.Double => java.lang.Long.valueOf(n.longValue)
      case s: String => ridPos(s).map(java.lang.Long.valueOf)
        .orElse(s.toLongOption.map(java.lang.Long.valueOf)).orNull
      case _ => null
    }
    case (v, DoubleType) => v match {
      case n: java.lang.Double => n
      case n: java.lang.Long => java.lang.Double.valueOf(n.doubleValue)
      case s: String => s.toDoubleOption
        .map(java.lang.Double.valueOf).orNull
      case _ => null
    }
    case (v, BooleanType) => v match {
      case b: java.lang.Boolean => b
      case s: String => java.lang.Boolean.valueOf(s)
      case _ => null
    }
    case (v, TimestampType) => v match {
      case s: String if looksLikeDate(s) => parseDate(s)
      case _ => null
    }
    case (v, BinaryType) => v match {
      case s: String => java.util.Base64.getDecoder.decode(s)
      case _ => null
    }
    case (v, ArrayType(LongType, _)) => v match {
      case s: Seq[_] => s.map(x => coerce(x, LongType))
      case _ => null
    }
    case (v, ArrayType(StringType, _)) => v match {
      case s: Seq[_] => s.map(x => coerce(x, StringType))
      case _ => null
    }
    case (v, StringType) => v match {
      case s: String => s
      case other => other.toString
    }
    case (v, _) => v.toString
  }

  // ----------------------------------------------------- the parse
  /** one streaming pass over the dump (Jackson handles the dictionary
    * section's REPEATED key/value attribute pairs —
    * ODatabaseExport.exportDictionary:224-242 — which strict
    * read-to-map parsers would collapse). */
  private def parse(file: String): (Seq[RefClass], Seq[RefRecord],
      Seq[(String, (Int, Long))]) = {
    val classes = mutable.ListBuffer[RefClass]()
    val records = mutable.ListBuffer[RefRecord]()
    val dict = mutable.ListBuffer[(String, (Int, Long))]()

    val p = new JsonFactory().createParser(new java.io.File(file))
    try {
      expect(p, JsonToken.START_OBJECT, p.nextToken())
      while (p.nextToken() == JsonToken.FIELD_NAME) {
        p.currentName() match {
          case "info" => p.nextToken(); p.skipChildren()
          case "clusters" => p.nextToken(); p.skipChildren()
          case "schema" => parseSchema(p, classes)
          case "records" =>
            expect(p, JsonToken.START_ARRAY, p.nextToken())
            while (p.nextToken() == JsonToken.START_OBJECT)
              parseRecord(p).foreach(records += _)
          case "dictionary" => parseDictionary(p, dict)
          case _ => p.nextToken(); p.skipChildren()
        }
      }
    } finally p.close()
    (classes.toSeq, records.toSeq, dict.toSeq)
  }

  private def expect(p: JsonParser, want: JsonToken, got: JsonToken): Unit =
    if (got != want) throw new IllegalArgumentException(
      s"malformed reference dump: expected $want, got $got " +
        s"at ${p.currentLocation()}")

  private def parseSchema(p: JsonParser,
      out: mutable.ListBuffer[RefClass]): Unit = {
    expect(p, JsonToken.START_OBJECT, p.nextToken())
    while (p.nextToken() == JsonToken.FIELD_NAME) {
      p.currentName() match {
        case "classes" =>
          expect(p, JsonToken.START_ARRAY, p.nextToken())
          while (p.nextToken() == JsonToken.START_OBJECT)
            out += parseClass(p)
        case _ => p.nextToken() // version etc: scalar
      }
    }
  }

  private def parseClass(p: JsonParser): RefClass = {
    var name = ""; var defCluster = -1
    val clusterIds = mutable.ListBuffer[Int]()
    var superClass: Option[String] = None
    val props = mutable.ListBuffer[RefProp]()
    while (p.nextToken() == JsonToken.FIELD_NAME) {
      p.currentName() match {
        case "name" => p.nextToken(); name = p.getText
        case "default-cluster-id" =>
          p.nextToken(); defCluster = p.getIntValue
        case "cluster-ids" =>
          expect(p, JsonToken.START_ARRAY, p.nextToken())
          while (p.nextToken() != JsonToken.END_ARRAY)
            clusterIds += p.getIntValue
        case "super-class" =>
          p.nextToken(); superClass = Some(p.getText)
        case "properties" =>
          expect(p, JsonToken.START_ARRAY, p.nextToken())
          while (p.nextToken() == JsonToken.START_OBJECT)
            props += parseProp(p)
        case _ => p.nextToken(); p.skipChildren() // id etc
      }
    }
    RefClass(name, defCluster, clusterIds.toSeq, superClass, props.toSeq)
  }

  private def parseProp(p: JsonParser): RefProp = {
    var name = ""; var tpe = "STRING"
    var linked: Option[String] = None
    var min: Option[String] = None; var max: Option[String] = None
    var idx: Option[String] = None
    while (p.nextToken() == JsonToken.FIELD_NAME) {
      val f = p.currentName(); p.nextToken()
      f match {
        case "name" => name = p.getText
        case "type" => tpe = p.getText
        case "linked-class" => linked = Some(p.getText)
        case "min" => min = Some(p.getText)
        case "max" => max = Some(p.getText)
        case "index-type" => idx = Some(p.getText)
        case _ => p.skipChildren() // id, linked-type, index-rid
      }
    }
    RefProp(name, tpe, linked, min, max, idx)
  }

  /** a `records` array element; None for records this engine can't
    * place (no `@class` — e.g. internal/index cluster rows — or a
    * non-document `@type`). */
  private def parseRecord(p: JsonParser): Option[RefRecord] = {
    var cls: Option[String] = None
    var rtype = "d"
    var cluster = -1; var pos = -1L; var version = 0L
    val fields = mutable.LinkedHashMap[String, Any]()
    while (p.nextToken() == JsonToken.FIELD_NAME) {
      val f = p.currentName(); p.nextToken()
      f match {
        case "@type" => rtype = p.getText
        case "@rid" => p.getText match {
          case RidRe(c, pp) => cluster = c.toInt; pos = pp.toLong
          case _ => ()
        }
        case "@version" => version = p.getLongValue
        case "@class" => cls = Option(p.getText).filter(_ != "null")
        case _ => fields(f) = parseValue(p)
      }
    }
    cls.filter(_ => rtype == "d" && pos >= 0)
      .map(c => RefRecord(c, cluster, pos, version, fields))
  }

  /** current-token value → Long/Double/Boolean/String/Seq[Any]/JSON
    * text (objects — embedded docs and maps keep their JSON form). */
  private def parseValue(p: JsonParser): Any = p.currentToken() match {
    case JsonToken.VALUE_NULL => null
    case JsonToken.VALUE_TRUE => java.lang.Boolean.TRUE
    case JsonToken.VALUE_FALSE => java.lang.Boolean.FALSE
    case JsonToken.VALUE_NUMBER_INT => java.lang.Long.valueOf(p.getLongValue)
    case JsonToken.VALUE_NUMBER_FLOAT =>
      java.lang.Double.valueOf(p.getDoubleValue)
    case JsonToken.VALUE_STRING => p.getText
    case JsonToken.START_ARRAY =>
      val items = mutable.ListBuffer[Any]()
      while (p.nextToken() != JsonToken.END_ARRAY) items += parseValue(p)
      items.toSeq
    case JsonToken.START_OBJECT => renderObject(p)
    case t => throw new IllegalArgumentException(
      s"malformed reference dump: unexpected $t at ${p.currentLocation()}")
  }

  /** re-render a nested object (embedded document or map) as compact
    * JSON text. */
  private def renderObject(p: JsonParser): String = {
    val sb = new StringBuilder("{")
    var first = true
    while (p.nextToken() == JsonToken.FIELD_NAME) {
      if (!first) sb.append(',')
      first = false
      sb.append(jstr(p.currentName())).append(':')
      p.nextToken()
      sb.append(renderValue(p))
    }
    sb.append('}').toString
  }

  private def renderValue(p: JsonParser): String = p.currentToken() match {
    case JsonToken.VALUE_NULL => "null"
    case JsonToken.VALUE_TRUE => "true"
    case JsonToken.VALUE_FALSE => "false"
    case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
      p.getText
    case JsonToken.VALUE_STRING => jstr(p.getText)
    case JsonToken.START_OBJECT => renderObject(p)
    case JsonToken.START_ARRAY =>
      val items = mutable.ListBuffer[String]()
      while (p.nextToken() != JsonToken.END_ARRAY) items += renderValue(p)
      items.mkString("[", ",", "]")
    case t => throw new IllegalArgumentException(
      s"malformed reference dump: unexpected $t at ${p.currentLocation()}")
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def parseDictionary(p: JsonParser,
      out: mutable.ListBuffer[(String, (Int, Long))]): Unit = {
    expect(p, JsonToken.START_OBJECT, p.nextToken())
    var key: Option[String] = None
    while (p.nextToken() == JsonToken.FIELD_NAME) {
      val f = p.currentName(); p.nextToken()
      f match {
        case "key" => key = Some(p.getText)
        case "value" =>
          val v = p.getText
          key.foreach { k =>
            v match {
              case RidRe(c, pos) => out += k -> (c.toInt, pos.toLong)
              case _ => ()
            }
          }
          key = None
        case _ => p.skipChildren()
      }
    }
  }
}
