package graft.api

import java.lang.reflect.{Field, ParameterizedType}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.engine.GraftSession

import scala.reflect.ClassTag

/** Optimistic-lock failure: the stored version moved since this object
  * was loaded (reference object layer: a version mismatch aborts the
  * save instead of overwriting a concurrent writer). */
final class StaleObjectException(msg: String) extends RuntimeException(msg)

/** JPA-lite object mapping over a [[GraftSession]] — the reference's
  * object-database surface (`db/object`,
  * `OObjectSerializerHelper.java`: POJO fields ↔ record fields, with
  * javax.persistence Id/Version honored reflectively) re-expressed for
  * immutable Scala case classes:
  *
  *  - an entity is a case class; its class simple name is the graft
  *    class (created on first save);
  *  - identity = the field annotated `@(Id @field)` or literally named
  *    `id`. An unset id (null / None / 0) makes [[save]] INSERT with a
  *    generated id (UUID for String ids, max+1 for numeric); a set id
  *    UPDATEs;
  *  - `@(Version @field)` (or `version`) is the optimistic lock: 0 on
  *    insert, and every update is conditioned on the in-memory value —
  *    a concurrent writer makes [[save]] throw [[StaleObjectException]]
  *    instead of silently clobbering;
  *  - instead of JPA's mutable managed entities, [[save]] RETURNS the
  *    persisted copy (id + version filled) — the caller threads state
  *    immutably;
  *  - a field whose value is itself a mapped entity (a `Product` with
  *    an id) is saved first (cascading) and stored as its id — the
  *    link-column convention; [[load]] resolves entity-typed fields
  *    one eager level deep (the reference's default fetch plan);
  *  - `Option[_]` fields map to nullable columns.
  *
  * SCALE NOTE: this is the single-entity CRUD surface (hooks,
  * validation and ACL all fire through the session paths it rides).
  * Bulk object persistence at 100 TB is NOT a save() loop — it is
  * `Dataset[T]` + `GraftSession.appendData`, one batch plan.
  */
final class ObjectMapper(session: GraftSession) {

  // ------------------------------------------------------- reflection

  /** persistent fields = the case-class constructor's backing fields
    * (declared order), minus synthetics. */
  private def persistentFields(c: Class[_]): Seq[Field] =
    c.getDeclaredFields.toSeq
      .filterNot(f => f.isSynthetic || f.getName.contains("$"))
      .map { f => f.setAccessible(true); f }

  private def idField(c: Class[_]): Field =
    persistentFields(c)
      .find(_.isAnnotationPresent(classOf[Id]))
      .orElse(persistentFields(c).find(_.getName.equalsIgnoreCase("id")))
      .getOrElse(throw new IllegalArgumentException(
        s"${c.getName}: no @Id field and none named 'id'"))

  private def versionField(c: Class[_]): Option[Field] =
    persistentFields(c)
      .find(_.isAnnotationPresent(classOf[Version]))
      .orElse(persistentFields(c).find(_.getName.equalsIgnoreCase("version")))

  /** Option[X] → X (for schema typing), via the field's generic type.
    * Scala erases Option[primitive] to Option<Object> — those resolve
    * through [[valueType]] instead. */
  private def innerType(f: Field): Class[_] = f.getGenericType match {
    case p: ParameterizedType if f.getType == classOf[Option[_]] =>
      p.getActualTypeArguments.head match {
        case c: Class[_] => c
        case _ => classOf[AnyRef]
      }
    case _ => f.getType
  }

  /** concrete value type for a field: the signature type when it
    * survives erasure, else the runtime class of the (unwrapped)
    * value; an absent erased value defaults to Long — the documented
    * default for `Option[primitive]` fields holding None. */
  private def valueType(f: Field, raw: Any): Class[_] = {
    val t = innerType(f)
    if (t != classOf[AnyRef] && t != classOf[Object]) t
    else raw match {
      case null => classOf[java.lang.Long]
      case x => x.getClass
    }
  }

  private def sparkType(c: Class[_]): DataType = c match {
    case q if q == classOf[String] => StringType
    case q if q == java.lang.Long.TYPE || q == classOf[java.lang.Long] => LongType
    case q if q == java.lang.Integer.TYPE || q == classOf[java.lang.Integer] => IntegerType
    case q if q == java.lang.Double.TYPE || q == classOf[java.lang.Double] => DoubleType
    case q if q == java.lang.Float.TYPE || q == classOf[java.lang.Float] => FloatType
    case q if q == java.lang.Boolean.TYPE || q == classOf[java.lang.Boolean] => BooleanType
    case q if q == java.lang.Short.TYPE || q == classOf[java.lang.Short] => ShortType
    case q if q == classOf[java.sql.Timestamp] => TimestampType
    case q if q == classOf[java.sql.Date] => DateType
    case q if classOf[Product].isAssignableFrom(q) =>
      // link column: holds the child entity's id
      sparkType(innerType(idField(q)))
    case other => throw new IllegalArgumentException(
      s"unmapped field type ${other.getName}")
  }

  private def isUnset(v: Any): Boolean = v match {
    case null | None => true
    case 0L | 0 => true
    case s: String => s.isEmpty
    case _ => false
  }

  // --------------------------------------------------------- literals

  /** graft-SQL literal with parser-compatible escaping (backslash
    * escapes inside single-quoted strings). */
  private def sqlLit(v: Any): String = v match {
    case null => "null"
    case s: String =>
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case b: Boolean => b.toString
    case t: java.sql.Timestamp => sqlLit(t.toString)
    case d: java.sql.Date => sqlLit(d.toString)
    case n => n.toString
  }

  // ------------------------------------------------------------- save

  private def ensureClass(cls: String): Unit =
    try session.command(s"CREATE CLASS $cls")
    catch { case _: IllegalArgumentException => () } // already exists

  /** persist one entity; returns the PERSISTED copy (id + version
    * filled). Insert when the id is unset, optimistic update when set.
    * Cascades the whole reachable entity tree, the reference default
    * (`ObjectTreeTest.java:49-65` testPersonSaving: one save of a
    * Profile persists its Address → City → Country chain). */
  def save[T <: Product](obj: T): T = save(obj, Int.MaxValue)

  /** [[save]] with a CASCADE DEPTH bound: child entities deeper than
    * `cascadeDepth` are NOT saved — an already-persisted child is
    * referenced by its existing id (its stored record untouched), an
    * unsaved one is an error (a dangling link would otherwise appear
    * committed). `cascadeDepth = 0` is JPA's no-cascade. */
  def save[T <: Product](obj: T, cascadeDepth: Int): T = {
    val c = obj.getClass
    val cls = c.getSimpleName
    ensureClass(cls)
    val fields = persistentFields(c)
    val idF = idField(c)
    val verF = versionField(c)
    // per field: (storage value, object value). Child entities save
    // first (cascading) — storage gets the child's persisted id, the
    // returned object gets the PERSISTED child (its generated id and
    // bumped version must be visible to the caller)
    val both: Map[String, (Any, Any)] = fields.map { f =>
      val orig = f.get(obj)
      val raw = orig match { case Some(x) => x; case None => null; case x => x }
      f.getName -> (raw match {
        case p: Product
            if classOf[Product].isAssignableFrom(innerType(f)) &&
              !f.getName.equalsIgnoreCase(idF.getName) =>
          if (cascadeDepth > 0) {
            val child = save(p, cascadeDepth - 1)
            val childId = idField(child.getClass).get(child)
            (childId,
              orig match { case Some(_) => Some(child); case _ => child })
          } else {
            // cascade exhausted: reference the child by its EXISTING id
            val cid = idField(p.getClass).get(p) match {
              case Some(x) => x; case None => null; case x => x
            }
            if (isUnset(cid)) throw new IllegalStateException(
              s"${c.getSimpleName}.${f.getName}: cascade depth " +
                "exhausted but the child entity has no id — save the " +
                "child first or raise cascadeDepth")
            (cid, orig)
          }
        case x => (x, orig)
      })
    }.toMap
    val resolved: Map[String, Any] = both.map { case (k, v) => k -> v._1 }
    val originals: Map[String, Any] = both.map { case (k, v) => k -> v._2 }
    val curId = resolved(idF.getName)
    if (isUnset(curId)) {
      val newId = generateId(cls, idF)
      insertRow(cls, fields,
        resolved + (idF.getName -> newId) ++
          verF.map(_.getName -> (0L: Any)))
      rebuild(obj, originals + (idF.getName -> newId) ++
        verF.map(_.getName -> (0L: Any)))
    } else {
      val curVer = verF.map(f => toLong(resolved(f.getName))).getOrElse(0L)
      val sets = fields
        .filterNot(f => f.getName.equalsIgnoreCase(idF.getName))
        .map { f =>
          val v = verF match {
            case Some(vf) if vf.getName == f.getName => (curVer + 1): Any
            case _ => resolved(f.getName)
          }
          s"${f.getName} = ${sqlLit(v)}"
        }
      val guard = verF.map(vf =>
        s" AND ${vf.getName} = ${sqlLit(curVer)}").getOrElse("")
      val where = s"${idF.getName} = ${sqlLit(curId)}$guard"
      val n =
        if (sets.isEmpty) 1L
        else session
          .command(s"UPDATE $cls SET ${sets.mkString(", ")} WHERE $where")
          .collect().head.getLong(0)
      if (n == 0) throw new StaleObjectException(
        s"$cls(${idF.getName}=$curId): version $curVer is stale " +
          "(or the record was deleted)")
      rebuild(obj, originals ++
        verF.map(_.getName -> ((curVer + 1): Any)))
    }
  }

  /** generated identity: UUID for String ids, max+1 for numeric (a
    * driver-side scalar — single-entity CRUD is control-plane; bulk
    * loads assign their own ids and use appendData). An erased
    * `Option[primitive]` id generates as Long. */
  private def generateId(cls: String, idF: Field): Any = {
    val t = valueType(idF, null)
    if (t == classOf[String]) java.util.UUID.randomUUID().toString
    else if (t == java.lang.Long.TYPE || t == classOf[java.lang.Long] ||
        t == java.lang.Integer.TYPE || t == classOf[java.lang.Integer]) {
      // a just-created class has no columns yet → treat as empty; an
      // explicit column check, NOT a catch-all (swallowing e.g. a
      // security error here would silently restart ids at 1 and mint
      // a duplicate primary key)
      val hasIdColumn = session.catalog.contains(cls) &&
        session.catalog.table(cls).columns
          .exists(_.equalsIgnoreCase(idF.getName))
      val rows =
        if (!hasIdColumn) Array.empty[Row]
        else session
          .query(s"select max(${idF.getName}) as m from $cls").collect()
      val next =
        if (rows.isEmpty || rows.head.isNullAt(0)) 1L
        else toLong(rows.head.get(0)) + 1L
      if (t == java.lang.Integer.TYPE || t == classOf[java.lang.Integer])
        next.toInt
      else next
    } else throw new IllegalArgumentException(
      s"cannot generate an id of type ${t.getName} — assign one")
  }

  private def insertRow(cls: String, fields: Seq[Field],
      vals: Map[String, Any]): Unit = {
    val schema = StructType(fields.map { f =>
      StructField(f.getName,
        sparkType(valueType(f, vals(f.getName))), nullable = true)
    })
    // align value widths to the schema (e.g. a Long 0 into an Int
    // version column) — Row values must match their DataType exactly
    def align(v: Any, dt: DataType): Any = (v, dt) match {
      case (null, _) => null
      case (n: Number, LongType) => n.longValue()
      case (n: Number, IntegerType) => n.intValue()
      case (n: Number, DoubleType) => n.doubleValue()
      case (n: Number, FloatType) => n.floatValue()
      case (n: Number, ShortType) => n.shortValue()
      case (x, _) => x
    }
    val row = Row.fromSeq(fields.zip(schema.fields)
      .map { case (f, sf) => align(vals(f.getName), sf.dataType) })
    val df = session.spark.createDataFrame(
      java.util.List.of(row), schema)
    session.appendData(cls, df)
  }

  /** reconstruct the case class through its primary constructor with
    * updated field values (the immutable stand-in for JPA's in-place
    * id/version injection). */
  private def rebuild[T <: Product](obj: T, vals: Map[String, Any]): T = {
    val c = obj.getClass
    val fields = persistentFields(c)
    val ctor = c.getConstructors
      .find(_.getParameterCount == fields.size)
      .getOrElse(throw new IllegalStateException(
        s"${c.getName}: no ${fields.size}-arg constructor"))
    val args = fields.zip(ctor.getParameterTypes).map { case (f, pt) =>
      coerce(vals(f.getName), pt, f)
    }
    ctor.newInstance(args: _*).asInstanceOf[T]
  }

  // ------------------------------------------------------------- load

  /** load one entity by id; None when absent. Entity-typed link
    * fields load their target record too (one eager level — the
    * reference default fetch plan; links nested deeper stay null, and
    * cyclic links therefore terminate instead of recursing).
    *
    * Loaded objects are BORN DETACHED (reference
    * `ObjectDetachingTest.java:34-120`: objects must be explicitly
    * detached from the database to live past the session; graft's
    * immutable case classes carry no session binding at all) — holding
    * or modifying a loaded copy never touches stored records until it
    * is passed back to [[save]]. */
  def load[T <: Product](id: Any)(implicit ct: ClassTag[T]): Option[T] =
    load(id, fetchDepth = 1)

  /** [[load]] with an explicit eager-fetch depth: entity links resolve
    * `fetchDepth` levels deep (the reference fetch-plan `field:depth`
    * dial applied to the object surface); deeper links stay null.
    * `fetchDepth = 0` loads the bare record — every entity-typed field
    * null, the fully-lazy shape. */
  def load[T <: Product](id: Any, fetchDepth: Int)(
      implicit ct: ClassTag[T]): Option[T] =
    loadRecord(ct.runtimeClass, id, depth = 0, fetchDepth)
      .map(_.asInstanceOf[T])

  private def loadRecord(c: Class[_], id: Any, depth: Int,
      fetchDepth: Int): Option[Any] = {
    val cls = c.getSimpleName
    val idF = idField(c)
    val rows = session
      .query(s"select * from $cls where ${idF.getName} = ${sqlLit(id)}")
      .collect()
    rows.headOption.map { r =>
      val fields = persistentFields(c)
      val ctor = c.getConstructors
        .find(_.getParameterCount == fields.size)
        .getOrElse(throw new IllegalStateException(
          s"${c.getName}: no ${fields.size}-arg constructor"))
      val args = fields.zip(ctor.getParameterTypes).map { case (f, pt) =>
        val i = r.schema.fieldNames
          .indexWhere(_.equalsIgnoreCase(f.getName))
        val v = if (i < 0 || r.isNullAt(i)) null else r.get(i)
        // entity link: the column holds the child's id — resolve it
        // at the first level only (depth bound = the one-eager-level
        // fetch plan AND the cycle guard: a <-> b links terminate)
        val t = innerType(f)
        val resolvedV =
          if (v != null && classOf[Product].isAssignableFrom(t) &&
              !classOf[Product].isInstance(v))
            (if (depth < fetchDepth)
              loadRecord(t, v, depth + 1, fetchDepth).orNull
            else null)
          else v
        coerce(resolvedV, pt, f)
      }
      ctor.newInstance(args: _*)
    }
  }

  /** delete by entity (uses its id); true when a record was removed. */
  def delete[T <: Product](obj: T): Boolean = {
    val c = obj.getClass
    val idF = idField(c)
    val idVal = idF.get(obj) match { // Option-typed ids unwrap like save
      case Some(x) => x
      case None => null
      case x => x
    }
    val n = session.command(
        s"DELETE FROM ${c.getSimpleName} " +
          s"WHERE ${idF.getName} = ${sqlLit(idVal)}")
      .collect().head.getLong(0)
    n > 0
  }

  // ---------------------------------------------------------- coerce

  private def toLong(v: Any): Long = v match {
    case n: Number => n.longValue()
    case null => 0L
    case other => other.toString.toLong
  }

  /** storage value → constructor argument (numeric width adjust,
    * Option re-wrap, child-entity links stay as ids). */
  private def coerce(v: Any, target: Class[_], f: Field): AnyRef = {
    def narrow(x: Any, t: Class[_]): AnyRef = (x, t) match {
      case (null, _) => null
      case (n: Number, q) if q == java.lang.Long.TYPE || q == classOf[java.lang.Long] =>
        java.lang.Long.valueOf(n.longValue())
      case (n: Number, q) if q == java.lang.Integer.TYPE || q == classOf[java.lang.Integer] =>
        java.lang.Integer.valueOf(n.intValue())
      case (n: Number, q) if q == java.lang.Double.TYPE || q == classOf[java.lang.Double] =>
        java.lang.Double.valueOf(n.doubleValue())
      case (n: Number, q) if q == java.lang.Float.TYPE || q == classOf[java.lang.Float] =>
        java.lang.Float.valueOf(n.floatValue())
      case (n: Number, q) if q == java.lang.Short.TYPE || q == classOf[java.lang.Short] =>
        java.lang.Short.valueOf(n.shortValue())
      case (b: java.lang.Boolean, _) => b
      case (s: String, _) => s
      case (o, _) => o.asInstanceOf[AnyRef]
    }
    if (target == classOf[Option[_]]) v match {
      case o: Option[_] => o // rebuild path: already wrapped
      case x => Option(narrow(x, innerType(f)))
    }
    else narrow(v, target)
  }
}
