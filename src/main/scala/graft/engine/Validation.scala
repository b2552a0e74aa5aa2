package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Property constraints + write-path validation (SURVEY.md §1.4;
  * reference `OProperty.java:56-62` fields and
  * `ORecordSchemaAwareAbstract.validateField:160-250` semantics:
  * mandatory = field present; notNull; regexp = whole-string match;
  * min/max = character count for STRING, byte count for BINARY,
  * numeric value for number types, element count for collections).
  *
  * The reference validates record-at-a-time on save; here validation is
  * ONE batch expression pass over the rows being written — a single
  * `coalesce(when(violation, msg)…)` column, so a 100 TB write adds one
  * scan, not a per-record driver loop.
  */
final case class PropertyDef(
    cls: String, name: String, tpe: String,
    mandatory: Boolean = false, notNull: Boolean = false,
    min: Option[String] = None, max: Option[String] = None,
    regexp: Option[String] = None, linkedClass: Option[String] = None)

final case class ValidationException(msg: String)
    extends RuntimeException(msg)

object Validation {

  /** first violation message per row, null when valid. */
  def violationColumn(df: DataFrame, props: Seq[PropertyDef]): Column = {
    val checks = props.flatMap { p =>
      val exists = df.columns.exists(_.equalsIgnoreCase(p.name))
      val c = if (exists) col(p.name) else lit(null)
      val measured: Column = p.tpe.toUpperCase match {
        case "STRING" => length(c.cast("string"))
        case "BINARY" => length(c) // byte length on BinaryType
        case "EMBEDDEDLIST" | "EMBEDDEDSET" | "LINKLIST" | "LINKSET" =>
          size(c)
        case _ => c
      }
      def bound(v: String): Column = p.tpe.toUpperCase match {
        case "STRING" | "BINARY" | "EMBEDDEDLIST" | "EMBEDDEDSET" |
            "LINKLIST" | "LINKSET" | "INTEGER" | "LONG" | "SHORT" | "BYTE" =>
          lit(v.toLong)
        case "FLOAT" | "DOUBLE" => lit(v.toDouble)
        case "DATE" => to_timestamp(lit(v))
        case _ => lit(v)
      }
      val mandatoryCheck =
        if (p.mandatory && !exists)
          Some(lit(s"The field ${p.name} is mandatory"))
        else None
      val notNullCheck =
        if (p.notNull && exists)
          Some(when(c.isNull, s"The field ${p.name} is null"))
        else None
      val regexpCheck = p.regexp.map { re =>
        when(c.isNotNull &&
          !c.cast("string").rlike("\\A(?:" + re + ")\\z"),
          s"The field ${p.name} doesn't match the regular expression '$re'")
      }
      val minCheck = p.min.map { m =>
        when(c.isNotNull && measured < bound(m),
          s"The field ${p.cls}.${p.name} is minor than $m")
      }
      val maxCheck = p.max.map { m =>
        when(c.isNotNull && measured > bound(m),
          s"The field ${p.cls}.${p.name} is major than $m")
      }
      mandatoryCheck ++ notNullCheck ++ regexpCheck ++ minCheck ++ maxCheck
    }
    if (checks.isEmpty) lit(null) else coalesce(checks :+ lit(null): _*)
  }

  /** validate rows about to be written; throws on the first violation
    * found (single distributed pass + limit-1 collect). */
  def validate(df: DataFrame, props: Seq[PropertyDef]): Unit = {
    if (props.isEmpty) return
    val v = violationColumn(df, props)
    val bad = df.select(v.as("__violation"))
      .filter(col("__violation").isNotNull).limit(1).collect()
    if (bad.nonEmpty) throw ValidationException(bad.head.getString(0))
  }
}
