package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fluent native-query DSL (SURVEY.md §2.10; reference
  * `OQueryContextNative.java:39-157`: operators eq/different/between/
  * minor[Eq]/major[Eq]/like/matches, casts toInt/toLong/toFloat/
  * toDouble/toChar/toDate, connectors and/or/not — evaluated per
  * record). Here each fluent predicate IS a Catalyst `Column`, so the
  * "native query" compiles into the scan instead of interpreting per
  * row: `g.nativeQuery("customer")(f => f("c_acctbal").major(1000)
  * .and(f("c_name").like("Customer%")))`.
  */
object NativeQuery {

  final class FieldRef(val c: Column) {
    def eq(v: Any): Pred = new Pred(c === lit(v))
    def different(v: Any): Pred = new Pred(c =!= lit(v))
    def between(a: Any, b: Any): Pred = new Pred(c.between(lit(a), lit(b)))
    def minor(v: Any): Pred = new Pred(c < lit(v))
    def minorEq(v: Any): Pred = new Pred(c <= lit(v))
    def major(v: Any): Pred = new Pred(c > lit(v))
    def majorEq(v: Any): Pred = new Pred(c >= lit(v))
    def like(pattern: String): Pred = new Pred(c.like(pattern))
    def matches(re: String): Pred =
      new Pred(c.rlike("\\A(?:" + re + ")\\z"))
    // cast chain (toInt/toLong/toFloat/toDouble/toChar/toDate)
    def toInt: FieldRef = new FieldRef(c.cast("int"))
    def toLong: FieldRef = new FieldRef(c.cast("long"))
    def toFloat: FieldRef = new FieldRef(c.cast("float"))
    def toDouble: FieldRef = new FieldRef(c.cast("double"))
    def toChar: FieldRef = new FieldRef(c.cast("string").substr(1, 1))
    def toDate: FieldRef = new FieldRef(to_timestamp(c))
  }

  final class Pred(val c: Column) {
    def and(other: Pred): Pred = new Pred(c && other.c)
    def or(other: Pred): Pred = new Pred(c || other.c)
    def not(): Pred = new Pred(!c)
  }

  final class Ctx {
    def apply(field: String): FieldRef = new FieldRef(col(field))
  }

  /** positional variant (`OQueryContextNativePositional.java`): fields
    * addressed by ordinal within the record's column order. */
  final class PositionalCtx(columns: Seq[String]) {
    def column(i: Int): FieldRef = new FieldRef(col(columns(i)))
  }

  /** schema variant (`OQueryContextNativeSchema.java`): fields resolved
    * against the class schema — unknown names fail at BUILD time
    * (the value-based Ctx defers resolution to Catalyst analysis). */
  final class SchemaCtx(clsName: String, columns: Seq[String]) {
    def field(name: String): FieldRef =
      columns.find(_.equalsIgnoreCase(name)) match {
        case Some(c) => new FieldRef(col(c))
        case None => throw Parser.ParseException(
          s"class $clsName has no field '$name'")
      }
  }
}
