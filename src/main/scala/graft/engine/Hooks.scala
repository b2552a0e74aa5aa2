package graft.engine

import org.apache.spark.sql.DataFrame

/** Trigger hooks (SURVEY.md §2.10; reference `hook/ORecordHook.java`:
  * BEFORE/AFTER × CREATE/READ/UPDATE/DELETE callbacks fired per
  * record). Batch deviation (documented): BEFORE hooks receive the
  * DataFrame of affected rows and may transform it (the returned frame
  * is what gets written); AFTER hooks observe it. One invocation per
  * statement, not per record — the per-record loop does not exist in a
  * vectorized engine.
  */
object Hooks {
  sealed trait HookType
  case object BeforeCreate extends HookType
  case object AfterCreate extends HookType
  case object BeforeRead extends HookType
  case object AfterRead extends HookType
  case object BeforeUpdate extends HookType
  case object AfterUpdate extends HookType
  case object BeforeDelete extends HookType
  case object AfterDelete extends HookType
}

final class HookRegistry {
  import Hooks._
  private val transforms =
    scala.collection.mutable.Map[HookType, List[(String, DataFrame) => DataFrame]]()
      .withDefaultValue(Nil)

  /** register a hook; BEFORE_* results replace the affected rows,
    * AFTER_* results are discarded (observation only). */
  def register(t: HookType, f: (String, DataFrame) => DataFrame): Unit =
    transforms(t) = transforms(t) :+ f

  def fire(t: HookType, cls: String, df: DataFrame): DataFrame = t match {
    case BeforeCreate | BeforeUpdate | BeforeDelete | BeforeRead =>
      transforms(t).foldLeft(df)((d, f) => f(cls, d))
    case _ =>
      transforms(t).foreach(f => f(cls, df)); df
  }

  def isEmpty(t: HookType): Boolean = transforms(t).isEmpty
}
