package graft.engine

import org.apache.spark.sql.DataFrame

/** Trigger hooks (SURVEY.md §2.10; reference `hook/ORecordHook.java`:
  * BEFORE/AFTER × CREATE/READ/UPDATE/DELETE callbacks fired per
  * record). Batch deviation (documented): hooks receive the DataFrame
  * of affected rows, one invocation per statement, not per record.
  * BEFORE_CREATE and BEFORE_READ may TRANSFORM the frame (the returned
  * frame is what gets written / returned); BEFORE_UPDATE and
  * BEFORE_DELETE are observers that can VETO by throwing (the rewrite
  * is already planned when they fire — mirroring the reference, where
  * a hook aborts by exception); AFTER_* observe only.
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

  /** register a hook; BEFORE_CREATE/BEFORE_READ results replace the
    * affected rows, all other hook results are discarded (observe /
    * veto-by-throwing only). */
  def register(t: HookType, f: (String, DataFrame) => DataFrame): Unit =
    transforms(t) = transforms(t) :+ f

  def fire(t: HookType, cls: String, df: DataFrame): DataFrame = t match {
    case BeforeCreate | BeforeRead =>
      transforms(t).foldLeft(df)((d, f) => f(cls, d))
    case _ =>
      transforms(t).foreach(f => f(cls, df)); df
  }

  def isEmpty(t: HookType): Boolean = transforms(t).isEmpty
}
