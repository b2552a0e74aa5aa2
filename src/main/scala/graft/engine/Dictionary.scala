package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistent name→record registry (SURVEY.md §1.1: `ODictionary` —
  * get/put/remove/keySet; `ODatabaseGraphTx.getRoot/setRoot` use it for
  * graph roots). The reference dictionary is persistent by definition —
  * it is the root registry graph traversals start from after a restart
  * (`core/.../dictionary/ODictionary.java`,
  * `ODatabaseGraphTx.java:71-82`) — so entries live in the catalog and
  * ride its durable manifest: put/setRoot through any session facade
  * survive an `openDurable` reopen, exactly like grants and DDL. The
  * registry is control-plane-tiny (names → (class, key)), so it is
  * driver-held and broadcast-by-construction into lookups. */
final class Dictionary(session: GraftSession,
    private[engine] val state: Dictionary.State) {

  def this(session: GraftSession) =
    this(session, new Dictionary.State(session.catalog))

  /** facade view: SAME registry state, this session's principal (a
    * bound session's get() is permission-checked like its queries). */
  private[engine] def viewFor(s: GraftSession): Dictionary =
    new Dictionary(s, state)

  def put(name: String, cls: String, key: Long): Unit = {
    session.checkClassRead(cls) // registering implies reading it back
    state.put(name, cls, key)
  }

  /** dereference: the registered record as a 1-row DataFrame. */
  def get(name: String): Option[DataFrame] =
    state.lookup(name).map { case (clsName, key) =>
      session.checkClassRead(clsName)
      val cls = session.catalog.get(clsName)
      val keyCol = cls.ridPosCol.getOrElse(
        throw new IllegalStateException(s"class ${cls.name} has no key"))
      session.catalog.table(cls.name)
        .filter(col(keyCol) === key)
    }

  /** destructive: deleting another principal's registry entries (or
    * graph roots) needs UPDATE on the registered class — put/get are
    * checked, so the delete path must be too (privilege isolation). */
  def remove(name: String): Unit = {
    state.lookup(name).foreach { case (cls, _) =>
      session.checkClassUpdate(cls)
    }
    state.remove(name)
  }

  /** registry coordinates (class, key) without dereferencing — the
    * graph facade rebuilds a typed vertex handle from a root entry. */
  def entry(name: String): Option[(String, Long)] = {
    state.lookup(name).foreach { case (cls, _) =>
      session.checkClassRead(cls)
    }
    state.lookup(name)
  }

  def keys: Seq[String] = state.keys

  def size: Long = state.size

  /** graph-root registry parity (getRoot/setRoot). */
  def setRoot(name: String, cls: String, key: Long): Unit =
    put(s"__root_$name", cls, key)
  def getRoot(name: String): Option[DataFrame] = get(s"__root_$name")
}

object Dictionary {
  /** the shared registry state — ONE per root session (facades get
    * views, [[Dictionary.viewFor]]); delegates to the catalog's
    * manifest-persisted entry map so durability is the catalog's
    * existing write-temp-then-rename discipline, not a second
    * persistence path to keep consistent. */
  final class State(cat: Catalog) {
    def put(name: String, cls: String, key: Long): Unit =
      cat.dictPut(name, cls, key)

    def lookup(name: String): Option[(String, Long)] =
      cat.dictEntries.get(name)

    def remove(name: String): Unit = cat.dictRemove(name)

    def keys: Seq[String] = cat.dictEntries.keys.toSeq

    def size: Long = cat.dictEntries.size.toLong
  }
}
