package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Atomic multi-statement commit (reference optimistic transactions,
  * core tx/OTransactionOptimistic.java: changes buffer and apply as one
  * unit at commit; the remote protocol ships the batch in one COMMIT
  * op) plus the durable drop/re-create generation fix. */
class TransactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-tx-$tag").toString

  test("committed batch is fully visible after reopen") {
    val root = tmpRoot("commit")
    val g1 = GraftSession.openDurable(spark, root)
    g1.transaction(Seq(
      "create class Acct",
      "insert into Acct (id, bal) values (1, 100)",
      "insert into Acct (id, bal) values (2, 50)",
      "update Acct set bal = 75 where id = 2"))
    val g2 = GraftSession.openDurable(spark, root)
    assert(g2.query("select id, bal from Acct order by id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 100L), (2L, 75L)))
  }

  test("uncommitted batch leaves nothing visible after reopen") {
    val root = tmpRoot("nocommit")
    val g1 = GraftSession.openDurable(spark, root)
    g1.begin()
    g1.command("create class Draft")
    g1.command("insert into Draft (id) values (1)")
    g1.command("insert into Draft (id) values (2)")
    // read-your-writes inside the transaction
    assert(g1.query("select from Draft").count() == 2)
    // session dies without commit — a reopen over the same root must
    // see none of it (no class, no data, no manifest entries)
    val g2 = GraftSession.openDurable(spark, root)
    intercept[Parser.ParseException](g2.query("select from Draft"))
  }

  test("rollback restores pre-transaction data and DDL in-session") {
    val root = tmpRoot("rollback")
    val g = GraftSession.openDurable(spark, root)
    g.command("create class Led")
    g.command("insert into Led (id, v) values (1, 'keep')")
    g.begin()
    g.command("insert into Led (id, v) values (2, 'drop-me')")
    g.command("update Led set v = 'mutated' where id = 1")
    g.command("create class Side")
    assert(g.query("select from Led").count() == 2)
    g.rollback()
    val rows = g.query("select id, v from Led order by id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "keep")))
    intercept[Parser.ParseException](g.query("select from Side"))
  }

  test("rollback reverts GRANTs; committed GRANTs survive reopen") {
    val root = tmpRoot("txacl")
    val g = GraftSession.openDurable(spark, root)
    g.command("create class Vault")
    g.command("insert into Vault (id) values (1)")
    // a grant inside a rolled-back tx must not leave enforcement state
    g.begin()
    g.command("grant READ on database.class.vault to auditor")
    g.rollback()
    intercept[SecurityException](g.as("auditor").query("select from Vault"))
    // a committed tx's grant is part of the atomic unit and durable
    g.begin()
    g.command("grant READ on database.class.vault to auditor")
    g.commit()
    assert(g.as("auditor").query("select from Vault").count() == 1)
    val g2 = GraftSession.openDurable(spark, root)
    assert(g2.as("auditor").query("select from Vault").count() == 1)
  }

  test("a failing statement rolls the whole batch back") {
    val root = tmpRoot("atomic")
    val g = GraftSession.openDurable(spark, root)
    g.command("create class Inv")
    g.command("insert into Inv (id) values (1)")
    intercept[Exception] {
      g.transaction(Seq(
        "insert into Inv (id) values (2)",
        "this is not a statement"))
    }
    assert(g.query("select from Inv").count() == 1)
    val g2 = GraftSession.openDurable(spark, root)
    assert(g2.query("select from Inv").count() == 1)
  }

  test("crash after the commit point rolls the batch forward on reopen") {
    val root = tmpRoot("rollfwd")
    val g1 = GraftSession.openDurable(spark, root)
    g1.command("create class Pay")
    g1.command("insert into Pay (id, amt) values (1, 10)")
    g1.begin()
    g1.command("insert into Pay (id, amt) values (2, 20)")
    g1.command("insert into Pay (id, amt) values (3, 30)")
    g1.catalog.txCrashAfterManifest = true
    intercept[IllegalStateException](g1.commit())
    // the manifest rename happened (commit point crossed), the staged
    // dir was never promoted and no marker flipped — recovery must
    // finish the job
    val g2 = GraftSession.openDurable(spark, root)
    assert(g2.query("select from Pay").count() == 3)
    // and the recovered class keeps accepting writes on the promoted
    // version chain
    g2.command("insert into Pay (id, amt) values (4, 40)")
    val g3 = GraftSession.openDurable(spark, root)
    assert(g3.query("select from Pay").count() == 4)
  }

  test("drop with failed data delete cannot resurrect into a re-created class") {
    val root = tmpRoot("gen")
    val g1 = GraftSession.openDurable(spark, root)
    g1.command("create class Ghost")
    g1.command("insert into Ghost (id, v) values (1, 'old-world')")
    // simulate the storage failing the drop-time delete: the committed
    // version dir and _current marker survive on disk
    g1.catalog.failDropDelete = true
    g1.command("remove class Ghost")
    g1.catalog.failDropDelete = false
    // re-create under the same name: the generation bump points the
    // new class at a fresh data dir, so the stale versions stay dead
    g1.command("create class Ghost")
    assert(g1.query("select from Ghost").count() == 0)
    g1.command("insert into Ghost (id, v) values (9, 'new-world')")
    val g2 = GraftSession.openDurable(spark, root)
    val rows = g2.query("select id, v from Ghost").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((9L, "new-world")))
  }

  test("concurrent commit to the same class is refused, never a lost update") {
    // reference MVCC contract (OTransactionOptimistic,
    // TransactionOptimisticTest.java:79-104): two sessions start from
    // the same version; the first commit wins, the second must throw —
    // silently overwriting the winner is the one forbidden outcome
    val root = tmpRoot("conflict")
    val setup = GraftSession.openDurable(spark, root)
    setup.command("create class Acc")
    setup.command("insert into Acc (id, bal) values (1, 100)")
    val g1 = GraftSession.openDurable(spark, root)
    val g2 = GraftSession.openDurable(spark, root)
    g1.begin(); g2.begin()
    g1.command("update Acc set bal = 150 where id = 1")
    g2.command("update Acc set bal = 999 where id = 1")
    g1.commit()
    intercept[java.util.ConcurrentModificationException](g2.commit())
    // the conflicted tx is still open — rollback, and the winner's
    // committed value is what every fresh session sees
    g2.rollback()
    val fresh = GraftSession.openDurable(spark, root)
    assert(fresh.query("select bal from Acc").collect()
      .map(_.getLong(0)).toSeq == Seq(150L))
  }

  test("concurrent commits to DISJOINT classes both land (class granularity)") {
    val root = tmpRoot("disjoint")
    val setup = GraftSession.openDurable(spark, root)
    setup.transaction(Seq(
      "create class L", "insert into L (id) values (1)",
      "create class R", "insert into R (id) values (1)"))
    val g1 = GraftSession.openDurable(spark, root)
    val g2 = GraftSession.openDurable(spark, root)
    g1.begin(); g2.begin()
    g1.command("insert into L (id) values (2)")
    g2.command("insert into R (id) values (2)")
    g1.commit()
    g2.commit() // touches only R: no conflict with g1's L commit
    val fresh = GraftSession.openDurable(spark, root)
    assert(fresh.query("select from L").count() == 2)
    assert(fresh.query("select from R").count() == 2)
  }

  test("record-level opt-in: disjoint rows of ONE class both commit") {
    // reference per-record MVCC (OTransactionOptimistic;
    // TransactionOptimisticTest.java:79-104): transactions touching
    // different records of the same class must BOTH land — the loser
    // rebases its row changes onto the winner's version
    val root = tmpRoot("reclevel")
    val setup = GraftSession.openDurable(spark, root)
    setup.command("create class Acc")
    setup.command("insert into Acc (id, bal) values (1, 100)")
    setup.command("insert into Acc (id, bal) values (2, 200)")
    setup.catalog.setRidPosCol("Acc", "id")
    val g1 = GraftSession.openDurable(spark, root)
    val g2 = GraftSession.openDurable(spark, root)
    g1.setRecordLevelConflicts(true); g2.setRecordLevelConflicts(true)
    g1.begin(); g2.begin()
    g1.command("update Acc set bal = 150 where id = 1")
    g2.command("update Acc set bal = 999 where id = 2")
    g1.commit()
    g2.commit() // disjoint keys: rebases, no exception
    val fresh = GraftSession.openDurable(spark, root)
    assert(fresh.query("select bal from Acc order by id").collect()
      .map(_.getLong(0)).toSeq == Seq(150L, 999L))
  }

  test("record-level opt-in: same row still conflicts loudly") {
    val root = tmpRoot("recsame")
    val setup = GraftSession.openDurable(spark, root)
    setup.command("create class Acc")
    setup.command("insert into Acc (id, bal) values (1, 100)")
    setup.catalog.setRidPosCol("Acc", "id")
    val g1 = GraftSession.openDurable(spark, root)
    val g2 = GraftSession.openDurable(spark, root)
    g1.setRecordLevelConflicts(true); g2.setRecordLevelConflicts(true)
    g1.begin(); g2.begin()
    g1.command("update Acc set bal = 150 where id = 1")
    g2.command("update Acc set bal = 999 where id = 1")
    g1.commit()
    intercept[java.util.ConcurrentModificationException](g2.commit())
    g2.rollback()
    val fresh = GraftSession.openDurable(spark, root)
    assert(fresh.query("select bal from Acc").collect()
      .map(_.getLong(0)).toSeq == Seq(150L))
  }

  test("record-level opt-in: concurrent delete and insert both land") {
    val root = tmpRoot("recmix")
    val setup = GraftSession.openDurable(spark, root)
    setup.command("create class Acc")
    setup.command("insert into Acc (id, bal) values (1, 100)")
    setup.command("insert into Acc (id, bal) values (2, 200)")
    setup.catalog.setRidPosCol("Acc", "id")
    val g1 = GraftSession.openDurable(spark, root)
    val g2 = GraftSession.openDurable(spark, root)
    g1.setRecordLevelConflicts(true); g2.setRecordLevelConflicts(true)
    g1.begin(); g2.begin()
    g1.command("delete from Acc where id = 1")
    g2.command("insert into Acc (id, bal) values (3, 300)")
    g1.commit()
    g2.commit() // rebase keeps g1's delete AND adds g2's row
    val fresh = GraftSession.openDurable(spark, root)
    assert(fresh.query("select id from Acc order by id").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("record-level opt-in: delete + re-insert of the SAME key rebases") {
    // the counterexample that kills any (key, _version)-only change
    // detection: the re-inserted row lands at _version 0, equal to the
    // untouched base row — only CONTENT hashing sees the change. A
    // fast path that misses it would silently resolve this key to the
    // winner's (stale) row.
    val root = tmpRoot("recreins")
    val setup = GraftSession.openDurable(spark, root)
    setup.command("create class Acc")
    setup.command("insert into Acc (id, bal) values (1, 100)")
    setup.command("insert into Acc (id, bal) values (2, 200)")
    setup.catalog.setRidPosCol("Acc", "id")
    val g1 = GraftSession.openDurable(spark, root)
    val g2 = GraftSession.openDurable(spark, root)
    g1.setRecordLevelConflicts(true); g2.setRecordLevelConflicts(true)
    g1.begin(); g2.begin()
    g1.command("update Acc set bal = 250 where id = 2")
    g2.command("delete from Acc where id = 1")
    g2.command("insert into Acc (id, bal) values (1, 777)")
    g1.commit()
    g2.commit() // disjoint keys: the re-insert must survive the rebase
    val fresh = GraftSession.openDurable(spark, root)
    assert(fresh.query("select bal from Acc order by id").collect()
      .map(_.getLong(0)).toSeq == Seq(777L, 250L))
  }

  test("record-level opt-in: non-numeric key refuses rebase loudly") {
    // a key that casts to null would null-out every __k in the rebase's
    // change detection: joins never match on null, collide is vacuously
    // false and the merge resolves to the WINNER's frame — this tx's
    // writes silently dropped. The rebase must detect the null keys and
    // fall through to the loud conflict path instead.
    val root = tmpRoot("recnullkey")
    val setup = GraftSession.openDurable(spark, root)
    setup.command("create class Acc")
    setup.command("insert into Acc (code, bal) values ('a', 100)")
    setup.command("insert into Acc (code, bal) values ('b', 200)")
    setup.catalog.setRidPosCol("Acc", "code")
    val g1 = GraftSession.openDurable(spark, root)
    val g2 = GraftSession.openDurable(spark, root)
    g1.setRecordLevelConflicts(true); g2.setRecordLevelConflicts(true)
    g1.begin(); g2.begin()
    g1.command("update Acc set bal = 150 where code = 'a'")
    g2.command("update Acc set bal = 999 where code = 'b'")
    g1.commit()
    intercept[java.util.ConcurrentModificationException](g2.commit())
    g2.rollback()
    val fresh = GraftSession.openDurable(spark, root)
    assert(fresh.query("select bal from Acc order by code").collect()
      .map(_.getLong(0)).toSeq == Seq(150L, 200L))
  }

  test("record-level opt-in: unkeyed class keeps class-granular check") {
    val root = tmpRoot("reckeyless")
    val setup = GraftSession.openDurable(spark, root)
    setup.command("create class NoKey")
    setup.command("insert into NoKey (a) values (1)")
    val g1 = GraftSession.openDurable(spark, root)
    val g2 = GraftSession.openDurable(spark, root)
    g1.setRecordLevelConflicts(true); g2.setRecordLevelConflicts(true)
    g1.begin(); g2.begin()
    g1.command("insert into NoKey (a) values (2)")
    g2.command("insert into NoKey (a) values (3)")
    g1.commit()
    // no key column → merge impossible → loud refusal, as before
    intercept[java.util.ConcurrentModificationException](g2.commit())
    g2.rollback()
  }

  test("manifest round-trips control characters in persisted strings") {
    val root = tmpRoot("esc")
    val g1 = GraftSession.openDurable(spark, root)
    g1.command("create class Esc")
    // a regexp constraint carrying tab/newline/quote/backslash — the
    // JSONL manifest must escape them or the framing corrupts
    g1.catalog.setProperty(PropertyDef("Esc", "v", "STRING",
      regexp = Some("a\tb\nc\"d\\e")))
    val g2 = GraftSession.openDurable(spark, root)
    assert(g2.catalog.properties(("esc", "v")).regexp
      .contains("a\tb\nc\"d\\e"))
  }
}
