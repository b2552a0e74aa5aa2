package graft.kv

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.engine.{Catalog, GraftSession}

class KVStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("kv bucket get/put/delete/keys") {
    val kv = new KVStore(spark)
    kv.put("db", "b1", "k1", "v1")
    kv.put("db", "b1", "k2", "v2")
    kv.put("db", "b1", "k1", "v1b") // overwrite
    assert(kv.get("db", "b1", "k1").contains("v1b"))
    assert(kv.get("db", "b1", "nope").isEmpty)
    assert(kv.keys("db", "b1").toSet == Set("k1", "k2"))
    assert(kv.delete("db", "b1", "k2"))
    assert(!kv.delete("db", "b1", "k2"))
    assert(kv.asDataFrame("db", "b1").count() == 1)
    // buckets are namespaced per db
    kv.put("db2", "b1", "k1", "other")
    assert(kv.get("db", "b1", "k1").contains("v1b"))
  }

  test("grant/revoke maintains the ACL catalog") {
    val g = new GraftSession(spark, new Catalog(spark))
    g.command("grant READ on database.class.customer to reader")
    g.command("grant UPDATE on database.class.customer to writer")
    assert(g.catalog.acl(("reader", "database.class.customer")) == Set("READ"))
    g.command("revoke READ on database.class.customer to reader")
    assert(g.catalog.acl(("reader", "database.class.customer")).isEmpty)
  }
}
