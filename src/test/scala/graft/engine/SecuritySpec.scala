package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** ACL enforcement (reference: OSecurity consulted by every command
  * executor — e.g. OCommandExecutorSQLSelect.execute:158-165 checks
  * (CLASS, PERMISSION_READ, className) before scanning; resources per
  * ODatabaseSecurityResources). A session without a principal is the
  * embedded superuser; [[GraftSession.as]] binds one. */
class SecuritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def seeded(): GraftSession = {
    val g = new GraftSession(spark, new Catalog(spark))
    g.command("create class Doc")
    g.command("insert into Doc (id, body) values (1, 'hello')")
    g
  }

  test("a principal without READ cannot query; GRANT restores; REVOKE removes") {
    val g = seeded()
    val reader = g.as("reader")
    intercept[SecurityException](reader.query("select from Doc"))
    intercept[SecurityException](reader.browseClass("Doc"))
    g.command("grant READ on database.class.doc to reader")
    assert(reader.query("select from Doc").count() == 1)
    g.command("revoke READ on database.class.doc from reader")
    intercept[SecurityException](reader.query("select from Doc"))
  }

  test("CRUD permissions are separate; ALL covers everything") {
    val g = seeded()
    val w = g.as("writer")
    g.command("grant READ on database.class.doc to writer")
    // READ does not imply CREATE/UPDATE/DELETE
    intercept[SecurityException](
      w.command("insert into Doc (id, body) values (2, 'x')"))
    intercept[SecurityException](
      w.command("update Doc set body = 'y' where id = 1"))
    intercept[SecurityException](w.command("delete from Doc where id = 1"))
    g.command("grant CREATE on database.class.doc to writer")
    w.command("insert into Doc (id, body) values (2, 'x')")
    assert(w.query("select from Doc").count() == 2)
    // ALL unlocks the rest
    g.command("grant ALL on database.class.doc to writer")
    w.command("update Doc set body = 'y' where id = 1")
    w.command("delete from Doc where id = 2")
    assert(w.query("select from Doc").count() == 1)
  }

  test("wildcard class grant and schema/security resources") {
    val g = seeded()
    g.command("create class Other")
    val p = g.as("power")
    g.command("grant READ on database.class.* to power")
    assert(p.query("select from Doc").count() == 1)
    assert(p.query("select from Other").count() == 0)
    // schema DDL needs database.schema, not a class grant
    intercept[SecurityException](p.command("create class Mine"))
    g.command("grant CREATE on database.schema to power")
    p.command("create class Mine")
    // granting requires database.security
    intercept[SecurityException](
      p.command("grant READ on database.class.mine to friend"))
    g.command("grant UPDATE on database.security to power")
    p.command("grant READ on database.class.mine to friend")
    assert(g.as("friend").query("select from Mine").count() == 0)
  }

  test("enforcement survives a durable reopen") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-acl").toString
    val g1 = GraftSession.openDurable(spark, root)
    g1.command("create class Secret")
    g1.command("insert into Secret (id) values (1)")
    g1.command("grant READ on database.class.secret to auditor")
    val g2 = GraftSession.openDurable(spark, root)
    assert(g2.as("auditor").query("select from Secret").count() == 1)
    intercept[SecurityException](
      g2.as("intruder").query("select from Secret"))
    // the bound facade shares the live catalog: a revoke in the parent
    // session applies immediately
    g2.command("revoke READ on database.class.secret from auditor")
    intercept[SecurityException](
      g2.as("auditor").query("select from Secret"))
  }

  test("link navigation and TRAVERSE require READ on the linked classes") {
    val g = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    val r = g.as("limited")
    g.command("grant READ on database.class.customer to limited")
    // plain single-class query: fine
    assert(r.query("select c_custkey from customer limit 1").count() == 1)
    // link chain reads nation/region records — customer grant alone
    // must not exfiltrate them
    intercept[SecurityException](
      r.query("select nation.region.r_name from customer limit 1"))
    intercept[SecurityException](r.query(
      "select c_custkey from customer where any() traverse(1,2) " +
        "(r_name = 'ASIA') limit 1"))
    // multi-link CONTAINS reads orders
    intercept[SecurityException](r.query(
      "select c_custkey from customer where orders contains " +
        "(o_totalprice > 1) limit 1"))
    g.command("grant READ on database.class.nation to limited")
    g.command("grant READ on database.class.region to limited")
    assert(r.query("select nation.region.r_name from customer limit 1")
      .count() == 1)
  }

  test("export/import/fetchJson/compare enforce wildcard grants") {
    val g = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    val r = g.as("narrow")
    g.command("grant READ on database.class.region to narrow")
    intercept[SecurityException](r.fetchJson("region"))
    intercept[SecurityException](r.exportDatabase("/tmp/graft-acl-x"))
    intercept[SecurityException](r.importDatabase("/tmp/graft-acl-x"))
    intercept[SecurityException](r.compareWith(g))
    g.command("grant READ on database.class.* to narrow")
    assert(r.fetchJson("region").count() == 5)
  }

  test("dropping a class named 'schema' keeps database.schema grants") {
    val g = seeded()
    g.command("grant CREATE on database.schema to builder")
    g.command("create class schema")
    g.command("remove class schema")
    // the DDL grant must survive the same-named class drop
    g.as("builder").command("create class StillAllowed")
  }

  test("user authentication: wrong password rejected, grants flow " +
      "through the user's roles") {
    val g = seeded()
    g.createUser("alice", "s3cret", Seq("reader", "writer"))
    intercept[SecurityException](g.authenticate("alice", "wrong"))
    intercept[SecurityException](g.authenticate("bob", "s3cret"))
    val alice = g.authenticate("alice", "s3cret")
    // no grants yet on either role
    intercept[SecurityException](alice.query("select from Doc"))
    // a grant on ANY of the user's roles unlocks (reference
    // checkIfAllowed iterates the role set)
    g.command("grant READ on database.class.doc to reader")
    assert(alice.query("select from Doc").count() == 1)
    intercept[SecurityException](
      alice.command("insert into Doc (id) values (9)"))
    g.command("grant CREATE on database.class.doc to writer")
    alice.command("insert into Doc (id) values (9)")
    assert(alice.query("select from Doc").count() == 2)
    // user administration itself is security-catalog-gated
    intercept[SecurityException](alice.createUser("eve", "x", Seq("r")))
    intercept[SecurityException](alice.dropUser("alice"))
  }

  test("password hash survives durable reopen; no plaintext in the " +
      "manifest; setUserPassword re-hashes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-users").toString
    val g1 = GraftSession.openDurable(spark, root)
    g1.command("create class Vault")
    g1.command("insert into Vault (id) values (1)")
    g1.command("grant READ on database.class.vault to keeper")
    g1.createUser("carol", "topsecret", Seq("keeper"))
    // cold reopen: credential + role binding replay from the manifest
    val g2 = GraftSession.openDurable(spark, root)
    intercept[SecurityException](g2.authenticate("carol", "nope"))
    assert(g2.authenticate("carol", "topsecret")
      .query("select from Vault").count() == 1)
    // the manifest carries only the digest, never the plaintext
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/catalog-manifest.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(!manifest.contains("topsecret"), "plaintext password on disk")
    assert(manifest.contains("\"kind\":\"user\""))
    // password change re-hashes; old credential dies everywhere
    g2.setUserPassword("carol", "rotated")
    intercept[SecurityException](g2.authenticate("carol", "topsecret"))
    val g3 = GraftSession.openDurable(spark, root)
    assert(g3.authenticate("carol", "rotated")
      .query("select from Vault").count() == 1)
    // drop removes the principal entirely
    g3.dropUser("carol")
    intercept[SecurityException](g3.authenticate("carol", "rotated"))
  }

  test("dictionary entries are shared across facades and READ-checked") {
    val g = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    g.dictionary.put("first", "customer", 1L)
    val r = g.as("dictuser")
    intercept[SecurityException](r.dictionary.get("first"))
    g.command("grant READ on database.class.customer to dictuser")
    assert(r.dictionary.get("first").exists(_.count() == 1),
      "facade must see entries put through the root session")
  }

  test("dictionary remove is UPDATE-checked (no zero-grant deletion)") {
    val g = GraftSession.forTestdata(spark, "/root/testdata/sf0.001")
    g.dictionary.put("victim", "customer", 2L)
    g.dictionary.setRoot("vroot", "customer", 3L)
    val r = g.as("nobody")
    // a zero-grant facade must not be able to delete the root session's
    // registry entries or graph roots
    intercept[SecurityException](r.dictionary.remove("victim"))
    intercept[SecurityException](r.dictionary.remove("__root_vroot"))
    assert(g.dictionary.get("victim").isDefined)
    // READ alone is not enough for the destructive op
    g.command("grant READ on database.class.customer to nobody")
    intercept[SecurityException](r.dictionary.remove("victim"))
    g.command("grant UPDATE on database.class.customer to nobody")
    r.dictionary.remove("victim")
    assert(g.dictionary.get("victim").isEmpty)
  }
}
