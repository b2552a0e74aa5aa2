package graft.api

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.engine.{Catalog, GraftSession}

import scala.annotation.meta.field

/** JPA-lite object mapping (reference `db/object`,
  * `OObjectSerializerHelper.java`): save/load round-trip, generated
  * ids, optimistic version locking, cascading link save + eager
  * one-level load, Option fields, delete. */
object ObjectMapperSpec {
  // entities live on the companion so Java reflection sees plain
  // top-level-style classes (no outer-instance constructor param)
  case class City(@(Id @field) id: Long, name: String)
  case class Person(@(Id @field) id: String,
      name: String,
      age: Int,
      nickname: Option[String],
      city: City,
      @(Version @field) version: Long)
  case class Gadget(serial: String, label: String) // no @Id → needs 'id'
  case class Note(id: Long, text: String, version: Int)
  case class Emp(id: Long, name: String, boss: Option[Emp])
  case class Memo(id: Option[Long], text: String)
  // 3-level chain mirroring the reference domain tree
  // Profile → Address → City → Country (ObjectTreeTest)
  case class Country(id: Long, cname: String)
  case class Town(id: Long, tname: String, country: Country)
  case class Address(id: Long, street: String, town: Town)
  case class Profile(id: Long, pname: String, location: Address,
      version: Long)
}

class ObjectMapperSpec extends AnyFunSuite {
  import ObjectMapperSpec._
  private lazy val spark = SparkTestSession.spark

  private def fresh(): ObjectMapper =
    new ObjectMapper(new GraftSession(spark, new Catalog(spark)))

  test("save assigns generated ids and version 0; load round-trips") {
    val m = fresh()
    val saved = m.save(Person("", "Ada", 36, Some("al"),
      City(0L, "London"), 0L))
    assert(saved.id.nonEmpty, "String id must be UUID-generated")
    assert(saved.version == 0L)
    assert(saved.city.id == 1L, "numeric child id must be max+1 generated")
    val loaded = m.load[Person](saved.id)
    assert(loaded.contains(saved),
      s"round-trip mismatch: $loaded vs $saved")
  }

  test("optimistic version lock: stale save throws, fresh save bumps") {
    val m = fresh()
    val v0 = m.save(Person("", "Bob", 40, None, City(0L, "Paris"), 0L))
    val v1 = m.save(v0.copy(age = 41))
    assert(v1.version == 1L)
    // saving the ORIGINAL (version 0) again must fail: the stored
    // version moved (reference OConcurrentModification semantics)
    val e = intercept[StaleObjectException] { m.save(v0.copy(age = 99)) }
    assert(e.getMessage.contains("stale"))
    // and the stored state is the v1 write, untouched by the stale try
    assert(m.load[Person](v1.id).exists(_.age == 41))
  }

  test("numeric ids sequence per class; updates don't re-generate") {
    val m = fresh()
    val a = m.save(Note(0L, "first", 0))
    val b = m.save(Note(0L, "second", 0))
    assert(a.id == 1L && b.id == 2L)
    val a2 = m.save(a.copy(text = "first-edited"))
    assert(a2.id == a.id && a2.version == 1)
    assert(m.load[Note](2L).exists(_.text == "second"))
  }

  test("Option fields: None persists as null and loads back as None") {
    val m = fresh()
    val p = m.save(Person("", "Eve", 25, None, City(0L, "Rome"), 0L))
    assert(m.load[Person](p.id).exists(_.nickname.isEmpty))
    val q = m.save(p.copy(nickname = Some("evie")))
    assert(m.load[Person](q.id).exists(_.nickname.contains("evie")))
  }

  test("delete removes the record; load returns None") {
    val m = fresh()
    val n = m.save(Note(0L, "temp", 0))
    assert(m.delete(n))
    assert(m.load[Note](n.id).isEmpty)
    assert(!m.delete(n), "second delete must report nothing removed")
  }

  test("an entity without @Id or an 'id' field is rejected") {
    val m = fresh()
    val e = intercept[IllegalArgumentException] {
      m.save(Gadget("S-1", "widget"))
    }
    assert(e.getMessage.contains("no @Id"))
  }

  test("cyclic links terminate: load resolves one eager level, then null") {
    val m = fresh()
    val a = m.save(Emp(0L, "alice", None))
    val b = m.save(Emp(0L, "bob", Some(a)))
    // close the cycle a -> b (b -> a already stored)
    m.save(a.copy(boss = Some(b)))
    val got = m.load[Emp](a.id).get
    assert(got.name == "alice" && got.boss.exists(_.name == "bob"))
    // depth-2 link (back to alice) stays null — no infinite recursion
    assert(got.boss.exists(_.boss.isEmpty),
      s"second-level link must stay unresolved: $got")
  }

  test("Option-typed ids: save generates, delete unwraps") {
    val m = fresh()
    val saved = m.save(Memo(None, "draft"))
    assert(saved.id.exists(_ == 1L))
    assert(m.load[Memo](1L).exists(_.text == "draft"))
    assert(m.delete(saved), "delete must unwrap the Option id")
    assert(m.load[Memo](1L).isEmpty)
  }

  test("save cascades the whole entity tree by default (ObjectTreeTest.testPersonSaving)") {
    // reference ObjectTreeTest.java:49-65: one save of a Profile
    // persists its Address → City → Country chain transitively
    val m = fresh()
    val saved = m.save(Profile(0L, "GGaribaldi",
      Address(0L, "Piazza Navona, 1",
        Town(0L, "Rome", Country(0L, "Italy"))), 0L))
    assert(saved.location.id == 1L && saved.location.town.id == 1L &&
      saved.location.town.country.id == 1L,
      s"every tree level must persist with a generated id: $saved")
    // each level is a real record reachable on its own
    assert(m.load[Country](1L).exists(_.cname == "Italy"))
    assert(m.load[Town](1L).exists(_.tname == "Rome"))
    // a second profile sharing the persisted city re-saves (not
    // re-creates) it — the chain stays 1 country / 1 town
    m.save(Profile(0L, "NBonaparte",
      Address(0L, "Piazza di Spagna, 111", saved.location.town), 0L))
    assert(m.load[Town](2L).isEmpty, "shared city must not duplicate")
  }

  test("cascade depth bounds the save; exhausted depth needs a persisted child") {
    val m = fresh()
    val country = m.save(Country(0L, "Austria"))
    // depth 0 = JPA no-cascade: the persisted child is referenced by
    // id, its stored record untouched (no version bump / duplicate)
    val town = m.save(Town(0L, "Graz", country), 1)
    assert(town.id == 1L)
    assert(m.load[Town](town.id).exists(_.country.cname == "Austria"))
    // an UNSAVED child with cascade exhausted is an error, not a
    // dangling link that looks committed
    val e = intercept[IllegalStateException] {
      m.save(Town(0L, "Linz", Country(0L, "Nowhere")), 0)
    }
    assert(e.getMessage.contains("cascade depth"))
  }

  test("fetchDepth dials eager loading; loaded objects are detached (ObjectDetachingTest)") {
    val m = fresh()
    val saved = m.save(Profile(0L, "WChurcill",
      Address(0L, "unknown", Town(0L, "London", Country(0L, "England"))),
      0L))
    // default = one eager level (address), deeper stays null
    val d1 = m.load[Profile](saved.id).get
    assert(d1.location.street == "unknown" && d1.location.town == null)
    // fetchDepth 3 resolves the whole chain
    val d3 = m.load[Profile](saved.id, fetchDepth = 3).get
    assert(d3.location.town.country.cname == "England")
    // fetchDepth 0 = bare record, fully lazy
    assert(m.load[Profile](saved.id, fetchDepth = 0).get.location == null)
    // detached semantics (reference ObjectDetachingTest.java:34-120):
    // a loaded copy carries no session binding — mutating/copying it
    // changes nothing until save()
    val detached = d3.copy(pname = "renamed")
    assert(m.load[Profile](saved.id).get.pname == "WChurcill")
    val resaved = m.save(detached.copy(location = d3.location))
    assert(resaved.version == 1L &&
      m.load[Profile](saved.id).get.pname == "renamed")
  }

  test("string values with quotes and backslashes survive the SQL path") {
    val m = fresh()
    val tricky = "O'Brien \\ the 2nd"
    val n = m.save(Note(0L, tricky, 0))
    val edited = m.save(n.copy(text = tricky + " (v2, 'quoted')"))
    assert(m.load[Note](n.id).exists(_.text == tricky + " (v2, 'quoted')"))
    assert(edited.version == 1)
  }
}
