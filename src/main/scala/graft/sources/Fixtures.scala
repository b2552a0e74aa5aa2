package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{Catalog, ClassDef, LinkSpec}

/** Demo-DB fixture generator (FIXTURES.md set A): the reference's test
  * domain — `Profile` with a cyclic follower graph and a
  * `location→city→country` link chain (`domain/whiz/Profile.java:5-15`),
  * `Account` (`domain/business/Account.java:125-135`),
  * `Animal`/`AnimalType` with embedded races, `MapPoint` for GEO.
  * Deterministic (seed 7), small, with nulls in nullable columns; the
  * sparse `photo` field (populated on ~10% of Profiles) stands in for
  * the reference's ad-hoc extra fields within a fixed schema.
  */
object Fixtures {
  final case class Country(countryId: Long, cname: String)
  final case class City(cityId: Long, cityName: String, countryId: Long)
  final case class Address(addressId: Long, street: String, cityId: Long)
  final case class Profile(profileId: Long, nick: String, name: String,
      surname: String, invitedBy: Option[Long], followings: Seq[Long],
      followers: Seq[Long], locationId: Option[Long],
      photo: Option[String])
  final case class Account(accountId: Long, name: String, surname: String,
      salary: Float, addressIds: Seq[Long])
  final case class Race(name: String, continent: String)
  final case class Animal(animalId: Long, name: String, tipo: String,
      races: Seq[Race])
  final case class MapPoint(pointId: Long, x: Double, y: Double)

  val firstNames = Seq("Giuseppe", "Napoleone", "Nicholas", "Jay", "Gary",
    "Sylvia", "Grace", "Nadia", "Leonard", "Mark")
  val surnames = Seq("Garibaldi", "Bonaparte", "Flamel", "Miner", "Smith",
    "Nolan", "Bach", "Verdi", "Rossi", "White")

  def register(spark: SparkSession, cat: Catalog): Catalog = {
    import spark.implicits._
    val rng = new scala.util.Random(7)

    val countries = Seq(Country(0, "Italy"), Country(1, "France"),
      Country(2, "Spain"), Country(3, "England"), Country(4, "Ireland"))
    val cities = (0L until 10L).map(i =>
      City(i, s"City_$i", i % 5))
    val addresses = (0L until 30L).map(i =>
      Address(i, s"Piazza Navona, $i", i % 10))

    val n = 100
    val profiles = (0L until n).map { i =>
      val nFollow = rng.nextInt(5)
      val followings = Seq.fill(nFollow)(rng.nextInt(n).toLong).distinct
        .filterNot(_ == i)
      Profile(i,
        nick = s"Nick$i",
        name = firstNames((i % firstNames.size).toInt),
        surname = surnames(rng.nextInt(surnames.size)),
        invitedBy = if (i == 0) None else Some(rng.nextInt(i.toInt).toLong),
        followings = followings,
        followers = Nil, // filled below by inversion
        locationId = if (rng.nextInt(10) == 0) None
          else Some(rng.nextInt(30).toLong),
        photo = if (rng.nextInt(10) == 0) Some(s"photo_$i.jpg") else None)
    }
    val followerMap = profiles.flatMap(p => p.followings.map(f => f -> p.profileId))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val withFollowers = profiles.map(p =>
      p.copy(followers = followerMap.getOrElse(p.profileId, Nil)))

    val accounts = (0L until 50L).map { i =>
      Account(i, firstNames(rng.nextInt(firstNames.size)),
        surnames(rng.nextInt(surnames.size)),
        salary = 500f + rng.nextInt(3000),
        addressIds = Seq.fill(1 + rng.nextInt(2))(rng.nextInt(30).toLong).distinct)
    }

    val races = Seq(Race("European", "Europe"), Race("Asiatic", "Asia"),
      Race("African", "Africa"), Race("American", "America"))
    val animals = (0L until 20L).map { i =>
      Animal(i, s"Animal_$i", if (i % 2 == 0) "cat" else "dog",
        Seq.fill(1 + rng.nextInt(2))(races(rng.nextInt(races.size))).distinct)
    }

    // reference GEOTest: points near Cambridge (52.20472, 0.14056)
    val points = (0L until 40L).map { i =>
      MapPoint(i, 52.0 + rng.nextDouble() * 0.5, -0.5 + rng.nextDouble())
    }

    def reg(name: String, df: DataFrame, cid: Int, pk: String,
        links: LinkSpec*): Unit =
      cat.register(ClassDef(name, _ => df, None, links.toSeq, cid, Some(pk)))

    reg("country", countries.toDF(), 101, "countryId")
    reg("city", cities.toDF(), 102, "cityId",
      LinkSpec("country", "country", "countryId", "countryId"))
    reg("address", addresses.toDF(), 103, "addressId",
      LinkSpec("city", "city", "cityId", "cityId"))
    reg("profile", withFollowers.toDF(), 104, "profileId",
      LinkSpec("invitedBy", "profile", "invitedBy", "profileId"),
      LinkSpec("location", "address", "locationId", "addressId"),
      LinkSpec("followings", "profile", "followings", "profileId",
        srcIsArray = true),
      LinkSpec("followers", "profile", "followers", "profileId",
        srcIsArray = true))
    reg("account", accounts.toDF(), 105, "accountId",
      LinkSpec("addresses", "address", "addressIds", "addressId",
        srcIsArray = true))
    reg("animal", animals.toDF(), 106, "animalId")
    reg("mappoint", points.toDF(), 107, "pointId")
    cat
  }

  def session(spark: SparkSession): graft.engine.GraftSession =
    new graft.engine.GraftSession(spark,
      register(spark, new Catalog(spark)))
}
