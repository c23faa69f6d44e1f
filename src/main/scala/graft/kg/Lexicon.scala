package graft.kg

import graft.functions.Hashing

/** Deterministic entity lexicon for the synthetic transcript corpus
  * and its entity catalogue (FIXTURES.md §1/§4). Name pool inspired
  * by the reference's `random_people` fixture list
  * (ketl/mongo/entityMatching.py:432-483) but regenerated — no text
  * copied. Variants (typos / middle initials / swapped order)
  * exercise Jaro-Winkler scoring, the margin confidence and the
  * canonicalization of duplicate catalogue entries.
  */
object Lexicon {

  private val FirstNames = Vector(
    "Alice", "Bruno", "Carla", "David", "Elena", "Felix", "Greta", "Henri",
    "Irene", "Jonas", "Karim", "Laura", "Marco", "Nadia", "Oscar", "Petra",
    "Quentin", "Rosa", "Stefan", "Tania", "Ugo", "Vera", "Walter", "Xenia",
    "Yann", "Zoe", "Amir", "Bianca", "Cedric", "Dora")
  private val LastNames = Vector(
    "Johnson", "Keller", "Moreau", "Silva", "Nguyen", "Weber", "Rossi",
    "Dubois", "Novak", "Fischer", "Haddad", "Lindgren", "Okafor", "Petrov",
    "Quispe", "Romero", "Schmid", "Takahashi", "Ullmann", "Vasquez",
    "Wagner", "Xu", "Yilmaz", "Zimmermann", "Andersen", "Bauer", "Costa",
    "Dietrich", "Egger", "Fontaine")

  /** 60 canonical people, deterministic pairing. */
  val People: Vector[String] = (0 until 60).toVector.map { i =>
    FirstNames(i % FirstNames.length) + " " + LastNames((i * 7 + i / FirstNames.length) % LastNames.length)
  }.distinct

  val Orgs: Vector[String] = Vector(
    "Acme Industries", "Borealis Labs", "Cobalt Systems", "Deltaware",
    "Everfield Group", "Fjord Analytics", "Granite Partners", "Helios Energy",
    "Ionware", "Juniper Logistics", "Kestrel Media", "Lumen Biotech",
    "Meridian Bank", "Northgate Capital", "Orchid Software", "Pinnacle Foods",
    "Quartz Mobility", "Redwood Mining", "Solstice Pharma", "Tundra Robotics",
    "Umbra Security", "Vantage Retail", "Westport Shipping", "Zephyr Airlines")

  val Locs: Vector[String] = Vector(
    "Paris", "Geneva", "Lausanne", "Berlin", "Madrid", "Lisbon", "Oslo",
    "Vienna", "Prague", "Dublin", "Zurich", "Milan", "Warsaw", "Helsinki",
    "Brussels", "Amsterdam", "Copenhagen", "Athens", "Budapest", "Stockholm")

  /** Deterministic surface variants of a canonical name: used both by
    * the generator (a fraction of turns mention the variant form) and
    * to seed near-duplicate catalogue entries. Variant 0 is the
    * canonical form itself. */
  def variant(name: String, v: Int): String = v match {
    case 0 => name
    case 1 => // middle initial
      val parts = name.split(" ")
      if (parts.length >= 2) parts(0) + " " + (parts(1).charAt(0) + ". ") + parts.drop(1).mkString(" ")
      else name
    case 2 => // drop one inner letter of the last word (typo)
      val parts = name.split(" ")
      val last = parts.last
      if (last.length > 4) (parts.dropRight(1) :+ (last.substring(0, 2) + last.substring(3))).mkString(" ")
      else name
    case _ => // doubled letter typo
      val parts = name.split(" ")
      val last = parts.last
      if (last.length > 3) (parts.dropRight(1) :+ (last.substring(0, 2) + last.charAt(1) + last.substring(2))).mkString(" ")
      else name
  }

  /** Entity catalogue: one row per canonical person/org, plus a
    * deterministic ~20% of entities duplicated under a variant
    * display name and a suffixed id (the duplicate-catalogue case
    * canonicalization must merge; canonical id = min id per
    * component). */
  def catalogue: Vector[Entity] = {
    val people = People.zipWithIndex.map { case (n, i) => Entity(f"P$i%04d", n, "Personne") }
    val orgs = Orgs.zipWithIndex.map { case (n, i) => Entity(f"O$i%04d", n, "Entreprise") }
    val base = people ++ orgs
    val dups = base.filter(e => Hashing.bucket(Hashing.hash64(e.entity_id, 7L), 100) < 20)
      .map(e => Entity(e.entity_id + "x", variant(e.display_name, 1), e.entity_type))
    base ++ dups
  }

  /** canonical entity id for a canonical display name (generator-side
    * gold knowledge). */
  lazy val idByName: Map[String, String] =
    (People.zipWithIndex.map { case (n, i) => n -> f"P$i%04d" } ++
      Orgs.zipWithIndex.map { case (n, i) => n -> f"O$i%04d" }).toMap

  /** All surface forms the scorer's matcher knows, with their
    * canonical name + tag. Variants map back to the canonical name.
    * Sorted longest-first so greedy matching prefers the longest
    * surface form. */
  lazy val surfaceForms: Vector[(String, String, String)] = {
    val ppl = People.flatMap { n =>
      (0 to 3).map(v => (variant(n, v), n, "PERSON"))
    }
    val orgs = Orgs.map(n => (n, n, "ORG"))
    val locs = Locs.map(n => (n, n, "GPE"))
    (ppl ++ orgs ++ locs).distinct.sortBy(-_._1.length)
  }
}
