package graft.core

/** Bidirectional prefix <-> namespace map with merge/conflict resolution —
  * the reference's `RDF.PrefixMap` (lib/rdf/model/prefix_map.ex:35-287).
  * Immutable; `add` refuses to remap an existing prefix to a different
  * namespace, `put` overwrites, `merge` takes an optional conflict
  * resolver. `prefixNamePair` is the longest-namespace-match lookup the
  * Turtle encoder uses.
  */
final case class PrefixMap(map: Map[String, String]) {

  def namespace(prefix: String): Option[String] = map.get(prefix)

  /** Reverse lookup: the prefix mapped to exactly this namespace. */
  def prefix(namespace: String): Option[String] =
    map.collectFirst { case (p, ns) if ns == namespace => p }

  def hasPrefix(prefix: String): Boolean = map.contains(prefix)
  def prefixes: Seq[String] = map.keys.toSeq.sorted
  def namespaces: Seq[String] = map.values.toSeq.sorted
  def isEmpty: Boolean = map.isEmpty

  /** Add a mapping; Left(error) if the prefix is already mapped to a
    * DIFFERENT namespace (prefix_map.ex add/3). */
  def add(prefix: String, namespace: String): Either[String, PrefixMap] =
    map.get(prefix) match {
      case Some(ns) if ns != namespace =>
        Left(s"prefix '$prefix' is already mapped to another namespace")
      case _ => Right(PrefixMap(map + (prefix -> namespace)))
    }

  /** Overwriting add (prefix_map.ex put/3). */
  def put(prefix: String, namespace: String): PrefixMap =
    PrefixMap(map + (prefix -> namespace))

  def drop(prefix: String): PrefixMap = PrefixMap(map - prefix)

  /** Merge; Left(conflicting prefixes) when both maps bind a prefix to
    * different namespaces (prefix_map.ex merge/2). */
  def merge(other: PrefixMap): Either[Seq[String], PrefixMap] = {
    val conflicts = other.map.keys.filter(p =>
      map.get(p).exists(_ != other.map(p))).toSeq.sorted
    if (conflicts.nonEmpty) Left(conflicts)
    else Right(PrefixMap(map ++ other.map))
  }

  /** Merge with a conflict resolver (prefix_map.ex merge/3): resolver gets
    * (prefix, ns1, ns2) and returns the namespace to keep. */
  def merge(other: PrefixMap,
            resolve: (String, String, String) => String): PrefixMap =
    PrefixMap(other.map.foldLeft(map) { case (acc, (p, ns2)) =>
      acc.get(p) match {
        case Some(ns1) if ns1 != ns2 => acc + (p -> resolve(p, ns1, ns2))
        case _ => acc + (p -> ns2)
      }
    })

  /** Longest-namespace match of an IRI -> (prefix, local name); the Turtle
    * encoder's `prefix_name_pair`. */
  def prefixNamePair(iri: String): Option[(String, String)] =
    map.toSeq
      .filter { case (_, ns) => iri.startsWith(ns) && iri.length > ns.length }
      .sortBy { case (_, ns) => -ns.length }
      .headOption
      .map { case (p, ns) => (p, iri.substring(ns.length)) }

  /** Expand a prefixed name "p:local" against the map. */
  def expand(pname: String): Option[String] = {
    val i = pname.indexOf(':')
    if (i < 0) None
    else map.get(pname.substring(0, i)).map(_ + pname.substring(i + 1))
  }
}

object PrefixMap {
  val empty: PrefixMap = new PrefixMap(Map.empty)
  def of(entries: (String, String)*): PrefixMap = new PrefixMap(entries.toMap)
}

/** Bidirectional readable-term <-> property-IRI map — the reference's
  * `RDF.PropertyMap` (lib/rdf/model/property_map.ex:39-120). Both
  * directions are kept consistent: adding a term for an IRI replaces any
  * previous binding of either side. Broadcast this to executors as the
  * "broadcast IRI dictionary" of the extraction pipeline.
  */
final case class PropertyMap(iris: Map[String, String]) {

  lazy val terms: Map[String, String] = iris.map(_.swap)

  def iri(term: String): Option[String] = iris.get(term)
  def term(iri: String): Option[String] = terms.get(iri)
  def termNames: Seq[String] = iris.keys.toSeq.sorted

  /** Add; Left(error) when the term is already mapped to a different IRI
    * (property_map.ex add/2 semantics). */
  def add(term: String, iri: String): Either[String, PropertyMap] =
    iris.get(term) match {
      case Some(existing) if existing != iri =>
        Left(s"term '$term' is already mapped to another IRI")
      case _ => Right(PropertyMap(iris + (term -> iri)))
    }

  /** Overwriting add (property_map.ex put/2). */
  def put(term: String, iri: String): PropertyMap =
    PropertyMap(iris + (term -> iri))

  def drop(term: String): PropertyMap = PropertyMap(iris - term)
}

object PropertyMap {
  val empty: PropertyMap = new PropertyMap(Map.empty)
  def of(entries: (String, String)*): PropertyMap = new PropertyMap(entries.toMap)
}
