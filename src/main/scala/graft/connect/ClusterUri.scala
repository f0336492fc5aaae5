package graft.connect

/** Connector endpoint parsing (reference: utils/cluster_uri.h pinned by
  * tests/test7_cluster_uri.cpp, utils/url_parser.h pinned by
  * tests/test7_url_vector.cpp): a cluster URI is
  * `scheme://host:port,host:port,...[/path]` — scheme case-insensitive
  * (normalized lower), whitespace around list members stripped, IPv6
  * `[...]:port` authorities preserved. `splitUrlList` splits a
  * comma-separated list of full URLs, applying a default scheme to members
  * that lack one.
  */
final case class ClusterUri(scheme: String, authority: String, path: String) {
  def good: Boolean = scheme.nonEmpty && authority.nonEmpty
  def str: String = s"$scheme://$authority$path"
}

object ClusterUri {
  /** Parse `Scheme://auth1, auth2/path`; returns good=false (empty fields)
    * on a missing scheme separator.
    */
  def parse(s: String, defaultScheme: String = ""): ClusterUri = {
    val trimmed = s.trim
    val (scheme, rest) = trimmed.indexOf("://") match {
      case -1 if defaultScheme.nonEmpty => (defaultScheme.toLowerCase, trimmed)
      case -1 => return ClusterUri("", "", "")
      case i => (trimmed.substring(0, i).toLowerCase, trimmed.substring(i + 3))
    }
    // path starts at the first '/' outside an IPv6 bracket pair
    var depth = 0
    var pathAt = -1
    var i = 0
    while (i < rest.length && pathAt < 0) {
      rest.charAt(i) match {
        case '[' => depth += 1
        case ']' => depth -= 1
        case '/' if depth == 0 => pathAt = i
        case _ =>
      }
      i += 1
    }
    val (auth, path) =
      if (pathAt < 0) (rest, "") else (rest.substring(0, pathAt), rest.substring(pathAt))
    // strip whitespace around each comma-separated authority member
    val cleaned = auth.split(',').map(_.trim).filter(_.nonEmpty).mkString(",")
    ClusterUri(scheme, cleaned, path)
  }

  /** Split a comma-separated list of FULL urls (each with its own path);
    * members missing a scheme get `defaultScheme`. Unlike the cluster-uri
    * authority list, members here are whole URLs, so the split is on
    * commas between them (reference url_parser::split_url_list).
    */
  def splitUrlList(s: String, defaultScheme: String = ""): Seq[ClusterUri] =
    s.split(',').map(_.trim).filter(_.nonEmpty)
      .map(m => parse(m, defaultScheme)).toSeq
}
