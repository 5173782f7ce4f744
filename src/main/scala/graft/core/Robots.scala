package graft.core

import scala.collection.mutable

/** robots.txt parsing and prefix matching, matching the reference semantics
  * (`bubing/util/URLRespectsRobots.java:55-227`):
  *
  *  - a record section applies to us if its `User-agent:` token is a prefix
  *    of our agent name (case-insensitive); `*` sections are collected
  *    separately and used only when no agent-specific section exists;
  *  - `Disallow:` with no value clears the current section's set;
  *  - a trailing `*` on a disallow value is stripped (erroneous wildcard);
  *  - tokens are whitespace-delimited; `#` starts a comment line; blank
  *    lines end a record;
  *  - the filter is the sorted, prefix-free set of disallowed path prefixes;
  *  - a pathQuery is ALLOWED iff it does not start with the rightmost
  *    filter entry that is <= it (binary search, `URLRespectsRobots.java:214-227`).
  */
object Robots {

  /** Sort + drop entries that start with an earlier entry
    * (`toSortedPrefixFreeCharArrays`, URLRespectsRobots.java:57-69). */
  def toSortedPrefixFree(set: Iterable[String]): Array[String] = {
    val s = set.toArray.sorted
    if (s.isEmpty) return s
    val out = mutable.ArrayBuffer[String](s(0))
    var j = 0
    var i = 1
    while (i < s.length) {
      if (!s(i).startsWith(out(j))) { out += s(i); j += 1 }
      i += 1
    }
    out.toArray
  }

  /** Parse robots.txt content into the sorted prefix-free disallow filter
    * for the given user agent. A leading UTF-8 BOM is skipped
    * (URLRespectsRobots.java:182-188). */
  def parse(content0: String, userAgent: String): Array[String] = {
    val content =
      if (content0.nonEmpty && content0.charAt(0) == 0xFEFF.toChar) content0.substring(1)
      else content0
    val set = mutable.LinkedHashSet[String]()     // agent-specific
    val setStar = mutable.LinkedHashSet[String]() // '*'
    var doesMatter = false
    var specific = false
    var generic = false
    var starSection = false

    for (rawLine <- content.split("\n", -1)) {
      val line = rawLine.stripSuffix("\r")
      val trimmed = line.trim
      if (trimmed.isEmpty) {
        doesMatter = false // blank line: new record starts
      } else if (trimmed.startsWith("#") || trimmed.charAt(0).isDigit) {
        // comment / number line: ignored (reference tokenizer quirk)
      } else {
        val tokens = trimmed.split("\\s+").toList
        tokens match {
          case first :: rest if first.equalsIgnoreCase("user-agent:") =>
            rest.headOption.foreach { agent =>
              if (userAgent.regionMatches(true, 0, agent, 0, agent.length)) {
                doesMatter = true; specific = true; starSection = false
              } else if (agent == "*") {
                starSection = true; generic = true
              } else starSection = false
            }
          case first :: rest if first.equalsIgnoreCase("disallow:") =>
            rest.headOption match {
              case None =>
                if (doesMatter) set.clear()
                else if (starSection) setStar.clear()
              case Some(value0) =>
                val value = if (value0.endsWith("*")) value0.dropRight(1) else value0
                if (doesMatter) set += value
                else if (starSection) setStar += value
            }
          case _ => // ununderstandable line: ignored
        }
      }
    }
    if (specific) toSortedPrefixFree(set)
    else if (generic) toSortedPrefixFree(setStar)
    else toSortedPrefixFree(set)
  }

  /** True iff pathQuery passes the filter (is allowed). Binary search for
    * the rightmost prefix <= pathQuery; allowed iff pathQuery does not start
    * with it (URLRespectsRobots.apply, :214-227). For a prefix-free sorted
    * set this equals "no entry is a prefix of pathQuery". */
  def allowed(filter: Array[String], pathQuery: String): Boolean = {
    if (filter.length == 0) return true
    var from = 0
    var to = filter.length - 1
    while (from <= to) {
      val mid = (from + to) >>> 1
      val cmp = filter(mid).compareTo(pathQuery)
      if (cmp < 0) from = mid + 1
      else if (cmp > 0) to = mid - 1
      else return false // exact match: disallowed
    }
    if (from == 0) true else !pathQuery.startsWith(filter(from - 1))
  }
}
