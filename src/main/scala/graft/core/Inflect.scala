package graft.core

/** Name inflection (singularize/pluralize/camelize/pascalize).
  *
  * The reference delegates to the `cruet` crate (Rails-style inflection
  * rules): `src/cli/server/model/types.rs:26-32,179-204`. We hand-roll
  * the rule subset its fixtures exercise — regular plurals
  * (movie/movies), snake→camel casing (cloned_movie→clonedMovie), the
  * movie-specific singular rule, and uncountable words (`yoga` must have
  * singular == plural so registry validation rejects it,
  * `types.rs:149-151`).
  */
object Inflect {

  private val uncountable: Set[String] = Set(
    "equipment", "information", "rice", "money", "species", "series",
    "fish", "sheep", "jeans", "police", "news", "yoga", "data", "metadata")

  private val pluralRules: Seq[(String, String)] = Seq(
    "(?i)(quiz)$" -> "$1zes",
    "(?i)([m|l])ouse$" -> "$1ice",
    "(?i)(matr|vert|ind)ix|ex$" -> "$1ices",
    "(?i)(x|ch|ss|sh)$" -> "$1es",
    "(?i)([^aeiouy]|qu)y$" -> "$1ies",
    "(?i)(hive)$" -> "$1s",
    "(?i)(?:([^f])fe|([lr])f)$" -> "$1$2ves",
    "(?i)sis$" -> "ses",
    "(?i)([ti])um$" -> "$1a",
    "(?i)(buffal|tomat)o$" -> "$1oes",
    "(?i)(bu)s$" -> "$1ses",
    "(?i)(alias|status)$" -> "$1es",
    "(?i)(octop|vir)us$" -> "$1i",
    "(?i)(ax|test)is$" -> "$1es",
    "(?i)s$" -> "s",
    "$" -> "s")

  private val singularRules: Seq[(String, String)] = Seq(
    "(?i)(quiz)zes$" -> "$1",
    "(?i)(matr)ices$" -> "$1ix",
    "(?i)(vert|ind)ices$" -> "$1ex",
    "(?i)([m|l])ice$" -> "$1ouse",
    "(?i)(x|ch|ss|sh)es$" -> "$1",
    "(?i)(m)ovies$" -> "$1ovie",
    "(?i)(s)eries$" -> "$1eries",
    "(?i)([^aeiouy]|qu)ies$" -> "$1y",
    "(?i)([lr])ves$" -> "$1f",
    "(?i)(tive)s$" -> "$1",
    "(?i)(hive)s$" -> "$1",
    "(?i)([^f])ves$" -> "$1fe",
    "(?i)(^analy)ses$" -> "$1sis",
    "(?i)([ti])a$" -> "$1um",
    "(?i)(bus)es$" -> "$1",
    "(?i)(alias|status)es$" -> "$1",
    "(?i)(octop|vir)i$" -> "$1us",
    "(?i)(ax|test)es$" -> "$1is",
    "(?i)s$" -> "")

  private def applyRules(word: String, rules: Seq[(String, String)]): String = {
    val lower = word.toLowerCase
    if (word.isEmpty || uncountable.exists(u => lower.endsWith(u))) word
    else rules.collectFirst {
      case (pat, rep) if pat.r.findFirstIn(word).isDefined =>
        pat.r.replaceAllIn(word, rep)
    }.getOrElse(word)
  }

  def pluralize(word: String): String = applyRules(word, pluralRules)
  def singularize(word: String): String = applyRules(word, singularRules)

  /** snake_case / spinal-case / space-separated → words; preserves
    * existing camel humps. */
  private def words(s: String): Seq[String] =
    s.split("[_\\-\\s]+").toSeq.filter(_.nonEmpty)

  def camelize(s: String): String = {
    val ws = words(s)
    if (ws.isEmpty) ""
    else (ws.head.headOption.map(_.toLower).mkString + ws.head.drop(1)) +
      ws.tail.map(w => w.head.toUpper + w.drop(1)).mkString
  }

  def pascalize(s: String): String = {
    val c = camelize(s)
    if (c.isEmpty) "" else c.head.toUpper + c.tail
  }
}
