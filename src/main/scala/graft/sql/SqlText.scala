package graft.sql

/** Small SQL-text utilities shared by the regex-shaped front-ends
  * (SystemTimeJoin, TemporalTableFunctions). */
object SqlText {

  /** Remove `alias.` qualifiers (for any alias in `aliases`) from `s`,
    * WITHOUT touching single-quoted string literals — a literal containing
    * `la.` must survive verbatim. Qualifiers are matched at word boundaries
    * and case-insensitively, mirroring identifier resolution. */
  def stripQualifiers(s: String, aliases: Iterable[String]): String = {
    val names = aliases.map(_.toLowerCase).toSet
    if (names.isEmpty) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          // copy the literal whole: quotes escape by doubling ('') AND by
          // backslash ('\''), both honored by Spark's default lexer
          val start = i; i += 1
          var closed = false
          while (i < s.length && !closed) {
            s.charAt(i) match {
              case '\\' => i += 2
              case '\'' if i + 1 < s.length && s.charAt(i + 1) == '\'' => i += 2
              case '\'' => closed = true; i += 1
              case _ => i += 1
            }
          }
          i = math.min(i, s.length)
          out.append(s.substring(start, i))
        case c if c.isLetter || c == '_' =>
          val start = i
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          val word = s.substring(start, i)
          val isQualifier = i < s.length && s.charAt(i) == '.' &&
            names(word.toLowerCase) &&
            // a preceding '.' means `word` is itself a path segment — keep it
            (start == 0 || s.charAt(start - 1) != '.')
          if (isQualifier) i += 1 // drop "word."
          else out.append(word)
        case c =>
          out.append(c); i += 1
      }
    }
    out.toString
  }
}
