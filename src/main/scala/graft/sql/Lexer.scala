package graft.sql

/** Tokenizer for the dialect. The reference uses a table-driven DFA
  * (reference scanner.go:248-356); a regex scanner covers the same
  * token surface: words, numbers, quoted strings (collapsed to one
  * token, reference scanner.go:452-461), operators, punctuation.
  */
object Lexer {
  sealed trait Tok { def text: String }
  final case class Word(text: String) extends Tok          // identifiers/keywords
  final case class Num(text: String) extends Tok
  final case class Str(text: String) extends Tok           // quoted, unescaped payload
  final case class Op(text: String) extends Tok            // operators/punctuation
  case object EOF extends Tok { val text = "<eof>" }

  final case class LexError(msg: String) extends RuntimeException(msg)

  private val twoCharOps = Set("<=", ">=", "!=", "<>")
  private val oneCharOps = "()=<>+-*/%^,.;".toSet

  def tokenize(input: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = input(i)
          if (d == quote) {
            // doubled quote = escaped quote
            if (i + 1 < n && input(i + 1) == quote) { sb += quote; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += d; i += 1 }
        }
        if (!closed) throw LexError(s"unterminated string at offset $i")
        out += Str(sb.toString)
      } else if (c.isDigit ||
          (c == '.' && i + 1 < n && input(i + 1).isDigit)) {
        val start = i
        while (i < n && (input(i).isDigit || input(i) == '.')) i += 1
        out += Num(input.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        out += Word(input.substring(start, i))
      } else if ((c == '/' && i + 1 < n &&
          (input(i + 1).isLetter || input(i + 1) == '_' || input(i + 1) == '/')) ||
          c == '~') {
        // absolute filesystem path token (the reference registers .csv
        // paths found in the query, utils.go:507-570); dotted relative
        // names like file.csv are re-joined by the parser from
        // Word '.' Word sequences. A bare '/' (division) falls through
        // to the operator branch below.
        val start = i
        while (i < n && !input(i).isWhitespace && input(i) != ',' &&
            input(i) != '(' && input(i) != ')' && input(i) != ';') i += 1
        out += Word(input.substring(start, i))
      } else if (i + 1 < n && twoCharOps(input.substring(i, i + 2))) {
        out += Op(input.substring(i, i + 2)); i += 2
      } else if (c == '!' ) {
        out += Op("!"); i += 1
      } else if (oneCharOps(c)) {
        out += Op(c.toString); i += 1
      } else throw LexError(s"unexpected character '$c' at offset $i")
    }
    out += EOF
    out.result()
  }
}
