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

  /** Keywords after which a table path may appear — path tokens (words
    * continuing through '/' and '.') are only lexed in that context;
    * anywhere else '/' is division and '.' is member access.
    * `profile` is the one statement whose table follows the keyword
    * directly (no `from`). */
  private val tableContext = Set("from", "join", "sjoin", "bjoin", "profile")
  private def pathChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '-' || c == '/' || c == '.' || c == '~'

  def tokenize(input: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var last: Tok = EOF
    // `profile` enables path mode only when it IS the statement's
    // first token (the statement form) — a COLUMN named profile
    // followed by '/' must stay arithmetic
    var prevText: String = ";" // virtual statement start
    var lastIsStmtInitial = false
    def emit(t: Tok): Unit = {
      lastIsStmtInitial = prevText == ";"
      prevText = t.text
      out += t; last = t
    }
    def inTableCtx: Boolean = last match {
      case Word(w) if w.equalsIgnoreCase("profile") => lastIsStmtInitial
      case Word(w) => tableContext(w.toLowerCase)
      case _ => false
    }
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
        emit(Str(sb.toString))
      } else if (c.isDigit ||
          (c == '.' && i + 1 < n && input(i + 1).isDigit)) {
        val start = i
        while (i < n && (input(i).isDigit || input(i) == '.')) i += 1
        emit(Num(input.substring(start, i)))
      } else if (c.isLetter || c == '_' ||
          (inTableCtx && (c == '/' || c == '~'))) {
        // word — or, right after from/join, a table path token that
        // continues through '/' and '.' (the reference registers path
        // tokens found in the query, utils.go:507-570). Outside table
        // context '/' is always division, so `a/b` stays arithmetic.
        val start = i
        if (inTableCtx) {
          while (i < n && pathChar(input(i))) i += 1
        } else {
          while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        }
        emit(Word(input.substring(start, i)))
      } else if (i + 1 < n && twoCharOps(input.substring(i, i + 2))) {
        emit(Op(input.substring(i, i + 2))); i += 2
      } else if (c == '!') {
        emit(Op("!")); i += 1
      } else if (oneCharOps(c)) {
        emit(Op(c.toString)); i += 1
      } else throw LexError(s"unexpected character '$c' at offset $i")
    }
    out += EOF
    out.result()
  }
}
