package graft.js

import scala.collection.mutable.ArrayBuffer

/** Tokenizer for the JS subset.
  *
  * Newline positions are tracked per token (`nlBefore`) so the parser can
  * apply automatic semicolon insertion and the restricted productions for
  * `return`/`throw`/`++`/`--`. Regex literals are lexed context-sensitively:
  * a `/` starts a regex when the previous significant token cannot end an
  * expression — the same heuristic real engines use for the grammar's
  * InputElementRegExp goal.
  */
object Lexer {

  final case class Token(kind: String, text: String, num: Double, line: Int,
                         nlBefore: Boolean) {
    def is(k: String, t: String): Boolean = kind == k && text == t
  }
  // kinds: num str template regex ident keyword punct privname eof
  //   template tokens carry raw text with `${`-splits re-lexed by the parser

  val Keywords: Set[String] = Set(
    "var", "let", "const", "function", "return", "if", "else", "for", "while",
    "do", "break", "continue", "throw", "try", "catch", "finally", "new",
    "delete", "typeof", "instanceof", "in", "of", "this", "null", "true",
    "false", "undefined", "switch", "case", "default", "void",
    "class", "extends", "super",
    // legal ONLY inside a generator body (r13); elsewhere the parser
    // keeps the pre-r13 startup error
    "yield",
    // r14: `async function` / async arrows / async methods and `await`
    // directly inside them; `await` anywhere else stays the startup
    // error (these were in Rejected before r14, so `async`/`await` as
    // BINDING names were never legal lens code — no compat break)
    "async", "await")

  /** syntax we refuse (startup error), per the reference contract */
  val Rejected: Set[String] = Set("with", "import", "export")

  private val Puncts: Array[String] = Array(
    // longest first so greedy matching is correct
    ">>>=", "...", "===", "!==", "**=", "<<=", ">>=", ">>>", "&&=", "||=", "??=",
    "=>", "==", "!=", "<=", ">=", "&&", "||", "??", "?.", "++", "--", "+=", "-=",
    "*=", "/=", "%=", "&=", "|=", "^=", "<<", ">>", "**",
    "{", "}", "(", ")", "[", "]", ";", ",", "<", ">", "+", "-", "*", "/", "%",
    "&", "|", "^", "!", "~", "?", ":", "=", ".", "`")

  def tokenize(src: String): Vector[Token] = {
    val out = ArrayBuffer.empty[Token]
    var i = 0
    var line = 1
    var nl = false
    val n = src.length

    def prevSignificant: Option[Token] = out.lastOption

    /** can the previous token end an expression? if yes, `/` is division */
    def prevEndsExpr: Boolean = prevSignificant match {
      case None => false
      case Some(t) => t.kind match {
        case "num" | "str" | "regex" | "template" => true
        case "ident" => true
        case "keyword" => t.text == "this" || t.text == "null" || t.text == "true" ||
          t.text == "false" || t.text == "undefined"
        case "punct" => t.text == ")" || t.text == "]" || t.text == "}"
        case _ => false
      }
    }

    def err(msg: String): Nothing = throw new JsSyntaxError(msg, line)

    while (i < n) {
      val c = src.charAt(i)
      if (c == '\n') { line += 1; nl = true; i += 1 }
      else if (c == ' ' || c == '\t' || c == '\r' || c == '\u000b' || c == '\u000c' || c == '\u00a0') i += 1
      else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '/') {
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '*') {
        i += 2
        var closed = false
        while (i < n && !closed) {
          if (src.charAt(i) == '\n') { line += 1; nl = true }
          if (src.charAt(i) == '*' && i + 1 < n && src.charAt(i + 1) == '/') { closed = true; i += 2 }
          else i += 1
        }
        if (!closed) err("unterminated block comment")
      } else if (c.isDigit || (c == '.' && i + 1 < n && src.charAt(i + 1).isDigit)) {
        val start = i
        // radix literals parse through BigInteger, not Long: JS admits
        // values past 2^63 (0xFFFFFFFFFFFFFFFF is a fine double), and a
        // Long overflow here would escape as an uncaught
        // NumberFormatException instead of a startup JsSyntaxError
        def radixLiteral(radix: Int, isDigit: Char => Boolean, what: String): Unit = {
          i += 2
          val dStart = i
          while (i < n && isDigit(src.charAt(i))) i += 1
          if (i == dStart) err(s"missing digits after '0$what'")
          val text = src.substring(start, i)
          out += Token("num", text, new java.math.BigInteger(text.substring(2), radix).doubleValue, line, nl); nl = false
        }
        if (c == '0' && i + 1 < n && (src.charAt(i + 1) == 'x' || src.charAt(i + 1) == 'X')) {
          radixLiteral(16, ch => ch.isDigit || "abcdefABCDEF".indexOf(ch) >= 0, "x")
        } else if (c == '0' && i + 1 < n && (src.charAt(i + 1) == 'b' || src.charAt(i + 1) == 'B')) {
          radixLiteral(2, ch => ch == '0' || ch == '1', "b")
        } else if (c == '0' && i + 1 < n && (src.charAt(i + 1) == 'o' || src.charAt(i + 1) == 'O')) {
          radixLiteral(8, ch => ch >= '0' && ch <= '7', "o")
        } else {
          while (i < n && src.charAt(i).isDigit) i += 1
          if (i < n && src.charAt(i) == '.') { i += 1; while (i < n && src.charAt(i).isDigit) i += 1 }
          if (i < n && (src.charAt(i) == 'e' || src.charAt(i) == 'E')) {
            i += 1
            if (i < n && (src.charAt(i) == '+' || src.charAt(i) == '-')) i += 1
            if (i >= n || !src.charAt(i).isDigit) err("malformed exponent")
            while (i < n && src.charAt(i).isDigit) i += 1
          }
          if (i < n && src.charAt(i) == 'n') err("BigInt literals are not supported in lens code")
          val text = src.substring(start, i)
          out += Token("num", text, java.lang.Double.parseDouble(text), line, nl); nl = false
        }
        if (i < n && (src.charAt(i).isLetter || src.charAt(i) == '_' || src.charAt(i) == '$'))
          err("identifier starts immediately after numeric literal")
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new java.lang.StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = src.charAt(i)
          if (ch == quote) { closed = true; i += 1 }
          else if (ch == '\n') err("unterminated string literal")
          else if (ch == '\\') { i += 1; if (i >= n) err("unterminated string literal"); i = readEscape(src, i, sb, () => { line += 1 }, err) }
          else { sb.append(ch); i += 1 }
        }
        if (!closed) err("unterminated string literal")
        out += Token("str", sb.toString, 0, line, nl); nl = false
      } else if (c == '`') {
        // hand the parser the raw template span (backtick to backtick,
        // honoring ${...} nesting — string/comment-aware, see
        // templateEnd); the parser re-lexes the holes
        val start = i
        val startLine = line
        i = templateEnd(src, i + 1, () => line += 1, err)
        out += Token("template", src.substring(start, i), 0, startLine, nl); nl = false
      } else if (c == '/' && !prevEndsExpr) {
        // regex literal
        val start = i
        i += 1
        var inClass = false
        var closed = false
        while (i < n && !closed) {
          val ch = src.charAt(i)
          if (ch == '\n') err("unterminated regular expression")
          else if (ch == '\\') i += 2
          else if (ch == '[') { inClass = true; i += 1 }
          else if (ch == ']') { inClass = false; i += 1 }
          else if (ch == '/' && !inClass) { closed = true; i += 1 }
          else i += 1
        }
        if (!closed) err("unterminated regular expression")
        val flagStart = i
        while (i < n && (src.charAt(i).isLetter)) i += 1
        out += Token("regex", src.substring(start, i), 0, line, nl); nl = false
        val _ = flagStart
      } else if (c == '#') {
        // private name (#x): one token carrying the leading '#'. A
        // bare '#' not starting an identifier stays the loud
        // unexpected-character error it always was.
        if (i + 1 >= n ||
            !(Character.isJavaIdentifierStart(src.charAt(i + 1)) || src.charAt(i + 1) == '$'))
          err("unexpected character '#'")
        val start = i
        i += 1
        while (i < n && (Character.isJavaIdentifierPart(src.charAt(i)) || src.charAt(i) == '$')) i += 1
        out += Token("privname", src.substring(start, i), 0, line, nl); nl = false
      } else if (Character.isJavaIdentifierStart(c) || c == '$') {
        val start = i
        while (i < n && (Character.isJavaIdentifierPart(src.charAt(i)) || src.charAt(i) == '$')) i += 1
        val text = src.substring(start, i)
        // Rejected words lex as KEYWORD tokens and fail in the PARSER
        // at expression/statement positions — so `.with`, `obj.await`,
        // `{ import: 1 }` (legal property names in JS) keep working
        // while `with (...)`, `yield x`, `async fn` stay loud startup
        // errors (round-8 fix: the lexer-level throw rejected 'with'
        // even as the ES2023 Array.prototype.with method name)
        val kind = if (Keywords.contains(text) || Rejected.contains(text)) "keyword" else "ident"
        out += Token(kind, text, 0, line, nl); nl = false
      } else {
        var matched: String = null
        var k = 0
        while (matched == null && k < Puncts.length) {
          val p = Puncts(k)
          if (src.startsWith(p, i)) matched = p
          k += 1
        }
        if (matched == null) err(s"unexpected character '$c'")
        if (matched == "`") err("unterminated template literal")
        out += Token("punct", matched, 0, line, nl); nl = false
        i += matched.length
      }
    }
    out += Token("eof", "", 0, line, nl)
    out.toVector
  }

  /** read one escape sequence starting at src(i) (the char after '\'),
    * append the decoded char(s), return the next index */
  private def readEscape(src: String, i0: Int, sb: java.lang.StringBuilder,
                         onNewline: () => Unit, err: String => Nothing): Int = {
    var i = i0
    val e = src.charAt(i)
    e match {
      case 'n' => sb.append('\n'); i + 1
      case 't' => sb.append('\t'); i + 1
      case 'r' => sb.append('\r'); i + 1
      case 'b' => sb.append('\b'); i + 1
      case 'f' => sb.append('\f'); i + 1
      case 'v' => sb.append('\u000b'); i + 1
      case '0' if i + 1 >= src.length || !src.charAt(i + 1).isDigit => sb.append('\u0000'); i + 1
      case 'x' =>
        if (i + 2 >= src.length) err("bad \\x escape")
        sb.append(parseHex(src.substring(i + 1, i + 3), () => err("bad \\x escape")).toChar); i + 3
      case 'u' =>
        if (i + 1 < src.length && src.charAt(i + 1) == '{') {
          val close = src.indexOf('}', i + 2)
          if (close < 0) err("bad \\u{} escape")
          // parse failures AND out-of-range code points (\u{FFFFFFFF})
          // must be startup syntax errors, not escaped host exceptions
          val cp = parseHex(src.substring(i + 2, close), () => err("bad \\u{} escape"))
          if (cp > 0x10FFFF) err("undefined code point in \\u{} escape")
          sb.appendCodePoint(cp); close + 1
        } else {
          if (i + 4 >= src.length) err("bad \\u escape")
          sb.append(parseHex(src.substring(i + 1, i + 5), () => err("bad \\u escape")).toChar); i + 5
        }
      case '\n' => onNewline(); i + 1 // line continuation
      case '\r' =>
        onNewline()
        if (i + 1 < src.length && src.charAt(i + 1) == '\n') i + 2 else i + 1
      case other => sb.append(other); i + 1
    }
  }

  /** Strict non-negative hex parse for escape digits. `Integer.parseInt`
    * alone would accept a '+'/'-' sign ("\\x-1" → char U+FFFF, "\\u{-1}"
    * → appendCodePoint(-1) throwing an uncaught IllegalArgumentException)
    * where JS makes every signed escape a SyntaxError. */
  private def parseHex(digits: String, bad: () => Nothing): Int = {
    if (digits.isEmpty || !digits.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))) bad()
    try Integer.parseInt(digits, 16)
    catch { case _: NumberFormatException => bad() } // > Int.MaxValue digits
  }

  /** Index just PAST the closing backtick of a template literal whose
    * body starts at `start` (the char after the opening backtick).
    * `${...}` holes are skipped via [[holeEnd]], so a `}` or backtick
    * inside a hole's string literal / comment / nested template cannot
    * mis-terminate the scan. */
  def templateEnd(s: String, start: Int, onNewline: () => Unit, err: String => Nothing): Int = {
    var i = start
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n') { onNewline(); i += 1 }
      else if (c == '\\') i += 2
      else if (c == '`') return i + 1
      else if (c == '$' && i + 1 < s.length && s.charAt(i + 1) == '{')
        i = holeEnd(s, i + 2, onNewline, err) + 1
      else i += 1
    }
    err("unterminated template literal")
  }

  /** Index OF the `}` closing a `${` hole whose expression text starts
    * at `start`. The hole is EXPRESSION context, so the scan must not
    * count braces blindly: a `}` inside a string literal (`` `${m['}']}`
    * ``), a comment, or a nested template does not close the hole.
    * (A `}` inside a regex literal is still miscounted — distinguishing
    * `/` division from a regex start needs full token context; that
    * corner stays outside the subset.) */
  def holeEnd(s: String, start: Int, onNewline: () => Unit, err: String => Nothing): Int = {
    var i = start
    var depth = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n') { onNewline(); i += 1 }
      else if (c == '\'' || c == '"') {
        val q = c
        i += 1
        var closed = false
        while (i < s.length && !closed) {
          val ch = s.charAt(i)
          if (ch == '\\') i += 2
          else if (ch == q) { closed = true; i += 1 }
          else if (ch == '\n') err("unterminated string literal in template hole")
          else i += 1
        }
        if (!closed) err("unterminated string literal in template hole")
      }
      else if (c == '`') i = templateEnd(s, i + 1, onNewline, err)
      else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '/') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
      }
      else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        i += 2
        var closed = false
        while (i < s.length && !closed) {
          if (s.charAt(i) == '\n') onNewline()
          if (s.charAt(i) == '*' && i + 1 < s.length && s.charAt(i + 1) == '/') { closed = true; i += 2 }
          else i += 1
        }
        if (!closed) err("unterminated block comment in template hole")
      }
      else if (c == '{') { depth += 1; i += 1 }
      else if (c == '}') { depth -= 1; if (depth == 0) return i; i += 1 }
      else i += 1
    }
    err("unterminated ${...} in template literal")
  }

  /** decode escapes inside a template literal chunk (cooked value) */
  def cookTemplateChunk(raw: String, line: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    def err(msg: String): Nothing = throw new JsSyntaxError(msg, line)
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) i = readEscape(raw, i + 1, sb, () => (), err)
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
