package graft.functions

import com.fasterxml.jackson.databind.JsonNode

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** A small, dependency-free JsonPath evaluator implementing the Jayway
  * JsonPath subset the dispatch rules need (reference:
  * TopologyProducer.kt:56–59,216–218 configures Jayway 2.8 with
  * SUPPRESS_EXCEPTIONS + AS_PATH_LIST and asks "does the path select ≥1
  * node"; example predicates in rules_example.yaml).
  *
  * Supported grammar:
  * {{{
  *   path     := '$' step*
  *   step     := '.' NAME | '.' '*' | '..' NAME | '..' '*' | '..' bracket | bracket
  *             | '.' FN '()'    // length/size, min/max/avg/sum/stddev,
  *                              // first/last, keys
  *   bracket  := '[' INT ']' | '[' INT? ':' INT? ']'          // slice
  *             | '[' INT (',' INT)+ ']'                       // index union
  *             | '[' QUOTED (',' QUOTED)* ']'                 // name union
  *             | '[*]' | '[?(' filter ')]'
  *             | '[(' '@.length' (('+'|'-') INT)? ')]'         // script subscript
  *   filter   := clause ( '||' clause )*           // || lowest precedence
  *   clause   := term ( '&&' term )*
  *   term     := relpath op literal | relpath      // bare path = existence
  *   relpath  := '@' ( '.' NAME | '..' NAME | '[' QUOTED ']' | '[' INT ']'
  *                   | '.length()' | '.size()' )*
  *   op       := '==' | '!=' | '<' | '<=' | '>' | '>=' | '=~' | 'in' | 'nin'
  *   literal  := 'sq-string' | "dq-string" | number | true | false | null
  *             | '/regex/flags'                    // =~ only; flags ⊆ {i,m,s}
  *             | '[' literal (',' literal)* ']'    // in/nin only
  *             | '$' step*                         // root-path operand:
  *                                                 // definite, comparison ops only
  * }}}
  *
  * Semantics matched to Jayway (as exercised by the reference):
  *  - a match = the expression selects at least one node;
  *  - a definite path that does not exist selects nothing (the reference
  *    surfaces this as a suppressed-exception NPE caught per rule,
  *    TopologyProducer.kt:221–223 — net effect identical: no match);
  *  - slices are python-style [start:end) with negative indices relative to
  *    the array end (step is not supported — Jayway has none either);
  *  - `..X` deep scan applies X at every node of the subtree, pre-order,
  *    walking through both objects and arrays; `..[0]`/`..['k']`/`..[*]`/
  *    `..[?(...)]` apply the bracket step the same way;
  *  - filters applied to an array keep matching elements; applied to an
  *    object they test the object itself;
  *  - missing filter operand ⇒ the comparison is false (never throws);
  *  - comparison operands must be definite relpaths (fields + indices);
  *    existence terms may also use `@..name` deep scan;
  *  - numeric comparison is exact decimal; strings compare with the given
  *    operator lexicographically; cross-type comparison is false
  *    (except `!=` which is true when both sides exist with different type);
  *  - `=~ /re/` is a FULL match on string values (Jayway's RegexpEvaluator
  *    calls `matcher.matches()`); non-strings never match;
  *  - `in [..]` / `nin [..]` test membership against literal lists.
  *
  * Evaluation never throws on well-formed compiled paths; `compile` throws
  * `JsonPathSyntaxException` on malformed input (callers isolate per rule,
  * mirroring the reference's per-rule runCatching).
  */
object JsonPathLite {

  final class JsonPathSyntaxException(msg: String) extends RuntimeException(msg)

  sealed trait Step
  final case class Field(name: String) extends Step
  final case class Index(i: Int) extends Step
  final case class Slice(start: Option[Int], end: Option[Int]) extends Step
  final case class UnionIdx(is: Seq[Int]) extends Step
  final case class UnionFields(names: Seq[String]) extends Step
  case object Wildcard extends Step
  final case class FilterStep(pred: Pred) extends Step
  /** Deep scan: apply `inner` at every node of the subtree (pre-order). */
  final case class Deep(inner: Step) extends Step
  /** Jayway `length()` path function: array/object size, string length. */
  case object FnLength extends Step
  /** Jayway script-expression subscript `[(@.length + offset)]`: selects
    * the array element at `size + offset` (so `[(@.length-1)]` is the last
    * element). Arrays only; out-of-range selects nothing — mirroring
    * Jayway under SUPPRESS_EXCEPTIONS.
    */
  final case class ScriptIndex(offset: Int) extends Step
  /** Jayway aggregate/accessor path functions: min, max, avg, sum, stddev
    * (numeric arrays → double), first, last (array element), keys
    * (object property names).
    */
  final case class FnAgg(kind: String) extends Step

  /** Path-function spellings accepted after '.' (checked in order). */
  private val pathFns: Seq[(String, Step)] = Seq(
    "length()" -> FnLength, "size()" -> FnLength,
    "min()" -> FnAgg("min"), "max()" -> FnAgg("max"),
    "avg()" -> FnAgg("avg"), "sum()" -> FnAgg("sum"),
    "stddev()" -> FnAgg("stddev"),
    "first()" -> FnAgg("first"), "last()" -> FnAgg("last"),
    "keys()" -> FnAgg("keys"))

  /** Path functions allowed inside a filter RELPATH (`@.a.length()`):
    * Jayway's filter-operand surface stops at length/size — accepting the
    * aggregate functions here would compile predicates the reference
    * rejects at runtime (silent grammar superset).
    */
  private val relpathFns: Seq[(String, Step)] =
    pathFns.filter { case (_, step) => step == FnLength }

  sealed trait Pred
  final case class Or(clauses: Seq[Pred]) extends Pred
  final case class And(terms: Seq[Pred]) extends Pred
  final case class Cmp(path: Seq[Step], op: String, lit: Lit) extends Pred
  final case class Exists(path: Seq[Step]) extends Pred

  sealed trait Lit
  final case class SLit(s: String) extends Lit
  final case class NLit(n: BigDecimal) extends Lit
  final case class BLit(b: Boolean) extends Lit
  case object NullLit extends Lit
  final case class RLit(regex: String, flags: Int) extends Lit {
    @transient lazy val pattern: Pattern = Pattern.compile(regex, flags)
  }
  final case class LLit(items: Seq[Lit]) extends Lit
  /** Root-path comparison operand — `[?(@.price <= $.expensive)]` (Jayway
    * bookstore example 8). Resolved against the ROOT document per
    * evaluation; must be a definite path (fields/indices only).
    */
  final case class PathLit(steps: Seq[Step]) extends Lit

  final case class Compiled(steps: Seq[Step])

  // ---------------------------------------------------------------- compile

  def compile(path: String): Compiled = {
    val s = path.trim
    if (s.isEmpty || s.charAt(0) != '$')
      throw new JsonPathSyntaxException(s"path must start with '$$': $path")
    var i = 1
    val steps = ArrayBuffer.empty[Step]

    def isNameChar(c: Char): Boolean =
      !(c == '.' || c == '[' || c == ']' || c == '(' || c == ')' ||
        c == ' ' || c == '\'' || c == '"')

    def readName(): String = {
      val start = i
      while (i < s.length && isNameChar(s.charAt(i))) i += 1
      if (i == start) throw new JsonPathSyntaxException(s"expected name at $start in $path")
      s.substring(start, i)
    }

    def skipWs(): Unit = while (i < s.length && s.charAt(i) == ' ') i += 1

    def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c)
        throw new JsonPathSyntaxException(s"expected '$c' at $i in $path")
      i += 1
    }

    def readQuoted(q: Char): String = {
      i += 1 // opening quote
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != q) {
        if (s.charAt(i) == '\\' && i + 1 < s.length) { sb += s.charAt(i + 1); i += 2 }
        else { sb += s.charAt(i); i += 1 }
      }
      if (i >= s.length) throw new JsonPathSyntaxException(s"unterminated string in $path")
      i += 1 // closing quote
      sb.result()
    }

    def readInt(): Int = {
      val start = i
      if (i < s.length && s.charAt(i) == '-') i += 1
      while (i < s.length && s.charAt(i).isDigit) i += 1
      val digits = s.substring(start, i)
      // contract: malformed input ⇒ JsonPathSyntaxException, never a raw
      // NumberFormatException ('$[-]', '$[99999999999]')
      try digits.toInt
      catch { case _: NumberFormatException =>
        throw new JsonPathSyntaxException(s"bad array index '$digits' in $path")
      }
    }

    /** Parse one bracket step; `i` is positioned just after '['. */
    def parseBracket(): Step = {
      skipWs()
      if (i >= s.length) throw new JsonPathSyntaxException(s"unterminated '[' in $path")
      s.charAt(i) match {
        case '*' =>
          i += 1; skipWs(); expect(']'); Wildcard
        case q @ ('\'' | '"') =>
          val names = ArrayBuffer(readQuoted(q))
          skipWs()
          while (i < s.length && s.charAt(i) == ',') {
            i += 1; skipWs()
            if (i >= s.length || (s.charAt(i) != '\'' && s.charAt(i) != '"'))
              throw new JsonPathSyntaxException(s"expected quoted name after ',' in $path")
            names += readQuoted(s.charAt(i))
            skipWs()
          }
          expect(']')
          if (names.length == 1) Field(names.head) else UnionFields(names.toSeq)
        case '(' => // script subscript: [(@.length)] or [(@.length ± INT)]
          i += 1; skipWs()
          val lenForms = Seq("@.length()", "@.length", "@.size()", "@.size")
          val form = lenForms.find(f => s.regionMatches(i, f, 0, f.length))
            .getOrElse(throw new JsonPathSyntaxException(
              s"script subscript must start with '@.length' in $path"))
          i += form.length; skipWs()
          val off =
            if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) {
              val neg = s.charAt(i) == '-'
              i += 1; skipWs()
              if (i >= s.length || !s.charAt(i).isDigit)
                throw new JsonPathSyntaxException(
                  s"expected integer after '${if (neg) "-" else "+"}' in script subscript in $path")
              val n = readInt()
              if (neg) -n else n
            } else 0
          skipWs(); expect(')'); skipWs(); expect(']')
          ScriptIndex(off)
        case '?' =>
          i += 1; expect('(')
          val start = i
          var depth = 1
          while (i < s.length && depth > 0) {
            val c = s.charAt(i)
            if (c == '(') depth += 1
            else if (c == ')') depth -= 1
            else if (c == '\'' || c == '"') { val q = c; i += 1; while (i < s.length && s.charAt(i) != q) { if (s.charAt(i) == '\\') i += 1; i += 1 } }
            if (depth > 0) i += 1
          }
          if (depth != 0) throw new JsonPathSyntaxException(s"unterminated filter in $path")
          val inner = s.substring(start, i)
          i += 1 // consume ')'
          skipWs(); expect(']')
          FilterStep(parseFilter(inner, path))
        case ':' => // [:end]
          i += 1; skipWs()
          val end = if (i < s.length && (s.charAt(i) == '-' || s.charAt(i).isDigit)) Some(readInt()) else None
          skipWs(); expect(']'); Slice(None, end)
        case c if c == '-' || c.isDigit =>
          val first = readInt()
          skipWs()
          if (i < s.length && s.charAt(i) == ':') { // [start:] or [start:end]
            i += 1; skipWs()
            val end = if (i < s.length && (s.charAt(i) == '-' || s.charAt(i).isDigit)) Some(readInt()) else None
            skipWs(); expect(']'); Slice(Some(first), end)
          } else if (i < s.length && s.charAt(i) == ',') { // index union
            val is = ArrayBuffer(first)
            while (i < s.length && s.charAt(i) == ',') { i += 1; skipWs(); is += readInt(); skipWs() }
            expect(']'); UnionIdx(is.toSeq)
          } else { skipWs(); expect(']'); Index(first) }
        case other =>
          throw new JsonPathSyntaxException(s"unexpected '$other' after '[' in $path")
      }
    }

    while (i < s.length) {
      s.charAt(i) match {
        case '.' if i + 1 < s.length && s.charAt(i + 1) == '.' =>
          i += 2
          if (i < s.length && s.charAt(i) == '[') { i += 1; steps += Deep(parseBracket()) }
          else if (i < s.length && s.charAt(i) == '*') { i += 1; steps += Deep(Wildcard) }
          else steps += Deep(Field(readName()))
        case '.' =>
          i += 1
          if (i < s.length && s.charAt(i) == '*') { i += 1; steps += Wildcard }
          else pathFns.find { case (fn, _) => s.startsWith(fn, i) } match {
            case Some((fn, step)) => i += fn.length; steps += step
            case None             => steps += Field(readName())
          }
        case '[' =>
          i += 1
          steps += parseBracket()
        case other =>
          throw new JsonPathSyntaxException(s"unexpected '$other' at $i in $path")
      }
    }

    Compiled(steps.toSeq)
  }

  /** Parse the inside of `[?( ... )]`. */
  private def parseFilter(f: String, whole: String): Pred = {
    def splitTop(input: String, sep: String): Seq[String] = {
      val parts = ArrayBuffer.empty[String]
      var depth = 0; var j = 0; var last = 0
      while (j < input.length) {
        val c = input.charAt(j)
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (c == '\'' || c == '"') { val q = c; j += 1; while (j < input.length && input.charAt(j) != q) { if (input.charAt(j) == '\\') j += 1; j += 1 } }
        else if (depth == 0 && input.startsWith(sep, j)) { parts += input.substring(last, j); j += sep.length - 1; last = j + 1 }
        j += 1
      }
      parts += input.substring(last)
      parts.toSeq
    }

    def parseTerm(t0: String): Pred = {
      var t = t0.trim
      if (t.startsWith("(") && t.endsWith(")")) {
        // parenthesised sub-filter
        return parseFilter(t.substring(1, t.length - 1), whole)
      }
      // find a top-level operator: symbol ops at any position, word ops
      // (in / nin) only at whitespace boundaries so they can't fire inside
      // a field name like '@.inner'
      val symOps = Seq("==", "!=", "<=", ">=", "=~", "<", ">")
      var opIdx = -1; var op = ""
      var j = 0; var inStr = false; var q = ' '
      var bracketDepth = 0
      while (j < t.length && opIdx < 0) {
        val c = t.charAt(j)
        if (inStr) { if (c == q) inStr = false else if (c == '\\') j += 1 }
        else if (c == '\'' || c == '"') { inStr = true; q = c }
        else if (c == '[') bracketDepth += 1
        else if (c == ']') bracketDepth -= 1
        else if (bracketDepth == 0) {
          symOps.find(o => t.startsWith(o, j)) match {
            case Some(o) => opIdx = j; op = o
            case None =>
              def wordAt(w: String): Boolean =
                t.startsWith(w, j) && j > 0 && t.charAt(j - 1).isWhitespace &&
                  (j + w.length >= t.length || !isWordChar(t.charAt(j + w.length)))
              if (wordAt("nin")) { opIdx = j; op = "nin" }
              else if (wordAt("in")) { opIdx = j; op = "in" }
          }
        }
        j += 1
      }
      if (opIdx < 0) Exists(parseRelPath(t, existsOk = true))
      else {
        val lhs = t.substring(0, opIdx).trim
        val rhs = t.substring(opIdx + op.length).trim
        val lit = parseLiteral(rhs, op)
        // operator/literal agreement BOTH ways: '=~' with a quoted string
        // (or 'in' with a scalar) would otherwise compile cleanly and
        // evaluate to constant false — the silent-never-match failure mode
        // eager rule validation exists to prevent
        // (the converse directions — regex with a non-'=~' op, list with a
        // non-in/nin op — are rejected inside parseLiteral itself)
        (op, lit) match {
          case ("=~", _: RLit) => ()
          case ("=~", _) =>
            throw new JsonPathSyntaxException(s"'=~' needs a /regex/ literal in $whole")
          case ("in" | "nin", _: LLit) => ()
          case ("in" | "nin", _) =>
            throw new JsonPathSyntaxException(s"'$op' needs a [list] literal in $whole")
          case _ => ()
        }
        Cmp(parseRelPath(lhs, existsOk = false), op, lit)
      }
    }

    def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

    /** Relpath inside a filter: `@` then field / index / quoted-field steps;
      * `@..name` deep scan is allowed only for existence terms (Jayway
      * rejects indefinite paths as comparison operands).
      */
    def parseRelPath(p0: String, existsOk: Boolean): Seq[Step] = {
      val p = p0.trim
      if (!p.startsWith("@"))
        throw new JsonPathSyntaxException(s"filter path must start with '@': '$p' in $whole")
      val rest = p.substring(1)
      if (rest.isEmpty) return Seq.empty
      val segs = ArrayBuffer.empty[Step]
      var j = 0
      while (j < rest.length) {
        rest.charAt(j) match {
          case '.' if j + 1 < rest.length && rest.charAt(j + 1) == '.' =>
            if (!existsOk)
              throw new JsonPathSyntaxException(
                s"deep scan not allowed in comparison operand '$p' in $whole")
            j += 2
            val start = j
            while (j < rest.length && rest.charAt(j) != '.' && rest.charAt(j) != '[') j += 1
            if (j == start) throw new JsonPathSyntaxException(s"bad filter path '$p' in $whole")
            segs += Deep(Field(rest.substring(start, j)))
          case '.' if pathFns.exists { case (fn, _) => rest.startsWith("." + fn, j) } =>
            val (fn, step) = pathFns.find { case (f, _) => rest.startsWith("." + f, j) }.get
            if (!relpathFns.exists(_._1 == fn))
              throw new JsonPathSyntaxException(
                s"path function '$fn' not allowed in a filter path (only length()/size()): '$p' in $whole")
            j += fn.length + 1
            segs += step
          case '.' =>
            j += 1
            val start = j
            while (j < rest.length && rest.charAt(j) != '.' && rest.charAt(j) != '[') j += 1
            if (j == start) throw new JsonPathSyntaxException(s"bad filter path '$p' in $whole")
            segs += Field(rest.substring(start, j))
          case '[' =>
            j += 1
            while (j < rest.length && rest.charAt(j) == ' ') j += 1
            if (j >= rest.length)
              throw new JsonPathSyntaxException(s"unterminated bracket in filter path '$p'")
            val c = rest.charAt(j)
            if (c == '\'' || c == '"') {
              val quote = c
              j += 1
              val sb = new StringBuilder
              while (j < rest.length && rest.charAt(j) != quote) { sb += rest.charAt(j); j += 1 }
              j += 1 // quote
              while (j < rest.length && rest.charAt(j) == ' ') j += 1
              if (j >= rest.length || rest.charAt(j) != ']')
                throw new JsonPathSyntaxException(s"unterminated bracket in filter path '$p'")
              j += 1
              segs += Field(sb.result())
            } else if (c == '-' || c.isDigit) {
              val start = j
              if (rest.charAt(j) == '-') j += 1
              while (j < rest.length && rest.charAt(j).isDigit) j += 1
              val digits = rest.substring(start, j)
              val idx =
                try digits.toInt
                catch { case _: NumberFormatException =>
                  throw new JsonPathSyntaxException(s"bad index '$digits' in filter path '$p'")
                }
              while (j < rest.length && rest.charAt(j) == ' ') j += 1
              if (j >= rest.length || rest.charAt(j) != ']')
                throw new JsonPathSyntaxException(s"unterminated bracket in filter path '$p'")
              j += 1
              segs += Index(idx)
            } else
              throw new JsonPathSyntaxException(
                s"only ['name'] or [int] brackets in filter paths: '$p'")
          case other =>
            throw new JsonPathSyntaxException(s"unexpected '$other' in filter path '$p'")
        }
      }
      segs.toSeq
    }

    def parseLiteral(l0: String, op: String): Lit = {
      val l = l0.trim
      if (l.isEmpty) throw new JsonPathSyntaxException(s"empty literal in $whole")
      if (l.charAt(0) == '/') {
        if (op != "=~")
          throw new JsonPathSyntaxException(s"regex literal only valid with '=~' in $whole")
        val close = l.lastIndexOf('/')
        if (close <= 0)
          throw new JsonPathSyntaxException(s"unterminated regex literal '$l' in $whole")
        val body = l.substring(1, close).replace("\\/", "/")
        val flagChars = l.substring(close + 1)
        var flags = 0
        flagChars.foreach {
          case 'i' => flags |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
          case 'm' => flags |= Pattern.MULTILINE
          case 's' => flags |= Pattern.DOTALL
          case c   => throw new JsonPathSyntaxException(s"unsupported regex flag '$c' in $whole")
        }
        try { Pattern.compile(body, flags); RLit(body, flags) }
        catch { case e: Exception =>
          throw new JsonPathSyntaxException(s"bad regex '$body' in $whole: ${e.getMessage}")
        }
      } else if (l.charAt(0) == '$') {
        // root-path operand: definite (fields/indices) only — Jayway
        // rejects indefinite paths as comparison operands, and regex /
        // list ops take literal RHS shapes
        if (op == "=~" || op == "in" || op == "nin")
          throw new JsonPathSyntaxException(
            s"root-path operand not valid with '$op' in $whole")
        val compiled =
          try compile(l)
          catch { case e: JsonPathSyntaxException =>
            throw new JsonPathSyntaxException(s"bad root-path operand '$l' in $whole: ${e.getMessage}")
          }
        val definite = compiled.steps.forall {
          case _: Field | _: Index => true
          case _                   => false
        }
        if (!definite)
          throw new JsonPathSyntaxException(
            s"root-path operand must be definite (fields/indices only): '$l' in $whole")
        PathLit(compiled.steps)
      } else if (l.charAt(0) == '[') {
        if (op != "in" && op != "nin")
          throw new JsonPathSyntaxException(s"list literal only valid with in/nin in $whole")
        if (l.last != ']')
          throw new JsonPathSyntaxException(s"unterminated list literal '$l' in $whole")
        val inner = l.substring(1, l.length - 1).trim
        if (inner.isEmpty) LLit(Nil)
        else LLit(splitTop(inner, ",").map { e =>
          parseLiteral(e, "==") match {
            case _: PathLit => throw new JsonPathSyntaxException(
              s"root-path operand not allowed inside a [list] literal in $whole")
            case lit => lit
          }
        })
      } else if (l.charAt(0) == '\'' || l.charAt(0) == '"') {
        val q = l.charAt(0)
        if (l.length < 2 || l.last != q)
          throw new JsonPathSyntaxException(s"unterminated string literal '$l'")
        val sb = new StringBuilder
        var j = 1
        while (j < l.length - 1) {
          if (l.charAt(j) == '\\' && j + 1 < l.length - 1) { sb += l.charAt(j + 1); j += 2 }
          else { sb += l.charAt(j); j += 1 }
        }
        SLit(sb.result())
      } else l match {
        case "true"  => BLit(true)
        case "false" => BLit(false)
        case "null"  => NullLit
        case n =>
          try NLit(BigDecimal(n))
          catch { case _: NumberFormatException => throw new JsonPathSyntaxException(s"bad literal '$l' in $whole") }
      }
    }

    val orParts = splitTop(f, "||")
    val orPreds = orParts.map { part =>
      val andParts = splitTop(part, "&&")
      if (andParts.length == 1) parseTerm(andParts.head)
      else And(andParts.map(parseTerm))
    }
    if (orPreds.length == 1) orPreds.head else Or(orPreds)
  }

  // ------------------------------------------------------------------- eval

  /** All nodes the path selects, document order. Never throws. */
  def select(root: JsonNode, path: Compiled): Seq[JsonNode] = {
    if (root == null || root.isMissingNode) return Seq.empty
    var current: Seq[JsonNode] = Seq(root)
    path.steps.foreach { step =>
      if (current.isEmpty) return Seq.empty
      current = current.flatMap(applyStep(root, _, step))
    }
    current
  }

  /** Does the path select at least one node? (The reference's match test —
    * TopologyProducer.kt:216–218.)
    */
  def exists(root: JsonNode, path: Compiled): Boolean = {
    if (root == null || root.isMissingNode) return false
    var current: Seq[JsonNode] = Seq(root)
    path.steps.foreach { step =>
      if (current.isEmpty) return false
      current = current.flatMap(applyStep(root, _, step))
    }
    current.nonEmpty
  }

  private def normSlice(i: Int, n: Int): Int =
    math.max(0, math.min(n, if (i < 0) n + i else i))

  private def applyStep(root: JsonNode, node: JsonNode, step: Step): Seq[JsonNode] = step match {
    case Field(name) =>
      if (node.isObject && node.has(name)) Seq(node.get(name)) else Seq.empty
    case Index(i) =>
      if (node.isArray) {
        val n = node.size
        val idx = if (i < 0) n + i else i
        if (idx >= 0 && idx < n) Seq(node.get(idx)) else Seq.empty
      } else Seq.empty
    case ScriptIndex(off) =>
      if (node.isArray) {
        val idx = node.size + off
        if (idx >= 0 && idx < node.size) Seq(node.get(idx)) else Seq.empty
      } else Seq.empty
    case Slice(start, end) =>
      if (node.isArray) {
        val n = node.size
        val s0 = normSlice(start.getOrElse(0), n)
        val e0 = normSlice(end.getOrElse(n), n)
        (s0 until e0).map(node.get)
      } else Seq.empty
    case UnionIdx(is) =>
      if (node.isArray) {
        val n = node.size
        is.flatMap { i =>
          val idx = if (i < 0) n + i else i
          if (idx >= 0 && idx < n) Some(node.get(idx)) else None
        }
      } else Seq.empty
    case UnionFields(names) =>
      if (node.isObject) names.flatMap(nm => if (node.has(nm)) Some(node.get(nm)) else None)
      else Seq.empty
    case Wildcard =>
      if (node.isArray) node.elements().asScala.toSeq
      else if (node.isObject) node.elements().asScala.toSeq
      else Seq.empty
    case Deep(inner) =>
      // pre-order: apply `inner` at this node, then recurse into children
      // of objects AND arrays. A deep FILTER can surface the same node
      // twice — once as a kept element of its parent array's FilterStep and
      // once when the walk visits the node itself — so those matches are
      // deduped by node identity (Jayway returns each match once).
      val out = ArrayBuffer.empty[JsonNode]
      val seen = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[JsonNode, java.lang.Boolean]())
      val dedupe = inner.isInstanceOf[FilterStep]
      def walk(n: JsonNode): Unit = {
        val hits = applyStep(root, n, inner)
        if (dedupe) hits.foreach(h => if (seen.add(h)) out += h)
        else out ++= hits
        if (n.isObject || n.isArray) n.elements().asScala.foreach(walk)
      }
      walk(node)
      out.toSeq
    case FilterStep(pred) =>
      if (node.isArray) node.elements().asScala.filter(evalPred(root, _, pred)).toSeq
      else if (node.isObject) { if (evalPred(root, node, pred)) Seq(node) else Seq.empty }
      else Seq.empty
    case FnLength =>
      // Jayway length()/size(): array size, object size, string length;
      // other node types have no length
      if (node.isArray || node.isObject)
        Seq(com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.numberNode(node.size))
      else if (node.isTextual)
        Seq(com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.numberNode(node.asText.length))
      else Seq.empty
    case FnAgg(kind) =>
      val fac = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
      kind match {
        case "first" =>
          if (node.isArray && node.size > 0) Seq(node.get(0)) else Seq.empty
        case "last" =>
          if (node.isArray && node.size > 0) Seq(node.get(node.size - 1)) else Seq.empty
        case "keys" =>
          if (node.isObject) {
            val arr = fac.arrayNode()
            node.fieldNames().asScala.foreach(arr.add)
            Seq(arr)
          } else Seq.empty
        case _ =>
          // numeric aggregates: defined only on non-empty all-number arrays
          // (Jayway throws on anything else; suppressed ⇒ no node)
          if (!node.isArray || node.size == 0) Seq.empty
          else {
            val elems = node.elements().asScala.toSeq
            if (!elems.forall(_.isNumber)) Seq.empty
            else {
              val xs = elems.map(_.doubleValue())
              val v = kind match {
                case "min" => xs.min
                case "max" => xs.max
                case "sum" => xs.sum
                case "avg" => xs.sum / xs.length
                case "stddev" =>
                  val mean = xs.sum / xs.length
                  math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.length)
              }
              Seq(fac.numberNode(v))
            }
          }
      }
  }

  private def selectRel(root: JsonNode, node: JsonNode, path: Seq[Step]): Seq[JsonNode] = {
    var current: Seq[JsonNode] = Seq(node)
    path.foreach { step =>
      if (current.isEmpty) return Seq.empty
      current = current.flatMap(applyStep(root, _, step))
    }
    current
  }

  private def evalPred(root: JsonNode, node: JsonNode, pred: Pred): Boolean = pred match {
    case Or(cs)  => cs.exists(evalPred(root, node, _))
    case And(ts) => ts.forall(evalPred(root, node, _))
    case Exists(p) => selectRel(root, node, p).nonEmpty
    case Cmp(p, op, lit) =>
      selectRel(root, node, p).headOption.exists(compare(root, _, op, lit))
  }

  private def litEquals(v: JsonNode, lit: Lit): Boolean = lit match {
    case SLit(s)  => v.isTextual && v.asText == s
    case NLit(n)  => v.isNumber && BigDecimal(v.decimalValue()).compare(n) == 0
    case BLit(b)  => v.isBoolean && v.asBoolean == b
    case NullLit  => v.isNull
    case _        => false
  }

  /** A root-path operand resolves to the scalar it selects (missing or
    * non-scalar operand => the comparison is false, Jayway's behavior for
    * an unresolvable operand). */
  private def nodeToLit(n: JsonNode): Option[Lit] =
    if (n.isTextual) Some(SLit(n.asText))
    else if (n.isNumber) Some(NLit(BigDecimal(n.decimalValue())))
    else if (n.isBoolean) Some(BLit(n.asBoolean))
    else if (n.isNull) Some(NullLit)
    else None

  private def compare(root: JsonNode, v: JsonNode, op: String, lit: Lit): Boolean = (lit, op) match {
    case (PathLit(steps), _) =>
      select(root, Compiled(steps)).headOption.flatMap(nodeToLit) match {
        case Some(resolved) => compare(root, v, op, resolved)
        case None           => false
      }
    case (r: RLit, "=~") => v.isTextual && r.pattern.matcher(v.asText).matches()
    case (LLit(items), "in")  => items.exists(litEquals(v, _))
    case (LLit(items), "nin") => !items.exists(litEquals(v, _))
    case (SLit(s), _) if v.isTextual =>
      val c = v.asText.compareTo(s)
      opHolds(op, c)
    case (NLit(n), _) if v.isNumber =>
      val c = BigDecimal(v.decimalValue()).compare(n)
      opHolds(op, c)
    case (BLit(b), "==") => v.isBoolean && v.asBoolean == b
    case (BLit(b), "!=") => !(v.isBoolean && v.asBoolean == b)
    case (NullLit, "==") => v.isNull
    case (NullLit, "!=") => !v.isNull
    case (_, "!=")       => true // both exist, different types
    case _               => false
  }

  private def opHolds(op: String, cmp: Int): Boolean = op match {
    case "==" => cmp == 0
    case "!=" => cmp != 0
    case "<"  => cmp < 0
    case "<=" => cmp <= 0
    case ">"  => cmp > 0
    case ">=" => cmp >= 0
    case _    => false
  }
}
