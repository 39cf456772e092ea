package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.functions.JsonPathLite
import org.scalatest.funsuite.AnyFunSuite

class JsonPathLiteSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private def ex(json: String, path: String): Boolean =
    JsonPathLite.exists(mapper.readTree(json), JsonPathLite.compile(path))

  // the reference's rule 1 shape (rules_example.yaml:5): filter on @type
  val tx =
    """{"body":{"messages":[
      |  {"@type":"type.googleapis.com/cosmos.bank.v1beta1.MsgSend",
      |   "fromAddress":"okp41rhd8744u4vqvcjuvyfm8fea4k9mefe3k57qz27",
      |   "toAddress":"okp41wwr8ye24766rmjjh7eva0rc2p7cnwa8py6s6fc",
      |   "amount":[{"denom":"know","amount":"100"}]}
      |]},"authInfo":{"fee":{}},"signatures":["YWJj"]}""".stripMargin

  test("filter on @type matches (rule 1)") {
    assert(ex(tx, "$.body.messages[?(@.@type == 'type.googleapis.com/cosmos.bank.v1beta1.MsgSend')]"))
    assert(!ex(tx, "$.body.messages[?(@.@type == 'type.googleapis.com/cosmos.bank.v1beta1.MsgMultiSend')]"))
  }

  test("deep scan + filter matches (rule 2)") {
    assert(ex(tx, "$..messages[?(@.fromAddress == 'okp41rhd8744u4vqvcjuvyfm8fea4k9mefe3k57qz27')]"))
    assert(!ex(tx, "$..messages[?(@.fromAddress == 'nobody')]"))
  }

  test("definite path that does not exist never matches, never throws (rule 3)") {
    assert(!ex(tx, "$.nop"))
    assert(!ex("{}", "$.a.b.c"))
  }

  test("definite paths") {
    assert(ex(tx, "$.body"))
    assert(ex(tx, "$.body.messages"))
    assert(ex(tx, "$.signatures[0]"))
    assert(!ex(tx, "$.signatures[3]"))
    assert(ex(tx, "$.signatures[-1]"))
    assert(ex(tx, "$['body']['messages']"))
  }

  test("wildcards") {
    assert(ex(tx, "$.body.messages[*]"))
    assert(ex(tx, "$.body.messages[*].amount[*].denom"))
    assert(ex(tx, "$.body.*"))
    assert(!ex("""{"body":{"messages":[]}}""", "$.body.messages[*]"))
  }

  test("deep scan plain field") {
    assert(ex(tx, "$..fromAddress"))
    assert(ex(tx, "$..denom"))
    assert(!ex(tx, "$..missingField"))
  }

  test("numeric comparisons") {
    val j = """{"props":{"k":87},"arr":[{"k":1},{"k":60}]}"""
    assert(ex(j, "$.arr[?(@.k > 50)]"))
    assert(!ex(j, "$.arr[?(@.k > 60)]"))
    assert(ex(j, "$.arr[?(@.k >= 60)]"))
    assert(ex(j, "$.arr[?(@.k < 2)]"))
    assert(ex(j, "$.arr[?(@.k == 60)]"))
    assert(ex(j, "$.arr[?(@.k != 60)]"))
    // filter applied to an object tests the object itself
    assert(ex(j, "$.props[?(@.k > 50)]"))
    assert(!ex(j, "$.props[?(@.k > 90)]"))
  }

  test("missing comparison operand is false for == and !=") {
    val j = """{"arr":[{"k":1}]}"""
    assert(!ex(j, "$.arr[?(@.z == 1)]"))
    assert(!ex(j, "$.arr[?(@.z != 1)]"))
  }

  test("existence filter") {
    val j = """{"arr":[{"k":1},{"z":2}]}"""
    assert(ex(j, "$.arr[?(@.k)]"))
    assert(!ex(j, "$.arr[?(@.missing)]"))
  }

  test("boolean/null literals and logic operators") {
    val j = """{"arr":[{"a":true,"b":null,"k":5},{"a":false,"k":60}]}"""
    assert(ex(j, "$.arr[?(@.a == true)]"))
    assert(ex(j, "$.arr[?(@.b == null)]"))
    assert(ex(j, "$.arr[?(@.a == true && @.k < 10)]"))
    assert(!ex(j, "$.arr[?(@.a == true && @.k > 10)]"))
    assert(ex(j, "$.arr[?(@.k > 100 || @.k == 60)]"))
  }

  test("string comparison is exact, cross-type equality is false") {
    val j = """{"arr":[{"k":"87"}]}"""
    assert(ex(j, "$.arr[?(@.k == '87')]"))
    assert(!ex(j, "$.arr[?(@.k == 87)]"))
  }

  test("nested field paths in filters") {
    val j = """{"arr":[{"a":{"b":"x"}}]}"""
    assert(ex(j, "$.arr[?(@.a.b == 'x')]"))
    assert(!ex(j, "$.arr[?(@.a.c == 'x')]"))
  }

  test("syntax errors throw at compile, not eval") {
    intercept[JsonPathLite.JsonPathSyntaxException](JsonPathLite.compile("body.messages"))
    intercept[JsonPathLite.JsonPathSyntaxException](JsonPathLite.compile("$.a[?(@.b =="))
    intercept[JsonPathLite.JsonPathSyntaxException](JsonPathLite.compile("$.a["))
  }

  test("malformed bracket indices throw JsonPathSyntaxException, not NumberFormatException") {
    intercept[JsonPathLite.JsonPathSyntaxException](JsonPathLite.compile("$[-]"))
    intercept[JsonPathLite.JsonPathSyntaxException](JsonPathLite.compile("$[99999999999]"))
    intercept[JsonPathLite.JsonPathSyntaxException](JsonPathLite.compile("$.a[-]"))
  }

  test("select returns matched nodes in document order") {
    val j = mapper.readTree("""{"a":[{"k":1},{"k":2},{"k":3}]}""")
    val got = JsonPathLite.select(j, JsonPathLite.compile("$.a[?(@.k > 1)]"))
    assert(got.map(_.get("k").asInt) == Seq(2, 3))
  }

  test("differential fuzz: definite paths agree with Jackson's JSON Pointer") {
    // Independent second implementation for the definite-path subset:
    // $.a.b[2].c  ≡  pointer /a/b/2/c; existence must agree on random docs
    val rnd = new scala.util.Random(424242L)
    val names = Seq("a", "b", "k", "x", "deep", "v2")
    def randomDoc(depth: Int): String =
      if (depth == 0) rnd.nextInt(3) match {
        case 0 => rnd.nextInt(100).toString
        case 1 => s""""s${rnd.nextInt(10)}""""
        case _ => if (rnd.nextBoolean()) "true" else "null"
      } else rnd.nextInt(3) match {
        case 0 => // object
          val ks = rnd.shuffle(names).take(1 + rnd.nextInt(3))
          ks.map(k => s""""$k":${randomDoc(depth - 1)}""").mkString("{", ",", "}")
        case 1 => // array
          Seq.fill(rnd.nextInt(3))(randomDoc(depth - 1)).mkString("[", ",", "]")
        case _ => randomDoc(0)
      }
    def randomPath(): Seq[Either[String, Int]] =
      Seq.fill(1 + rnd.nextInt(4))(
        if (rnd.nextBoolean()) Left(names(rnd.nextInt(names.length)))
        else Right(rnd.nextInt(3)))
    var checked = 0
    for (_ <- 1 to 500) {
      val doc = mapper.readTree(randomDoc(3))
      val segs = randomPath()
      val jsonPath = "$" + segs.map {
        case Left(n) => s".$n"
        case Right(i) => s"[$i]"
      }.mkString
      val pointer = "/" + segs.map {
        case Left(n) => n
        case Right(i) => i.toString
      }.mkString("/")
      val viaLite = JsonPathLite.exists(doc, JsonPathLite.compile(jsonPath))
      val viaPointer = !doc.at(pointer).isMissingNode
      // known, intended divergence: JSON Pointer `/0` treats an OBJECT's
      // key "0" as a hit while JsonPath `[0]` only indexes arrays — walk
      // the prefix and skip exactly the paths that hit an int segment on
      // an object node; everything else must agree bidirectionally
      var node = doc
      var comparable = true
      segs.foreach { seg =>
        if (node != null && !node.isMissingNode) {
          seg match {
            case Right(_) if node.isObject => comparable = false
            case Right(i) => node = if (node.isArray) node.get(i) else null
            case Left(n) => node = if (node.isObject) node.get(n) else null
          }
          if (node == null) node = mapper.missingNode()
        }
      }
      if (comparable) {
        assert(viaLite == viaPointer, s"doc=$doc path=$jsonPath pointer=$pointer")
        checked += 1
      }
    }
    assert(checked > 300, s"too few comparable cases: $checked")
  }
}
