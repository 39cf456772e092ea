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

  // ---- widened Jayway grammar (round-2: slices, unions, ..[], =~, in) ----

  private val store =
    """{"store":{"book":[
      |  {"category":"reference","author":"Nigel Rees","title":"Sayings of the Century","price":8.95},
      |  {"category":"fiction","author":"Evelyn Waugh","title":"Sword of Honour","price":12.99},
      |  {"category":"fiction","author":"Herman Melville","title":"Moby Dick","isbn":"0-553-21311-3","price":8.99},
      |  {"category":"fiction","author":"J. R. R. Tolkien","title":"The Lord of the Rings","isbn":"0-395-19395-8","price":22.99}
      |],"bicycle":{"color":"red","price":19.95}},"expensive":10}""".stripMargin

  private def sel(json: String, path: String): Seq[String] =
    JsonPathLite.select(mapper.readTree(json), JsonPathLite.compile(path)).map(_.toString)

  test("array slices (Jayway examples: $..book[:2], [1:2], [-2:], [2:])") {
    def titles(p: String) =
      JsonPathLite.select(mapper.readTree(store), JsonPathLite.compile(p))
        .map(_.get("title").asText)
    assert(titles("$..book[:2]") == Seq("Sayings of the Century", "Sword of Honour"))
    assert(titles("$.store.book[1:2]") == Seq("Sword of Honour"))
    assert(titles("$..book[-2:]") == Seq("Moby Dick", "The Lord of the Rings"))
    assert(titles("$..book[2:]") == Seq("Moby Dick", "The Lord of the Rings"))
    assert(titles("$.store.book[1:-1]") == Seq("Sword of Honour", "Moby Dick"))
    assert(titles("$.store.book[9:]") == Nil)
  }

  test("root-path filter operand (Jayway example 8: price <= $['expensive'])") {
    def titles(p: String) =
      JsonPathLite.select(mapper.readTree(store), JsonPathLite.compile(p))
        .map(_.get("title").asText)
    // both bracket and dot spellings of the root reference
    assert(titles("$..book[?(@.price <= $['expensive'])]") ==
      Seq("Sayings of the Century", "Moby Dick"))
    assert(titles("$.store.book[?(@.price > $.expensive)]") ==
      Seq("Sword of Honour", "The Lord of the Rings"))
    // string-valued root operand compares lexicographically like a literal
    assert(titles("$.store.book[?(@.color == $.store.bicycle.color)]") == Nil)
    assert(sel(store, "$.store.book[?(@.category == $.store.book[0].category)]").size == 1)
    // missing / non-scalar root operand => comparison false, never a match
    assert(titles("$..book[?(@.price <= $.nonexistent)]") == Nil)
    assert(titles("$..book[?(@.price <= $.store)]") == Nil)
    // != with a RESOLVED operand keeps literal semantics
    assert(titles("$.store.book[?(@.category != $.store.book[0].category)]").size == 3)
  }

  test("root-path operand grammar limits: definite only, comparison ops only") {
    import JsonPathLite.JsonPathSyntaxException
    intercept[JsonPathSyntaxException](
      JsonPathLite.compile("$.a[?(@.x == $..y)]"))          // indefinite (deep scan)
    intercept[JsonPathSyntaxException](
      JsonPathLite.compile("$.a[?(@.x == $.b[*])]"))        // indefinite (wildcard)
    intercept[JsonPathSyntaxException](
      JsonPathLite.compile("$.a[?(@.x =~ $.re)]"))          // regex op needs /re/
    intercept[JsonPathSyntaxException](
      JsonPathLite.compile("$.a[?(@.x in $.list)]"))        // in needs [list]
    intercept[JsonPathSyntaxException](
      JsonPathLite.compile("$.a[?(@.x in [1, $.y])]"))      // no path inside list
  }

  test("script subscript (Jayway doc example: $..book[(@.length-1)])") {
    def titles(p: String) =
      JsonPathLite.select(mapper.readTree(store), JsonPathLite.compile(p))
        .map(_.get("title").asText)
    assert(titles("$..book[(@.length-1)]") == Seq("The Lord of the Rings"))
    assert(titles("$.store.book[(@.length-4)]") == Seq("Sayings of the Century"))
    assert(titles("$.store.book[( @.length - 2 )]") == Seq("Moby Dick"))
    // out of range (too negative, past the end, exactly length) → nothing
    assert(sel(store, "$.store.book[(@.length-9)]") == Nil)
    assert(sel(store, "$.store.book[(@.length)]") == Nil)
    assert(sel(store, "$.store.book[(@.length+1)]") == Nil)
    // script subscripts apply to arrays only
    assert(sel(store, "$.store.bicycle[(@.length-1)]") == Nil)
    // unsupported script expressions fail loudly at compile
    intercept[JsonPathLite.JsonPathSyntaxException] {
      JsonPathLite.compile("$.store.book[(1+1)]")
    }
    intercept[JsonPathLite.JsonPathSyntaxException] {
      JsonPathLite.compile("$.store.book[(@.length-)]")
    }
  }

  test("union indices and union names (Jayway: $..book[0,1], $['a','b'])") {
    def titles(p: String) =
      JsonPathLite.select(mapper.readTree(store), JsonPathLite.compile(p))
        .map(_.get("title").asText)
    assert(titles("$..book[0,1]") == Seq("Sayings of the Century", "Sword of Honour"))
    assert(titles("$..book[1,0]") == Seq("Sword of Honour", "Sayings of the Century"))
    assert(titles("$..book[0,-1]") == Seq("Sayings of the Century", "The Lord of the Rings"))
    val j = """{"a":1,"b":2,"c":3}"""
    assert(sel(j, "$['a','c']") == Seq("1", "3"))
    assert(sel(j, "$['a','missing']") == Seq("1"))
  }

  test("deep-scan brackets: ..[0], ..['k'], ..[*], ..[?()]") {
    assert(ex(store, "$..[0]"))
    assert(sel("""{"a":[[10,20],[30]]}""", "$..[0]") == Seq("[10,20]", "10", "30"))
    assert(sel("""{"x":{"k":1},"y":[{"k":2}]}""", "$..['k']") == Seq("1", "2"))
    assert(ex(store, "$..[*]"))
    assert(ex(store, "$..[?(@.price > 20)]"))
    assert(!ex(store, "$..[?(@.price > 100)]"))
  }

  test("regex =~ is a full match on strings, with i flag") {
    assert(ex(store, "$..book[?(@.author =~ /.*Rees/)]"))
    assert(!ex(store, "$..book[?(@.author =~ /Rees/)]")) // full match, not find
    assert(ex(store, "$..book[?(@.author =~ /.*rees/i)]"))
    assert(!ex(store, "$..book[?(@.price =~ /8.*/)]")) // numbers never regex-match
  }

  test("in / nin membership over literal lists") {
    assert(ex(store, "$..book[?(@.category in ['fiction', 'poetry'])]"))
    assert(!ex(store, "$..book[?(@.category in ['poetry'])]"))
    assert(ex(store, "$..book[?(@.category nin ['poetry'])]"))
    assert(ex(store, "$..book[?(@.price in [8.95, 100])]"))
    // 'in' inside a field name must not parse as the operator
    assert(ex("""{"arr":[{"inner":1}]}""", "$.arr[?(@.inner == 1)]"))
  }

  test("array indices in filter relpaths; deep scan allowed in existence terms only") {
    assert(ex(store, "$.store.book[?(@['author'] == 'Nigel Rees')]"))
    val j = """{"arr":[{"tags":["a","b"]},{"tags":["c"]}]}"""
    assert(ex(j, "$.arr[?(@.tags[0] == 'c')]"))
    assert(!ex(j, "$.arr[?(@.tags[5] == 'c')]"))
    assert(ex(j, "$.arr[?(@.tags[-1] == 'b')]"))
    // deep-scan existence
    assert(ex("""{"arr":[{"x":{"deep":1}}]}""", "$.arr[?(@..deep)]"))
    assert(!ex("""{"arr":[{"x":{"nope":1}}]}""", "$.arr[?(@..deep)]"))
    // deep scan as a comparison operand is rejected at compile
    intercept[JsonPathLite.JsonPathSyntaxException](
      JsonPathLite.compile("$.arr[?(@..deep == 1)]"))
  }

  test("length()/size() path function: arrays, objects, strings; filter usage") {
    assert(sel(store, "$.store.book.length()") == Seq("4"))
    assert(sel("""{"a":{"x":1,"y":2}}""", "$.a.length()") == Seq("2"))
    assert(sel("""{"a":"hello"}""", "$.a.size()") == Seq("5"))
    assert(sel("""{"a":7}""", "$.a.length()") == Nil) // numbers have no length
    val j = """{"arr":[{"tags":["a","b","c"]},{"tags":["d"]}]}"""
    assert(ex(j, "$.arr[?(@.tags.length() > 2)]"))
    assert(!ex(j, "$.arr[?(@.tags.length() > 3)]"))
    assert(ex(j, "$.arr[?(@.tags.size() == 1)]"))
  }

  test("aggregate/accessor path functions: min, max, avg, sum, first, last, keys") {
    val j = """{"scores":[4.0, 1.0, 7.0, 2.0], "o":{"a":1,"b":2}}"""
    assert(sel(j, "$.scores.min()") == Seq("1.0"))
    assert(sel(j, "$.scores.max()") == Seq("7.0"))
    assert(sel(j, "$.scores.sum()") == Seq("14.0"))
    assert(sel(j, "$.scores.avg()") == Seq("3.5"))
    assert(sel(j, "$.scores.first()") == Seq("4.0"))
    assert(sel(j, "$.scores.last()") == Seq("2.0"))
    assert(sel(j, "$.o.keys()") == Seq("""["a","b"]"""))
    assert(sel(j, "$.o.min()") == Nil)            // not a numeric array
    assert(sel("""{"scores":[]}""", "$.scores.min()") == Nil)
    assert(sel("""{"scores":[1,"x"]}""", "$.scores.sum()") == Nil)
    // filter RELPATHS stop at length()/size() (Jayway's filter-operand
    // surface) — aggregate functions there must fail loudly at compile,
    // not silently parse as field lookups
    val arr = """{"arr":[{"scores":[1,2,3]},{"scores":[10,20]}]}"""
    assert(ex(arr, "$.arr[?(@.scores.length() == 3)]"))
    for (bad <- Seq("$.arr[?(@.scores.avg() > 5)]", "$.arr[?(@.scores.max() == 3)]",
        "$.arr[?(@.scores.first() == 10)]", "$.arr[?(@.o.keys())]"))
      intercept[JsonPathLite.JsonPathSyntaxException] {
        JsonPathLite.compile(bad)
      }
  }

  test("deep-scan filter returns each matching node once (no array-element double count)") {
    // {"a":[{"k":99},{"k":1}]}: the k=99 object is reachable both as a kept
    // element of the array's FilterStep and as a walked node — one result
    val j = """{"a":[{"k":99},{"k":1}],"b":{"k":95}}"""
    assert(sel(j, "$..[?(@.k > 90)]").sorted == Seq("""{"k":95}""", """{"k":99}""").sorted)
    // scalar-element filters still work through the array path
    assert(sel("""{"a":[1,7,9]}""", "$..[?(@ > 5)]") == Seq("7", "9"))
  }

  test("slice/union differential fuzz vs an independent list model") {
    val rnd = new scala.util.Random(77L)
    for (_ <- 1 to 500) {
      val n = rnd.nextInt(7)
      val arr = (0 until n).toList
      val json = arr.mkString("""{"a":[""", ",", "]}")
      def expectIdx(i: Int): Seq[Int] = {
        val idx = if (i < 0) n + i else i
        if (idx >= 0 && idx < n) Seq(arr(idx)) else Nil
      }
      val doc = mapper.readTree(json)
      rnd.nextInt(3) match {
        case 0 => // slice
          val s = if (rnd.nextBoolean()) Some(rnd.nextInt(11) - 5) else None
          val e = if (rnd.nextBoolean()) Some(rnd.nextInt(11) - 5) else None
          val p = s"$$.a[${s.getOrElse("")}:${e.getOrElse("")}]"
          def norm(x: Int) = math.max(0, math.min(n, if (x < 0) n + x else x))
          val want = arr.slice(norm(s.getOrElse(0)), norm(e.getOrElse(n)))
          val got = JsonPathLite.select(doc, JsonPathLite.compile(p)).map(_.asInt)
          assert(got == want, s"$json $p")
        case 1 => // union
          val is = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(11) - 5)
          val p = s"$$.a[${is.mkString(",")}]"
          val want = is.flatMap(expectIdx)
          val got = JsonPathLite.select(doc, JsonPathLite.compile(p)).map(_.asInt)
          assert(got == want, s"$json $p")
        case 2 => // single index
          val i = rnd.nextInt(11) - 5
          val got = JsonPathLite.select(doc, JsonPathLite.compile(s"$$.a[$i]")).map(_.asInt)
          assert(got == expectIdx(i), s"$json [$i]")
      }
    }
  }

  test("rule load fails fast on malformed predicates (silent-never-match prevention)") {
    import graft.rules.TxDispatchRules
    val bad =
      """rules:
        |  - name: bad-rule
        |    topic: t
        |    predicate: "$.a[?(@.b =="
        |""".stripMargin
    val e = intercept[TxDispatchRules.RuleParseException](TxDispatchRules.fromYamlString(bad))
    assert(e.getMessage.contains("bad-rule"))
    // previously-unsupported grammar now loads fine
    val nowOk =
      """rules:
        |  - name: slice-rule
        |    topic: t
        |    predicate: "$..messages[0:2]"
        |  - name: regex-rule
        |    topic: t
        |    predicate: "$..book[?(@.author =~ /.*Rees/)]"
        |""".stripMargin
    assert(TxDispatchRules.fromYamlString(nowOk).rules.length == 2)
  }

  test("operator/literal type mismatches throw at compile (no silent constant-false)") {
    // '=~' with a quoted string — the easy authoring mistake — must not
    // compile into a predicate that evaluates false forever
    intercept[JsonPathLite.JsonPathSyntaxException](
      JsonPathLite.compile("$..messages[?(@.t =~ 'p.+e')]"))
    intercept[JsonPathLite.JsonPathSyntaxException](
      JsonPathLite.compile("$.a[?(@.x in 'fiction')]"))
    intercept[JsonPathLite.JsonPathSyntaxException](
      JsonPathLite.compile("$.a[?(@.x nin 5)]"))
    intercept[JsonPathLite.JsonPathSyntaxException](
      JsonPathLite.compile("$.a[?(@.x == /re/)]"))
    intercept[JsonPathLite.JsonPathSyntaxException](
      JsonPathLite.compile("$.a[?(@.x > [1,2])]"))
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
