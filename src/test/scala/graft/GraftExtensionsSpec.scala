package graft

import graft.functions.JsonPathExists
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

/** The config-time registration face: a deployment that never runs
  * engine code on the session (pure SQL, Thrift server) gets the SQL
  * functions via `spark.sql.extensions=graft.plans.GraftExtensions`.
  * `getOrCreate` ignores extensions once a session exists, so the test
  * drives the injection through `SparkSessionExtensions` directly and
  * registers into a cloned function registry — the exact path
  * `BaseSessionStateBuilder` takes at session build.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def injectedRegistry(): FunctionRegistry = {
    val ext = new SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    val reg = spark.sessionState.functionRegistry.clone()
    // drop any temp registrations other suites made via register(): the
    // test must prove the injection, not a leftover
    graft.functions.JsonPathFunctions.sqlFunctionBuilders.foreach {
      case (name, _, _) => reg.dropFunction(FunctionIdentifier(name))
    }
    // registerFunctions is private[sql] (bytecode-public): the session
    // builder's own call site, invoked reflectively
    val m = classOf[SparkSessionExtensions].getDeclaredMethods
      .find(_.getName == "registerFunctions")
      .getOrElse(fail("SparkSessionExtensions.registerFunctions not found"))
    m.invoke(ext, reg)
    reg
  }

  test("extensions inject every engine SQL function") {
    val reg = injectedRegistry()
    graft.functions.JsonPathFunctions.sqlFunctionBuilders.foreach {
      case (name, _, _) =>
        assert(reg.functionExists(FunctionIdentifier(name)),
          s"$name missing after injection")
    }
  }

  test("an injected function resolves and evaluates like the register() one") {
    val reg = injectedRegistry()
    val e = reg.lookupFunction(FunctionIdentifier("json_path_exists"),
      Seq(Literal.create("""{"a": 1}"""), Literal.create("$.a")))
    assert(e.isInstanceOf[JsonPathExists], s"unexpected expression: $e")
    assert(e.eval(InternalRow.empty) == true)
    val miss = reg.lookupFunction(FunctionIdentifier("json_path_exists"),
      Seq(Literal.create("""{"a": 1}"""), Literal.create("$.b")))
    assert(miss.eval(InternalRow.empty) == false)
  }
}
