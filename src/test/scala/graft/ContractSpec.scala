package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency guards: every oracle has a query, names are
  * well-formed, and the flagship map stays non-empty — cheap invariants
  * that catch wiring mistakes before the round driver does.
  */
class ContractSpec extends AnyFunSuite {

  test("every oracleSql entry has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("every query has an oracle (full correctness coverage, no weak checks)") {
    val unverified = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unverified.isEmpty, s"queries without oracle: $unverified")
  }

  test("oracle SQL strings are single statements without driver-breaking chars") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains(";"), s"$name: multi-statement oracle")
      assert(sql.trim.toUpperCase.startsWith("SELECT") || sql.trim.toUpperCase.startsWith("WITH"),
        s"$name: oracle must be a SELECT/WITH")
    }
  }

  test("query names are stable identifiers") {
    SparkEntry.queries.keys.foreach { n =>
      assert(n.matches("q_[a-z0-9_]+"), s"bad query name: $n")
    }
  }
}
