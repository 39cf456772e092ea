package graft

import org.scalatest.funsuite.AnyFunSuite

/** The clean-capture sidecar mechanism ([[Bench]] — SCALE.md capture
  * protocol rule 8): a contaminated round-close run may re-publish a
  * stored clean compact line ONLY for the same query set at the same
  * SF, with the live run's headline spliced in as provenance. These are
  * the guards four rounds of unusable driver artifacts ride on, so they
  * are pinned as pure functions — the committed BENCH_CLEAN.json is
  * also checked to be embeddable for the driver's contract run.
  */
class BenchSidecarSpec extends AnyFunSuite {

  private val fp = "q_a,q_b,q_c"
  private val clean =
    """{"metric":"total","value":12.3,"unit":"sec","queries":{"q_a":1.0},"sf":"/root/testdata/sf0.1","contaminated":false}"""

  test("cleanCapturePath keys the sidecar by SF and core count") {
    assert(Bench.cleanCapturePath("/root/testdata/sf0.1", "32") == "BENCH_CLEAN.sf0.1.c32.json")
    assert(Bench.cleanCapturePath("/root/testdata/sf0.001", "32") == "BENCH_CLEAN.sf0.001.c32.json")
    // the driver's 8-core scaling pass must never clobber the 32-core
    // contract sidecar (the round-19 keying fix)
    assert(Bench.cleanCapturePath("/root/testdata/sf0.1", "8") == "BENCH_CLEAN.sf0.1.c8.json")
  }

  test("embeddableClean: fingerprint AND sf must both match") {
    val content = fp + "\n" + clean + "\n"
    assert(Bench.embeddableClean(content, fp, "/root/testdata/sf0.1")
      .contains(clean))
    // a gate added/removed after the capture → no embed
    assert(Bench.embeddableClean(content, "q_a,q_b", "/root/testdata/sf0.1").isEmpty)
    // a clean capture at ANOTHER SF must never become this run's line
    assert(Bench.embeddableClean(content, fp, "/root/testdata/sf0.001").isEmpty)
    // malformed sidecars refuse quietly
    assert(Bench.embeddableClean("", fp, "/root/testdata/sf0.1").isEmpty)
    assert(Bench.embeddableClean(fp + "\ntruncated{", fp, "/root/testdata/sf0.1").isEmpty)
  }

  test("spliceProvenance: the result is one JSON object carrying both runs") {
    val out = Bench.spliceProvenance(clean, "999.0000", "9.17 8.2 7.1")
    // still a single object, ends in }, keeps the clean verdict, and
    // carries the live headline + the source marker
    assert(out.startsWith("{") && out.endsWith("}"))
    assert(out.contains("\"contaminated\":false"))
    assert(out.contains("\"source\":\"clean_capture_sidecar\""))
    assert(out.contains("\"live_total\":999.0000"))
    assert(out.contains("\"live_load_before\":\"9.17 8.2 7.1\""))
    assert(out.contains("\"live_contaminated\":true"))
    // naive JSON well-formedness: balanced braces, one top-level object
    assert(out.count(_ == '{') == out.count(_ == '}'))
  }

  test("the committed sidecar is embeddable for the driver's sf0.1 contract run") {
    val f = new java.io.File(Bench.cleanCapturePath("/root/testdata/sf0.1", "32"))
    assume(f.exists, "no committed sidecar in this tree")
    val content = java.nio.file.Files.readString(f.toPath)
    val names = SparkEntry.queries.keys.toSeq.sorted.mkString(",")
    val got = Bench.embeddableClean(content, names, "/root/testdata/sf0.1")
    assert(got.isDefined,
      "the sf0.1 sidecar does not match the current query set at sf0.1 — " +
        "re-capture (a stale sidecar means the round-close embed silently won't fire)")
    assert(got.get.contains("\"contaminated\":false"))
  }
}
