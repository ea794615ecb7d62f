package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dev-loop query selector: exact names, trailing-* prefixes, and the
  * set-but-empty edge (`SPARK_GRAFT_ONLY= sbt ...` must run the FULL
  * board, not silently zero queries). */
class NameFilterSpec extends AnyFunSuite {

  test("no filter selects everything") {
    assert(NameFilter.selected(None, "q1_agg"))
  }

  test("tokens match exact names, not prefixes") {
    val t = Some(Seq("q1_agg", "q94_bloom_dedup"))
    assert(NameFilter.selected(t, "q1_agg"))
    assert(NameFilter.selected(t, "q94_bloom_dedup"))
    assert(!NameFilter.selected(t, "q10_distinct"))
    assert(!NameFilter.selected(t, "q9_topk"))
  }

  test("trailing * opts into prefix matching") {
    val t = Some(Seq("q9*"))
    assert(NameFilter.selected(t, "q94_bloom_dedup"))
    assert(NameFilter.selected(t, "q9_topk"))
    assert(!NameFilter.selected(t, "q1_agg"))
  }

  test("blank or whitespace tokens are dropped; an all-blank list means no filter") {
    assert(NameFilter.selected(Some(Seq("")), "q1_agg"))
    assert(NameFilter.selected(Some(Seq(" ", "")), "q1_agg"))
    // blanks dropped but real tokens still filter
    val t = Some(Seq("", "q1_agg"))
    assert(NameFilter.selected(t, "q1_agg"))
    assert(!NameFilter.selected(t, "q2_filter"))
  }
}
