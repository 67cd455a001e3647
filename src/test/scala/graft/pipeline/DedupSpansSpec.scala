package graft.pipeline

import graft.SparkSpec

/** dedup_substring: duplicated-span detection invariants. */
class DedupSpansSpec extends SparkSpec {

  test("dedup_substring: injected passage detected, spans well-formed and maximal") {
    val rows = Dedup.queries("dedup_substring")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (start, end, len) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(start >= 0 && end >= start)
      assert(len == end - start + 1)
      assert(len >= 8, "a span covers at least one 8-gram")
    }
    // every doc that got the injected passage must report a span reaching
    // its (appended) tail
    val injected = rows.filter(_.getLong(0) % 7 == 0).groupBy(_.getLong(0))
    assert(injected.nonEmpty)
    // spans within a doc are disjoint and non-adjacent (maximality):
    // merged spans are separated by more than one uncovered position
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val spans = rs.sortBy(_.getLong(2)).map(r => (r.getLong(2), r.getLong(3)))
      spans.zip(spans.drop(1)).foreach { case ((_, e1), (s2, _)) =>
        assert(s2 > e1 + 1, "maximal spans cannot touch")
      }
    }
  }

  test("dedup_substring: deterministic across runs") {
    val a = Dedup.queries("dedup_substring")(spark, sf).collect().map(_.toSeq).toSeq
    val b = Dedup.queries("dedup_substring")(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
