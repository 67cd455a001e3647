package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** NFA semantics on hand fixtures (what MatchRecognizeITCase pins in the
  * reference): contiguity, within, and after-match skip strategies. */
class CepSpec extends SparkSpec {

  private def ev(key: Long, ts: Long, id: Long, kind: String) =
    KeyedRow(key, ts, id, kind, 0.0)

  test("strict contiguity: an intervening row kills the run") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ev(1, 1, 1, "error"), ev(1, 2, 2, "error"), ev(1, 3, 3, "view"),
      ev(1, 4, 4, "error"), ev(1, 5, 5, "error"), ev(1, 6, 6, "error"),
      ev(1, 7, 7, "error")).toDS()
    val ms = Cep.matchBatch(rows, Cep.errorBurst).collect()
    // positions ending at id=6 (4,5,6) and id=7 (5,6,7); 1,2 broken by the view
    assert(ms.map(_.ids).toSet == Set(Seq(4L, 5L, 6L), Seq(5L, 6L, 7L)))
  }

  test("relaxed contiguity + within: funnel matches only inside the horizon") {
    val s = spark
    import s.implicits._
    val h = 3600L * 1000000L
    val rows = Seq(
      ev(1, 0, 1, "signup"), ev(1, 10, 2, "view"), ev(1, 20, 3, "purchase"), // match
      ev(2, 0, 4, "signup"), ev(2, h + 1, 5, "purchase") // outside within → no match
    ).toDS()
    val ms = Cep.matchBatch(rows, Cep.signupFunnel).collect()
    assert(ms.map(m => (m.key, m.ids)).toSeq == Seq((1L, Seq(1L, 3L))))
  }

  test("skip-past-last-row suppresses overlapping funnel matches") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ev(1, 0, 1, "signup"), ev(1, 1, 2, "signup"),
      ev(1, 2, 3, "purchase"), // completes run started at id=1; run at id=2 dropped
      ev(1, 3, 4, "purchase") // must NOT match the dropped id=2 run
    ).toDS()
    val ms = Cep.matchBatch(rows, Cep.signupFunnel).collect()
    assert(ms.map(_.ids).toSeq == Seq(Seq(1L, 3L)))
  }

  test("times(n) expansion equals the hand-written repeated pattern") {
    val s = spark
    import s.implicits._
    val rows = Seq(ev(1, 1, 1, "error"), ev(1, 2, 2, "error"), ev(1, 3, 3, "error"),
      ev(1, 4, 4, "view"), ev(1, 5, 5, "error")).toDS()
    val viaTimes = Cep.Pattern(
      Cep.times(Cep.Step("e", _.kind == "error", strict = true), 3)
        .zipWithIndex.map { case (st, i) => if (i == 0) st.copy(strict = false) else st },
      afterMatch = Cep.SkipToNextRow)
    val a = Cep.matchBatch(rows, viaTimes).collect().map(_.ids).toSet
    val b = Cep.matchBatch(rows, Cep.errorBurst).collect().map(_.ids).toSet
    assert(a == b && a == Set(Seq(1L, 2L, 3L)))
  }

  test("oneOrMore is greedy: the longest absorption wins under skip-past-last") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ev(1, 1, 1, "signup"), ev(1, 2, 2, "purchase"), ev(1, 3, 3, "purchase"),
      ev(1, 4, 4, "view")).toDS()
    val p = Cep.Pattern(Seq(
      Cep.Step("s", _.kind == "signup"),
      Cep.Step("p", _.kind == "purchase", oneOrMore = true),
      Cep.Step("v", _.kind == "view")))
    val ms = Cep.matchBatch(rows, p).collect()
    assert(ms.map(_.ids).toSeq == Seq(Seq(1L, 2L, 3L, 4L))) // both purchases absorbed
  }

  test("streaming CEP: watermark-ordered processing matches batch result") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[KeyedRow]
    // 10s bounded out-of-orderness so the gap-filling row isn't late-dropped
    val q = Cep.matchStream(in.toDS(), Cep.errorBurst, "10 seconds")
      .writeStream.format("memory").queryName("cep").outputMode("append").start()
    try {
      // batch 1: out-of-order arrival — nothing may fire before the watermark
      in.addData(ev(1, 3000000, 3, "error"), ev(1, 1000000, 1, "error"))
      q.processAllAvailable()
      in.addData(ev(1, 2000000, 2, "error")) // fills the gap (still ≥ wm? dropped if late!)
      q.processAllAvailable()
      in.addData(ev(1, 10000000, 9, "view")) // push watermark past ts=3s
      q.processAllAvailable()
      in.addData(ev(1, 20000000, 10, "view")) // one more advance to flush
      q.processAllAvailable()
      val ms = s.sql("select * from cep").as[Cep.Match].collect()
      // row id=2 arrived after rows 1,3 but before the watermark passed 3s,
      // so the NFA must see 1,2,3 in event-time order → one match
      assert(ms.map(_.ids).toSeq == Seq(Seq(1L, 2L, 3L)))
    } finally q.stop()
  }

  // ---- negative patterns / branching (Pattern.java:129-542) ----

  test("interior absence: notFollowedBy guard kills a waiting run") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ev(1, 1, 1, "signup"), ev(1, 2, 2, "error"), ev(1, 3, 3, "purchase"), // killed
      ev(2, 1, 4, "signup"), ev(2, 2, 5, "view"), ev(2, 3, 6, "purchase") // clean
    ).toDS()
    val ms = Cep.matchBatch(rows, Cep.cleanFunnel).collect()
    assert(ms.map(m => (m.key, m.ids)).toSet == Set((2L, Seq(4L, 6L))))
  }

  test("notNext: the absence guard only checks the immediately-following row") {
    val s = spark
    import s.implicits._
    val p = Cep.Pattern(Seq(
      Cep.Step("s", _.kind == "signup"),
      Cep.Step("p", _.kind == "purchase",
        guardNot = Some(_.kind == "error"), guardOnNext = true)))
    val rows = Seq(
      ev(1, 1, 1, "signup"), ev(1, 2, 2, "error"), ev(1, 3, 3, "purchase"), // error is next → killed
      ev(2, 1, 4, "signup"), ev(2, 2, 5, "view"), ev(2, 3, 6, "error"), // error NOT next → ok
      ev(2, 4, 7, "purchase")
    ).toDS()
    val ms = Cep.matchBatch(rows, p).collect()
    assert(ms.map(m => (m.key, m.ids)).toSet == Set((2L, Seq(4L, 7L))))
  }

  test("trailing absence: hold dies on a hit, emits on expiry or input end") {
    val s = spark
    import s.implicits._
    val h = 3600L * 1000000L
    val rows = Seq(
      ev(1, 0, 1, "signup"), ev(1, 10, 2, "purchase"), // purchase in window → no match
      ev(2, 0, 3, "signup"), ev(2, h + 1, 4, "purchase"), // window already closed → match
      ev(3, 0, 5, "signup") // input ends → match
    ).toDS()
    val ms = Cep.matchBatch(rows, Cep.abandonedSignup).collect()
    assert(ms.map(m => (m.key, m.ids)).toSet == Set((2L, Seq(3L)), (3L, Seq(5L))))
  }

  test("followedByAny: later rows keep opening alternative branches") {
    val s = spark
    import s.implicits._
    def p(any: Boolean) = Cep.Pattern(Seq(
      Cep.Step("s", _.kind == "signup"),
      Cep.Step("p", _.kind == "purchase", anyMatch = any)),
      afterMatch = Cep.SkipToNextRow)
    val rows = Seq(
      ev(1, 1, 1, "signup"), ev(1, 2, 2, "purchase"), ev(1, 3, 3, "purchase")).toDS()
    val any = Cep.matchBatch(rows, p(any = true)).collect().map(_.ids).toSet
    val one = Cep.matchBatch(rows, p(any = false)).collect().map(_.ids).toSet
    assert(one == Set(Seq(1L, 2L)))
    assert(any == Set(Seq(1L, 2L), Seq(1L, 3L)))
  }

  test("until closes a oneOrMore loop") {
    val s = spark
    import s.implicits._
    def p(until: Option[KeyedRow => Boolean]) = Cep.Pattern(Seq(
      Cep.Step("s", _.kind == "signup"),
      Cep.Step("c", _.kind == "click", oneOrMore = true, untilPred = until),
      Cep.Step("b", _.kind == "purchase")))
    val rows = Seq(
      ev(1, 1, 1, "signup"), ev(1, 2, 2, "click"), ev(1, 3, 3, "view"),
      ev(1, 4, 4, "click"), ev(1, 5, 5, "purchase")).toDS()
    val plain = Cep.matchBatch(rows, p(None)).collect().map(_.ids).toSeq
    val closed = Cep.matchBatch(rows, p(Some(_.kind == "view"))).collect().map(_.ids).toSeq
    assert(plain == Seq(Seq(1L, 2L, 4L, 5L))) // greedy absorbs across the view
    assert(closed == Seq(Seq(1L, 2L, 5L))) // the view closes the loop
  }

  test("reluctant ranking prefers the shortest same-row completion") {
    val s = spark
    import s.implicits._
    def p(rel: Boolean) = Cep.Pattern(Seq(
      Cep.Step("a", _.kind == "signup"),
      Cep.Step("v", _.kind == "view", optional = true, reluctant = rel),
      Cep.Step("b", _.kind == "purchase")))
    val rows = Seq(
      ev(1, 1, 1, "signup"), ev(1, 2, 2, "view"), ev(1, 3, 3, "purchase")).toDS()
    val greedy = Cep.matchBatch(rows, p(rel = false)).collect().map(_.ids).toSeq
    val rel = Cep.matchBatch(rows, p(rel = true)).collect().map(_.ids).toSeq
    assert(greedy == Seq(Seq(1L, 2L, 3L)))
    assert(rel == Seq(Seq(1L, 3L))) // ε-path skipping the view wins
  }

  test("streaming trailing absence: holds expire on the watermark, agree with batch") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val h = 3600L * 1000000L
    val t0 = 10000000L // above the initial watermark — an event AT epoch 0
                       // would be pre-filtered as late before the operator
    val in = MemoryStream[KeyedRow]
    val q = Cep.matchStream(in.toDS(), Cep.abandonedSignup, "0 seconds")
      .writeStream.format("memory").queryName("cep_abs").outputMode("append").start()
    try {
      in.addData(ev(1, t0, 1, "signup"), ev(2, t0, 2, "signup"))
      q.processAllAvailable()
      // key 1's purchase arrives inside the window → kills its hold; the
      // same row advances the watermark past key 2's window → key 2 emits
      in.addData(ev(1, t0 + 100, 3, "purchase"), ev(2, t0 + 2 * h, 4, "view"))
      q.processAllAvailable()
      in.addData(ev(1, t0 + 3 * h, 5, "view")) // push watermark for everyone
      q.processAllAvailable()
      in.addData(ev(1, t0 + 4 * h, 6, "view"))
      q.processAllAvailable()
      val ms = s.sql("select * from cep_abs").as[Cep.Match].collect()
      // key 1: purchase within the hour → no match; key 2: no purchase → match
      assert(ms.map(m => (m.key, m.ids)).toSet == Set((2L, Seq(2L))))
    } finally q.stop()
  }

  test("skew: 10^6 rows on one key through the absence-hold scan") {
    val s = spark
    import s.implicits._
    val n = 1000000
    // alternating signup/other traffic on ONE key; every 10th row a signup,
    // purchases only in the first half → second-half signups all match
    val rows = s.range(n.toLong).map { i =>
      val kind =
        if (i % 10 == 0) "signup"
        else if (i % 10 == 5 && i < n / 2) "purchase"
        else "view"
      KeyedRow(7L, i * 1000000L, i, kind, 0.0) // 1s apart → 1h window = 3600 rows
    }
    val ms = Cep.matchBatch(rows, Cep.abandonedSignup).count()
    // signups at i % 10 == 0; a purchase follows within 3600 rows for every
    // signup before n/2 - 3600ish; all later signups are unmatched
    assert(ms >= (n / 2 / 10) - 400 && ms <= n / 2 / 10 + 400, s"got $ms")
  }

  test("skip to last <var>: resume at the skipped-to row, overlap pruned") {
    val s = spark
    import s.implicits._
    // A = any row, B = click (1..2 of them), C = purchase
    def p(am: Cep.AfterMatch) = Cep.Pattern(Seq(
      Cep.Step("A", _ => true),
      Cep.Step("B", _.kind == "click"),
      Cep.Step("B", _.kind == "click", optional = true),
      Cep.Step("C", _.kind == "purchase")), afterMatch = am)
    val rows = Seq(
      ev(1, 1, 1, "view"), ev(1, 2, 2, "click"), ev(1, 3, 3, "click"),
      ev(1, 4, 4, "purchase"), ev(1, 5, 5, "click"), ev(1, 6, 6, "purchase")).toDS()
    val past = Cep.matchBatch(rows, p(Cep.SkipPastLastRow)).collect().map(_.ids).toSet
    val toLastB = Cep.matchBatch(rows, p(Cep.SkipToVar("B", first = false)))
      .collect().map(_.ids).toSet
    assert(past == Set(Seq(1L, 2L, 3L, 4L)))
    // resuming at the last B (row 3) lets the run anchored there finish later
    assert(toLastB == Set(Seq(1L, 2L, 3L, 4L), Seq(3L, 5L, 6L)))
  }

  test("consecutive() demands strict inner contiguity for the oneOrMore loop") {
    val s = spark
    import s.implicits._
    def p(consecutive: Boolean) = Cep.Pattern(Seq(
      Cep.Step("B", _.kind == "b", oneOrMore = true, consecutive = consecutive),
      Cep.Step("C", _.kind == "c", strict = true)), afterMatch = Cep.SkipToNextRow)
    // b1 x b2 c: the relaxed loop bridges the x; consecutive() kills the
    // absorb branch at x, so only the run anchored at b2 completes
    val rows = Seq(
      ev(1, 1, 1, "b"), ev(1, 2, 2, "x"), ev(1, 3, 3, "b"),
      ev(1, 4, 4, "c")).toDS()
    val relaxed = Cep.matchBatch(rows, p(consecutive = false)).collect().map(_.ids).toSet
    val strict = Cep.matchBatch(rows, p(consecutive = true)).collect().map(_.ids).toSet
    assert(relaxed == Set(Seq(1L, 3L, 4L), Seq(3L, 4L)))
    assert(strict == Set(Seq(3L, 4L)))
  }

  test("allowCombinations() explores absorption subsets the relaxed loop skips") {
    val s = spark
    import s.implicits._
    def p(combinations: Boolean) = Cep.Pattern(Seq(
      Cep.Step("B", _.kind == "b", oneOrMore = true, combinations = combinations),
      Cep.Step("C", _.kind == "c")), afterMatch = Cep.SkipToNextRow)
    val rows = Seq(
      ev(1, 1, 1, "b"), ev(1, 2, 2, "b"), ev(1, 3, 3, "b"),
      ev(1, 4, 4, "c")).toDS()
    val relaxed = Cep.matchBatch(rows, p(combinations = false)).collect().map(_.ids).toSet
    val combos = Cep.matchBatch(rows, p(combinations = true)).collect().map(_.ids).toSet
    // relaxed: absorptions are contiguous in the loop's matching rows —
    // every prefix-from-anchor, nothing skipped
    assert(relaxed == Set(
      Seq(1L, 4L), Seq(1L, 2L, 4L), Seq(1L, 2L, 3L, 4L),
      Seq(2L, 4L), Seq(2L, 3L, 4L), Seq(3L, 4L)))
    // combinations adds the subset that skips the matching middle row
    assert(combos == relaxed + Seq(1L, 3L, 4L))
  }

  test("timesConsecutive(n) requires adjacent repetitions") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ev(1, 1, 1, "b"), ev(1, 2, 2, "x"), ev(1, 3, 3, "b"),
      ev(1, 4, 4, "b")).toDS()
    val loose = Cep.Pattern(Cep.times(Cep.Step("B", _.kind == "b"), 2),
      afterMatch = Cep.SkipToNextRow)
    val tight = Cep.Pattern(Cep.timesConsecutive(Cep.Step("B", _.kind == "b"), 2),
      afterMatch = Cep.SkipToNextRow)
    assert(Cep.matchBatch(rows, loose).collect().map(_.ids).toSet
      == Set(Seq(1L, 3L), Seq(3L, 4L)))
    assert(Cep.matchBatch(rows, tight).collect().map(_.ids).toSet
      == Set(Seq(3L, 4L)))
  }

  test("consecutive() and allowCombinations() on one step are rejected like the reference") {
    // Quantifier.java:86-97 throws on the pair; the flags are contradictory
    val e = intercept[IllegalArgumentException] {
      Cep.Pattern(Seq(
        Cep.Step("B", _.kind == "b", oneOrMore = true,
          consecutive = true, combinations = true),
        Cep.Step("C", _.kind == "c")))
    }
    assert(e.getMessage.contains("not both"))
  }

  test("file-stream NFA run equals the batch NFA on the events table") {
    // the oracle-gated deployment shape: once the final watermark passes
    // max(ts), the streaming match set must be exactly the batch one
    val streamed = Cep.qStreamErrorBurst(spark, sf).collect().toSeq
    val batch = Cep.qErrorBurst(spark, sf).collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
