package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams.{FEvt, FunnelAcc}

/** Unit tests for the funnel accumulator — specifically the
  * cross-micro-batch orderings the round-3 verdict flagged: a click
  * arriving before its view, and a late-but-EARLIER stage event
  * arriving after a later one was already recorded. */
class FunnelGroupSpec extends AnyFunSuite {

  private val empty = FunnelAcc(-1L, Nil, Nil, emitted = false)
  private def fe(t: String, es: Long) = FEvt(7L, es, t, es)

  test("click arriving before its view still resolves once the view lands") {
    // arrival order: click@200 first (no view yet), view@100 later
    val b1 = EventStreams.funnelFold(empty, Seq(fe("click", 200L)))
    assert(EventStreams.funnelAnswers(b1) == ((-1L, -1L, -1L)))
    val b2 = EventStreams.funnelFold(b1, Seq(fe("view", 100L)))
    assert(EventStreams.funnelAnswers(b2) == ((100L, 200L, -1L)))
  }

  test("late EARLIER click lowers the recorded click answer (min, not first-match)") {
    val b1 = EventStreams.funnelFold(empty,
      Seq(fe("view", 100L), fe("click", 200L), fe("purchase", 300L)))
    assert(EventStreams.funnelAnswers(b1) == ((100L, 200L, 300L)))
    // a click@150 arrives in a LATER micro-batch: batch semantics say the
    // click answer is the MIN click after the view — 150, not 200 — and
    // the purchase answer re-evaluates against it
    val b2 = EventStreams.funnelFold(b1, Seq(fe("click", 150L)))
    assert(EventStreams.funnelAnswers(b2) == ((100L, 150L, 300L)))
  }

  test("late earlier view re-opens a click that was below the recorded view") {
    // click@50 is below the current min view (100): ineligible but KEPT,
    // because a still-earlier view can re-open it
    val b1 = EventStreams.funnelFold(empty,
      Seq(fe("view", 100L), fe("click", 50L)))
    assert(EventStreams.funnelAnswers(b1) == ((100L, -1L, -1L)))
    val b2 = EventStreams.funnelFold(b1, Seq(fe("view", 40L)))
    assert(EventStreams.funnelAnswers(b2) == ((40L, 50L, -1L)))
  }

  test("late earlier purchase lowers the purchase answer") {
    val b1 = EventStreams.funnelFold(empty,
      Seq(fe("view", 100L), fe("click", 150L), fe("purchase", 400L)))
    val b2 = EventStreams.funnelFold(b1, Seq(fe("purchase", 250L)))
    assert(EventStreams.funnelAnswers(b2) == ((100L, 150L, 250L)))
  }

  test("pruning drops candidates provably above the stage successors") {
    val acc = EventStreams.funnelFold(empty,
      Seq(fe("view", 100L), fe("click", 150L), fe("click", 900L),
        fe("purchase", 200L), fe("purchase", 950L)))
    // 900/950 sit strictly above the current successors (150/200) and can
    // never become a min answer — state stays bounded
    assert(acc.clicks == List(150L))
    assert(acc.purchases == List(200L))
  }

  test("timeout emits the final chain once and tombstones the user") {
    val acc = EventStreams.funnelFold(empty,
      Seq(fe("view", 100L), fe("click", 150L), fe("purchase", 200L)))
    val st = TestGroupState.create[FunnelAcc](
      Optional.of(acc), GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(201000L),
      hasTimedOut = true)
    val out = EventStreams.funnelGroup(7L, Iterator.empty, st).toSeq
    assert(out.map(o => (o.view_es, o.click_es, o.purchase_es)) == Seq((100L, 150L, 200L)))
    assert(st.get.emitted)
    // stragglers after finalization are consumed without a second emit
    val st2 = TestGroupState.create[FunnelAcc](
      Optional.of(st.get), GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(201000L),
      hasTimedOut = false)
    val out2 = EventStreams.funnelGroup(7L,
      Iterator(fe("purchase", 205L)), st2).toSeq
    assert(out2.isEmpty)
    assert(st2.get.emitted)
  }
}
