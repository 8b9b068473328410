package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams.{Evt, SessionState}

/** Unit tests for the per-group sessionization transition function —
  * specifically the cross-micro-batch late-event path, which the
  * MemoryStream parity test can't exercise (it feeds one ordered batch). */
class SessionizeGroupSpec extends AnyFunSuite {

  private def state(s: SessionState): TestGroupState[SessionState] =
    TestGroupState.create[SessionState](
      Optional.of(s), GroupStateTimeout.NoTimeout(),
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)

  test("late event within the gap merges without regressing lastEs") {
    val st = state(SessionState(1L, 100L, 200L, 2L))
    val out = EventStreams.sessionizeGroup(7L,
      Iterator(Evt(7L, 10L, 150L)), st).toSeq
    assert(out.isEmpty)
    assert(st.get == SessionState(1L, 100L, 200L, 3L))
  }

  test("late event before startEs extends the session backwards") {
    val st = state(SessionState(1L, 100L, 200L, 2L))
    val out = EventStreams.sessionizeGroup(7L,
      Iterator(Evt(7L, 11L, 50L)), st).toSeq
    assert(out.isEmpty)
    assert(st.get == SessionState(1L, 50L, 200L, 3L))
  }

  test("closed sessions never emit a negative duration after late merges") {
    val st = state(SessionState(1L, 100L, 200L, 2L))
    val gap = EventStreams.GapSec
    val out = EventStreams.sessionizeGroup(7L,
      Iterator(Evt(7L, 12L, 90L), Evt(7L, 13L, 200L + gap + 1L)), st).toSeq
    assert(out.size == 1)
    assert(out.head.duration_sec == 110L) // 200 - 90, never negative
    assert(out.head.n_events == 3L)
    assert(st.get.sessionIdx == 2L)
  }
}
