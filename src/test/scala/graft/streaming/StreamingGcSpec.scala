package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** State-GC audit for the order-final fold operators (VERDICT r13 #8):
  * state must NOT grow with stream LIFETIME — only with watermark lag.
  * Each pure fold is driven through a years-long synthetic stream with
  * an advancing watermark and its retained state asserted bounded.
  * (WindowTopK aggregates with native watermark eviction and
  * AnomalyStats caps its ring at 6 sealed days by construction —
  * their bounds don't need a fold drive.) Plus the wm-floor contract:
  * before any watermark exists, nothing is late and nothing is
  * order-final (ADVICE r13 pre-epoch case). */
class StreamingGcSpec extends AnyFunSuite {

  private val DayUs = 86400000000L

  test("wm floor: no watermark ⇒ −∞ (pre-epoch rows neither late nor final)") {
    assert(AttributionStats.wmFloorMs(0L) == Long.MinValue)
    assert(AttributionStats.wmFloorUs(0L) == Long.MinValue)
    assert(AttributionStats.wmFloorMs(5L) == 5L)
    assert(AttributionStats.wmFloorUs(5L) == 5000L)
    // a pre-epoch event is NOT dropped by the > −∞ filter and NOT
    // folded by the ≤ −∞ finality test
    val preEpoch = -86400000000L
    assert(preEpoch > AttributionStats.wmFloorUs(0L))
    val (st, out) = Scd2Stats.fold(
      Scd2Stats.Scd2State(Long.MinValue, 0L, Array(preEpoch), Array(1L)),
      AttributionStats.wmFloorUs(0L))
    assert(out.isEmpty && st.pendUs.length == 1)
  }

  test("RetentionStats: 10-year weekly stream, O(1) state") {
    // one event per ISO week for 520 weeks, folded incrementally with
    // the watermark trailing one week behind — the shape that grew the
    // old emitted-week_nos set to 520 entries
    var st = RetentionStats.RetState(Long.MinValue, -1L,
      Array.emptyLongArray, Array.emptyLongArray)
    var emitted = 0L
    (0 until 520).foreach { w =>
      val us = (4L + 7L * w) * DayUs + 3600000000L // Mondays (day 4 = 1970-01-05)
      st = st.copy(pendUs = st.pendUs :+ us, pendId = st.pendId :+ w.toLong)
      val (st2, out) = RetentionStats.fold(st, us - 7L * DayUs)
      st = st2
      emitted += out.size
    }
    val (stF, outF) = RetentionStats.fold(st, Long.MaxValue)
    emitted += outF.size
    assert(emitted == 520L, s"one delta per active week: $emitted")
    assert(stF.lastWn == 519L && stF.pendUs.isEmpty)
    // state is scalars + the pending slice — nothing proportional to
    // the 10-year span survives the fold
    assert(stF.productArity == 4)
    // same-week repeats dedup against lastWn, not a set
    val (_, dup) = RetentionStats.fold(
      stF.copy(pendUs = Array(519L * 7L * DayUs + (4L * DayUs)),
        pendId = Array(999L)), Long.MaxValue)
    assert(dup.isEmpty, "re-emitted an already-counted week")
  }

  test("AttributionStats: 10k-event stream, state is carry + lag slice") {
    var st = AttributionStats.AttrState(Long.MinValue, "",
      Array.emptyLongArray, Array.emptyLongArray, Array.empty[String])
    var purchases = 0
    (0 until 10000).foreach { i =>
      val us = i.toLong * 3600000000L
      val ty = if (i % 5 == 4) "purchase" else "view"
      st = st.copy(pendUs = st.pendUs :+ us, pendId = st.pendId :+ i.toLong,
        pendTy = st.pendTy :+ ty)
      val (st2, out) = AttributionStats.fold(st, us - 2L * 3600000000L,
        7L * 86400000000L)
      st = st2
      purchases += out.size
    }
    // watermark lag = 2 events: the pending slice never exceeds it
    assert(st.pendUs.length <= 2,
      s"pending slice grew with lifetime: ${st.pendUs.length}")
    val (stF, outF) = AttributionStats.fold(st, Long.MaxValue,
      7L * 86400000000L)
    assert(purchases + outF.size == 2000)
    assert(stF.pendUs.isEmpty)
  }

  test("EwmaStats: 10-year daily stream, pending bounded by lag in days") {
    var st = EwmaStats.EwmaState(-1L, 0L, Array.emptyLongArray,
      Array.emptyLongArray)
    var maxPend = 0
    (0 until 3650).foreach { d =>
      st = st.copy(pendDay = st.pendDay :+ d.toLong,
        pendCnt = st.pendCnt :+ 1L)
      val (st2, _) = EwmaStats.fold(st, d.toLong * DayUs) // wm = day start
      st = st2
      maxPend = math.max(maxPend, st.pendDay.length)
    }
    assert(maxPend <= 2, s"pending days grew with lifetime: $maxPend")
    val (stF, _) = EwmaStats.fold(st, Long.MaxValue)
    assert(stF.nDays == 3650L && stF.pendDay.isEmpty)
    // carry stays bounded by 2·max-count micro-units (here x = 1e6)
    assert(stF.ewmaU <= 2000000L)
  }

  test("Scd2Stats: 10k-version stream, one open version retained") {
    var st = Scd2Stats.Scd2State(Long.MinValue, 0L,
      Array.emptyLongArray, Array.emptyLongArray)
    var closed = 0
    (0 until 10000).foreach { i =>
      val us = i.toLong * 60000000L
      st = st.copy(pendUs = st.pendUs :+ us, pendId = st.pendId :+ i.toLong)
      val (st2, out) = Scd2Stats.fold(st, us - 3L * 60000000L)
      st = st2
      closed += out.size
    }
    assert(st.pendUs.length <= 3,
      s"pending slice grew with lifetime: ${st.pendUs.length}")
    val (stF, outF) = Scd2Stats.fold(st, Long.MaxValue)
    assert(closed + outF.size == 9999 && stF.pendUs.isEmpty)
    assert(stF.openUs == 9999L * 60000000L) // exactly one open version
  }

  test("GapfillStats: 10-year daily stream, O(1) carry + lag slice") {
    var st = GapfillStats.GapState(Long.MinValue, 0L, hasCarry = false,
      Array.emptyLongArray, Array.emptyLongArray, Array.emptyLongArray,
      Array.empty[Boolean])
    var maxPend = 0
    var emitted = 0L
    (0 until 3650 by 2).foreach { d => // every OTHER day: gaps backfill
      st = st.copy(pendDay = st.pendDay :+ d.toLong,
        pendN = st.pendN :+ 1L, pendFp = st.pendFp :+ 10000L,
        pendHasV = st.pendHasV :+ true)
      val (st2, out) = GapfillStats.fold(st, d.toLong * DayUs)
      st = st2
      emitted += out.size
      maxPend = math.max(maxPend, st.pendDay.length)
    }
    assert(maxPend <= 2, s"pending days grew with lifetime: $maxPend")
    val (stF, outF) = GapfillStats.fold(st, Long.MaxValue)
    // grid density: one row per calendar day in [0, 3648], gaps filled
    assert(emitted + outF.size == 3649L)
    assert(stF.pendDay.isEmpty && stF.lastDay == 3648L)
  }

  test("RunningDistinctStats: 10-year stream, one bit after first day") {
    // a user active daily for 10 years: exactly ONE delta ever, and
    // after it the state is the terminal seen bit — no candidate, no
    // pending slice, nothing proportional to lifetime
    var st = RunningDistinctStats.SeenState(seen = false, Long.MaxValue)
    var emitted = 0L
    (0 until 3650).foreach { d =>
      val us = d.toLong * DayUs + 3600000000L
      val (st2, out) = RunningDistinctStats.fold(st, us, us - DayUs)
      st = st2
      emitted += out.size
    }
    assert(emitted == 1L, s"one delta per user, ever: $emitted")
    assert(st.seen && st.pendUs == Long.MaxValue)
    // terminal folds are identity — the state store is never rewritten
    assert(RunningDistinctStats.fold(st, 0L, Long.MaxValue) == (st, None))
  }

  test("QuantileStats: 1M-row window state bounded by occupied buckets") {
    // per-window state is the occupied-bucket histogram — bounded by
    // the value column's DYNAMIC RANGE (⌈log_γ(max/min)⌉ ≈ 2.3k at
    // α = 1% over 10²⁰), never by row count: a million rows across 20
    // decades keep ≤ that many entries, and sealing tombstones them
    var st = QuantileStats.QState(Array.emptyLongArray,
      Array.emptyLongArray)
    val gamma = (1 + QuantileStats.Alpha) / (1 - QuantileStats.Alpha)
    (0 until 1000000).foreach { i =>
      // values sweep 1e-10..1e10 — the full 20-decade range
      val v = math.pow(10.0, (i % 2001) / 100.0 - 10.0)
      val b = math.ceil(math.log(v) / math.log(gamma)).toLong
      val (st2, out) = QuantileStats.fold(st, Array(b), 0L, -1L)
      st = st2.get
      assert(out.isEmpty)
    }
    val bound = math.ceil(math.log(1e20) / math.log(gamma)).toLong + 1
    assert(st.buckets.length <= bound,
      s"bucket state ${st.buckets.length} exceeds the log_γ bound $bound")
    assert(st.counts.sum == 1000000L)
    // sealing emits every bucket once and removes the state entirely
    val (stF, outF) = QuantileStats.fold(st, Array.emptyLongArray,
      0L, QuantileStats.WinUs)
    assert(stF.isEmpty && outF.size == st.buckets.length)
  }

  test("SessionStats: endless sessions, state is one open session + lag") {
    val min = 60000000L
    var st = SessionStats.SessState(0L, 0L, Long.MinValue, 0L,
      Array.emptyLongArray, Array.emptyLongArray)
    var closed = 0L
    var maxPend = 0
    // 10k events a minute apart with a >30-min gap every 100 events:
    // ~100 sessions close along the way, state never grows with any
    // of it — one open session (four longs) + the 3-event wm lag
    (0 until 10000).foreach { i =>
      val us = i.toLong * min + (i / 100).toLong * 40L * min
      st = st.copy(pendUs = st.pendUs :+ us, pendId = st.pendId :+ i.toLong)
      val (st2, out) = SessionStats.fold(st, us - 3L * min)
      st = st2
      closed += out.size
      maxPend = math.max(maxPend, st.pendUs.length)
    }
    assert(maxPend <= 4, s"pending slice grew with lifetime: $maxPend")
    val (stF, outF) = SessionStats.fold(st, Long.MaxValue)
    assert(closed + outF.size == 100L,
      s"one session per gap block: ${closed + outF.size}")
    assert(stF.idx == 100L && stF.n == 0L && stF.pendUs.isEmpty)
  }

  test("FunnelStats: a user who views forever but never signs up") {
    // no step-1 event: the buffer must stay bounded by watermark lag,
    // not accumulate 10k views
    var buf = Array.emptyLongArray
    var maxKept = 0
    (0 until 10000).foreach { i =>
      val ms = i.toLong * 60000L
      buf = buf ++ Array(ms * 8L + 1L) // step index 1 = not step-1
      val (kept, _) = FunnelStats.updateBuffer(buf, 21L * 60000L,
        ms - 5L * 60000L)
      buf = kept
      maxKept = math.max(maxKept, kept.length)
    }
    assert(maxKept <= 6, s"no-step1 buffer grew with lifetime: $maxKept")
  }

  test("SequenceStats: one endless session, tail capped at maxLen−1") {
    val pats = Array("svp", "vvv")
    var st = SequenceStats.SeqState("", 0, 0L, Long.MinValue,
      Long.MinValue, Array.emptyLongArray, Array.emptyLongArray, "")
    (0 until 10000).foreach { i =>
      val ms = i.toLong * 1000L // 1s apart, gap never exceeded
      st = st.copy(lastTs = ms, pendTs = st.pendTs :+ ms,
        pendId = st.pendId :+ i.toLong, pendCh = st.pendCh + "v")
      val (st2, _) = SequenceStats.fold(st, ms - 2000L, pats, 2, 60000L)
      st = st2
    }
    assert(st.tail.length <= 2,
      s"open-session tail grew with lifetime: ${st.tail.length}")
    assert(st.pendTs.length <= 2,
      s"pending slice grew with lifetime: ${st.pendTs.length}")
    assert(st.n > 9000, "the endless session kept counting")
  }

  test("HitterStats: 1M ALL-DISTINCT tokens, state bounded at d·w cells") {
    // the CMS projection's whole point: per-window frequency state is
    // the d×w counter grid (4096 cells), never the vocabulary — a
    // million distinct tokens leave ≤ d·w occupied cells, and sealing
    // tombstones them. Cell ids here are any deterministic spread into
    // [0, d·w) — the bound is structural, not hash-specific (the hash
    // bit-equality is HitterStatsSpec's pin).
    val dw = HitterStats.D * HitterStats.W
    var st = WindowHistogram.empty
    (0 until 1000000).foreach { i =>
      val cells = Array.tabulate(HitterStats.D)(r =>
        r.toLong * HitterStats.W +
          math.floorMod(i * 2654435761L + r * 40503L, HitterStats.W))
      val (st2, out) = WindowHistogram.fold(st, cells, 0L,
        HitterStats.WinUs, -1L)
      st = st2.get
      assert(out.isEmpty)
    }
    assert(st.buckets.length <= dw,
      s"cell state ${st.buckets.length} exceeds d·w = $dw")
    assert(st.counts.sum == 1000000L * HitterStats.D)
    // sealing emits every occupied cell once and removes the state
    val (stF, outF) = WindowHistogram.fold(st, Array.emptyLongArray,
      0L, HitterStats.WinUs, HitterStats.WinUs)
    assert(stF.isEmpty && outF.size == st.buckets.length)
  }
}
