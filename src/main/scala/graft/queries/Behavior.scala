package graft.queries

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the `events` stream table — the funnel /
  * retention / gap-fill trio every product-analytics engine ships
  * (reference scope: the sink's consumers run exactly these shapes over
  * landed event tables; see /root/reference/README.md "query the
  * partitioned output with any engine").
  *
  * Scale design (100 TB of events):
  *
  *  - `q_funnel`: ONE exchange on `user_id`, then a cascade of four
  *    whole-partition window minima over the SAME partitioning —
  *    Catalyst plans a single shuffle and chains the WindowExecs
  *    (no orderBy, so no per-step sort either; PlanSpec pins exactly
  *    one Exchange). Each step's conditional `min` references the
  *    previous step's per-user timestamp, which is the textbook
  *    sequential-funnel semantics (ClickHouse `windowFunnel`,
  *    Amplitude) without materializing per-user event arrays: state
  *    per row is four timestamps, never a collect_list. The final
  *    per-user flags collapse through a distinct-on-user aggregation
  *    that REUSES the window partitioning (no fourth-distinct Expand,
  *    no second shuffle of the events).
  *
  *  - `q_retention_cohort`: two partial-aggregated shuffles (cohort =
  *    min week per user; activity = distinct user-week) joined on
  *    user_id — both sides shrink to ~|users| rows before the join,
  *    so the join input is orders of magnitude below the event count.
  *
  *  - `q_gapfill_locf`: the daily grid is generated per user with
  *    `sequence` + `explode` (grid size = span days, bounded), LEFT
  *    join back to the daily partial aggregate, then last-observation-
  *    carried-forward via `last(ignoreNulls)` over (user, day) — the
  *    window's partitioning matches the join's, so the sort is the
  *    only post-join work. No driver loop, no global materialized
  *    calendar.
  *
  * Determinism: counts are exact BIGINTs; the one double column
  * (`v_locf`) is a sum of DECIMAL(12,4) casts (exact at this scale)
  * converted to double once — same discipline as q_stream_tumbling.
  */
object Behavior extends QueryFamily {

  private def tsCol: Column = col("ts")
  private def dec(c: String) = col(c).cast("decimal(12,4)")

  /** Conditional per-user window min for funnel step `etype`, gated on
    * the previous step's timestamp `prev` and a 7-day step window. */
  private def stepMin(etype: String, prev: Column): Column =
    min(when(col("event_type") === etype && tsCol > prev &&
      tsCol <= prev + expr("INTERVAL 7 DAYS"), tsCol))
      .over(Window.partitionBy(col("user_id")))

  /** One row per user with the funnel cascade's step timestamps
    * t1..t4 — the shared core of q_funnel and q_funnel_latency. The
    * window cascade and the per-user collapse share ONE exchange. */
  private def funnelStages(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("t1", min(when(col("event_type") === "signup", tsCol))
        .over(Window.partitionBy(col("user_id"))))
      .withColumn("t2", stepMin("view", col("t1")))
      .withColumn("t3", stepMin("click", col("t2")))
      .withColumn("t4", stepMin("purchase", col("t3")))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"), max(col("t4")).as("t4"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> { (s, d) =>
      // signup → view → click → purchase, each step within 7 days of
      // the previous step's FIRST qualifying event (strictly after it).
      // t1..t4 are constant per user: collapse to one row per user on
      // the partitioning the windows already established, then one
      // global partial-aggregated sum of step flags (avoids the 4-way
      // count-distinct Expand over the full event table).
      funnelStages(s, d)
        .agg(
          sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("step1_users"),
          sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("step2_users"),
          sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("step3_users"),
          sum(when(col("t4").isNotNull, 1L).otherwise(0L)).as("step4_users"))
    },
    "q_funnel_latency" -> { (s, d) =>
      // Per-step time-to-convert: among users who completed each
      // transition, the mean seconds between the two step timestamps.
      // Exact integer arithmetic end to end (the micro-unit
      // discipline): each latency is a floored whole-second BIGINT and
      // the mean is an integer DIV — no float summation order, no
      // AVG() precision drift between engines.
      val st = funnelStages(s, d)
      def sec(a: String, b: String): Column =
        expr(s"(unix_micros(cast($b as timestamp)) - " +
          s"unix_micros(cast($a as timestamp))) DIV 1000000")
      val lat = st.select(
        explode(array(
          struct(lit(2L).as("step"), sec("t1", "t2").as("sec")),
          struct(lit(3L).as("step"), sec("t2", "t3").as("sec")),
          struct(lit(4L).as("step"), sec("t3", "t4").as("sec")))).as("l"))
        .select(col("l.step").as("step"), col("l.sec").as("sec"))
        .filter(col("sec").isNotNull)
      lat.groupBy("step")
        .agg(count(lit(1)).as("n_converts"),
          expr("sum(sec) DIV count(1)").as("avg_sec"))
        .orderBy("step")
    },
    "q_running_distinct" -> { (s, d) =>
      runningDistinct(Tables.events(s, d))
    },
    "q_sequence_pattern" -> { (s, d) =>
      // Consecutive-pattern detection (the MATCH_RECOGNIZE-lite /
      // "did sequence" shape): each user's events collapse to one
      // character string in (ts, event_id) order — s/v/c/p/e initials
      // — and patterns are pure SUBSTRING containment (no regex, so no
      // engine-dialect risk). Per-user state is the user's own event
      // string (bounded by their activity, the collect_list contract
      // documented on q_pack_sequences); one shuffle on user_id, the
      // pattern probes are map-side over |users| rows.
      val ini = substring(col("event_type"), 1, 1)
      val strs = Tables.events(s, d)
        .select(col("user_id"),
          struct(col("ts"), col("event_id"), ini.as("i")).as("e"))
        .groupBy(col("user_id"))
        .agg(array_join(transform(sort_array(collect_list(col("e"))),
          x => x.getField("i")), "").as("seq"))
      strs.agg(
          sum(when(col("seq").contains("sp"), 1L).otherwise(0L))
            .as("signup_then_purchase"),
          sum(when(col("seq").contains("vvv"), 1L).otherwise(0L))
            .as("three_views_row"),
          sum(when(col("seq").contains("ee"), 1L).otherwise(0L))
            .as("error_pair"))
    },
    "q_sessionize" -> ((s, d) => sessionize(Tables.events(s, d))),
    "q_sequence_regex" -> { (s, d) =>
      // Regex-CLASS sequence patterns over the same per-user event
      // strings — MATCH_RECOGNIZE's real power (quantifiers,
      // alternation, negated classes, anchors), where substring
      // containment (q_sequence_pattern) can't reach. The dialect risk
      // is pinned to the construct subset Java regex and DuckDB's RE2
      // agree on: character classes, {n,} quantifiers, alternation,
      // ^ anchors — no backreferences (RE2 has none), no lookaround.
      // Same one-shuffle shape: per-user collect to a string, map-side
      // rlike probes over |users| rows.
      val ini = substring(col("event_type"), 1, 1)
      val strs = Tables.events(s, d)
        .select(col("user_id"),
          struct(col("ts"), col("event_id"), ini.as("i")).as("e"))
        .groupBy(col("user_id"))
        .agg(array_join(transform(sort_array(collect_list(col("e"))),
          x => x.getField("i")), "").as("seq"))
      strs.agg(
          sum(when(col("seq").rlike("s[^p]*p"), 1L).otherwise(0L))
            .as("signup_before_purchase"),
          sum(when(col("seq").rlike("v{3,}"), 1L).otherwise(0L))
            .as("three_plus_views_row"),
          sum(when(col("seq").rlike("(c|p)e"), 1L).otherwise(0L))
            .as("click_or_purchase_then_error"),
          sum(when(col("seq").rlike("^s"), 1L).otherwise(0L))
            .as("signup_first_event"),
          sum(when(col("seq").rlike("e[^e]*e[^e]*e"), 1L).otherwise(0L))
            .as("three_errors_anywhere"))
    },
    "q_event_transitions" -> { (s, d) =>
      // First-order Markov transition matrix of the event stream: per
      // user, consecutive event-type pairs (ts order, event_id
      // tie-break), counted and row-normalized in micro-units (n·1e6
      // DIV row total — exact integers, no float probabilities). One
      // shuffle on user_id for the lag window, one partial-agged count
      // shuffle; the |types|² matrix is trivially small.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // checkpointed: the row-total aggregate AND the final join both
      // read it, and without this the corpus lag-window runs twice —
      // the matrix is |types|² rows, so materializing is free
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("to_type"),
          lag(col("event_type"), 1).over(w).as("from_type"))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val rowTot = pairs.groupBy(col("from_type").as("ft"))
        .agg(sum(col("n")).as("row_total"))
      pairs.join(broadcast(rowTot), col("from_type") === col("ft"))
        .select(col("from_type"), col("to_type"), col("n"),
          expr("n * 1000000 DIV row_total").as("p_u"))
        .orderBy("from_type", "to_type")
    },
    "q_rolling_anomaly" -> { (s, d) =>
      // Rolling per-user anomaly days: |x − μ| > 2σ over the trailing
      // 7-observed-day window, decided ENTIRELY in integer arithmetic —
      // the z-test inequality (x−s/n)² > 4(q/n − s²/n²) multiplied
      // through by n² is (n·x−s)² > 4(n·q−s²), all BIGINTs, so both
      // engines flag the identical set with zero float σ drift. One
      // shuffle on user_id; the three window aggregates share a frame.
      // Runs on observed days (compose with q_gapfill_locf's grid for
      // zero-filled silence detection).
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      Tables.events(s, d)
        .groupBy(col("user_id"), date_trunc("day", tsCol).cast("date")
          .as("day"))
        .agg(count(lit(1)).as("x"))
        .select(col("user_id"), col("day"), col("x"),
          count(lit(1)).over(w).as("n"),
          sum(col("x")).over(w).as("s"),
          sum(col("x") * col("x")).over(w).as("q"))
        .filter(col("n") >= 4 &&
          (col("n") * col("x") - col("s")) *
            (col("n") * col("x") - col("s")) >
            lit(4) * (col("n") * col("q") - col("s") * col("s")))
        .select(col("user_id"), col("day"), col("x"), col("n"))
        .orderBy("user_id", "day")
    },
    "q_assoc_rules" -> { (s, d) =>
      // Market-basket association rules over co-purchased parts:
      // support count, confidence and lift for every pair appearing in
      // ≥ 2 orders, in exact micro-units (conf_u = ⌊1e6·c_ab/c_a⌋,
      // lift_u = ⌊1e6·n·c_ab/(c_a·c_b)⌋). The lift numerator
      // n·c_ab·1e6 outgrows BIGINT past ~10⁶ orders per frequent pair,
      // so it multiplies in DECIMAL(38,0) (DuckDB: HUGEINT) — the
      // q_drift_ks/q_mix_token_budget discipline — making the bound
      // enforced by the type, not documented in a comment; integer DIV
      // keeps both engines ranking identically.
      // Shape: one distinct (order, part) shuffle feeds the pair
      // count, the item counts AND the order count; the pair→item-
      // count joins are part-keyed (dim-sized sides, AQE broadcasts
      // them at small SF, hash-shuffles at scale); the final top-100
      // is TakeOrdered, never a global sort.
      val op = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .localCheckpoint()
      val n = op.agg(countDistinct(col("l_orderkey")).as("n"))
      // checkpointed: both endpoint joins read the item counts
      val ca = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val cab = op.as("a")
        .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").cast("long").as("p1"),
          col("b.l_partkey").cast("long").as("p2"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 2)
      cab
        .join(ca.select(col("l_partkey").as("p1k"), col("c").as("c_a")),
          col("p1") === col("p1k"))
        .join(ca.select(col("l_partkey").as("p2k"), col("c").as("c_b")),
          col("p2") === col("p2k"))
        .crossJoin(broadcast(n))
        .select(col("p1"), col("p2"), col("c_ab"),
          expr("c_ab * 1000000 DIV c_a").as("conf_u"),
          expr("CAST((CAST(c_ab AS DECIMAL(38,0)) * n * 1000000) DIV " +
            "(CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)").as("lift_u"))
        .orderBy(col("lift_u").desc, col("p1"), col("p2"))
        .limit(100)
    },
    "q_retention_cohort" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(date_trunc("week", tsCol)).as("cw"))
      val act = ev
        .select(col("user_id"), date_trunc("week", tsCol).as("w"))
        .distinct()
      act.join(cohort, Seq("user_id"))
        .groupBy(col("cw").cast("date").as("cohort_week"),
          (datediff(col("w").cast("date"), col("cw").cast("date")) / 7)
            .cast("long").as("week_no"))
        .agg(count(lit(1)).as("users"))
        .orderBy("cohort_week", "week_no")
    },
    "q_gapfill_locf" -> ((s, d) => gapfillLocf(Tables.events(s, d))),
    "q_trend" -> { (s, d) =>
      // Exact integer OLS — per order-priority, the monthly-revenue
      // trend in micro-cents/month: slope = (nΣxy − ΣxΣy) /
      // (nΣx² − (Σx)²), every sum a BIGINT over integers, the cross
      // products in DECIMAL(38,0) (DuckDB HUGEINT — the lift_u
      // discipline). Division is SIGN-SPLIT: slope_u = sign(num) ·
      // (1e6·|num| DIV den) — Spark DIV truncates toward zero while
      // DuckDB // floors, and they agree only on non-negatives
      // (the q_communities_quality lesson), so the quotient is taken
      // on |num| and the sign re-applied. den = n·Σx²−(Σx)² ≥ 0 by
      // Cauchy-Schwarz. Two partial-aggregated shuffles (monthly
      // series, then per-group sums) + a 1-row min-month broadcast.
      val o = Tables.orders(s, d).select(
        col("o_orderpriority").as("prio"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("ym"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val minYm = o.agg(min("ym").as("ym0"))
      val monthly = o.crossJoin(broadcast(minYm))
        .groupBy(col("prio"), (col("ym") - col("ym0")).as("x"))
        .agg(sum("cents").as("y"))
      monthly.groupBy("prio").agg(
          count(lit(1)).as("n_months"),
          sum("x").as("sx"),
          sum(col("x") * col("x")).as("sxx"),
          sum("y").as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
        .select(col("prio"), col("n_months"),
          expr("""CAST(
            CASE WHEN CAST(n_months AS DECIMAL(38,0)) * sxy
                      - CAST(sx AS DECIMAL(38,0)) * sy < 0
                 THEN -1 ELSE 1 END
            * ((1000000 * abs(CAST(n_months AS DECIMAL(38,0)) * sxy
                              - CAST(sx AS DECIMAL(38,0)) * sy))
               DIV (CAST(n_months AS DECIMAL(38,0)) * sxx
                    - CAST(sx AS DECIMAL(38,0)) * sx))
            AS BIGINT)""").as("slope_u"))
        .orderBy("prio")
    },
    "q_seasonality" -> { (s, d) =>
      // Month-of-year seasonality index: each calendar month's share
      // of revenue against a flat year — index_u = 1e6·12·rev_m /
      // rev_total in micro-units (1e6 = a perfectly flat month). The
      // 1e6·12·rev numerator outgrows BIGINT at corpus scale, so it
      // multiplies in DECIMAL(38,0)/HUGEINT (the lift_u discipline);
      // everything is non-negative, so DIV and // agree. One
      // partial-aggregated shuffle (12 groups) + a 1-row broadcast.
      val o = Tables.orders(s, d).select(
        month(col("o_orderdate")).cast("long").as("m"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val byM = o.groupBy("m").agg(
        count(lit(1)).as("n_orders"),
        sum("cents").as("revenue_cents"))
      val tot = byM.agg(sum("revenue_cents").as("total_cents"))
      byM.crossJoin(broadcast(tot))
        .select(col("m"), col("n_orders"), col("revenue_cents"),
          expr("CAST((CAST(revenue_cents AS DECIMAL(38,0)) * 12000000)" +
            " DIV total_cents AS BIGINT)").as("index_u"))
        .orderBy("m")
    },
    "q_rfm" -> { (s, d) =>
      // RFM customer segmentation — recency/frequency/monetary quartile
      // tiers, the classic CRM cut. All-integer metrics (days, counts,
      // CENTS via the floor(x*100+0.5) integerization), quartile
      // thresholds by EXACT interpolated percentile over integers —
      // value + {0,.25,.5,.75}·(next−value) lands on dyadic rationals
      // both engines represent exactly (the q_profile_outliers
      // discipline). BOUNDED THRESHOLD STATE (r16): the exact
      // `percentile` buffers a value→count map on the final reducer,
      // and distinct per-customer m_cents grows O(customers) — so the
      // monetary signal quantizes to $100 units through the SAME
      // cdfBin clamp the calibration family uses (≤ 2^20 distinct
      // values BY CONSTRUCTION; r_days and f are naturally bounded).
      // The clamp is mirrored in the oracle SQL — the
      // q_quality_normalize discipline. Two partial-aggregated
      // shuffles (per-customer RFM, 1-row max-date) + two 1-row
      // broadcasts; tiers are map-side CASE sums. Boundary semantics
      // pinned in the SQL: recency uses <= (lower is better → higher
      // tier), frequency/monetary use >.
      val o = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderdate"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val maxD = o.agg(max("o_orderdate").as("maxd"))
      val rfm = o.crossJoin(broadcast(maxD))
        .groupBy("o_custkey")
        .agg(min(datediff(col("maxd"), col("o_orderdate")))
            .cast("long").as("r_days"),
          count(lit(1)).as("f"),
          sum("cents").as("m_cents"))
        .withColumn("m_q", Quality.cdfBin(expr("m_cents div 10000")))
      val th = rfm.agg(
        expr("percentile(r_days, array(0.25, 0.5, 0.75))").as("rq"),
        expr("percentile(f, array(0.25, 0.5, 0.75))").as("fq"),
        expr("percentile(m_q, array(0.25, 0.5, 0.75))").as("mq"))
      def upTier(c: Column, q: Column): Column =
        (lit(1) + (c > q.getItem(0)).cast("long") +
          (c > q.getItem(1)).cast("long") +
          (c > q.getItem(2)).cast("long"))
      def downTier(c: Column, q: Column): Column =
        (lit(1) + (c <= q.getItem(0)).cast("long") +
          (c <= q.getItem(1)).cast("long") +
          (c <= q.getItem(2)).cast("long"))
      rfm.crossJoin(broadcast(th))
        .select(col("o_custkey"), col("r_days"), col("f"),
          col("m_cents"),
          downTier(col("r_days"), col("rq")).as("r_tier"),
          upTier(col("f"), col("fq")).as("f_tier"),
          upTier(col("m_q"), col("mq")).as("m_tier"))
        .withColumn("rfm_score",
          col("r_tier") * 100 + col("f_tier") * 10 + col("m_tier"))
        .orderBy("o_custkey")
    },
    "q_cohort_ltv" -> { (s, d) =>
      // Cohort lifetime-value curves: customers cohorted by first-order
      // month, revenue accumulated over cohort age — the companion of
      // q_retention_cohort that answers "how much", not "how many".
      // Months as year*12+month integers (no interval dialect drift),
      // revenue in cents; the running sum windows PER COHORT (many
      // cohorts — never a single global partition) over the unique age
      // axis, so frame semantics are tie-free and engine-identical.
      val o = Tables.orders(s, d).select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("ym"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val cohort = o.groupBy("o_custkey").agg(min("ym").as("cym"))
      val rev = o.join(cohort, Seq("o_custkey"))
        .groupBy(col("cym").as("cohort_ym"),
          (col("ym") - col("cym")).as("age_months"))
        .agg(sum("cents").as("revenue_cents"))
      val w = Window.partitionBy("cohort_ym").orderBy("age_months")
      rev.withColumn("cum_revenue_cents",
          sum("revenue_cents").over(w))
        .orderBy("cohort_ym", "age_months")
    },
    "q_attribution" -> { (s, d) =>
      // Last-touch conversion attribution: each purchase credits the
      // user's most recent PRIOR non-purchase event within a 7-day
      // lookback, else 'direct' — the marketing-attribution shape the
      // funnel doesn't answer (funnels count converters; attribution
      // splits conversions across acquisition channels). ONE exchange
      // on user_id; the two last-ignoreNulls windows share frame and
      // sort; the final rollup is |types| rows. The 7-day cut compares
      // epoch micros (exact BIGINTs — no interval-arithmetic dialect
      // drift), tie-break (ts, event_id) as everywhere in this family.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val us = expr("unix_micros(cast(ts as timestamp))")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), us.as("us"),
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w).as("touch_type"),
          last(when(col("event_type") =!= "purchase", us),
            ignoreNulls = true).over(w).as("touch_us"))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          when(col("touch_us").isNotNull &&
            col("us") - col("touch_us") <= 604800000000L,
            col("touch_type")).otherwise("direct").as("touch_type"))
        .groupBy("touch_type")
        .agg(count(lit(1)).as("conversions"),
          countDistinct(col("user_id")).as("users"))
        .orderBy("touch_type")
    },
    "q_ewma" -> { (s, d) =>
      // Per-user EWMA (α = 1/2) of daily event counts — the smoothed
      // activity baseline behind the anomaly family, decided ENTIRELY
      // in integer arithmetic: the recurrence e_i = (e_{i-1} + x_i·1e6)
      // DIV 2 floors at every step, so both engines walk the identical
      // integer sequence (no float summation order, no pow() drift) and
      // the state never outgrows max(x)·1e6·2 — the q_rolling_anomaly
      // micro-unit discipline applied to a left fold. Shape: one
      // partial-agged daily shuffle, one user_id shuffle; the fold is
      // map-side over per-user day arrays (bounded by the span in days,
      // the q_pack_sequences collect_list contract). The -1 seed is a
      // sentinel: counts are ≥ 1, so x·1e6 ≥ 1e6 and the first element
      // passes through as the classic ewma_1 = x_1 initialization —
      // matching DuckDB list_reduce's first-element-as-seed exactly.
      ewma(Tables.events(s, d))
    }
  )

  /** q_sessionize's kernel over any events frame — gap-based
    * sessionization, the batch form of the 30-minute session semantics
    * streaming/SessionStats seals continuously (factored so
    * SessionStatsSpec can pin the streaming fold against the SAME
    * code): a session breaks where the gap to the previous event
    * exceeds 30 minutes; session ids are the running count of breaks
    * (the classic lag + cumulative-sum idiom, both windows sharing ONE
    * user_id exchange and ONE (ts, event_id) sort). Durations in
    * whole seconds (exact BIGINTs — no interval/float drift). */
  private[graft] def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 1800L * 1000000L
    val us = expr("unix_micros(cast(ts as timestamp))")
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        us.as("us"), lag(us, 1).over(w).as("prev_us"))
      .select(col("user_id"), col("ts"), col("event_id"), col("us"),
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > gapUs, 1L).otherwise(0L)
          .as("brk"))
      .select(col("user_id"), col("us"),
        sum(col("brk")).over(w).as("session_idx"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        expr("(max(us) - min(us)) DIV 1000000").as("duration_sec"))
      .orderBy("user_id", "session_idx")
  }

  /** q_running_distinct's kernel over any events frame — daily new vs
    * cumulative distinct users, the scalable form of count(DISTINCT)
    * OVER (ORDER BY day): tag each user's FIRST day (one per-user
    * aggregation), roll new-user counts up per day, then a running sum
    * over the DAY-level frame. The global window is safe because its
    * input is |days| rows, not the corpus — the corpus-sized distinct
    * state never exists. Factored so RunningDistinctSpec can pin the
    * streaming fold ([[graft.streaming.RunningDistinctStats]]) against
    * the SAME code. */
  private[graft] def runningDistinct(events: DataFrame): DataFrame = {
    val firstDay = events
      .groupBy(col("user_id"))
      .agg(min(date_trunc("day", col("ts"))).as("first_day"))
    val dailyNew = firstDay
      .groupBy(col("first_day").cast("date").as("day"))
      .agg(count(lit(1)).as("new_users"))
    // constant partition key: same one-group semantics, but the
    // bounded-frame claim (|days| rows, never the corpus) is now
    // machine-checkable — the plan carries no SinglePartition window
    // (PlanSpec) and the WindowExec warning stays silent. pmod(x,1)=0
    // because Catalyst STRIPS foldable keys from a window partition
    // spec — a bare lit(0) still plans SinglePartition
    dailyNew.select(col("day"), col("new_users"),
        sum(col("new_users")).over(
          Window.partitionBy(pmod(dayofmonth(col("day")), lit(1)))
          .orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_users"))
      .orderBy("day")
  }

  /** q_gapfill_locf's kernel over any events frame — factored so
    * GapfillStatsSpec can pin the streaming fold ([[
    * graft.streaming.GapfillStats]]) against the SAME code.
    * Checkpointed: the grid build AND the left join both read the
    * daily aggregate — one aggregation, not two (the
    * q_quantile_sketch lesson). */
  private[graft] def gapfillLocf(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,4)")).cast("double").as("v"))
      .localCheckpoint()
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY")))
          .as("day"))
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day").cast("date").as("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("v"), ignoreNulls = true)
          .over(Window.partitionBy(col("user_id")).orderBy(col("day")))
          .as("v_locf"))
      .orderBy("user_id", "day")
  }

  /** q_ewma's kernel over any events frame — factored so
    * EwmaStatsSpec can pin the streaming fold ([[
    * graft.streaming.EwmaStats]]) against the SAME code. */
  private[graft] def ewma(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    daily.groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("day"), col("x"))))
        .as("ds"))
      .select(col("user_id"), size(col("ds")).as("n_days"),
        expr("aggregate(transform(ds, s -> s.x * 1000000L), -1L, " +
          "(acc, v) -> IF(acc = -1L, v, (acc + v) DIV 2))").as("ewma_u"))
      .orderBy("user_id")
  }

  def oracle: Map[String, String] = Map(
    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT *, min(CASE WHEN event_type='signup' THEN ts END)
        |            OVER (PARTITION BY user_id) AS t1 FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type='view' AND ts > t1
        |                AND ts <= t1 + INTERVAL 7 DAY THEN ts END)
        |            OVER (PARTITION BY user_id) AS t2 FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type='click' AND ts > t2
        |                AND ts <= t2 + INTERVAL 7 DAY THEN ts END)
        |            OVER (PARTITION BY user_id) AS t3 FROM s2),
        |s4 AS (
        |  SELECT *, min(CASE WHEN event_type='purchase' AND ts > t3
        |                AND ts <= t3 + INTERVAL 7 DAY THEN ts END)
        |            OVER (PARTITION BY user_id) AS t4 FROM s3)
        |SELECT
        |  count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS step1_users,
        |  count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS step2_users,
        |  count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS step3_users,
        |  count(DISTINCT CASE WHEN t4 IS NOT NULL THEN user_id END) AS step4_users
        |FROM s4""".stripMargin,
    "q_sequence_pattern" ->
      """WITH strs AS (
        |  SELECT user_id,
        |         string_agg(substring(event_type, 1, 1), ''
        |           ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CAST(sum(CASE WHEN contains(seq, 'sp') THEN 1 ELSE 0 END)
        |       AS BIGINT) AS signup_then_purchase,
        |  CAST(sum(CASE WHEN contains(seq, 'vvv') THEN 1 ELSE 0 END)
        |       AS BIGINT) AS three_views_row,
        |  CAST(sum(CASE WHEN contains(seq, 'ee') THEN 1 ELSE 0 END)
        |       AS BIGINT) AS error_pair
        |FROM strs""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |marked AS (
        |  SELECT user_id, us,
        |    CASE WHEN lag(us) OVER (PARTITION BY user_id
        |           ORDER BY us, event_id) IS NULL
        |         OR us - lag(us) OVER (PARTITION BY user_id
        |           ORDER BY us, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS brk,
        |    event_id
        |  FROM e),
        |sess AS (
        |  SELECT user_id, us,
        |    sum(brk) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS session_idx
        |  FROM marked)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST((max(us) - min(us)) // 1000000 AS BIGINT)
        |         AS duration_sec
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "q_sequence_regex" ->
      """WITH strs AS (
        |  SELECT user_id,
        |         string_agg(substring(event_type, 1, 1), ''
        |           ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CAST(sum(CASE WHEN regexp_matches(seq, 's[^p]*p')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS signup_before_purchase,
        |  CAST(sum(CASE WHEN regexp_matches(seq, 'v{3,}')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS three_plus_views_row,
        |  CAST(sum(CASE WHEN regexp_matches(seq, '(c|p)e')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS click_or_purchase_then_error,
        |  CAST(sum(CASE WHEN regexp_matches(seq, '^s')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS signup_first_event,
        |  CAST(sum(CASE WHEN regexp_matches(seq, 'e[^e]*e[^e]*e')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS three_errors_anywhere
        |FROM strs""".stripMargin,
    "q_event_transitions" ->
      """WITH pairs AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS from_type,
        |         event_type AS to_type
        |  FROM events),
        |cnt AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        |  SELECT from_type AS ft, CAST(sum(n) AS BIGINT) AS row_total
        |  FROM cnt GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |       CAST((c.n * 1000000) // t.row_total AS BIGINT) AS p_u
        |FROM cnt c JOIN tot t ON c.from_type = t.ft
        |ORDER BY c.from_type, c.to_type""".stripMargin,
    "q_rolling_anomaly" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT user_id, day, x,
        |         CAST(count(*) OVER w AS BIGINT) AS n,
        |         CAST(sum(x) OVER w AS BIGINT) AS s,
        |         CAST(sum(x*x) OVER w AS BIGINT) AS q
        |  FROM daily
        |  WINDOW w AS (PARTITION BY user_id ORDER BY day
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT user_id, day, x, n FROM win
        |WHERE n >= 4 AND (n*x - s)*(n*x - s) > 4*(n*q - s*s)
        |ORDER BY user_id, day""".stripMargin,
    "q_assoc_rules" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |nn AS (
        |  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM op),
        |ca AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        |  FROM op GROUP BY 1),
        |cab AS (
        |  SELECT CAST(a.l_partkey AS BIGINT) AS p1,
        |         CAST(b.l_partkey AS BIGINT) AS p2,
        |         CAST(count(*) AS BIGINT) AS c_ab
        |  FROM op a JOIN op b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT cab.p1, cab.p2, cab.c_ab,
        |       (cab.c_ab * 1000000) // ca1.c AS conf_u,
        |       CAST((CAST(cab.c_ab AS HUGEINT) * nn.n * 1000000)
        |            // (CAST(ca1.c AS HUGEINT) * ca2.c) AS BIGINT) AS lift_u
        |FROM cab
        |JOIN ca ca1 ON cab.p1 = ca1.l_partkey
        |JOIN ca ca2 ON cab.p2 = ca2.l_partkey
        |CROSS JOIN nn
        |ORDER BY lift_u DESC, p1, p2 LIMIT 100""".stripMargin,
    "q_funnel_latency" ->
      """WITH s1 AS (
        |  SELECT *, min(CASE WHEN event_type='signup' THEN ts END)
        |            OVER (PARTITION BY user_id) AS t1 FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type='view' AND ts > t1
        |                AND ts <= t1 + INTERVAL 7 DAY THEN ts END)
        |            OVER (PARTITION BY user_id) AS t2 FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type='click' AND ts > t2
        |                AND ts <= t2 + INTERVAL 7 DAY THEN ts END)
        |            OVER (PARTITION BY user_id) AS t3 FROM s2),
        |s4 AS (
        |  SELECT *, min(CASE WHEN event_type='purchase' AND ts > t3
        |                AND ts <= t3 + INTERVAL 7 DAY THEN ts END)
        |            OVER (PARTITION BY user_id) AS t4 FROM s3),
        |st AS (
        |  SELECT user_id, min(t1) AS t1, min(t2) AS t2,
        |         min(t3) AS t3, min(t4) AS t4
        |  FROM s4 GROUP BY user_id),
        |lat AS (
        |  SELECT CAST(2 AS BIGINT) AS step,
        |         (epoch_us(t2) - epoch_us(t1)) // 1000000 AS sec
        |  FROM st WHERE t2 IS NOT NULL
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT),
        |         (epoch_us(t3) - epoch_us(t2)) // 1000000
        |  FROM st WHERE t3 IS NOT NULL
        |  UNION ALL
        |  SELECT CAST(4 AS BIGINT),
        |         (epoch_us(t4) - epoch_us(t3)) // 1000000
        |  FROM st WHERE t4 IS NOT NULL)
        |SELECT step, count(*) AS n_converts,
        |       CAST(sum(sec) // count(*) AS BIGINT) AS avg_sec
        |FROM lat GROUP BY step ORDER BY step""".stripMargin,
    "q_running_distinct" ->
      """WITH fd AS (
        |  SELECT user_id,
        |         CAST(min(date_trunc('day', ts)) AS DATE) AS day
        |  FROM events GROUP BY 1),
        |dn AS (SELECT day, count(*) AS new_users FROM fd GROUP BY 1)
        |SELECT day, new_users,
        |       CAST(sum(new_users) OVER (ORDER BY day
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM dn ORDER BY day""".stripMargin,
    "q_retention_cohort" ->
      """WITH cohort AS (
        |  SELECT user_id, min(date_trunc('week', ts)) AS cw
        |  FROM events GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
        |SELECT CAST(c.cw AS DATE) AS cohort_week,
        |       CAST(date_diff('day', c.cw, a.w)/7 AS BIGINT) AS week_no,
        |       count(*) AS users
        |FROM act a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_trend" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        |      AS ym,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |m0 AS (SELECT min(ym) AS ym0 FROM o),
        |monthly AS (
        |  SELECT prio, ym - ym0 AS x, CAST(sum(cents) AS BIGINT) AS y
        |  FROM o, m0 GROUP BY 1, 2),
        |sums AS (
        |  SELECT prio, count(*) AS n_months,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM monthly GROUP BY prio)
        |SELECT prio, n_months,
        |  CAST(
        |    (CASE WHEN CAST(n_months AS HUGEINT) * sxy
        |               - CAST(sx AS HUGEINT) * sy < 0
        |          THEN -1 ELSE 1 END)
        |    * ((1000000 * abs(CAST(n_months AS HUGEINT) * sxy
        |                      - CAST(sx AS HUGEINT) * sy))
        |       // (CAST(n_months AS HUGEINT) * sxx
        |           - CAST(sx AS HUGEINT) * sx))
        |  AS BIGINT) AS slope_u
        |FROM sums ORDER BY prio""".stripMargin,
    "q_seasonality" ->
      """WITH o AS (
        |  SELECT CAST(month(o_orderdate) AS BIGINT) AS m,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |bym AS (
        |  SELECT m, count(*) AS n_orders,
        |    CAST(sum(cents) AS BIGINT) AS revenue_cents
        |  FROM o GROUP BY m),
        |tot AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS total_cents
        |        FROM bym)
        |SELECT m, n_orders, revenue_cents,
        |  CAST((CAST(revenue_cents AS HUGEINT) * 12000000) // total_cents
        |    AS BIGINT) AS index_u
        |FROM bym, tot ORDER BY m""".stripMargin,
    "q_rfm" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |mx AS (SELECT max(o_orderdate) AS maxd FROM o),
        |rfm AS (
        |  SELECT o_custkey,
        |    CAST(min(date_diff('day', o_orderdate, maxd)) AS BIGINT)
        |      AS r_days,
        |    count(*) AS f,
        |    CAST(sum(cents) AS BIGINT) AS m_cents,
        |    LEAST(GREATEST(CAST(sum(cents) AS BIGINT) // 10000, 0),
        |      1048575) AS m_q
        |  FROM o, mx GROUP BY o_custkey),
        |th AS (
        |  SELECT quantile_cont(r_days, [0.25, 0.5, 0.75]) AS rq,
        |         quantile_cont(f, [0.25, 0.5, 0.75]) AS fq,
        |         quantile_cont(m_q, [0.25, 0.5, 0.75]) AS mq
        |  FROM rfm),
        |tiers AS (
        |  SELECT o_custkey, r_days, f, m_cents,
        |    CAST(1 + (CASE WHEN r_days <= rq[1] THEN 1 ELSE 0 END)
        |           + (CASE WHEN r_days <= rq[2] THEN 1 ELSE 0 END)
        |           + (CASE WHEN r_days <= rq[3] THEN 1 ELSE 0 END)
        |      AS BIGINT) AS r_tier,
        |    CAST(1 + (CASE WHEN f > fq[1] THEN 1 ELSE 0 END)
        |           + (CASE WHEN f > fq[2] THEN 1 ELSE 0 END)
        |           + (CASE WHEN f > fq[3] THEN 1 ELSE 0 END)
        |      AS BIGINT) AS f_tier,
        |    CAST(1 + (CASE WHEN m_q > mq[1] THEN 1 ELSE 0 END)
        |           + (CASE WHEN m_q > mq[2] THEN 1 ELSE 0 END)
        |           + (CASE WHEN m_q > mq[3] THEN 1 ELSE 0 END)
        |      AS BIGINT) AS m_tier
        |  FROM rfm, th)
        |SELECT o_custkey, r_days, f, m_cents, r_tier, f_tier, m_tier,
        |  r_tier * 100 + f_tier * 10 + m_tier AS rfm_score
        |FROM tiers ORDER BY o_custkey""".stripMargin,
    "q_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        |      AS ym,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |cohort AS (SELECT o_custkey, min(ym) AS cym FROM o GROUP BY 1),
        |rev AS (
        |  SELECT cym AS cohort_ym, ym - cym AS age_months,
        |    CAST(sum(cents) AS BIGINT) AS revenue_cents
        |  FROM o JOIN cohort USING (o_custkey)
        |  GROUP BY 1, 2)
        |SELECT cohort_ym, age_months, revenue_cents,
        |  CAST(sum(revenue_cents) OVER (PARTITION BY cohort_ym
        |    ORDER BY age_months) AS BIGINT) AS cum_revenue_cents
        |FROM rev ORDER BY cohort_ym, age_months""".stripMargin,
    "q_gapfill_locf" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1),
        |grid AS (
        |  SELECT user_id,
        |         unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |  FROM span)
        |SELECT g.user_id, CAST(g.day AS DATE) AS day,
        |       coalesce(d.n, 0) AS n,
        |       last_value(d.v IGNORE NULLS)
        |         OVER (PARTITION BY g.user_id ORDER BY g.day) AS v_locf
        |FROM grid g
        |LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
        |ORDER BY g.user_id, g.day""".stripMargin,
    "q_attribution" ->
      """WITH t AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |                    THEN event_type END IGNORE NULLS)
        |      OVER w AS touch_type,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |                    THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER w AS touch_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT CASE WHEN touch_us IS NOT NULL
        |            AND us - touch_us <= 604800000000
        |            THEN touch_type ELSE 'direct' END AS touch_type,
        |       CAST(count(*) AS BIGINT) AS conversions,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS users
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ewma" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |arr AS (SELECT user_id, list(x ORDER BY day) AS xs
        |        FROM daily GROUP BY 1)
        |SELECT user_id, CAST(len(xs) AS INTEGER) AS n_days,
        |  list_reduce(list_transform(xs, x -> x * 1000000),
        |              (a, b) -> (a + b) // 2) AS ewma_u
        |FROM arr ORDER BY user_id""".stripMargin
  )
}
