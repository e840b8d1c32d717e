package graft.queries

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality family: profiling (ANALYZE-style column statistics,
  * equi-width histograms) and expectation validation (declarative rule
  * → violation counts) — the observability surface every ingest
  * pipeline runs before training data is trusted. All Spark built-ins,
  * all DuckDB-oracled; derived doubles ride the §7.5 fixed-point
  * contract (floor-scaled micro-units).
  *
  * Scale design (100 TB):
  *  - profiling is ONE full-scan aggregation (count/null/distinct/
  *    min/max computed in the same partial-aggregated pass — one
  *    shuffle of a single combined row per partition);
  *  - the histogram is two passes by necessity (min/max bounds, then
  *    bucket counts) with the 1-row bounds frame BROADCAST — never a
  *    shuffle of the data by bucket;
  *  - expectations are map-only conditional sums folded into one
  *    aggregation row, then unpivoted driver-free with stack() — rule
  *    count never touches the data again.
  */
object Quality extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_stats" -> { (s, d) =>
      // the ANALYZE pass: per-column fill/cardinality/bounds in ONE
      // partial-aggregated scan (profiled columns chosen to cover
      // numeric, categorical, and temporal shapes)
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").isNull.cast("long")).as("qty_nulls"),
        count_distinct(col("l_returnflag")).as("rf_distinct"),
        count_distinct(col("l_suppkey")).as("supp_distinct"),
        floor(min("l_quantity") * 1000000).cast("long").as("qty_min_u"),
        floor(max("l_quantity") * 1000000).cast("long").as("qty_max_u"),
        // avg over the DECIMAL sum (§7.5): a double avg is partial-
        // aggregation-order dependent and floor can flip at a boundary
        floor(sum(col("l_quantity").cast("decimal(18,4)"))
            .cast("double") / count(lit(1)) * 1000000)
          .cast("long").as("qty_avg_u"),
        floor(min("l_extendedprice") * 1000000).cast("long").as("price_min_u"),
        floor(max("l_extendedprice") * 1000000).cast("long").as("price_max_u"),
        min(year(col("l_shipdate"))).as("ship_year_min"),
        max(year(col("l_shipdate"))).as("ship_year_max"))
    },
    "q_profile_histogram" -> { (s, d) =>
      // equi-width 10-bucket histogram of l_extendedprice: bounds pass
      // (1 row, broadcast) then a bucket-count aggregation — the data
      // shuffles one combined count row per partition, never by value
      val li = Tables.lineitem(s, d)
      val bounds = li.agg(min("l_extendedprice").as("lo"),
        max("l_extendedprice").as("hi"))
      val bucket = least(lit(9), floor(
        (col("l_extendedprice") - col("lo")) * 10.0 /
          (col("hi") - col("lo")))).cast("long")
      li.crossJoin(broadcast(bounds))
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          floor(min("l_extendedprice") * 1000000).cast("long")
            .as("seen_min_u"),
          floor(max("l_extendedprice") * 1000000).cast("long")
            .as("seen_max_u"))
        .orderBy("bucket")
    },
    "q_drift_psi" -> { (s, d) =>
      // Corpus drift monitor: Population Stability Index between two
      // corpus snapshots (stand-ins: even/odd doc_id halves) over the
      // token distribution — the production alarm for "this week's
      // crawl shifted under the filters". Add-one smoothing keeps every
      // vocab token defined in both snapshots; per-token contributions
      // (p−q)·ln(p/q) quantize to integer micro-units with identical
      // operand order in both engines (the unigram-surprisal
      // discipline). One corpus shuffle (token counts, partial-agged);
      // the scalar totals ride a 1-row broadcast.
      val toks = Tables.documents(s, d)
        .select((col("doc_id") % 2).as("snap"),
          explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      val counts = toks.groupBy("token").agg(
        sum(when(col("snap") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("snap") === 1, 1L).otherwise(0L)).as("cb"))
      val tot = counts.agg(
        sum("ca").cast("double").as("na"),
        sum("cb").cast("double").as("nb"),
        count(lit(1)).cast("double").as("v"))
      val p = (col("ca") + 1).cast("double") / (col("na") + col("v"))
      val q = (col("cb") + 1).cast("double") / (col("nb") + col("v"))
      counts.crossJoin(broadcast(tot))
        .select(col("token"), col("ca"), col("cb"),
          floor(lit(1e6) * (p - q) * log(p / q)).cast("long").as("psi_u"))
        .orderBy("token")
    },
    "q_drift_psi_binned" -> { (s, d) =>
      // The FIXED-BIN PSI — the numeric-column drift monitor whose
      // streaming form is streaming/DriftStats: events.value binned by
      // the reference boundaries (DriftStats.Bounds — a training
      // artifact, literals in the plan) via the SAME Catalyst fragment
      // the stream folds over (DriftStats.binExpr, a codegen'd sum of
      // indicators), snapshots = event_id parity. Same add-one
      // smoothing and per-bin floor(1e6·(p−q)·ln(p/q)) discipline as
      // q_drift_psi; state/shuffle is bins-sized, never value-sized.
      import graft.streaming.DriftStats
      val binned = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select((col("event_id") % 2).as("snap"),
          DriftStats.binExpr(col("value").cast("double"),
            DriftStats.Bounds).as("bin"))
      val counts = binned.groupBy("bin").agg(
        sum(when(col("snap") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("snap") === 1, 1L).otherwise(0L)).as("cb"))
      val tot = counts.agg(
        sum("ca").cast("double").as("na"),
        sum("cb").cast("double").as("nb"),
        count(lit(1)).cast("double").as("v"))
      val p = (col("ca") + 1).cast("double") / (col("na") + col("v"))
      val q = (col("cb") + 1).cast("double") / (col("nb") + col("v"))
      counts.crossJoin(broadcast(tot))
        .select(col("bin"), col("ca"), col("cb"),
          floor(lit(1e6) * (p - q) * log(p / q)).cast("long").as("psi_u"))
        .orderBy("bin")
    },
    "q_profile_outliers" -> { (s, d) =>
      // Robust outlier profiling: per-group median/MAD (the robust
      // z-score — resistant to the very outliers it hunts, unlike
      // mean/stddev). Determinism across engines: values are integer
      // CENTS, so exact interpolated medians land only on .5 midpoints
      // and deviations on .25 steps — dyadic rationals, exactly
      // representable doubles; the 4.4478·MAD rule (3σ-equivalent
      // under normality, 3×1.4826) is one literal double product
      // computed identically by both engines. Two scans, both
      // group-partial-aggregated; the median/MAD frames are
      // group-count-sized and broadcast.
      // l_extendedprice is a parquet DOUBLE: x*100 carries float noise
      // and Spark's long cast truncates while DuckDB's rounds — the
      // engine-identical integerization is floor(x*100 + 0.5) (floor is
      // exact in both)
      val cents = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long")
            .as("cents"))
      val med = cents.groupBy("l_returnflag")
        .agg(expr("percentile(cents, 0.5)").as("med"))
      val dev = cents.join(broadcast(med), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("med"),
          abs(col("cents") - col("med")).as("dev"))
      val mad = dev.groupBy("l_returnflag")
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      dev.join(broadcast(mad), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum((col("dev") > lit(4.4478) * col("mad")).cast("long"))
            .as("n_outliers"),
          round(min(col("med")), 1).as("med_cents"),
          round(min(col("mad")), 1).as("mad_cents"))
        .orderBy("l_returnflag")
    },
    "q_cardinality_hll" -> { (s, d) =>
      // Persistable cardinality registers (operators.Sketch.hll):
      // unlike approx_count_distinct's opaque in-query state, the
      // register TABLE lands in parquet and merges across runs/shards
      // by bucketwise max — completing the sketch triad (counts: CMS,
      // quantiles: DDSketch, distincts: HLL). ≤2^p rows shuffle per
      // partition regardless of corpus size. xxhash64 registers ⇒ no
      // DuckDB oracle (rows-only); SketchSpec pins the standard-error
      // band in both the linear-counting and raw-estimate regimes plus
      // exact shard-merge equality.
      val tok = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      // localCheckpoint: hllEstimate collects the registers eagerly and
      // the returned frame executes again — without it the corpus-wide
      // token aggregation would run twice
      val regs = graft.operators.Sketch.hll(tok, "token", p = 12)
        .localCheckpoint()
      val est = graft.operators.Sketch.hllEstimate(regs, p = 12)
      regs.withColumn("n_distinct_est", lit(est)).orderBy("bucket")
    },
    "q_corpus_overlap" -> { (s, d) =>
      // Snapshot-overlap estimation via KMV/theta sketches
      // (operators.Sketch.kmv): the set-operation sketch HLL registers
      // cannot be — bottom-k distinct hashes support INTERSECTION and
      // Jaccard between corpus snapshots (the question decontamination
      // and mix design ask: "how much of snapshot B is already in A?").
      // Each side's state is ≤ k rows per partition; merge is LOSSLESS
      // (merged shard sketches ≡ whole-corpus sketch bit-for-bit,
      // SketchSpec). The two "snapshots" are the corpus token sets of
      // even/odd documents. xxhash64 state ⇒ rows-only; SketchSpec pins
      // exactness below k, SE bands above, and merge identity.
      val k = 1024
      val docs = Tables.documents(s, d)
      def toks(filter: Column) = docs.filter(filter)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      val ka = graft.operators.Sketch.kmv(
        toks(pmod(col("doc_id"), lit(2)) === 0), "token", k).localCheckpoint()
      val kb = graft.operators.Sketch.kmv(
        toks(pmod(col("doc_id"), lit(2)) === 1), "token", k).localCheckpoint()
      val estA = graft.operators.Sketch.kmvEstimate(ka, k)
      val estB = graft.operators.Sketch.kmvEstimate(kb, k)
      val estU = graft.operators.Sketch.kmvEstimate(
        graft.operators.Sketch.kmvMerge(ka, kb, k), k)
      val inter = graft.operators.Sketch.kmvIntersectEstimate(ka, kb, k)
      val jac = graft.operators.Sketch.kmvJaccard(ka, kb, k)
      import s.implicits._
      Seq((estA, estB, estU, inter, jac))
        .toDF("est_a", "est_b", "est_union", "est_intersect", "jaccard")
    },
    "q_quantile_sketch" -> { (s, d) =>
      // Mergeable quantiles via DDSketch (operators.Sketch.ddSketch):
      // fixed log-scaled buckets, so shard sketches merge by bucketwise
      // ADDITION — order-free and bit-deterministic, unlike KLL's
      // randomized compaction — and the shuffle carries at most one row
      // per occupied bucket per partition (~2.3k buckets at alpha=1%
      // over a 10^20 dynamic range) however many rows feed it. The
      // profiling companion to q_profile_histogram for long-tailed
      // columns where equi-width buckets lose the tail. Float log
      // bucketing ⇒ no cross-engine oracle (rows-only); SketchSpec pins
      // the alpha relative-error guarantee against exact sorted
      // quantiles and exact shard-merge equality.
      val prices = Tables.lineitem(s, d)
        .select(col("l_extendedprice").cast("double").as("v"))
      // localCheckpoint: ddQuantiles references the sketch three times
      // (cum self-join twice + total) — without it the lineitem
      // scan+aggregation re-executes per reference
      val sketch = graft.operators.Sketch.ddSketch(prices, "v", alpha = 0.01)
        .localCheckpoint()
      graft.operators.Sketch.ddQuantiles(sketch, alpha = 0.01,
        Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0))
    },
    "q_expectations" -> { (s, d) =>
      // declarative validation: each rule is a conditional sum in ONE
      // aggregation row; stack() unpivots to (rule, violations, total)
      // without touching the data again. Rule order is the contract
      // (attrition dashboards key on it), hence the final sort by name.
      val li = Tables.lineitem(s, d)
      def viol(p: org.apache.spark.sql.Column) = sum((!p).cast("long"))
      li.agg(
          count(lit(1)).as("total"),
          viol(col("l_quantity").between(1, 50)).as("v_qty"),
          viol(col("l_discount").between(0.0, 0.1)).as("v_disc"),
          viol(col("l_tax") >= 0).as("v_tax"),
          viol(col("l_returnflag").isin("A", "N", "R")).as("v_rf"),
          viol(col("l_extendedprice") > 0).as("v_price"),
          viol(year(col("l_shipdate")).between(1992, 1998)).as("v_era"))
        .select(expr(
          """stack(6,
            |  'discount_range',   v_disc,  total,
            |  'price_positive',   v_price, total,
            |  'quantity_range',   v_qty,   total,
            |  'returnflag_domain',v_rf,    total,
            |  'ship_era',         v_era,   total,
            |  'tax_nonnegative',  v_tax,   total)
            |  AS (rule, violations, total)""".stripMargin))
        .withColumn("pass", (col("violations") === 0).cast("int"))
        .orderBy("rule")
    },
    "q_drift_ks" -> { (s, d) =>
      // Exact two-sample Kolmogorov–Smirnov distance over the doc-
      // length distribution (the nonparametric sibling of q_drift_psi;
      // same even/odd snapshot stand-ins). ENTIRELY integer:
      // D = max_v |F_A(v) − F_B(v)| = max |ca(v)·nB − cb(v)·nA| /
      // (nA·nB) — the numerator is the statistic in exact integer
      // units, ks_micro its ⌊1e6·⌋ scaling, so both engines agree
      // bit-for-bit with no float CDF drift. One shuffle (per-length
      // counts, partial-agged); the cumulative runs over |distinct
      // lengths| rows — the day-level-safe global-window argument of
      // q_running_distinct, not a corpus-sized sort. ks_micro divides
      // in DECIMAL(38,0) (DuckDB: HUGEINT) — BIGINT would wrap at
      // D·nA·nB·1e6 > 2^63, i.e. only ~3e6 docs per side.
      val lens = Tables.documents(s, d)
        .select((col("doc_id") % 2).as("snap"),
          size(split(col("text"), " ")).cast("long").as("v"))
      // checkpointed: the totals AND the cumulative window both read
      // it — |distinct lengths| rows, one corpus aggregation
      val byV = lens.groupBy("v").agg(
        sum(when(col("snap") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("snap") === 1, 1L).otherwise(0L)).as("b"))
        .localCheckpoint()
      // constant partition key (the q_running_distinct discipline):
      // bounded |distinct lengths| frame, no SinglePartition in-plan;
      // pmod(v,1)=0 — non-foldable, so Catalyst can't strip it the way
      // it strips a bare literal from a window partition spec
      val wv = Window.partitionBy(pmod(col("v"), lit(1)))
        .orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = byV.agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"))
      byV.select(col("v"), sum(col("a")).over(wv).as("ca"),
          sum(col("b")).over(wv).as("cb"))
        .crossJoin(broadcast(tot))
        .select(abs(col("ca") * col("n_b") - col("cb") * col("n_a"))
          .as("dev"), col("n_a"), col("n_b"))
        .groupBy(col("n_a"), col("n_b"))
        .agg(max(col("dev")).as("ks_num"))
        .select(col("n_a"), col("n_b"), col("ks_num"),
          expr("CAST((CAST(ks_num AS DECIMAL(38,0)) * 1000000) DIV " +
            "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
            .as("ks_micro"))
    },
    "q_quality_normalize" -> { (s, d) =>
      // Per-source CDF quantile transform of the doc-length quality
      // signal — the calibration pass that makes quality scores
      // comparable ACROSS sources before a global threshold (a web
      // crawl and a books corpus have incommensurable raw scores; their
      // percentiles are commensurable). pr_u = ⌊1e6·|{v' < v}| /
      // (n_src − 1)⌋, ties sharing their value's rank — exact integers
      // end to end. Scale shape: the rank is NEVER a per-doc sort —
      // value-level counts cumulate over |distinct lengths per source|
      // rows (the q_drift_ks bounded-frame discipline; both windows
      // share the source partitioning) and the per-doc ranks arrive by
      // broadcasting that value-level table back onto the corpus.
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          // per-doc side rides the SAME quantizer as the CDF side
          // (identity on integer lengths < 2^20) — the join contract
          cdfBin(col("n_chars")).as("n_chars"))
      calibJoin(docs)
        .select(col("doc_id"), col("source"), col("n_chars"),
          expr("below * 1000000 DIV greatest(n_src - 1, 1)").as("pr_u"))
        .orderBy("doc_id")
    })

  /** Bin count of the [[cdfBin]] quantizer — the hard ceiling on the
    * value-level calibration frame, per source. */
  private[graft] val CdfBins = 1 << 20

  /** Fixed-point quantizer for the calibration signal: clamp to
    * [0, CdfBins) after the integer cast. Identity on non-negative
    * integer signals below 2^20 (doc lengths: fixture max ~600, and
    * even book-length docs sit around 10^6 chars ≈ the cap), which is
    * what keeps the q_quality_normalize / q_curriculum oracles exact;
    * a CONTINUOUS quality score must be scaled to fixed point by the
    * caller (e.g. score·1e5 for a [0,10] score) and is then bounded by
    * construction. Consumers must join through the SAME quantizer —
    * exposed so the per-doc side and the CDF side cannot drift. */
  private[graft] def cdfBin(signal: Column): Column =
    least(greatest(signal.cast("long"), lit(0L)), lit(CdfBins - 1L))

  /** Broadcast ceiling for the calibration frame, in VALUE rows
    * (≈ 40 B each → ~10 MB, the sane broadcast envelope). Above it the
    * per-doc rank join routes SHUFFLE_HASH instead. */
  private[graft] val BroadcastCdfRows = 1L << 18

  /** Value-level per-source CDF of a quality signal, quantized through
    * [[cdfBin]]: (source, <signal name>, below = docs with a strictly
    * smaller quantized value, n_src) — the shared calibration pass of
    * q_quality_normalize and q_curriculum (one definition, so the
    * "same CDF" contract between them cannot drift). Checkpointed: the
    * two windows AND every downstream join read it — one corpus
    * aggregation. The quantizer bounds the frame at |source| × 2^20
    * rows BY CONSTRUCTION (VERDICT r13 #1): with a continuous double
    * signal, distinct raw values ≈ corpus size and the unquantized
    * broadcast (and the bounded-window claim) would collapse at
    * 100 TB. */
  private[queries] def sourceCdf(docs: DataFrame,
      signal: String = "n_chars"): DataFrame =
    sourceCdfParts(docs, signal)._2

  /** [[sourceCdf]] plus its pre-window checkpointed value frame, so
    * size probes (calibJoin) can count the materialized byV directly
    * instead of re-deriving the row count through the two window
    * projections (ADVICE r14: the windows are row-preserving, so the
    * counts are identical — but counting through them costs an extra
    * window pass per query build). */
  private[queries] def sourceCdfParts(docs: DataFrame,
      signal: String = "n_chars"): (DataFrame, DataFrame) = {
    val byV = docs.groupBy(col("source"), cdfBin(col(signal)).as(signal))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val below = Window.partitionBy(col("source")).orderBy(col(signal))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cdf = byV.select(col("source"), col(signal),
      coalesce(sum(col("c")).over(below), lit(0L)).as("below"),
      sum(col("c")).over(Window.partitionBy(col("source"))).as("n_src"))
    (byV, cdf)
  }

  /** The per-doc calibration join, SIZE-ROUTED (r14): the bin bound
    * makes the CDF frame finite, but 2^20 bins × many sources can
    * still outgrow a sane broadcast — e.g. 20 sources of continuous
    * scores ≈ 20M value rows ≈ hundreds of MB, which a forced
    * broadcast() would push to every executor (and through the
    * driver). The value frame is checkpointed, so its exact row count
    * is one cheap count(): ≤ [[BroadcastCdfRows]] broadcasts (the
    * fixture path — integer doc lengths are a few hundred rows),
    * above it the join is SHUFFLE_HASH with the vocab-sized CDF as
    * the build side (the dsirScores pin). Same rows either way. */
  private[queries] def calibJoin(docs: DataFrame,
      signal: String = "n_chars",
      broadcastRows: Long = BroadcastCdfRows): DataFrame = {
    val (byV, cdf) = sourceCdfParts(docs, signal)
    // size probe on the PRE-window checkpointed value frame: the two
    // window projections are row-preserving, so byV's count is cdf's —
    // and byV is already materialized (eager localCheckpoint), so the
    // probe is a cached-partition count, not a re-derivation
    val rows = byV.count()
    if (rows <= broadcastRows)
      docs.join(broadcast(cdf), Seq("source", signal))
    else
      docs.join(cdf.hint("shuffle_hash"), Seq("source", signal))
  }

  def oracle: Map[String, String] = Map(
    "q_drift_ks" ->
      """WITH lens AS (
        |  SELECT doc_id % 2 AS snap,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS v
        |  FROM documents),
        |byv AS (
        |  SELECT v,
        |         CAST(sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS a,
        |         CAST(sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS b
        |  FROM lens GROUP BY v),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n_a,
        |               CAST(sum(b) AS BIGINT) AS n_b FROM byv),
        |cum AS (
        |  SELECT CAST(sum(a) OVER w AS BIGINT) AS ca,
        |         CAST(sum(b) OVER w AS BIGINT) AS cb
        |  FROM byv
        |  WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING))
        |SELECT t.n_a, t.n_b,
        |       CAST(max(abs(c.ca * t.n_b - c.cb * t.n_a)) AS BIGINT)
        |         AS ks_num,
        |       CAST(CAST(max(abs(c.ca * t.n_b - c.cb * t.n_a))
        |                 AS HUGEINT) * 1000000
        |            // (CAST(t.n_a AS HUGEINT) * t.n_b)
        |            AS BIGINT) AS ks_micro
        |FROM cum c CROSS JOIN tot t
        |GROUP BY t.n_a, t.n_b""".stripMargin,
    "q_profile_outliers" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, quantile_cont(cents, 0.5) AS med
        |  FROM c GROUP BY 1),
        |dv AS (
        |  SELECT c.l_returnflag, abs(cents - med) AS dev, med
        |  FROM c JOIN m USING (l_returnflag)),
        |md AS (
        |  SELECT l_returnflag, quantile_cont(dev, 0.5) AS mad
        |  FROM dv GROUP BY 1)
        |SELECT dv.l_returnflag,
        |  count(*) AS n_rows,
        |  CAST(sum(CASE WHEN dev > 4.4478 * mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  round(min(med), 1) AS med_cents,
        |  round(min(mad), 1) AS mad_cents
        |FROM dv JOIN md USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_profile_stats" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS qty_nulls,
        |  count(DISTINCT l_returnflag) AS rf_distinct,
        |  count(DISTINCT l_suppkey) AS supp_distinct,
        |  CAST(floor(min(l_quantity) * 1000000) AS BIGINT) AS qty_min_u,
        |  CAST(floor(max(l_quantity) * 1000000) AS BIGINT) AS qty_max_u,
        |  CAST(floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    / count(*) * 1000000) AS BIGINT) AS qty_avg_u,
        |  CAST(floor(min(l_extendedprice) * 1000000) AS BIGINT) AS price_min_u,
        |  CAST(floor(max(l_extendedprice) * 1000000) AS BIGINT) AS price_max_u,
        |  min(year(l_shipdate)) AS ship_year_min,
        |  max(year(l_shipdate)) AS ship_year_max
        |FROM lineitem""".stripMargin,
    "q_profile_histogram" ->
      """WITH b AS (SELECT min(l_extendedprice) AS lo,
        |                  max(l_extendedprice) AS hi FROM lineitem)
        |SELECT CAST(least(9, floor((l_extendedprice - lo) * 10.0 /
        |         (hi - lo))) AS BIGINT) AS bucket,
        |  count(*) AS cnt,
        |  CAST(floor(min(l_extendedprice) * 1000000) AS BIGINT)
        |    AS seen_min_u,
        |  CAST(floor(max(l_extendedprice) * 1000000) AS BIGINT)
        |    AS seen_max_u
        |FROM lineitem, b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_drift_psi" ->
      """WITH t AS (
        |  SELECT doc_id % 2 AS snap, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (
        |  SELECT token,
        |    CAST(sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM t WHERE token <> '' GROUP BY token),
        |s AS (
        |  SELECT CAST(sum(ca) AS DOUBLE) AS na,
        |         CAST(sum(cb) AS DOUBLE) AS nb,
        |         CAST(count(*) AS DOUBLE) AS v
        |  FROM c)
        |SELECT token, ca, cb,
        |  CAST(floor(1e6 * (CAST(ca + 1 AS DOUBLE) / (na + v)
        |                    - CAST(cb + 1 AS DOUBLE) / (nb + v))
        |    * ln((CAST(ca + 1 AS DOUBLE) / (na + v))
        |         / (CAST(cb + 1 AS DOUBLE) / (nb + v)))) AS BIGINT)
        |    AS psi_u
        |FROM c, s ORDER BY token""".stripMargin,
    "q_drift_psi_binned" -> {
      // the bin expression is generated from the SAME Bounds constant
      // the Spark plan uses — one source of truth for the boundaries
      val binSql = graft.streaming.DriftStats.Bounds
        .map(b => s"(CASE WHEN value >= $b THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH t AS (
        |  SELECT event_id % 2 AS snap, CAST($binSql AS BIGINT) AS bin
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT bin,
        |    CAST(sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM t GROUP BY bin),
        |s AS (
        |  SELECT CAST(sum(ca) AS DOUBLE) AS na,
        |         CAST(sum(cb) AS DOUBLE) AS nb,
        |         CAST(count(*) AS DOUBLE) AS v
        |  FROM c)
        |SELECT bin, ca, cb,
        |  CAST(floor(1e6 * (CAST(ca + 1 AS DOUBLE) / (na + v)
        |                    - CAST(cb + 1 AS DOUBLE) / (nb + v))
        |    * ln((CAST(ca + 1 AS DOUBLE) / (na + v))
        |         / (CAST(cb + 1 AS DOUBLE) / (nb + v)))) AS BIGINT)
        |    AS psi_u
        |FROM c, s ORDER BY bin""".stripMargin
    },
    "q_expectations" ->
      """WITH a AS (SELECT count(*) AS total,
        |  CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1
        |    ELSE 0 END) AS BIGINT) AS v_qty,
        |  CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1) THEN 1
        |    ELSE 0 END) AS BIGINT) AS v_disc,
        |  CAST(sum(CASE WHEN NOT (l_tax >= 0) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS v_tax,
        |  CAST(sum(CASE WHEN NOT (l_returnflag IN ('A','N','R')) THEN 1
        |    ELSE 0 END) AS BIGINT) AS v_rf,
        |  CAST(sum(CASE WHEN NOT (l_extendedprice > 0) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS v_price,
        |  CAST(sum(CASE WHEN NOT (year(l_shipdate) BETWEEN 1992 AND 1998)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS v_era
        |  FROM lineitem)
        |SELECT rule, violations, total,
        |  CASE WHEN violations = 0 THEN 1 ELSE 0 END AS pass
        |FROM (
        |  SELECT 'discount_range' AS rule, v_disc AS violations, total FROM a
        |  UNION ALL SELECT 'price_positive', v_price, total FROM a
        |  UNION ALL SELECT 'quantity_range', v_qty, total FROM a
        |  UNION ALL SELECT 'returnflag_domain', v_rf, total FROM a
        |  UNION ALL SELECT 'ship_era', v_era, total FROM a
        |  UNION ALL SELECT 'tax_nonnegative', v_tax, total FROM a)
        |ORDER BY rule""".stripMargin,
    "q_quality_normalize" ->
      // docs mirrors the engine's cdfBin quantizer (clamp to [0, 2^20))
      // so both sides share it — identity on fixture lengths, but a
      // book-scale n_chars >= 2^20 must not drift engine vs oracle
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    least(greatest(CAST(n_chars AS BIGINT), 0), 1048575)
        |      AS n_chars
        |  FROM documents),
        |byv AS (
        |  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
        |  FROM docs GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, n_chars,
        |    CAST(coalesce(sum(c) OVER (PARTITION BY source
        |      ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below,
        |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n_src
        |  FROM byv)
        |SELECT d.doc_id, d.source, d.n_chars,
        |       below * 1000000 // greatest(n_src - 1, 1) AS pr_u
        |FROM docs d JOIN cum USING (source, n_chars)
        |ORDER BY doc_id""".stripMargin)
}
