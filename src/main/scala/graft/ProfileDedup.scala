package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Developer tool: the dedup-cascade scale story, measured.
  *
  * Two modes:
  *
  * `ProfileDedup [nDocs]` — the original planted-boilerplate check:
  * candidate counts for naive vs prefix-filtered generation on a corpus
  * where EVERY doc shares a hot 12-shingle block, plus the assertion
  * that the verified edge sets are IDENTICAL (prefix filtering is exact,
  * not approximate).
  *
  * `ProfileDedup sweep <clean|boiler> <nDocs> <naive|ppjoin|lsh>` — one
  * (corpus, size, variant) measurement per invocation (fresh JVM = GC
  * and page-cache isolation, same discipline as BenchOne), printing one
  * JSON line: candidate-pair count, verified-edge count, and wall times
  * for the candidate and verify phases. The driver for VERDICT r5 #5:
  * measured crossover points for naive vs ppjoin vs LSH go to PLANS.md.
  *
  * Corpus model (generated ON the executors — nothing driver-side, so
  * 5M-doc corpora are fine):
  *  - docs come in groups of 4 sharing 20 unique "content" elements;
  *    doc 1 of each group mutates 2 of them — a planted near-duplicate
  *    of doc 0 (J ≈ 0.82 clean / 0.88 boiler, ≥ 0.5 either way); docs
  *    2-3 mutate 10 — planted NON-duplicates (J < 0.5);
  *  - `boiler` adds 12 GLOBAL shingles to every doc (df = n, the cookie
  *    banner / nav-chrome shape): every pair of docs becomes a naive
  *    candidate, the quadratic term prefix filtering exists to kill.
  */
object ProfileDedup {

  /** (doc_id, n, sset) — set-shaped corpus, executor-generated. */
  def corpus(spark: SparkSession, kind: String, nDocs: Long): DataFrame = {
    import spark.implicits._
    val boiler = kind == "boiler"
    spark.range(0L, nDocs).map { i =>
      val g = i - (i % 4)
      val mutations = (i % 4) match {
        case 0 => 0
        case 1 => 2  // near-dup of doc g (J >= 0.5)
        case _ => 10 // shares a prefix of content, but J < 0.5
      }
      val content = (0 until 20).map { j =>
        if (j < mutations) s"m${i}_$j" else s"u${g}_$j"
      }
      val sset =
        (if (boiler) (0 until 12).map(b => s"BOILER_$b") else Seq.empty) ++
          content
      (i, sset.size, sset.toArray)
    }.toDF("doc_id", "n", "sset")
      .repartition(col("doc_id"))
  }

  /** LSH banding candidates — delegates to the shared
    * [[graft.operators.Lsh.bandCandidates]] (validation + join pins
    * included), so the sweep measures the production plan. 8 bands ×
    * 4 rows is the cheap default; 16 × 2 the near-threshold-recall
    * configuration (see Llm.lshCascade). */
  def lshCandidates(docs: DataFrame, nBands: Int = 8): DataFrame =
    graft.operators.Lsh.bandCandidates(docs, nBands)

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("sweep") =>
      val kind = args(1)
      val nDocs = args(2).toLong
      val variant = args(3)
      val spark = Sessions.get("profile-dedup-sweep")
      val docs = corpus(spark, kind, nDocs).localCheckpoint() // corpus
      // generation off every clock (localCheckpoint is eager)
      import graft.operators.SetSimJoin
      val (cands, edges, tCand, tVerify) = variant match {
        case "naive" =>
          val c = SetSimJoin.candidatesAll(docs)
          val (nc, tc) = timed(c.count())
          val (ne, tv) = timed(SetSimJoin.verify(c, docs, 1, 2).count())
          (nc, ne, tc, tv)
        case "ppjoin" =>
          val (nc, tc) = timed(SetSimJoin.candidatesPrefix(docs, 1, 2).count())
          // edges() re-derives its candidates internally — tVerify is the
          // fused end-to-end minus nothing; report it as the total phase
          val (ne, tv) = timed(SetSimJoin.edges(docs, 1, 2).count())
          (nc, ne, tc, tv)
        case "lsh" | "lsh16" =>
          val c = lshCandidates(docs, if (variant == "lsh16") 16 else 8)
          val (nc, tc) = timed(c.count())
          val (ne, tv) = timed(SetSimJoin.verify(c, docs, 1, 2).count())
          (nc, ne, tc, tv)
        case other => throw new IllegalArgumentException(other)
      }
      println(s"""{"sweep":{"kind":"$kind","n_docs":$nDocs,""" +
        s""""variant":"$variant","candidates":$cands,"edges":$edges,""" +
        s""""cand_sec":${f"$tCand%.2f"},"verify_sec":${f"$tVerify%.2f"}}}""")
      spark.stop()

    case Some("route") =>
      // router validation cell: profile → decision, then BOTH exact
      // variants timed so the pick can be judged against measurement
      val kind = args(1)
      val nDocs = args(2).toLong
      val spark = Sessions.get("profile-dedup-route")
      val docs = corpus(spark, kind, nDocs).localCheckpoint()
      import graft.operators.SetSimJoin
      val (prof, tProf) = timed(SetSimJoin.dfProfile(docs))
      val hot = prof.hot(8)
      val (nRouted, tRouted) =
        timed(SetSimJoin.edgesAuto(docs, 1, 2).count())
      val (nP, tP) = timed(SetSimJoin.edges(docs, 1, 2).count())
      // naive on a hot corpus is the proven n²/2 detonation — report
      // the closed-form candidate count instead of burning the host
      val (nN, tN) =
        if (hot && nDocs > 5000) (-1L, -1.0)
        else timed(SetSimJoin.edgesNaive(docs, 1, 2).count())
      require(nRouted == nP && (nN < 0 || nN == nRouted),
        s"variant edge counts diverge: routed=$nRouted ppjoin=$nP naive=$nN")
      println(s"""{"route":{"kind":"$kind","n_docs":$nDocs,""" +
        s""""volume":${prof.volume},"naive_cands":${prof.naiveCandidates},""" +
        s""""max_df":${prof.maxDf},"picked":"${if (hot) "ppjoin" else "naive"}",""" +
        s""""profile_sec":${f"$tProf%.2f"},"routed_sec":${f"$tRouted%.2f"},""" +
        s""""ppjoin_sec":${f"$tP%.2f"},"naive_sec":${f"$tN%.2f"},""" +
        s""""edges":$nRouted}}""")
      spark.stop()

    case _ =>
      // original planted-boilerplate identity check
      val spark = Sessions.get("profile-dedup")
      import spark.implicits._
      val nDocs = args.headOption.map(_.toInt).getOrElse(2000)
      val half = nDocs / 2
      val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")
      def uniq(i: Int) = (1 to 20).map(j => s"u${i}_$j").mkString(" ")
      val texts = (0 until half).map(i => (i.toLong, s"$boiler ${uniq(i)}")) ++
        (0 until half).map { i => // near-dup partner: one tail token changed
          val t = s"$boiler ${uniq(i)}".split(" "); t(20) = "CHANGED"
          ((i + half).toLong, t.mkString(" "))
        }
      val docs = texts.toDF("doc_id", "text")
        .select(col("doc_id"), array_distinct(
          graft.functions.TextFunctions.shingles3(col("text"))).as("sset"))
        .select(col("doc_id"), size(col("sset")).as("n"), col("sset"))
        .localCheckpoint() // shingle cost off both clocks
      def t[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"$what ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      import graft.operators.SetSimJoin
      val nAll = t("candidatesAll")(SetSimJoin.candidatesAll(docs).count())
      val nPre = t("candidatesPrefix")(
        SetSimJoin.candidatesPrefix(docs, 1, 2).count())
      val edgesAll = SetSimJoin
        .verify(SetSimJoin.candidatesAll(docs), docs, 1, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val edgesPre = SetSimJoin.edges(docs, 1, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      require(edgesAll == edgesPre,
        s"edge sets diverge: ${edgesAll.size} vs ${edgesPre.size}")
      println(s"""{"nDocs":$nDocs,"candidates_all":$nAll,""" +
        s""""candidates_prefix":$nPre,"reduction":${nAll.toDouble / nPre},""" +
        s""""edges":${edgesAll.size},"edges_identical":true}""")
      spark.stop()
  }
}
