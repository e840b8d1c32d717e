package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.{BlockClient, BlockClientFactory, BlockData}

/** A LIVE-reorg chain client: unlike SimChainClient (whose reorg
  * schedule is baked into every fetch), the identity served for blocks
  * 28-30 CHANGES when the shared head crosses 30 — gen-0 ids before,
  * `_r1` after. Head advances 7 per driver poll; state is keyed by the
  * `statekey` option so concurrent streams don't share a chain. The
  * fetch log records the head at each data fetch, letting the spec
  * prove the reorg really happened mid-stream (non-vacuity). */
class LiveReorgClientFactory extends BlockClientFactory {
  override def create(o: Map[String, String]): BlockClient = {
    val st = LiveReorgChain.state(o.getOrElse("statekey", "default"))
    new BlockClient {
      override def headBlock(): Long =
        st.head.updateAndGet(h => math.min(h + 7, 65))
      override def blocks(from: Long, until: Long): Iterator[BlockData] = {
        val h = st.head.get()
        st.fetchLog.add((h, from, until))
        (from until math.min(until, 61)).iterator.map { n =>
          val id = if (h >= 30 && n > 27 && n <= 30) s"0xb${n}_r1" else s"0xb$n"
          BlockData(n, id, Array[Byte](n.toByte))
        }
      }
    }
  }
}

object LiveReorgChain {
  final class State {
    val head = new AtomicLong(0L)
    val fetchLog = new ConcurrentLinkedQueue[(Long, Long, Long)]()
  }
  private val states = new java.util.concurrent.ConcurrentHashMap[String, State]()
  def state(key: String): State =
    states.computeIfAbsent(key, _ => new State)
}

/** SURVEY §7.4.4: session windows + the source-side undo buffer. A
  * reorg re-mines blocks that land INSIDE a session window that is
  * already open (earlier blocks of the session were ingested in earlier
  * micro-batches). With confirmations K ≥ reorg depth, the finality lag
  * guarantees the re-mined blocks are only ever FETCHED after the reorg
  * — the open session closes over canonical identities only, and the
  * stateful query graph never needs a retraction. The K=0 control run
  * shows the failure the buffer prevents: a torn session with an
  * orphaned pre-reorg identity baked in. */
class SessionUndoSpec extends SparkSuite {

  private val fmt = "graft.sources.BlockStreamProvider"

  /** Event time: block n at minute n + 10·⌊n/20⌋ — consecutive blocks
    * are 1 min apart, with an 11-min jump before blocks 20, 40, 60, so
    * a 5-min gap splits the chain into sessions 1-19, 20-39, 40-59, 60.
    * The reorg region 28-30 sits mid-session-2. */
  private def sessionAgg(statekey: String, confirmations: Int) =
    spark.readStream.format(fmt)
      .option("client", classOf[LiveReorgClientFactory].getName)
      .option("statekey", statekey)
      .option("confirmations", confirmations.toString)
      .load()
      .withColumn("ts", timestamp_seconds(lit(1700000000L) +
        (col("block_number") + lit(10) * floor(col("block_number") / 20)) * 60))
      // Spark rejects a GLOBAL session-window aggregate in streaming;
      // the chain id is the natural (single-valued) session key here
      .withColumn("chain", lit("main"))
      .groupBy(col("chain"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("block_id").endsWith("_r1"), 1L).otherwise(0L)).as("n_r1"),
        min("block_number").as("lo"), max("block_number").as("hi"))

  private def runToCompletion(name: String, statekey: String,
      confirmations: Int): Seq[(Long, Long, Long, Long)] = {
    val q = sessionAgg(statekey, confirmations)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      val deadline = System.currentTimeMillis() + 120000
      def total: Long = spark.table(name).agg(coalesce(sum("n"), lit(0L)))
        .head().getLong(0)
      while (total < 60 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(total == 60, s"stream stalled: ingested $total of 60 blocks")
    } finally q.stop()
    spark.table(name).select("lo", "hi", "n", "n_r1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
  }

  test("a reorg inside an open session window never reaches the query " +
      "graph when confirmations >= depth (SURVEY §7.4.4)") {
    val sessions = runToCompletion("sess_k5", "k5", confirmations = 5)
    // session boundaries and counts: the reorg created no duplicates,
    // no gaps, no session splits
    assert(sessions.map(s => (s._1, s._2, s._3)) ==
      Seq((1L, 19L, 19L), (20L, 39L, 20L), (40L, 59L, 20L), (60L, 60L, 1L)))
    // the session the reorg struck holds exactly the 3 canonical
    // re-mined identities; every other session is reorg-free
    assert(sessions.map(_._4) == Seq(0L, 3L, 0L, 0L),
      s"canonical identities wrong: $sessions")
    // non-vacuity: session 2 was OPEN before the reorg — some fetch at
    // head < 30 already delivered blocks >= 20 (they entered the agg
    // state in an earlier micro-batch), and fetches continued after
    val log = LiveReorgChain.state("k5").fetchLog.asScala.toSeq
    assert(log.exists { case (h, _, until) => h < 30 && until > 20 },
      s"session 2 never open pre-reorg — fixture degenerated: $log")
    assert(log.exists { case (h, _, _) => h >= 30 }, "no post-reorg fetch")
  }

  test("control: with no confirmation lag the same chain tears the " +
      "session — an orphaned pre-reorg identity is baked into state") {
    val sessions = runToCompletion("sess_k0", "k0", confirmations = 0)
    // still 60 blocks (offsets are monotone — nothing re-fetched), but
    // block 28 was fetched at head 28, BEFORE the reorg re-mined it:
    // its orphaned gen-0 identity is permanently in the session state,
    // and only 29-30 carry canonical _r1 ids. This is the corruption
    // the source-side buffer exists to prevent; the reference hard-
    // errors in this situation (sinker.go:142-148).
    assert(sessions.map(_._3).sum == 60)
    val session2 = sessions.find(_._1 == 20L).get
    assert(session2._4 == 2L,
      s"expected the torn session (2 of 3 canonical ids), got: $sessions")
  }
}
