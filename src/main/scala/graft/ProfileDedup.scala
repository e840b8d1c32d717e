package graft

import org.apache.spark.sql.functions._

/** Developer tool: measure what ppjoin prefix filtering buys on a
  * boilerplate-heavy (hot-shingle) corpus — the naive inverted index's
  * 100 TB failure mode.
  *
  * Plants `nDocs` documents that all share a 12-token boilerplate block
  * (every boilerplate shingle has df = nDocs — maximally hot) plus a
  * unique tail, with a true near-duplicate partner for each doc in the
  * first half. Prints candidate-pair counts and wall times for
  * [[graft.operators.SetSimJoin.candidatesAll]] vs `candidatesPrefix`,
  * and asserts the verified edge sets are IDENTICAL (prefix filtering is
  * exact, not approximate).
  *
  * `java -cp classes:spark-jars graft.ProfileDedup [nDocs]`
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
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

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$what ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.operators.SetSimJoin
    val nAll = timed("candidatesAll")(SetSimJoin.candidatesAll(docs).count())
    val nPre = timed("candidatesPrefix")(
      SetSimJoin.candidatesPrefix(docs, 1, 2).count())
    val edgesAll = SetSimJoin
      .verify(SetSimJoin.candidatesAll(docs), docs, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val edgesPre = SetSimJoin
      .verify(SetSimJoin.candidatesPrefix(docs, 1, 2), docs, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    require(edgesAll == edgesPre,
      s"edge sets diverge: ${edgesAll.size} vs ${edgesPre.size}")
    println(s"""{"nDocs":$nDocs,"candidates_all":$nAll,""" +
      s""""candidates_prefix":$nPre,"reduction":${nAll.toDouble / nPre},""" +
      s""""edges":${edgesAll.size},"edges_identical":true}""")
    spark.stop()
  }
}
