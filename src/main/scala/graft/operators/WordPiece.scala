package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{WordPieceExpressions, WordPieceVocab}

/** WordPiece tokenizer (Schuster & Nakajima 2012; BERT's tokenizer) —
  * completes the production tokenizer triad beside [[Bpe]] and
  * [[Unigram]]. The kernel lives in
  * [[graft.functions.WordPieceEncode]]; this object owns model
  * construction, the corpus-level encode/decode, persistence, and the
  * single-threaded reference the spec pins against.
  *
  * Vocabulary: the standard production shape is greedy longest-match
  * inference over a subword inventory learned by a likelihood trainer;
  * we derive the inventory from [[Bpe.train]]'s merge table (base
  * charset + merge outputs — exactly the subwords BPE training decided
  * were worth a dictionary slot), deduplicated and UTF-8-sorted so the
  * id numbering is a pure function of the trained pieces. Training is
  * thus ONE corpus-sized shuffle (the weighted word vocabulary) and the
  * encode is map-only — the same 100 TB shape as the other two
  * families.
  */
object WordPiece {

  /** Piece inventory from a trained BPE model: base chars ∪ merge
    * concatenations, deduped, UTF-8-sorted. Model-sized driver work. */
  def fromBpe(bpe: graft.functions.BpeRanks,
      maxWordChars: Int = 200): WordPieceVocab = {
    val set = new scala.collection.mutable.HashSet[String]
    bpe.baseChars.foreach(set += _)
    bpe.merges.foreach { case (l, r) => set += (l + r) }
    new WordPieceVocab(set.toArray.sortWith(Bpe.utf8Less), maxWordChars)
  }

  /** Learn a WordPiece vocabulary from the corpus: BPE merge training
    * supplies the subword inventory (`nMerges` merges ⇒ ≤ charset +
    * nMerges pieces), [[fromBpe]] shapes it. */
  def train(docs: DataFrame, nMerges: Int,
      maxWordChars: Int = 200): WordPieceVocab = {
    val merges = Bpe.train(docs, nMerges)
    fromBpe(Bpe.rankModel(merges, docs), maxWordChars)
  }

  /** Corpus → (doc_id, ids ARRAY<INT>): map-only, one codegen'd kernel
    * call per row — no shuffle, no broadcast join (model state rides
    * the codegen references array). */
  def encodeIds(docs: DataFrame, model: WordPieceVocab): DataFrame =
    docs.select(col("doc_id"),
      WordPieceExpressions.encodeIds(col("text"), model).as("ids"))

  /** (doc_id, ids) → (doc_id, text): decode(encode(w)) == w for
    * UNK-free words; document-level round-trip is the space-stripped
    * text (ids carry no word boundaries — same contract as BPE). */
  def decodeIds(encoded: DataFrame, model: WordPieceVocab): DataFrame =
    encoded.select(col("doc_id"),
      WordPieceExpressions.decodeIds(col("ids"), model).as("text"))

  /** Naive reference munch — WordPieceSpec pins the kernel against it
    * bit-for-bit. Deliberately structured differently from the kernel
    * (substring scans over a Set, no cache, no cp-prefix concat). */
  private[operators] def encodeWordLocal(w: String,
      model: WordPieceVocab): Seq[Int] = {
    val vocab = model.pieces.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    val cps = graft.functions.BpeRanks.codePoints(w)
    if (cps.length > model.maxWordChars) return Seq(model.unkId)
    var start = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (start < cps.length) {
      val candidates = (start + 1 to cps.length).reverse.iterator
        .map(end => (end, cps.slice(start, end).mkString))
        .collectFirst { case (end, s) if vocab.contains(s) => (end, vocab(s)) }
      candidates match {
        case None => return Seq(model.unkId)
        case Some((end, id)) =>
          out += (if (start == 0) id else id + model.pieces.length)
          start = end
      }
    }
    out.toSeq
  }

  /** Persist the piece table — one small parquet, the `tokenize` CLI
    * layout (dir detection key: `$dir/wordpiece`). */
  def writeModel(model: WordPieceVocab,
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import spark.implicits._
    model.pieces.toSeq.zipWithIndex.map { case (p, i) => (i + 1, p) }
      .toDF("id", "piece")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/wordpiece")
    Seq((model.maxWordChars))
      .toDF("max_word_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/wordpiece_params")
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): WordPieceVocab = {
    import spark.implicits._
    val pieces = spark.read.parquet(s"$dir/wordpiece")
      .orderBy("id").select("piece").as[String].collect()
    val maxChars = spark.read.parquet(s"$dir/wordpiece_params")
      .select("max_word_chars").as[Int].head()
    new WordPieceVocab(pieces, maxChars)
  }
}
