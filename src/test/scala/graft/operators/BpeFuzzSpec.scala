package graft.operators

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite
import graft.functions.BpeRanks

/** Adversarial fuzz for the BPE training/encode equivalences. Random
  * corpora over a TINY alphabet maximize exactly the cases the
  * exact-batching proof (Bpe.selectBatch) and the ascending-rank encode
  * guard have to survive: constant count ties, shared symbols between
  * head pairs, and concatenations colliding with live symbols. */
class BpeFuzzSpec extends SparkSuite {

  private def randomWords(seed: Int): Map[String, Long] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = "abc"
    val n = 5 + rnd.nextInt(20)
    (1 to n).map { _ =>
      val len = 1 + rnd.nextInt(6)
      val w = (1 to len).map(_ => alphabet(rnd.nextInt(3))).mkString
      w -> (1L + rnd.nextInt(20))
    }.toMap // map collapses dup words — fine, it's a weighted vocab
  }

  test("incremental local trainer ≡ naive reference on 40 random corpora") {
    (1 to 40).foreach { seed =>
      val words = randomWords(seed)
      val fast = Bpe.trainLocalFast(words, nMerges = 12)
      val ref = Bpe.trainLocal(words, nMerges = 12)
      assert(fast == ref, s"seed $seed diverged:\nfast=$fast\nref =$ref")
    }
  }

  test("batched distributed trainer ≡ naive reference on random corpora") {
    import spark.implicits._
    (1 to 8).foreach { seed =>
      val words = randomWords(seed * 31)
      val docs = words.toSeq
        .map { case (w, f) => Seq.fill(f.toInt)(w).mkString(" ") }
        .toDF("text")
      val dist = Bpe.trainDistributed(docs, nMerges = 10)
        .as[(Int, String, String, Long)].collect().toSeq
      val ref = Bpe.trainLocal(words, nMerges = 10)
      assert(dist == ref, s"seed $seed diverged:\ndist=$dist\nref =$ref")
    }
  }

  test("encode kernel ≡ in-rank-order apply under learned tiny-alphabet " +
      "merges (collision-heavy)") {
    (1 to 30).foreach { seed =>
      val words = randomWords(seed * 7 + 3)
      // learned merges over 'aaab'-ish corpora concatenate into symbols
      // like "aa"/"ab" that later merges can collide with — the exact
      // case the kernel's `> lastRank` guard exists for
      val merges = Bpe.trainLocal(words, nMerges = 8)
        .map { case (_, l, r, _) => (l, r) }
      val chars = words.keys.flatMap(BpeRanks.codePoints(_)).toSeq
        .distinct.sorted
      val model = new BpeRanks(merges.toArray, chars.toArray)
      words.keys.foreach { w =>
        val viaKernel = {
          val arr = model.encodeTokens(UTF8String.fromString(w))
          (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
        }
        val ref = Bpe.encodeWordLocal(w, merges)
        assert(viaKernel == ref,
          s"seed $seed word '$w': kernel=$viaKernel ref=$ref")
      }
    }
  }

  test("decode kernel inverts encode on collision-heavy learned vocabs") {
    (1 to 30).foreach { seed =>
      val words = randomWords(seed * 13 + 5)
      val merges = Bpe.trainLocal(words, nMerges = 8)
        .map { case (_, l, r, _) => (l, r) }
      val chars = words.keys.flatMap(BpeRanks.codePoints(_)).toSeq
        .distinct.sorted
      val model = new BpeRanks(merges.toArray, chars.toArray)
      words.keys.foreach { w =>
        // even when a merge output collides with an existing token (the
        // first-wins id rule), the surviving id must decode back to the
        // same string — so decode(encode(w)) == w always holds per word
        val ids = model.encodeIds(UTF8String.fromString(w))
        val back = model.decodeIds(ids).toString
        assert(back == w, s"seed $seed word '$w' decoded to '$back'")
      }
    }
  }
}
