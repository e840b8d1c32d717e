package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BqHamming, FloatVectorDot, MinHashSignature, UnicodeNormalize}

/** SparkSessionExtensions entry point:
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Registers the engine's custom expressions into the SQL function
  * registry, so `spark.sql("SELECT vec_dot(a, b) ...")` works alongside
  * the Column DSL (graft.functions.Vectors.dot).
  *
  * Deliberately NO custom optimizer rules or strategies: the reference
  * has no optimizer surface to reproduce (SURVEY.md §4.1), and every
  * declared operator plans well on stock Catalyst (PLANS.md). This class
  * is the seam where a `injectOptimizerRule` / `injectPlannerStrategy`
  * would go if a future operator needs one.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot(a, b) takes two arguments")
        FloatVectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "minhash_sig(shingles, nPerm) takes two arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"nPerm must be an integer literal, got $other")
        }
        MinHashSignature(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bq_hamming"),
      new ExpressionInfo(classOf[BqHamming].getName, "bq_hamming"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "bq_hamming(codeA, codeB) takes two BINARY arguments")
        BqHamming(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName,
        "unicode_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "unicode_normalize(str, 'NFC'|'NFD'|'NFKC'|'NFKD')")
        val form = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"form must be a string literal, got $other")
        }
        UnicodeNormalize(children.head, form)
      }))
  }
}
