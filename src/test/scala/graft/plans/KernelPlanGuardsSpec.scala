package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenFallback, GenerateMutableProjection}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, HashJoin}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}

import graft.SparkSuite
import graft.operators.{Pq, SemDedup}

/** Regression guards for the round-8 profile findings, promoted to
  * named tests (the r6 dedup sweep got this treatment; this is the ANN
  * sweep's turn):
  *  1. SemDedup must never build a hash table on the candidate-pair
  *     frame (the first cut did; 31 s → 5.6 s at 50k when fixed);
  *  2. the quantization/tokenizer kernels must take the codegen path —
  *     an interpreted fallback (CodegenFallback, or doGenCode emitting
  *     uncompilable Java) is the 5.5k-vec/s regression resurfacing.
  */
class KernelPlanGuardsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Plans are inspected with AQE off so join strategy and build sides
    * are fixed at planning time (the guards constrain the static shape;
    * AQE only ever narrows exchanges at runtime). */
  private def withStaticPlan[A](f: => A): A = {
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  /** A hash-join build side is scale-safe iff every path to a join
    * below it passes through an aggregation first (aggregates collapse
    * candidate volume to group-sized state; a build directly on a join
    * output holds the un-collapsed pair frame in executor memory). */
  private def buildIsSafe(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true
    case _: BaseJoinExec => false
    case other => other.children.forall(buildIsSafe)
  }

  test("SemDedup: no hash build on the candidate-pair frame") {
    withStaticPlan {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val df = SemDedup.semDedup(emb, k = 8, iters = 1, tau = 0.4)
      val plan = df.queryExecution.executedPlan
      val hashJoins = plan.collect { case j: HashJoin => j }
      assert(hashJoins.nonEmpty, "expected hash joins in the dedup plan")
      hashJoins.foreach { j =>
        val build = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
        }
        assert(buildIsSafe(build),
          s"hash build on an un-aggregated join output:\n${j.treeString}")
      }
      // and nothing fell back to a nested-loop join
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      }.isEmpty, "nested-loop join in the SemDedup plan")
    }
  }

  private def wholeStageCovers(df: DataFrame, kernel: String): Boolean =
    df.queryExecution.executedPlan
      .collect { case w: WholeStageCodegenExec => w }
      .exists(_.treeString.contains(kernel))

  test("PQ encode and BPE encode kernels run inside whole-stage codegen") {
    withStaticPlan {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val model = Pq.train(emb, m = 8, k = 4, iters = 1)
      assert(wholeStageCovers(Pq.encode(emb, model), "pq_codes"),
        "pq_codes left the whole-stage codegen span")
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val merges = graft.operators.Bpe.train(docs, nMerges = 4)
      val bpe = graft.operators.Bpe.rankModel(merges, docs)
      assert(wholeStageCovers(
        graft.operators.Bpe.encodeIds(docs, bpe), "bpe_encode"),
        "bpe_encode left the whole-stage codegen span")
    }
  }

  test("kernels are not CodegenFallback and their generated Java compiles") {
    import graft.functions._
    // static: none of the hot-path kernels may regress to CodegenFallback
    val fallback = classOf[CodegenFallback]
    assert(!fallback.isAssignableFrom(classOf[PqCodes]))
    assert(!fallback.isAssignableFrom(classOf[NearestCells]))
    assert(!fallback.isAssignableFrom(classOf[AdcScore]))
    assert(!fallback.isAssignableFrom(classOf[BpeEncode]))
    assert(!fallback.isAssignableFrom(classOf[ProjectVector]))
    // dynamic: doGenCode's Java must COMPILE (Janino) and agree with
    // the interpreted eval — GenerateMutableProjection throws on bad
    // codegen, which is exactly the regression this test pins
    val cb = Array[Float](0f, 0f, 1f, 1f, 5f, 5f, 9f, 9f)
    val vec = Literal.create(Seq(0.1f, 0.1f, 8.9f, 9.2f),
      ArrayType(FloatType))
    val pq = PqCodes(vec, cb, m = 2, k = 2, sub = 2)
    val cents = Array[Float](1f, 0f, 0f, 1f, 0.5f, 0.5f)
    val nc = NearestCells(Literal.create(Seq(1f, 0f), ArrayType(FloatType)),
      cents, k = 3, dim = 2, p = 2)
    val adc = AdcScore(
      Literal.create(Seq(1, 0), ArrayType(IntegerType)),
      Literal.create(Seq(Seq(10.0, 20.0), Seq(30.0, 40.0)),
        ArrayType(ArrayType(DoubleType))))
    val bpe = BpeEncode(
      Literal.create("aa ab", org.apache.spark.sql.types.StringType),
      new BpeRanks(Array(("a", "a")), Array("a", "b")), emitIds = true)
    // PCA projection: identity components, mean (0.5, 0.5) → x − μ
    val pca = ProjectVector(
      Literal.create(Seq(1.0f, 2.0f), ArrayType(FloatType)),
      mean = Array(0.5, 0.5), components = Array(1f, 0f, 0f, 1f),
      dim = 2, kOut = 2)
    val proj = GenerateMutableProjection.generate(Seq(pq, nc, adc, bpe, pca))
    val row = proj(org.apache.spark.sql.catalyst.InternalRow.empty)
    assert(row.getArray(0).toIntArray().toSeq == Seq(0, 1))
    assert(row.getArray(1).toIntArray().toSeq == Seq(0, 2))
    assert(row.getDouble(2) == 50.0)
    // "aa ab" with merge (a,a): word "aa" → [aa] (id 2), "ab" → [a, b]
    assert(row.getArray(3).toIntArray().toSeq == Seq(2, 0, 1))
    assert(row.getArray(4).toFloatArray().toSeq == Seq(0.5f, 1.5f))
  }
}
