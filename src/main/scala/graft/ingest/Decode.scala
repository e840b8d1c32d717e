package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

import ProtoSchema._

/** proto_decode(payload) — a Catalyst Expression turning raw protobuf
  * bytes into a typed struct per the ProtoSchema mapping; the engine's
  * replacement for the reference's per-block dynamicpb decode
  * (converter_proto.go:53-61). spark-protobuf's from_protobuf is the
  * preferred built-in (SURVEY.md §7.3) but is not on this classpath, so
  * this is the documented fallback: a custom Expression, which keeps the
  * decode inside the executor task (no UDF serialization overhead, null
  * in → null out for the reference's nil-output guard, sinker.go:158-160).
  */
final case class ProtoDecodeExpression(child: Expression, schema: PMessage,
    lenient: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ProtoSchema.toStructType(schema)
  override def nullable: Boolean = true
  override def prettyName: String = "proto_decode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"proto_decode needs BINARY input, got ${child.dataType.sql}")
  }

  /** Strict mode (default) surfaces malformed payloads as task failures —
    * the reference's behavior (decode error fails the block,
    * sinker.go:163-165). Lenient mode yields null instead, for
    * quarantine-and-continue pipelines (filter decoded IS NULL to a
    * dead-letter sink). */
  override protected def nullSafeEval(input: Any): Any =
    decodeOne(input.asInstanceOf[Array[Byte]])

  /** Shared by interpreted eval and generated code. */
  def decodeOne(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    if (!lenient) ProtoWire.decode(schema, bytes)
    else try ProtoWire.decode(schema, bytes)
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => null }

  /** Codegen: call the decoder directly on the child's byte[] instead of
    * CodegenFallback (which re-materializes the full input row per call
    * and drops the expression out of whole-stage codegen). The decode
    * itself stays a JVM call — the win is keeping the surrounding
    * projection fused and the input access columnar. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("protoDecoder", this,
      classOf[ProtoDecodeExpression].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.decodeOne($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DataFrame-level ingest transforms: block stream → main table + exploded
  * child tables (the reference's whole relational surface, SURVEY.md
  * §2.A#4/#5).
  */
object Decode {

  /** payload bytes → typed struct column. */
  def protoDecode(payload: Column, schema: PMessage,
      lenient: Boolean = false): Column =
    Bridge.column(
      ProtoDecodeExpression(Bridge.expression(payload), schema, lenient))

  /** Blocks decoded once: (block_number, block_id, decoded struct). The
    * reference decodes each block exactly once and fans out
    * (sinker.go:195) — callers deriving multiple tables should persist()
    * this intermediate so Spark doesn't re-decode per table. */
  def decoded(blocks: DataFrame, schema: PMessage): DataFrame =
    blocks
      .filter(col("payload").isNotNull) // nil-output guard (sinker.go:158-160)
      .select(col("block_number"), col("block_id"),
        protoDecode(col("payload"), schema).as("decoded"))

  /** Main table from the decoded intermediate: one row per block,
    * provenance columns kept — a deliberate divergence from the
    * reference, which drops block_number/block_id (converter_proto.go:
    * 53-61 ignores them; SURVEY.md §7.4.3). */
  def mainFromDecoded(dec: DataFrame): DataFrame =
    dec.select(col("block_number"), col("block_id"), col("decoded.*"))

  /** One exploded child table (converter_field.go:24-35): message elements
    * flattened via inline(), scalar elements a single column named after
    * the field. One level only — no recursion (README.md:68-70). */
  def childFromDecoded(dec: DataFrame, f: ProtoSchema.PField): DataFrame =
    f.ptype match {
      case _: PMessage =>
        dec.select(col("block_number"), col("block_id"),
          inline(col(s"decoded.${f.name}")))
      case _ =>
        dec.select(col("block_number"), col("block_id"),
          explode(col(s"decoded.${f.name}")).as(f.name))
    }

  def mainTable(blocks: DataFrame, schema: PMessage): DataFrame =
    mainFromDecoded(decoded(blocks, schema))

  /** Exploded child tables: one DataFrame per root repeated non-map field
    * (factory.go:207-220). */
  def childTables(blocks: DataFrame, schema: PMessage): Map[String, DataFrame] = {
    val dec = decoded(blocks, schema)
    ProtoSchema.explodableFields(schema)
      .map(f => f.name -> childFromDecoded(dec, f)).toMap
  }
}
