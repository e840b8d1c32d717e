package graft.ingest

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Per-file column statistics IN THE LOG (r18) — the Delta add-action
  * stats / Iceberg manifest-metrics analogue. At commit time the
  * staged files' parquet FOOTERS (kilobytes each, O(changed files))
  * fold into one `stats=` line per (file, column) inside the delta
  * record; checkpoints carry them forward as `(kind="stats", value)`
  * rows, and [[TableLog.scanWhere]] prunes any snapshot scan against
  * a predicate BEFORE opening a single data file. Range layouts
  * (RangeSink, ZOrder) already prune their clustered key at scan
  * time via footers — log-resident stats extend that to EVERY
  * primitive column and move the check from N footer opens to the
  * already-resolved metadata.
  *
  * Line format (tab-separated, backslash-escaped):
  *   file, column, kind, hasMinMax(0|1), min, max, nullCount, rowCount
  * with kind `l` (integrals, dates as epoch days, timestamps as
  * micros), `d` (float/double), `s` (UTF-8 strings). nullCount is -1
  * when the footer did not record it.
  *
  * PRUNING IS LOSSLESS BY CONSTRUCTION: a file is skipped only when
  * its recorded range PROVABLY excludes a conjunct, comparisons run
  * in exact arithmetic (BigDecimal for numerics, unsigned UTF-8
  * bytes for strings — the same total order as Spark's UTF8String
  * and parquet's binary stats), a file or column without stats is
  * always kept, any conjunct shape the pruner does not understand is
  * ignored, and the caller re-applies the FULL predicate after the
  * scan. The one subtle edge — a fractional literal against integer
  * stats beyond 2^53, where double rounding could flip a boundary —
  * is skipped outright. */
object FileStats {

  private def esc(s: String): String = s
    .replace("\\", "\\\\").replace("\t", "\\t")
    .replace("\n", "\\n").replace("\r", "\\r")

  private def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\')
          case 't' => b.append('\t')
          case 'n' => b.append('\n')
          case 'r' => b.append('\r')
          case other => b.append('\\').append(other)
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** The file name a stats line describes (its first field). */
  private[ingest] def fileOf(line: String): String =
    unesc(line.takeWhile(_ != '\t'))

  private[ingest] final case class ColStats(kind: String,
    hasMinMax: Boolean, min: String, max: String, nullCount: Long,
    rowCount: Long)

  private[ingest] def parseLine(line: String)
      : Option[(String, String, ColStats)] = {
    // split on UNESCAPED tabs: escaped values never contain raw \t
    val parts = line.split("\t", -1)
    if (parts.length != 8) None
    else scala.util.Try((unesc(parts(0)), unesc(parts(1)), ColStats(
      parts(2), parts(3) == "1", unesc(parts(4)), unesc(parts(5)),
      parts(6).toLong, parts(7).toLong))).toOption
  }

  /** One merged (min, max, nullCount) accumulator per column while
    * folding a footer's row groups. */
  private final case class Acc(kind: String, var hasMinMax: Boolean,
    var minL: Long, var maxL: Long, var minD: Double, var maxD: Double,
    var minB: Array[Byte], var maxB: Array[Byte], var nulls: Long,
    var rows: Long, var dropped: Boolean)

  /** Fold the parquet footers of `names` (files under `dir`) into
    * stats lines — O(changed files) footer reads, no data pages
    * touched. Unsupported physical/logical types, multi-level paths,
    * and chunks with non-null values but no recorded statistics
    * yield no line (never pruned — lossless). */
  def forFiles(spark: SparkSession, dir: String, names: Seq[String])
      : Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    names.flatMap(n => forFile(conf, new Path(dir, n), n))
  }

  private def forFile(conf: Configuration, p: Path, name: String)
      : Seq[String] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    val blocks = try reader.getFooter.getBlocks.asScala.toSeq
      finally reader.close()
    val accs = scala.collection.mutable.LinkedHashMap.empty[String, Acc]
    blocks.foreach { b =>
      b.getColumns.asScala.foreach { c =>
        if (c.getPath.size == 1) {
          val col = c.getPath.toDotString
          val pt = c.getPrimitiveType
          kindOf(pt).foreach { case (kind, toL) =>
            val acc = accs.getOrElseUpdate(col, Acc(kind, false,
              Long.MaxValue, Long.MinValue, Double.MaxValue,
              Double.MinValue, null, null, 0L, 0L, false))
            acc.rows += b.getRowCount
            val st = c.getStatistics
            if (st == null || acc.kind != kind) acc.dropped = true
            else {
              if (acc.nulls >= 0)
                acc.nulls =
                  if (st.isNumNullsSet) acc.nulls + st.getNumNulls
                  else -1L
              if (st.hasNonNullValue) {
                acc.hasMinMax = true
                kind match {
                  case "l" =>
                    val mn = toL(st.genericGetMin)
                    val mx = toL(st.genericGetMax)
                    acc.minL = math.min(acc.minL, mn)
                    acc.maxL = math.max(acc.maxL, mx)
                  case "d" =>
                    val mn = st.genericGetMin match {
                      case f: java.lang.Float => f.doubleValue
                      case d: java.lang.Double => d.doubleValue
                    }
                    val mx = st.genericGetMax match {
                      case f: java.lang.Float => f.doubleValue
                      case d: java.lang.Double => d.doubleValue
                    }
                    if (mn.isNaN || mx.isNaN) acc.dropped = true
                    else {
                      acc.minD = math.min(acc.minD, mn)
                      acc.maxD = math.max(acc.maxD, mx)
                    }
                  case "s" =>
                    val mn = st.genericGetMin
                      .asInstanceOf[org.apache.parquet.io.api.Binary]
                      .getBytes
                    val mx = st.genericGetMax
                      .asInstanceOf[org.apache.parquet.io.api.Binary]
                      .getBytes
                    if (acc.minB == null || cmpBytes(mn, acc.minB) < 0)
                      acc.minB = mn
                    if (acc.maxB == null || cmpBytes(mx, acc.maxB) > 0)
                      acc.maxB = mx
                }
              } else if (!st.isNumNullsSet ||
                  st.getNumNulls < b.getRowCount) {
                // non-null values exist but min/max were not written
                acc.dropped = true
              }
            }
          }
        }
      }
    }
    accs.toSeq.collect { case (col, a) if !a.dropped =>
      val (mn, mx) = a.kind match {
        case _ if !a.hasMinMax => ("", "")
        case "l" => (a.minL.toString, a.maxL.toString)
        case "d" => (a.minD.toString, a.maxD.toString)
        case "s" => (new String(a.minB, "UTF-8"),
          new String(a.maxB, "UTF-8"))
      }
      Seq(esc(name), esc(col), a.kind, if (a.hasMinMax) "1" else "0",
        esc(mn), esc(mx), a.nulls.toString, a.rows.toString)
        .mkString("\t")
    }
  }

  /** kind + INT96-free long normalization for a primitive type; None
    * for anything the pruner cannot compare exactly. */
  private def kindOf(pt: PrimitiveType)
      : Option[(String, Any => Long)] = {
    import PrimitiveType.PrimitiveTypeName._
    val logical = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case INT32 | INT64 =>
        logical match {
          case null => Some(("l", toLong))
          case _: LogicalTypeAnnotation.IntLogicalTypeAnnotation
              if logical.asInstanceOf[
                LogicalTypeAnnotation.IntLogicalTypeAnnotation]
                .isSigned => Some(("l", toLong))
          case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
            Some(("l", toLong))
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MICROS =>
                Some(("l", toLong))
              case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                Some(("l", v => toLong(v) * 1000L))
              case _ => None
            }
          case _ => None // decimals, unsigned, time-of-day
        }
      case FLOAT | DOUBLE => Some(("d", _ => 0L))
      case BINARY
          if logical.isInstanceOf[
            LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        Some(("s", _ => 0L))
      case _ => None // BOOLEAN, INT96, FIXED_LEN_BYTE_ARRAY
    }
  }

  private def toLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.longValue
    case l: java.lang.Long => l.longValue
  }

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  // ---------------------------------------------------------------
  // pruning
  // ---------------------------------------------------------------

  private val Two53 = BigDecimal(2L << 52)

  /** Resolve `pred` against a one-row frame of `schema` and return
    * the ANALYZED filter condition: attribute references bound and
    * implicit casts materialized (an inexact cast landing on the
    * column side makes the pruner skip that conjunct; a cast on a
    * literal side folds in [[checkOf]]) — so pruning compares under
    * exactly the semantics the re-applied filter will use. The
    * analyzed plan, not the optimized one: the optimizer would
    * execute a filter over a LocalRelation eagerly and leave no
    * Filter node to read. */
  private[graft] def analyzedCondition(spark: SparkSession,
      schema: StructType, pred: org.apache.spark.sql.Column)
      : Option[Expression] = {
    if (schema.isEmpty) return None
    val row = org.apache.spark.sql.Row
      .fromSeq(schema.fields.toSeq.map(_ => null))
    val df = spark.createDataFrame(
      java.util.Collections.singletonList(row), schema).filter(pred)
    df.queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }
  }

  /** Snapshot files whose stats might satisfy `pred` (an ANALYZED
    * condition from [[analyzedCondition]]) — every file truly holding
    * a matching row is returned (lossless); files without stats for a
    * referenced column are always kept. Conjunctions AND
    * DISJUNCTIONS compose: might(a AND b) = might(a) ∧ might(b),
    * might(a OR b) = might(a) ∨ might(b) — each leaf
    * over-approximates "some row could match", so both compositions
    * stay over-approximations and `k = 5 OR k = 95` prunes to the
    * two matching range files. */
  private[graft] def prune(files: Seq[String],
      statsByFile: Map[String, Seq[String]], schema: StructType,
      pred: Expression): Seq[String] = {
    var known = false
    def might(e: Expression): Check = e match {
      case And(l, r) =>
        val (a, b) = (might(l), might(r))
        cols => a(cols) && b(cols)
      case Or(l, r) =>
        val (a, b) = (might(l), might(r))
        cols => a(cols) || b(cols)
      case Not(IsNull(a)) => might(IsNotNull(a))
      case Not(IsNotNull(a)) => might(IsNull(a))
      case leaf => checkOf(leaf, schema) match {
        case Some(c) => known = true; c
        case None => _ => true // opaque leaf: keep the file
      }
    }
    val check = might(pred)
    if (!known) return files
    files.filter { f =>
      val cols: Map[String, ColStats] = statsByFile.getOrElse(f, Nil)
        .flatMap(parseLine).collect {
          case (_, c, st) => c -> st
        }.toMap
      check(cols)
    }
  }

  private type Check = Map[String, ColStats] => Boolean

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The column a comparison side names, seen through EXACT widening
    * casts only: a bare attribute, or an integral/float attribute
    * under a cast to double (value-preserving within the 2^53 guard
    * [[kindMatches]] applies). Anything else — a narrowing cast, a
    * string parse, an expression — is opaque and its conjunct is
    * ignored. */
  private def attrRef(e: Expression, schema: StructType)
      : Option[(String, DataType)] = e match {
    case a: AttributeReference => Some((a.name, a.dataType))
    case u: UnresolvedAttribute =>
      schema.fields.find(_.name == u.name).map(f => (f.name, f.dataType))
    case c: Cast if c.dataType == DoubleType =>
      attrRef(c.child, schema)
        .filter(t => isIntegral(t._2) || t._2 == FloatType)
    case c: Cast if c.dataType == LongType =>
      attrRef(c.child, schema).filter(t => isIntegral(t._2))
    case _ => None
  }

  /** A per-file keep check for one conjunct, when its shape and
    * typing allow exact pruning; None ignores the conjunct. */
  private def checkOf(e: Expression, schema: StructType)
      : Option[Check] = {
    def ar(x: Expression): Option[(String, DataType)] =
      attrRef(x, schema)
    def lid(l: Expression): Option[Literal] = l match {
      case lit: Literal if lit.value != null => Some(lit)
      case e if e.foldable =>
        // an analyzed literal side arrives cast (cast(57 as bigint)):
        // fold it to the exact value the filter will compare with
        val v = e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        if (v == null) None else Some(Literal(v, e.dataType))
      case _ => None
    }
    def rc(a: Option[(String, DataType)], l: Option[Literal],
        keep: (ColStats, CmpVal) => Boolean): Option[Check] =
      rangeCheck(a, l, keep)
    e match {
      case EqualTo(x, y) =>
        rc(ar(x), lid(y), (st, v) => geMin(st, v) && leMax(st, v))
          .orElse(rc(ar(y), lid(x),
            (st, v) => geMin(st, v) && leMax(st, v)))
      case EqualNullSafe(x, y) =>
        rc(ar(x), lid(y), (st, v) => geMin(st, v) && leMax(st, v))
          .orElse(rc(ar(y), lid(x),
            (st, v) => geMin(st, v) && leMax(st, v)))
      case LessThan(x, y) =>
        rc(ar(x), lid(y), (st, v) => ltMin(st, v))
          .orElse(rc(ar(y), lid(x), (st, v) => gtMax(st, v)))
      case LessThanOrEqual(x, y) =>
        rc(ar(x), lid(y), (st, v) => leMin(st, v))
          .orElse(rc(ar(y), lid(x), (st, v) => geMax(st, v)))
      case GreaterThan(x, y) =>
        rc(ar(x), lid(y), (st, v) => gtMax(st, v))
          .orElse(rc(ar(y), lid(x), (st, v) => ltMin(st, v)))
      case GreaterThanOrEqual(x, y) =>
        rc(ar(x), lid(y), (st, v) => geMax(st, v))
          .orElse(rc(ar(y), lid(x), (st, v) => leMin(st, v)))
      case In(a, list) =>
        // elements arrive cast ((3 AS BIGINT)): fold each; any
        // non-foldable element makes the whole conjunct opaque
        val vs = list.map(lid)
        if (vs.exists(_.isEmpty)) None
        else inCheck(ar(a), vs.flatten)
      case InSet(a, hset) =>
        ar(a).flatMap { case (n, dt) =>
          inCheck(Some((n, dt)),
            hset.toSeq.map(v => Literal(v, dt)))
        }
      case IsNull(a) => ar(a).map { case (n, _) =>
        (cols: Map[String, ColStats]) => cols.get(n) match {
          case Some(st) if st.nullCount >= 0 => st.nullCount > 0
          case _ => true
        }
      }
      case IsNotNull(a) => ar(a).map { case (n, _) =>
        (cols: Map[String, ColStats]) => cols.get(n) match {
          case Some(st) if st.nullCount >= 0 =>
            st.nullCount < st.rowCount
          case _ => true
        }
      }
      case _ => None
    }
  }

  private def inCheck(a: Option[(String, DataType)],
      lits: Seq[Literal]): Option[Check] = {
    val vs = lits.filter(_.value != null)
    if (vs.isEmpty) return None
    val rcs = vs.map(v => rangeCheck(a, Some(v),
      (st, x) => geMin(st, x) && leMax(st, x)))
    if (rcs.exists(_.isEmpty)) None
    else Some((cols: Map[String, ColStats]) => rcs.exists(_.get(cols)))
  }

  /** A comparable (kind-aligned, exactly-typed) keep check for one
    * (column, literal) pair; None skips the conjunct. */
  private def rangeCheck(attr: Option[(String, DataType)],
      lit: Option[Literal], keep: (ColStats, CmpVal) => Boolean)
      : Option[Check] = {
    for {
      (n, dt) <- attr
      l <- lit
      v <- cmpVal(dt, l)
    } yield (cols: Map[String, ColStats]) => cols.get(n) match {
      case Some(st) =>
        if (!st.hasMinMax)
          // a provably all-null file satisfies no comparison; one
          // with unknown nulls must stay
          !(st.nullCount >= 0 && st.nullCount == st.rowCount)
        else kindMatches(st, v) && keep(st, v)
      case None => true
    }
  }

  private sealed trait CmpVal
  private final case class NumV(v: BigDecimal, fractional: Boolean)
    extends CmpVal
  private final case class StrV(bytes: Array[Byte]) extends CmpVal

  /** Literal → exact comparison value, only when the column's
    * declared type and the literal's type compare exactly under
    * Spark semantics. Literal values here are CATALYST-internal
    * (UTF8String for strings, Int days for dates, Long micros for
    * timestamps). */
  private def cmpVal(colType: DataType, l: Literal): Option[CmpVal] = {
    def num(v: Any): Option[NumV] = v match {
      case d: java.lang.Double =>
        if (d.isNaN || d.isInfinite) None
        else Some(NumV(BigDecimal(d.toString), fractional = true))
      case f: java.lang.Float =>
        if (f.isNaN || f.isInfinite) None
        else Some(NumV(BigDecimal(f.toString), fractional = true))
      case n: java.lang.Byte => Some(NumV(BigDecimal(n.longValue), false))
      case n: java.lang.Short => Some(NumV(BigDecimal(n.longValue), false))
      case n: java.lang.Integer => Some(NumV(BigDecimal(n.longValue), false))
      case n: java.lang.Long => Some(NumV(BigDecimal(n.longValue), false))
      case d: org.apache.spark.sql.types.Decimal =>
        Some(NumV(BigDecimal(d.toJavaBigDecimal), fractional = true))
      case _ => None
    }
    (colType, l.dataType, l.value) match {
      case (t, _, v) if isIntegral(t) || t == FloatType ||
          t == DoubleType =>
        l.dataType match {
          case t2 if isIntegral(t2) || t2 == FloatType ||
              t2 == DoubleType || t2.isInstanceOf[DecimalType] => num(v)
          case _ => None
        }
      case (DateType, DateType, v: java.lang.Integer) =>
        Some(NumV(BigDecimal(v.intValue), fractional = false))
      case (TimestampType, TimestampType, v: java.lang.Long) =>
        Some(NumV(BigDecimal(v.longValue), fractional = false))
      case (StringType, StringType, v) =>
        Some(StrV(v.toString.getBytes("UTF-8")))
      case _ => None
    }
  }

  private def kindMatches(st: ColStats, v: CmpVal): Boolean = v match {
    case NumV(_, fractional) => (st.kind == "l" || st.kind == "d") &&
      // integer stats past 2^53 vs a fractional literal: double
      // rounding could flip a boundary — skip (keep the file)
      !(fractional && st.kind == "l" &&
        (BigDecimal(st.min).abs > Two53 || BigDecimal(st.max).abs > Two53))
    case StrV(_) => st.kind == "s"
  }

  private def minOf(st: ColStats): CmpVal =
    if (st.kind == "s") StrV(st.min.getBytes("UTF-8"))
    else NumV(BigDecimal(st.min), fractional = false)
  private def maxOf(st: ColStats): CmpVal =
    if (st.kind == "s") StrV(st.max.getBytes("UTF-8"))
    else NumV(BigDecimal(st.max), fractional = false)

  private def cmp(a: CmpVal, b: CmpVal): Int = (a, b) match {
    case (NumV(x, _), NumV(y, _)) => x.compare(y)
    case (StrV(x), StrV(y)) => cmpBytes(x, y)
    case _ => sys.error("mismatched comparison kinds")
  }

  // file-range predicates against a literal v
  private def geMin(st: ColStats, v: CmpVal): Boolean =
    cmp(v, minOf(st)) >= 0 // v >= min: some value could be <= v
  private def leMax(st: ColStats, v: CmpVal): Boolean =
    cmp(v, maxOf(st)) <= 0
  private def ltMin(st: ColStats, v: CmpVal): Boolean =
    cmp(minOf(st), v) < 0 // ∃ value < v  ⇔  min < v
  private def leMin(st: ColStats, v: CmpVal): Boolean =
    cmp(minOf(st), v) <= 0
  private def gtMax(st: ColStats, v: CmpVal): Boolean =
    cmp(maxOf(st), v) > 0
  private def geMax(st: ColStats, v: CmpVal): Boolean =
    cmp(maxOf(st), v) >= 0
}
