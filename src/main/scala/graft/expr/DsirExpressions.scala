package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernels for the DSIR hashed-n-gram chain
  * ([[graft.text.Dsir]]): tokenize → lowercase → drop blanks → emit
  * unigram + bigram md5 hash buckets, in ONE JVM loop per row.
  *
  * The Column-chain original (`transform`/`filter`/`aggregate` higher-
  * order functions over a `lit(table)` array) is semantically identical
  * but evaluates INTERPRETED — Spark's higher-order functions are
  * CodegenFallback — and re-enters the fitted table as a plan literal
  * whose O(buckets) cost is paid on every tree conversion (the failure
  * mode [[AdcDistanceConst]] fixed for ADC tables). Here the table and
  * salt ride as codegen reference objects and the whole per-row chain is
  * one static call inside whole-stage codegen.
  *
  * Bit-exactness contract (pinned by DsirSpec's local replication and
  * the DuckDB oracle rows): `trim` strips 0x20 only (Spark StringTrim),
  * `split("\\s+", -1)` is Java regex-split semantics (Spark StringSplit),
  * lowercase is `UTF8String.toLowerCase`, grams hash as the UTF-8 bytes
  * of `salt ++ ":" ++ gram` with the bucket = first 8 md5 hex chars mod
  * `buckets` ([[graft.functions.Sampling.hashBucket]]), and the score
  * sums `table(bucket)` left-to-right over unigrams-then-bigrams —
  * the exact fold order of the original `aggregate`. */
object DsirKernels {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  val EMPTY_BUCKETS: ArrayData = new GenericArrayData(Array.empty[Int])

  /** Lowercased non-blank whitespace tokens as UTF-8 byte slices. */
  private def tokenBytes(text: UTF8String): Array[Array[Byte]] = {
    val parts = text.trim().toString.split("\\s+", -1)
    val out = new Array[Array[Byte]](parts.length)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val lowered = UTF8String.fromString(parts(i)).toLowerCase
      if (lowered.numBytes() > 0) { out(n) = lowered.getBytes; n += 1 }
      i += 1
    }
    if (n == parts.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** First 8 md5 hex chars of `saltColon ++ a [++ ' ' ++ b]` mod
    * `buckets` — [[graft.functions.Sampling.hashBucket]] bit for bit
    * (the first 8 hex chars are the first 4 digest bytes). */
  private def bucketOf(md: MessageDigest, saltColon: Array[Byte],
      a: Array[Byte], b: Array[Byte], buckets: Int): Int = {
    md.reset()
    md.update(saltColon)
    md.update(a)
    if (b != null) { md.update(' '.toByte); md.update(b) }
    val d = md.digest()
    ((((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % buckets).toInt
  }

  /** Per-doc gram buckets (unigrams then bigrams, multiplicity kept). */
  def gramBuckets(text: UTF8String, buckets: Int,
      saltColon: Array[Byte]): ArrayData = {
    val md = md5Local.get()
    val toks = tokenBytes(text)
    val n = toks.length
    val out = new Array[Int](if (n >= 2) 2 * n - 1 else n)
    var i = 0
    while (i < n) { out(i) = bucketOf(md, saltColon, toks(i), null, buckets); i += 1 }
    i = 0
    while (i < n - 1) {
      out(n + i) = bucketOf(md, saltColon, toks(i), toks(i + 1), buckets)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Σ table(bucket) over the doc's grams, left-to-right (unigrams then
    * bigrams) — the original `aggregate` fold order, so sums are
    * bit-identical. */
  def score(text: UTF8String, buckets: Int, saltColon: Array[Byte],
      table: Array[Double]): Double = {
    val md = md5Local.get()
    val toks = tokenBytes(text)
    val n = toks.length
    var acc = 0.0
    var i = 0
    while (i < n) { acc += table(bucketOf(md, saltColon, toks(i), null, buckets)); i += 1 }
    i = 0
    while (i < n - 1) {
      acc += table(bucketOf(md, saltColon, toks(i), toks(i + 1), buckets))
      i += 1
    }
    acc
  }
}

/** The DSIR gram-bucket array (array<int>, never null: a NULL doc has no
  * grams, exactly like the Column chain it replaces). Feeds the fit-side
  * `explode → groupBy(bucket)` count jobs. */
case class DsirGramBuckets(child: Expression, buckets: Int, salt: String)
    extends UnaryExpression {

  require(buckets > 0, "buckets must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "dsir_gram_buckets"

  @transient private lazy val saltColon: Array[Byte] =
    (salt + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) DsirKernels.EMPTY_BUCKETS
    else DsirKernels.gramBuckets(t.asInstanceOf[UTF8String], buckets, saltColon)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("dsirSalt", saltColon, "byte[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.expr.DsirKernels.EMPTY_BUCKETS();
      if (!${c.isNull}) {
        ${ev.value} = graft.expr.DsirKernels.gramBuckets(${c.value}, $buckets, $saltRef);
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DsirGramBuckets =
    copy(child = newChild)
}

/** The DSIR importance log-weight: Σ table(bucket) over the doc's grams.
  * The fitted table rides as a codegen REFERENCE OBJECT, not a plan
  * literal (see [[AdcDistanceConst]]); a NULL or empty doc scores 0.0,
  * exactly like the Column chain it replaces. */
case class DsirScore(child: Expression, table: Array[Double], salt: String)
    extends UnaryExpression {

  require(table.nonEmpty, "table must be non-empty")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "dsir_score"

  @transient private lazy val saltColon: Array[Byte] =
    (salt + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) 0.0
    else DsirKernels.score(t.asInstanceOf[UTF8String], table.length, saltColon, table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("dsirTable", table, "double[]")
    val saltRef = ctx.addReferenceObj("dsirSalt", saltColon, "byte[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      double ${ev.value} = 0.0;
      if (!${c.isNull}) {
        ${ev.value} = graft.expr.DsirKernels.score(${c.value}, ${table.length}, $saltRef, $tableRef);
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}
