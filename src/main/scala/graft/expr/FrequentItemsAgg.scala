package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; the batched
  * median-purge variant Apache DataSketches' FrequentItemsSketch uses,
  * proven MERGEABLE in Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * At most `capacity` counters live at any time. When an insert would
  * exceed the bound, the (lower) median count `m` is added to the
  * cumulative `offset`, subtracted from every counter, and non-positive
  * counters drop — at least half the entries, so purge cost amortizes
  * to O(1) per insert. Invariants carried by the structure:
  *
  *  - every stored count is a LOWER bound of its item's true frequency,
  *    undercounting by at most `offset`;
  *  - an ABSENT item's true frequency is at most `offset`;
  *  - `offset` never exceeds 2·W/capacity (W = total inserted weight),
  *    so any item heavier than that survives purging — with capacity
  *    well above the wanted k, the reported heavy hitters are the true
  *    ones;
  *  - no purge (capacity ≥ distinct items) ⇒ counts are EXACT and the
  *    summary is order-independent, hence fully deterministic.
  *
  * Merging sums offsets and counter-wise adds the other summary's
  * counters (purging on overflow) — the PODS'12 merge, which keeps all
  * bounds above. This is what makes the aggregate a one-pass
  * bounded-state plan at 100 TB: each partition ships ≤ capacity
  * counters to the final merge instead of shuffling the full
  * (item, count) vocabulary table. */
final class FreqSummary(val capacity: Int) {
  require(capacity >= 2, "capacity must be at least 2")

  val counts: scala.collection.mutable.HashMap[UTF8String, Long] =
    scala.collection.mutable.HashMap.empty
  var offset: Long = 0L

  /** Add `w` observations of `item`. The caller may pass a buffer-backed
    * UTF8String — it is cloned iff a new counter is created. */
  def add(item: UTF8String, w: Long = 1L): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + w)
      case None =>
        counts.update(item.clone(), w)
        if (counts.size > capacity) purge()
    }
  }

  private def purge(): Unit = {
    val vals = counts.values.toArray
    java.util.Arrays.sort(vals)
    val m = vals(vals.length / 2)
    offset += m
    counts.filterInPlace((_, c) => c > m)
    counts.mapValuesInPlace((_, c) => c - m)
  }

  def mergeIn(other: FreqSummary): Unit = {
    offset += other.offset
    other.counts.foreach { case (item, c) => add(item, c) }
  }

  /** (item, lower-bound count) pairs, heaviest first, ties by item. */
  def top(k: Int): Seq[(UTF8String, Long)] =
    counts.toSeq.sortBy { case (item, c) => (-c, item) }.take(k)
}

/** Corpus-wide top-k heavy hitters over an `array<string>` column as one
  * Catalyst `TypedImperativeAggregate` — the bounded-shuffle form of
  * `explode → groupBy → count → ORDER BY LIMIT k`: the exact plan
  * shuffles one row per DISTINCT item (vocabulary-sized at web scale),
  * this plan ships at most `capacity` counters per partition. Each
  * input row contributes every non-null element of its array (one
  * update per document, no explode row inflation), each weighted by the
  * row's `weightExpr` (LongType; 1 = plain counting — a null or
  * non-positive weight contributes nothing). Weighted form = "heavy by
  * MASS": e.g. sources/domains ranked by their token totals rather
  * than document counts, the number a data-mix audit actually budgets.
  *
  * Output: `array<struct<item string, freq bigint>>`, the top `k` by
  * (freq desc, item asc). `freq` is a lower bound of the true weighted
  * total, exact whenever capacity ≥ distinct items (see
  * [[FreqSummary]]). */
case class FrequentItemsAgg(itemsExpr: Expression, weightExpr: Expression,
    capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSummary] {

  require(capacity >= 2, "capacity must be at least 2")
  require(k >= 1, "k must be positive")

  override def children: Seq[Expression] = Seq(itemsExpr, weightExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("freq", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "frequent_items"

  override def createAggregationBuffer(): FreqSummary = new FreqSummary(capacity)

  override def update(buf: FreqSummary, input: InternalRow): FreqSummary = {
    val arr = itemsExpr.eval(input)
    val wv = weightExpr.eval(input)
    val w = if (wv == null) 0L else wv.asInstanceOf[Number].longValue()
    if (arr != null && w > 0L) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (!a.isNullAt(i)) buf.add(a.getUTF8String(i), w)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: FreqSummary, b2: FreqSummary): FreqSummary = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buf: FreqSummary): Any =
    new GenericArrayData(buf.top(k).map { case (item, c) =>
      new GenericInternalRow(Array[Any](item, c))
    }.toArray)

  override def serialize(buf: FreqSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.offset)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (item, c) =>
      val bytes = item.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new FreqSummary(capacity)
    buf.offset = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val c = in.readLong()
      buf.counts.update(UTF8String.fromBytes(b), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItemsAgg =
    copy(itemsExpr = newChildren(0), weightExpr = newChildren(1))
}
