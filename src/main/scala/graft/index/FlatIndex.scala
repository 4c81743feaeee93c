package graft.index

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.core.{CollectionConfig, Metric, ScoreMode}
import graft.expr.VectorKernels
import graft.search.Search

/** In-memory flat acceleration mirror.
  *
  * The reference keeps canonical records in ETS and mirrors vectors into
  * a native flat structure for the hot scan (SURVEY architecture
  * paragraph: "Rust owns only acceleration state — flat vector mirror").
  * This is the same split for Spark: the DataFrame/Parquet collection
  * stays canonical; `FlatIndex` is a rebuildable cached RDD of
  * row-major-packed primitive blocks, one scan of which is a pure
  * sequential float[] loop — memory-bandwidth bound, no row
  * deserialization, no boxing. Per partition the search keeps a bounded
  * (rank, id) heap; the driver merges partitions' top-k — identical
  * algorithm to the reference's heap scan (flat.rs:96-124) distributed
  * over executors.
  *
  * Like the reference's index (rebuilt from canonical rows on load,
  * collection.ex:426-433), this mirror carries NO authoritative state:
  * drop it and rebuild from the collection at any time.
  */
final class FlatIndex private (
    val blocks: RDD[FlatIndex.Block],
    val dims: Int) extends Serializable {

  /** Exact top-k: per-partition bounded heap + driver merge. Returns
    * (id, raw) in final rank order (rank asc, id asc). */
  def search(query: Array[Float], metric: Metric, k: Int): Array[(String, Double)] = {
    val q = query
    val code = metric.code
    val partTops = blocks.mapPartitions { it =>
      val heap = new FlatIndex.BoundedRankHeap(k)
      it.foreach(_.scoreInto(code, q, heap))
      Iterator.single(heap.toSortedArray)
    }.collect()
    FlatIndex.mergeTop(partTops, k)
  }

  /** Batch top-k: ONE pass over the blocks answers every query —
    * the scan cost is amortized across the whole query batch. */
  def searchMany(queries: Array[(String, Array[Float])], metric: Metric,
      k: Int): Map[String, Array[(String, Double)]] = {
    val code = metric.code
    val qs = queries
    val partTops = blocks.mapPartitions { it =>
      val heaps = Array.fill(qs.length)(new FlatIndex.BoundedRankHeap(k))
      it.foreach { b =>
        var qi = 0
        while (qi < qs.length) { b.scoreInto(code, qs(qi)._2, heaps(qi)); qi += 1 }
      }
      Iterator.single(heaps.map(_.toSortedArray))
    }.collect()
    qs.indices.map { qi =>
      qs(qi)._1 -> FlatIndex.mergeTop(partTops.map(_(qi)), k)
    }.toMap
  }

  /** Top `keep` ids by PREFIX rank (first `d` dims; cosine uses the true
    * normalized cosine on the prefix, search.rs:56-59), optionally
    * restricted to `within`. One funnel stage. */
  def prefixTop(query: Array[Float], metric: Metric, d: Int, keep: Int,
      within: Set[String]): Array[String] = {
    val q = query
    val code = if (metric == Metric.Cosine) VectorKernels.TRUE_COSINE_CODE else metric.code
    val rankCode = metric.code
    val filter = within
    // clamp like Search.funnelStage: a stage > dims degrades to a
    // full-vector stage instead of reading past the query array
    val dEff = math.min(d, dims)
    val partTops = blocks.mapPartitions { it =>
      val heap = new FlatIndex.BoundedRankHeap(keep)
      it.foreach(_.scorePrefixInto(code, rankCode, q, dEff, filter, heap))
      Iterator.single(heap.toSortedArray)
    }.collect()
    FlatIndex.mergeTop(partTops, keep).map(_._1)
  }

  /** Top `keep` ids by the quantized candidate scorer over the stored
    * sign bits, ties by id. Default is the asymmetric binary dot
    * (matches Search.quantizedCandidates, including the
    * negative_inner_product direction flip); `asymmetric = false` is
    * the reference-literal symmetric packed Hamming. */
  def hammingTop(query: Array[Float], keep: Int,
      asymmetric: Boolean = true,
      metric: Metric = Metric.Cosine): Array[String] = {
    val q = query
    val qBits = if (asymmetric) null else VectorKernels.packSignBits(query)
    val negDir = metric == Metric.NegativeInnerProduct
    val d = dims
    val partTops = blocks.mapPartitions { it =>
      val heap = new FlatIndex.BoundedRankHeap(keep)
      if (qBits == null) it.foreach(_.scoreAsymmetricInto(q, heap, negDir))
      else it.foreach(_.scoreHammingInto(qBits, d, heap))
      Iterator.single(heap.toSortedArray)
    }.collect()
    FlatIndex.mergeTop(partTops, keep).map(_._1)
  }

  /** Exact top-k restricted to a candidate id set (the shared rerank). */
  def rerank(query: Array[Float], metric: Metric, within: Set[String],
      k: Int): Array[(String, Double)] = {
    val q = query
    val code = metric.code
    val filter = within
    val partTops = blocks.mapPartitions { it =>
      val heap = new FlatIndex.BoundedRankHeap(k)
      it.foreach(_.scoreWithinInto(code, q, filter, heap))
      Iterator.single(heap.toSortedArray)
    }.collect()
    FlatIndex.mergeTop(partTops, k)
  }

  /** Matryoshka funnel over the mirror: prefix stages cut with the same
    * widening schedule as Search.funnelSearch (earlier stages keep
    * `widen`x more; see Search.funnelKeeps), then exact rerank. */
  def funnelSearch(query: Array[Float], metric: Metric, k: Int,
      stages: Seq[Int], candidates: Int,
      widen: Int = 8): Array[(String, Double)] = {
    var survivors: Set[String] = null
    stages.zip(Search.funnelKeeps(stages.size, candidates, widen)).foreach {
      case (d, keep) => survivors = prefixTop(query, metric, d, keep, survivors).toSet
    }
    rerank(query, metric, survivors, k)
  }

  /** Binary-quantized search over the mirror (candidate scorer matches
    * Search.quantizedSearch: asymmetric by default, `asymmetric = false`
    * for the reference-literal Hamming pass). */
  def quantizedSearch(query: Array[Float], metric: Metric, k: Int,
      candidates: Int, asymmetric: Boolean = true): Array[(String, Double)] =
    rerank(query, metric, hammingTop(query, candidates, asymmetric, metric).toSet, k)

  /** Hybrid: union of funnel + quantized candidates, exact rerank. */
  def hybridSearch(query: Array[Float], metric: Metric, k: Int,
      stages: Seq[Int], candidates: Int,
      widen: Int = 8): Array[(String, Double)] = {
    var survivors: Set[String] = null
    stages.zip(Search.funnelKeeps(stages.size, candidates, widen)).foreach {
      case (d, keep) => survivors = prefixTop(query, metric, d, keep, survivors).toSet
    }
    rerank(query, metric, survivors ++ hammingTop(query, candidates, metric = metric), k)
  }

  /** Result-frame form matching Search.flatSearch output semantics. */
  def searchDf(spark: SparkSession, config: CollectionConfig,
      query: Array[Float], k: Int): DataFrame = {
    val q = Search.prepareQuery(config, query)
    val hits = search(q, config.metric, k)
    val rows = hits.map { case (id, raw) =>
      val (score, dist) = ScoreMode.resultValues(config.metric, raw, config.score)
      Row(id, score, dist.orNull)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("score", DoubleType, nullable = false),
      StructField("distance", DoubleType, nullable = true))))
  }

  def count(): Long = blocks.map(_.n.toLong).fold(0L)(_ + _)

  def unpersist(): Unit = blocks.unpersist()
}

object FlatIndex {

  /** Row-major packed vector block: vector i lives at [i*dims, (i+1)*dims);
    * its sign words at [i*words, (i+1)*words). */
  final case class Block(ids: Array[String], vecs: Array[Float], n: Int, dims: Int,
      bits: Array[Long]) {

    private def words: Int = (dims + 63) / 64

    /** Funnel stage: score the d-prefix (kernel `code`, rank semantics
      * `rankCode`), optionally restricted to a candidate id set. */
    def scorePrefixInto(code: Int, rankCode: Int, q: Array[Float], d: Int,
        within: Set[String], heap: BoundedRankHeap): Unit = {
      var i = 0
      var off = 0
      while (i < n) {
        if (within == null || within.contains(ids(i))) {
          val raw = code match {
            case 2 | 3 => dotPrefix(off, q, d)
            case 4     => -dotPrefix(off, q, d)
            case 0     => math.sqrt(l2sqPrefix(off, q, d))
            case 1     => l2sqPrefix(off, q, d)
            case 9     => trueCosinePrefix(off, q, d)
            case _     => genericPrefix(code, off, q, d)
          }
          heap.offer(VectorKernels.rankValue(rankCode, raw), raw, ids(i))
        }
        i += 1
        off += dims
      }
    }

    /** Quantized candidate pass: packed Hamming against query bits. */
    def scoreHammingInto(qBits: Array[Long], fullDims: Int,
        heap: BoundedRankHeap): Unit = {
      val w = words
      val rem = fullDims % 64
      val lastMask = if (rem != 0) (1L << rem) - 1 else -1L
      var i = 0
      var boff = 0
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < w) {
          val m = if (j + 1 == w) lastMask else -1L
          acc += java.lang.Long.bitCount((bits(boff + j) ^ qBits(j)) & m)
          j += 1
        }
        heap.offer(acc.toDouble, acc.toDouble, ids(i))
        i += 1
        boff += w
      }
    }

    /** Quantized candidate pass, asymmetric scorer: full-precision query
      * against stored sign bits, rank = -dot (`negDir` flips the rank
      * for the negative_inner_product metric — see
      * VectorKernels.packedAsymmetricDot). */
    def scoreAsymmetricInto(q: Array[Float], heap: BoundedRankHeap,
        negDir: Boolean = false): Unit = {
      val w = words
      val d = dims
      var i = 0
      var boff = 0
      while (i < n) {
        var acc = 0.0
        var j = 0
        while (j < d) {
          val x = q(j).toDouble
          acc += (if ((bits(boff + (j >>> 6)) & (1L << (j & 63))) != 0L) x else -x)
          j += 1
        }
        heap.offer(if (negDir) acc else -acc, acc, ids(i))
        i += 1
        boff += w
      }
    }

    /** Exact scoring restricted to a candidate id set. */
    def scoreWithinInto(code: Int, q: Array[Float], within: Set[String],
        heap: BoundedRankHeap): Unit = {
      var i = 0
      var off = 0
      while (i < n) {
        if (within == null || within.contains(ids(i))) {
          val raw = code match {
            case 2 | 3 => dotAt(off, q)
            case 4     => -dotAt(off, q)
            case 0     => math.sqrt(l2sqAt(off, q))
            case 1     => l2sqAt(off, q)
            case _     => genericAt(code, off, q)
          }
          heap.offer(VectorKernels.rankValue(code, raw), raw, ids(i))
        }
        i += 1
        off += dims
      }
    }

    private def dotPrefix(off: Int, q: Array[Float], d0: Int): Double = {
      var acc = 0.0; var d = 0
      while (d < d0) { acc += vecs(off + d).toDouble * q(d).toDouble; d += 1 }
      acc
    }

    private def l2sqPrefix(off: Int, q: Array[Float], d0: Int): Double = {
      var acc = 0.0; var d = 0
      while (d < d0) { val x = vecs(off + d).toDouble - q(d).toDouble; acc += x * x; d += 1 }
      acc
    }

    private def trueCosinePrefix(off: Int, q: Array[Float], d0: Int): Double = {
      var dotAcc = 0.0; var na = 0.0; var nb = 0.0; var d = 0
      while (d < d0) {
        val x = vecs(off + d).toDouble; val y = q(d).toDouble
        dotAcc += x * y; na += x * x; nb += y * y; d += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else math.max(-1.0, math.min(1.0, dotAcc / (math.sqrt(na) * math.sqrt(nb))))
    }

    private def genericPrefix(code: Int, off: Int, q: Array[Float], d0: Int): Double = {
      val v = new Array[Float](d0)
      System.arraycopy(vecs, off, v, 0, d0)
      VectorKernels.distance(code, v, q.slice(0, d0))
    }
    /** Score every vector in the block against q into the heap. */
    def scoreInto(metricCode: Int, q: Array[Float], heap: BoundedRankHeap): Unit = {
      var i = 0
      var off = 0
      while (i < n) {
        val raw = metricCode match {
          case 2 | 3 => dotAt(off, q)
          case 4     => -dotAt(off, q)
          case 0     => math.sqrt(l2sqAt(off, q))
          case 1     => l2sqAt(off, q)
          case _     => genericAt(metricCode, off, q)
        }
        heap.offer(VectorKernels.rankValue(metricCode, raw), raw, ids(i))
        i += 1
        off += dims
      }
    }

    private def dotAt(off: Int, q: Array[Float]): Double = {
      var acc = 0.0; var d = 0
      while (d < dims) { acc += vecs(off + d).toDouble * q(d).toDouble; d += 1 }
      acc
    }

    private def l2sqAt(off: Int, q: Array[Float]): Double = {
      var acc = 0.0; var d = 0
      while (d < dims) { val x = vecs(off + d).toDouble - q(d).toDouble; acc += x * x; d += 1 }
      acc
    }

    private def genericAt(code: Int, off: Int, q: Array[Float]): Double = {
      val v = new Array[Float](dims)
      System.arraycopy(vecs, off, v, 0, dims)
      VectorKernels.distance(code, v, q)
    }
  }

  /** Bounded max-heap on (rank, id): keeps the k smallest (rank, id)
    * pairs, ties by ascending id — the reference's heap semantics
    * (search.rs:23-29). */
  final class BoundedRankHeap(k: Int) {
    private val ranks = new Array[Double](k)
    private val raws = new Array[Double](k)
    private val ids = new Array[String](k)
    private var size0 = 0

    private def worseThan(r1: Double, id1: String, r2: Double, id2: String): Boolean =
      r1 > r2 || (r1 == r2 && id1.compareTo(id2) > 0)

    def offer(rank: Double, raw: Double, id: String): Unit = {
      if (size0 < k) {
        ranks(size0) = rank; raws(size0) = raw; ids(size0) = id
        size0 += 1
        siftUp(size0 - 1)
      } else if (k > 0 && worseThan(ranks(0), ids(0), rank, id)) {
        ranks(0) = rank; raws(0) = raw; ids(0) = id
        siftDown(0)
      }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) / 2
        if (worseThan(ranks(i), ids(i), ranks(p), ids(p))) { swap(i, p); i = p }
        else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var worst = i
        if (l < size0 && worseThan(ranks(l), ids(l), ranks(worst), ids(worst))) worst = l
        if (r < size0 && worseThan(ranks(r), ids(r), ranks(worst), ids(worst))) worst = r
        if (worst == i) return
        swap(i, worst); i = worst
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val tr = ranks(i); ranks(i) = ranks(j); ranks(j) = tr
      val tw = raws(i); raws(i) = raws(j); raws(j) = tw
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    /** (id, raw, rank) sorted by (rank, id) ascending. */
    def toSortedArray: Array[(String, Double, Double)] = {
      val out = (0 until size0).map(i => (ids(i), raws(i), ranks(i))).toArray
      scala.util.Sorting.stableSort(out,
        (a: (String, Double, Double), b: (String, Double, Double)) =>
          a._3 < b._3 || (a._3 == b._3 && a._1 < b._1))
      out
    }
  }

  private[index] def mergeTop(parts: Array[Array[(String, Double, Double)]],
      k: Int): Array[(String, Double)] = {
    parts.flatten
      .sortBy(t => (t._3, t._1))
      .take(k)
      .map(t => (t._1, t._2))
  }

  /** Build the mirror from a canonical collection frame. `blockRows`
    * bounds block size (bounded task memory; several blocks per
    * partition are fine). */
  def build(df: DataFrame, config: CollectionConfig,
      blockRows: Int = 65536,
      storage: StorageLevel = StorageLevel.MEMORY_ONLY): FlatIndex = {
    val dims = config.dimensions
    import df.sparkSession.implicits._
    val pairs = df.select(df.col("id").cast(StringType),
      df.col("vector").cast(ArrayType(FloatType))).as[(String, Array[Float])]
    val blocks = pairs.rdd.mapPartitions { it =>
      new Iterator[Block] {
        override def hasNext: Boolean = it.hasNext
        override def next(): Block = {
          val ids = new scala.collection.mutable.ArrayBuffer[String](1024)
          val vecs = new scala.collection.mutable.ArrayBuilder.ofFloat
          vecs.sizeHint(math.min(blockRows, 1024) * dims)
          val bits = new scala.collection.mutable.ArrayBuilder.ofLong
          var n = 0
          while (it.hasNext && n < blockRows) {
            val (id, v) = it.next()
            require(v.length == dims, s"dimension mismatch for id $id")
            ids += id
            vecs ++= v
            bits ++= graft.expr.VectorKernels.packSignBits(v)
            n += 1
          }
          Block(ids.toArray, vecs.result(), n, dims, bits.result())
        }
      }
    }.persist(storage)
    blocks.count() // materialize
    new FlatIndex(blocks, dims)
  }
}
