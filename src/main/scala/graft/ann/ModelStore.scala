package graft.ann

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** JSON sidecar persistence for trained ANN model artifacts (SQ8
  * min/max ranges, PQ/OPQ codebooks, IVF centroids).
  *
  * Without this, every cold session retrains its quantizers — at the
  * gate that showed up as multi-second ann_* rows whose cost was
  * train+encode, not search, and at 100 TB it is the difference between
  * "load a few KB of JSON" and "re-scan the corpus". The reference's
  * snapshot persists collection config exactly so load does not
  * re-derive it (lib/vettore/collection.ex:444-457); codebooks and
  * centroids are the same class of artifact for the quantized indexes,
  * so they get the same treatment: a human-readable sidecar beside the
  * at-rest data.
  *
  * Format: one JSON object, `kind` discriminated. Floats are written
  * with `Float.toString` (shortest round-tripping decimal) and parsed
  * with `toFloat`, so a loaded model is BIT-IDENTICAL to the trained
  * one — load-then-search equals train-then-search row-for-row (pinned
  * in QuantizationSpec). IO goes through the Hadoop FileSystem API, so
  * sidecars live wherever the data lives (local/HDFS/object store).
  */
object ModelStore {

  val SidecarName = "_graft_model.json"

  /** The model sidecar path of a layout directory — the ONE place the
    * naming/placement rule lives. */
  def sidecarOf(path: String): String =
    path.stripSuffix("/") + "/" + SidecarName

  // ------------------------------------------------------------ mini JSON
  // Hand-rolled on purpose: the build exposes only spark/java/scala
  // namespaces, and the schema here is closed (objects, arrays, numbers,
  // strings, booleans — no nulls, no escapes beyond \" and \\).

  private[ann] sealed trait J
  private[ann] final case class JObj(fields: Vector[(String, J)]) extends J {
    def apply(k: String): J = fields.find(_._1 == k).map(_._2)
      .getOrElse(throw new IllegalArgumentException(s"missing field $k"))
    def get(k: String): Option[J] = fields.find(_._1 == k).map(_._2)
  }
  private[ann] final case class JArr(items: Vector[J]) extends J
  private[ann] final case class JStr(s: String) extends J
  private[ann] final case class JNum(text: String) extends J
  private[ann] final case class JBool(b: Boolean) extends J

  private def render(j: J, sb: StringBuilder): Unit = j match {
    case JObj(fs) =>
      sb.append('{')
      var first = true
      fs.foreach { case (k, v) =>
        if (!first) sb.append(',')
        first = false
        sb.append('"').append(k).append("\":")
        render(v, sb)
      }
      sb.append('}')
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { v =>
        if (!first) sb.append(',')
        first = false
        render(v, sb)
      }
      sb.append(']')
    case JStr(s) =>
      sb.append('"').append(s.replace("\\", "\\\\").replace("\"", "\\\"")).append('"')
    case JNum(t)  => sb.append(t)
    case JBool(b) => sb.append(b)
  }

  private[ann] def renderJson(j: J): String = {
    val sb = new StringBuilder
    render(j, sb)
    sb.toString
  }

  private[ann] def parseJson(s: String): J = {
    var i = 0
    def err(msg: String) = throw new IllegalArgumentException(s"bad model JSON at $i: $msg")
    def at(): Char = { if (i >= s.length) err("truncated"); s.charAt(i) }
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = { ws(); if (i >= s.length || s.charAt(i) != c) err(s"expected $c"); i += 1 }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (at() != '"') {
        val c = at()
        if (c == '\\') {
          // the writer only ever emits \" and \\ — anything else in a
          // sidecar (a hand edit, a foreign tool's \n or \uXXXX) must
          // fail loudly, not silently parse to the wrong string
          if (i + 1 >= s.length) err("truncated escape")
          val e = s.charAt(i + 1)
          if (e != '"' && e != '\\') err(s"unsupported escape \\$e")
          sb.append(e); i += 2
        }
        else { sb.append(c); i += 1 }
      }
      i += 1
      sb.toString
    }
    def value(): J = {
      ws()
      at() match {
        case '{' =>
          i += 1; ws()
          val fs = Vector.newBuilder[(String, J)]
          if (at() == '}') { i += 1 }
          else {
            var more = true
            while (more) {
              val k = str(); expect(':'); fs += (k -> value()); ws()
              if (at() == ',') { i += 1; ws() }
              else { expect('}'); more = false }
            }
          }
          JObj(fs.result())
        case '[' =>
          i += 1; ws()
          val items = Vector.newBuilder[J]
          if (at() == ']') { i += 1 }
          else {
            var more = true
            while (more) {
              items += value(); ws()
              if (at() == ',') { i += 1; ws() }
              else { expect(']'); more = false }
            }
          }
          JArr(items.result())
        case '"' => JStr(str())
        case 't' => i += 4; JBool(true)
        case 'f' => i += 5; JBool(false)
        case _ =>
          val start = i
          while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
          if (i == start) err("expected a value")
          JNum(s.substring(start, i))
      }
    }
    val v = value()
    ws()
    if (i != s.length) err("trailing content")
    v
  }

  private def num(j: J): String = j match {
    case JNum(t) => t
    case other   => throw new IllegalArgumentException(s"expected number, got $other")
  }
  private def arr(j: J): Vector[J] = j match {
    case JArr(items) => items
    case other       => throw new IllegalArgumentException(s"expected array, got $other")
  }
  private def floats1(j: J): Array[Float] = arr(j).map(x => num(x).toFloat).toArray
  private def floats2(j: J): Array[Array[Float]] = arr(j).map(floats1).toArray
  private def floats3(j: J): Array[Array[Array[Float]]] = arr(j).map(floats2).toArray
  // fail at SAVE time on non-finite values: Float.toString renders NaN /
  // Infinity as bare tokens the parser (rightly) rejects, so without
  // this check a poisoned model (0/0 from a zero vector under cosine, a
  // corrupt embedding) would persist fine and only fail at cold open
  private def jFloats1(a: Array[Float]): J = JArr(a.toVector.map { f =>
    require(java.lang.Float.isFinite(f),
      s"non-finite model value $f — refusing to persist a poisoned model")
    JNum(f.toString)
  })
  private def jFloats2(a: Array[Array[Float]]): J = JArr(a.toVector.map(jFloats1))
  private def jFloats3(a: Array[Array[Array[Float]]]): J = JArr(a.toVector.map(jFloats2))

  // --------------------------------------------------------------- fs io

  /** Write a sidecar atomically: temp file + OVERWRITE rename via
    * FileContext, which replaces the destination in one metadata op on
    * HDFS/local — no window where the old sidecar is deleted and the
    * new one not yet in place (delete-then-rename has exactly that
    * window, and a crash inside it destroys a previously valid layout). */
  private def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val p = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val tmp = new Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def readString(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def kindOf(j: J): String = j match {
    case o: JObj => o("kind") match {
      case JStr(k) => k
      case other   => throw new IllegalArgumentException(s"bad kind $other")
    }
    case other => throw new IllegalArgumentException(s"expected object, got $other")
  }

  private def load(spark: SparkSession, path: String, kind: String): JObj =
    parseJson(readString(spark, path)) match {
      case o: JObj =>
        require(kindOf(o) == kind, s"sidecar $path holds a ${kindOf(o)} model, expected $kind")
        o
      case other => throw new IllegalArgumentException(s"expected object, got $other")
    }

  // ------------------------------------------------------------- models

  /** Measured recall-curve sidecar: the ladder of operating points
    * (nprobe, candidates, beam, overlap@limit) GraftDb.overlapCurve
    * measures against exact flat — persisted beside an at-rest index so
    * a reopened session resolves `recallTarget` knobs from the stored
    * curve instead of re-measuring. */
  val RecallCurveName = "_graft_recall_curve.json"

  def saveRecallCurve(spark: SparkSession, dir: String, limit: Int,
      points: Seq[(Int, Int, Int, Double, Double)]): Unit =
    writeString(spark, dir.stripSuffix("/") + "/" + RecallCurveName,
      renderJson(JObj(Vector(
        "kind" -> JStr("recall_curve"), "limit" -> JNum(limit.toString),
        "points" -> JArr(points.toVector.map { case (np, cand, beam, ov, fill) =>
          JArr(Vector(JNum(np.toString), JNum(cand.toString),
            JNum(beam.toString), JNum(ov.toString), JNum(fill.toString)))
        })))))

  /** (limit, points) when a curve sidecar exists under `dir`; each
    * point is (nprobe, candidates, beam, overlap, fill). */
  def loadRecallCurve(spark: SparkSession,
      dir: String): Option[(Int, Seq[(Int, Int, Int, Double, Double)])] = {
    val p = dir.stripSuffix("/") + "/" + RecallCurveName
    if (!exists(spark, p)) None
    else {
      val o = load(spark, p, "recall_curve")
      val pts = arr(o("points")).map { j =>
        val a = arr(j)
        (num(a(0)).toInt, num(a(1)).toInt, num(a(2)).toInt,
          num(a(3)).toDouble, num(a(4)).toDouble)
      }
      Some((num(o("limit")).toInt, pts))
    }
  }

  def saveSq8(spark: SparkSession, path: String, m: Sq8.Model): Unit =
    writeString(spark, path, renderJson(JObj(Vector(
      "kind" -> JStr("sq8"), "mn" -> jFloats1(m.mn), "rng" -> jFloats1(m.rng)))))

  def loadSq8(spark: SparkSession, path: String): Sq8.Model = {
    val o = load(spark, path, "sq8")
    Sq8.Model(floats1(o("mn")), floats1(o("rng")))
  }

  /** RaBitQ = config scalars + the centroid (f64 — Double.toString
    * round-trips exactly, so a loaded model estimates bit-identically). */
  def saveRabitq(spark: SparkSession, path: String, m: RaBitQ.Model): Unit =
    writeString(spark, path, renderJson(JObj(Vector(
      "kind" -> JStr("rabitq"),
      "dims" -> JNum(m.config.dims.toString),
      "rounds" -> JNum(m.config.rounds.toString),
      "seed" -> JNum(m.config.seed.toString),
      "centered" -> JBool(m.config.centered),
      "ordered" -> JBool(m.config.ordered),
      "centroid" -> JArr(m.centroid.toVector.map { d =>
        require(java.lang.Double.isFinite(d),
          s"non-finite model value $d — refusing to persist a poisoned model")
        JNum(d.toString)
      })))))

  def loadRabitq(spark: SparkSession, path: String): RaBitQ.Model = {
    val o = load(spark, path, "rabitq")
    val bool: J => Boolean = { case JBool(b) => b
      case other => throw new IllegalArgumentException(s"expected bool, got $other") }
    RaBitQ.Model(
      RaBitQ.Config(num(o("dims")).toInt, num(o("rounds")).toInt,
        num(o("seed")).toLong, bool(o("centered")), bool(o("ordered"))),
      arr(o("centroid")).map(x => num(x).toDouble).toArray)
  }

  def savePq(spark: SparkSession, path: String,
      codebooks: Array[Array[Array[Float]]]): Unit =
    writeString(spark, path, renderJson(JObj(Vector(
      "kind" -> JStr("pq"), "codebooks" -> jFloats3(codebooks)))))

  def loadPq(spark: SparkSession, path: String): Array[Array[Array[Float]]] =
    floats3(load(spark, path, "pq")("codebooks"))

  /** OPQ = the rotation seed (signs regenerate deterministically) + the
    * codebooks trained in the rotated space. */
  def saveOpq(spark: SparkSession, path: String, seed: Long,
      codebooks: Array[Array[Array[Float]]]): Unit =
    writeString(spark, path, renderJson(JObj(Vector(
      "kind" -> JStr("opq"), "seed" -> JNum(seed.toString),
      "codebooks" -> jFloats3(codebooks)))))

  def loadOpq(spark: SparkSession, path: String): (Long, Array[Array[Array[Float]]]) = {
    val o = load(spark, path, "opq")
    (num(o("seed")).toLong, floats3(o("codebooks")))
  }

  /** Sharded-HNSW layout sidecar: shard count + graph params (the
    * adjacency itself lives in the parquet state rows) + a version
    * stamp that changes on EVERY rewrite/append — readers fold it into
    * their cache keys, which is how executor-cached graphs on a real
    * cluster learn the layout changed (the driver cannot reach their
    * memory). */
  def saveHnsw(spark: SparkSession, path: String, shards: Int,
      p: graft.index.Hnsw.Params,
      version: String = java.util.UUID.randomUUID().toString): Unit =
    writeString(spark, path, renderJson(JObj(Vector(
      "kind" -> JStr("hnsw"), "shards" -> JNum(shards.toString),
      "m" -> JNum(p.m.toString), "m0" -> JNum(p.m0.toString),
      "ef_construction" -> JNum(p.efConstruction.toString),
      "ef_search" -> JNum(p.efSearch.toString),
      "max_level" -> JNum(p.maxLevel.toString),
      "version" -> JStr(version)))))

  def loadHnsw(spark: SparkSession,
      path: String): (Int, graft.index.Hnsw.Params, String) = {
    val o = load(spark, path, "hnsw")
    (num(o("shards")).toInt, graft.index.Hnsw.Params(
      m = num(o("m")).toInt, m0 = num(o("m0")).toInt,
      efConstruction = num(o("ef_construction")).toInt,
      efSearch = num(o("ef_search")).toInt,
      maxLevel = num(o("max_level")).toInt),
      o.get("version").map { case JStr(v) => v; case _ => "v0" }.getOrElse("v0"))
  }

  def saveVamana(spark: SparkSession, path: String, shards: Int,
      p: graft.index.Vamana.Params,
      version: String = java.util.UUID.randomUUID().toString): Unit =
    writeString(spark, path, renderJson(JObj(Vector(
      "kind" -> JStr("vamana"), "shards" -> JNum(shards.toString),
      "max_degree" -> JNum(p.maxDegree.toString),
      "build_beam" -> JNum(p.buildBeam.toString),
      "alpha" -> JNum(p.alpha.toString),
      "search_beam" -> JNum(p.searchBeam.toString),
      "coded" -> JBool(p.coded),
      "version" -> JStr(version)))))

  def loadVamana(spark: SparkSession,
      path: String): (Int, graft.index.Vamana.Params, String) = {
    val o = load(spark, path, "vamana")
    (num(o("shards")).toInt, graft.index.Vamana.Params(
      maxDegree = num(o("max_degree")).toInt,
      buildBeam = num(o("build_beam")).toInt,
      alpha = num(o("alpha")).toDouble,
      searchBeam = num(o("search_beam")).toInt,
      // absent in pre-coded sidecars — default false keeps them serving
      coded = o.get("coded").collect { case JBool(b) => b }.getOrElse(false)),
      o.get("version").map { case JStr(v) => v; case _ => "v0" }.getOrElse("v0"))
  }

  def saveIvf(spark: SparkSession, path: String,
      centroids: Array[Array[Float]]): Unit =
    writeString(spark, path, renderJson(JObj(Vector(
      "kind" -> JStr("ivf"), "centroids" -> jFloats2(centroids)))))

  def loadIvf(spark: SparkSession, path: String): Array[Array[Float]] =
    floats2(load(spark, path, "ivf")("centroids"))

  def saveIvfPq(spark: SparkSession, path: String,
      centroids: Array[Array[Float]], codebooks: Array[Array[Array[Float]]],
      residual: Boolean): Unit =
    writeString(spark, path, renderJson(JObj(Vector(
      "kind" -> JStr("ivfpq"), "residual" -> JBool(residual),
      "centroids" -> jFloats2(centroids), "codebooks" -> jFloats3(codebooks)))))

  /** IVF x RaBitQ = coarse centroids (f32) + the shared rotation config
    * (seeded — signs regenerate deterministically; the per-cell
    * centering points ARE the centroids, so nothing else is trained). */
  def saveIvfRabitq(spark: SparkSession, path: String,
      m: IvfRaBitQ.Model): Unit =
    writeString(spark, path, renderJson(JObj(Vector(
      "kind" -> JStr("ivfrabitq"),
      "dims" -> JNum(m.config.dims.toString),
      "rounds" -> JNum(m.config.rounds.toString),
      "seed" -> JNum(m.config.seed.toString),
      "ordered" -> JBool(m.config.ordered),
      "centroids" -> jFloats2(m.centroids)))))

  def loadIvfRabitq(spark: SparkSession, path: String): IvfRaBitQ.Model = {
    val o = load(spark, path, "ivfrabitq")
    val bool: J => Boolean = { case JBool(b) => b
      case other => throw new IllegalArgumentException(s"expected bool, got $other") }
    IvfRaBitQ.Model(floats2(o("centroids")),
      RaBitQ.Config(num(o("dims")).toInt, num(o("rounds")).toInt,
        num(o("seed")).toLong, centered = true, ordered = bool(o("ordered"))))
  }

  /** (centroids, codebooks, residual). */
  def loadIvfPq(spark: SparkSession,
      path: String): (Array[Array[Float]], Array[Array[Array[Float]]], Boolean) = {
    val o = load(spark, path, "ivfpq")
    val residual = o("residual") match {
      case JBool(b) => b
      case other    => throw new IllegalArgumentException(s"bad residual $other")
    }
    (floats2(o("centroids")), floats3(o("codebooks")), residual)
  }
}
