package graft

import org.apache.spark.sql.functions._

import graft.functions.Drift

/** Distribution-drift monitoring: PSI buckets and standardized mean
  * difference, hand-derived. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psi: identical distributions score zero, shifted ones large; clamping") {
    val ref = (1 to 100).map(i => i.toDouble).toDF("x")
    val same = Drift.psi(ref, ref, "x", buckets = 10)
      .collect().map(r => (r.getInt(0), r.getDouble(3)))
    assert(same.length === 10)
    assert(same.forall(_._2 === 0.0), "pa == pb gives exactly zero terms")
    // hard shift: everything lands in the top bucket (clamped), PSI huge
    val cur = (1 to 100).map(i => 1000.0 + i).toDF("x")
    val shifted = Drift.psi(ref, cur, "x", buckets = 10)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val top = shifted.find(_._1 == 9).get
    assert(top._3 === 1.0, "out-of-range current mass clamps into the edge bucket")
    assert(shifted.map(_._4).sum > 0.25, "rule-of-thumb drifted threshold")
    // empty-bucket eps substitution keeps every term finite
    assert(shifted.forall(t => !t._4.isNaN && !t._4.isInfinite))
    // nulls are ignored, not bucketed: 3 non-null rows all land in one
    // bucket, so its fraction is exactly 1.0 (a counted null would make
    // it 0.75); the nine empty buckets carry only the eps clamp
    val withNull = (Seq.fill(3)(Some(5.0)) ++ Seq(None)).toDF("x")
    val n = Drift.psi(ref, withNull, "x").agg(max("cur_frac")).head.getDouble(0)
    assert(n === 1.0)
  }

  test("psiByGroup: per-group buckets, one drifted group flagged, single-sided groups skipped") {
    val ref = ((1 to 50).map(i => ("en", i.toDouble)) ++
      (1 to 50).map(i => ("de", i.toDouble)) ++
      Seq(("const", 7.0), ("const", 7.0))).toDF("lang", "x")
    // en stable, de hard-shifted; 'const' has no range; 'fr' only in cur
    val cur = ((1 to 50).map(i => ("en", i.toDouble)) ++
      (1 to 50).map(i => ("de", 1000.0 + i)) ++
      Seq(("fr", 3.0))).toDF("lang", "x")
    val out = Drift.psiByGroup(ref, cur, "x", "lang")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(4))
    val byLang = out.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byLang.keySet === Set("en", "de"), "rangeless/cur-only groups skipped")
    assert(byLang("en") === 0.0, "identical group scores exactly zero")
    assert(byLang("de") > 0.25, "shifted group flagged")
    assert(out.length === 20)
  }

  test("psi/psiCategorical/psiByGroup stay finite on an empty current side") {
    val ref = (1 to 100).map(i => i.toDouble).toDF("x")
    val empty = Seq.empty[Double].toDF("x")
    // 0/0 = NaN passes greatest() in Spark — the eps guard must hold
    val terms = Drift.psi(ref, empty, "x").collect().map(_.getDouble(3))
    assert(terms.forall(t => !t.isNaN && !t.isInfinite))
    assert(terms.sum > 0.25, "an emptied batch is maximal drift, not NaN")
    val refC = Seq("a", "a", "b").toDF("x")
    val emptyC = Seq.empty[String].toDF("x")
    val ct = Drift.psiCategorical(refC, emptyC, "x").collect().map(_.getDouble(3))
    assert(ct.forall(t => !t.isNaN && !t.isInfinite))
    // a reference group ABSENT from current is emitted at the eps floor
    val refG = (1 to 50).map(i => ("en", i.toDouble)).toDF("lang", "x")
    val curG = Seq(("xx", 1.0)).toDF("lang", "x")
    val g = Drift.psiByGroup(refG, curG, "x", "lang").collect()
    assert(g.nonEmpty && g.forall(_.getString(0) == "en"))
    assert(g.forall(r => !r.getDouble(4).isNaN))
  }

  test("smd: hand-derived pooled std and sign") {
    // ref {0,2}: mean 1, var 1; cur {3,5}: mean 4, var 1 -> pooled 1, smd 3
    val ref = Seq(0.0, 2.0).toDF("x")
    val cur = Seq(3.0, 5.0).toDF("x")
    val r = Drift.standardizedMeanDiff(ref, cur, "x").collect().head
    assert(r.getDouble(0) === 1.0 && r.getDouble(1) === 4.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-12)
    // symmetric: swapping sides flips the sign
    val s = Drift.standardizedMeanDiff(cur, ref, "x").collect().head
    assert(math.abs(s.getDouble(3) + 3.0) < 1e-12)
  }

  test("categorical psi: identical zero, unseen category flagged, null aligns") {
    val ref = (Seq.fill(50)(Some("en")) ++ Seq.fill(30)(Some("de")) ++
      Seq.fill(20)(None: Option[String])).toDF("lang")
    val same = Drift.psiCategorical(ref, ref, "lang")
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(3))
    assert(same.length === 3)
    assert(same.forall(_._2 === 0.0))
    assert(same.exists(_._1.isEmpty), "null category is one aligned row")
    // current side has a category the reference never saw
    val cur = (Seq.fill(50)(Some("en")) ++ Seq.fill(50)(Some("xx")))
      .toDF("lang")
    val out = Drift.psiCategorical(ref, cur, "lang")
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(3)).toMap
    assert(out(Some("xx")) > 1.0, "unseen category is maximally flagged")
    assert(out.keySet === Set(Some("en"), Some("de"), Some("xx"), None))
  }

  test("embedding psi: cell-mix drift flagged, identical zero, nulls skipped, hand-checked assignment") {
    // two fixed centroids on the x axis; vectors near +x or -x
    val cents = Array(Array(1f, 0f), Array(-1f, 0f))
    def vecs(plus: Int, minus: Int): org.apache.spark.sql.DataFrame =
      ((0 until plus).map(i => Array(0.9f + 0.01f * (i % 5), 0.1f)) ++
        (0 until minus).map(i => Array(-0.9f - 0.01f * (i % 5), 0.1f)))
        .toDF("vector")
    val ref = vecs(50, 50)
    val same = Drift.psiEmbedding(ref, ref, "vector", cents)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(same.keySet === Set(0, 1), "both cells observed")
    assert(same.values.forall(_ === 0.0), "identical mix scores exactly zero")
    // current batch collapses onto the +x cluster: cell-mass movement a
    // scalar column monitor would miss
    val cur = vecs(95, 5)
    val out = Drift.psiEmbedding(ref, cur, "vector", cents)
    val psi = out.agg(sum("psi_term")).head.getDouble(0)
    assert(psi > 0.25, s"collapsed mix must flag as drifted, psi=$psi")
    val shares = out.collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(shares(0) === ((0.5, 0.95)) && shares(1) === ((0.5, 0.05)),
      s"hand-checked cell shares: $shares")
    // null vectors contribute nothing (the ref mix stays 50/50)
    val withNull = ref.union(Seq(null.asInstanceOf[Array[Float]]).toDF("vector"))
    val n = Drift.psiEmbedding(withNull, ref, "vector", cents)
      .agg(sum("psi_term")).head.getDouble(0)
    assert(n === 0.0, "null vector must be skipped, not assigned")
  }
}
