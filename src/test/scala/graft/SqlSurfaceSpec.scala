package graft

/** The SQL surface: kernels registered via GraftExtensions and used
  * from pure spark.sql. */
class SqlSurfaceSpec extends SparkSpec {

  test("text dedup kernels callable from SQL: shingles, minhash banding (spec + fast)") {
    GraftExtensions.register(spark)
    // shingles agree with the kernel
    val sh = spark.sql(
      "SELECT text_distinct_shingles('a b c d', 2) AS s").head().getSeq[String](0)
    assert(sh === graft.expr.TextKernels.distinctShingles("a b c d", 2).toSeq)
    // near-dup texts collide on at least one band; unrelated texts on none
    val collide = spark.sql("""
      SELECT size(array_intersect(
        text_minhash_bands('the quick brown fox jumps over the lazy dog', 2, 8, 4),
        text_minhash_bands('the quick brown fox jumps over the lazy dog x', 2, 8, 4))) AS n""")
      .head().getInt(0)
    assert(collide >= 1)
    val disjoint = spark.sql("""
      SELECT size(array_intersect(
        text_minhash_bands('alpha beta gamma delta epsilon zeta', 2, 8, 4),
        text_minhash_bands('one two three four five six seven', 2, 8, 4))) AS n""")
      .head().getInt(0)
    assert(disjoint === 0)
    // fast path: long keys, same collision behavior, matches the kernel
    val fast = spark.sql(
      "SELECT text_minhash_bands_fast('a b c d e f', 2, 8, 4) AS b").head().getSeq[Long](0)
    assert(fast === graft.expr.TextKernels
      .minhashBandKeysFast("a b c d e f", 2, 8, 4).toSeq)
    // compression ratio: empty = 1, repetitive < 1, explicit level works
    val crs = spark.sql("""SELECT text_compression_ratio(''),
      text_compression_ratio(repeat('spam ham ', 200)),
      text_compression_ratio(repeat('spam ham ', 200), 9)""").head()
    assert(crs.getDouble(0) === 1.0)
    assert(crs.getDouble(1) < 0.1 && crs.getDouble(2) <= crs.getDouble(1))
  }

  test("vector kernels callable from SQL") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("a", Seq(1.0f, 0.0f)), ("b", Seq(0.0f, 1.0f)), ("c", Seq(-1.0f, 0.0f)))
      .toDF("id", "vector").createOrReplaceTempView("vecs")

    val top = spark.sql("""
      SELECT id, vec_distance('l2', vector, array(1.0F, 0.0F)) AS d
      FROM vecs ORDER BY d ASC, id ASC LIMIT 2""").collect()
    assert(top.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(top.head.getDouble(1) === 0.0)

    val cos = spark.sql(
      "SELECT vec_distance('true_cosine', array(1.0F,0.0F), array(-1.0F,0.0F))")
      .head().getDouble(0)
    assert(cos === -1.0)

    val packed = spark.sql("""
      SELECT vec_packed_hamming(vec_pack_sign_bits(array(1.0F, -1.0F)),
                                vec_pack_sign_bits(array(-1.0F, 1.0F)), 2) AS h""")
      .head().getDouble(0)
    assert(packed === 2.0)

    val ms = spark.sql("""
      SELECT vec_max_sim('inner_product',
        array(array(1.0F, 0.0F), array(0.0F, 1.0F)),
        array(array(1.0F, 0.0F), array(0.0F, 1.0F))) AS s""").head().getDouble(0)
    assert(ms === 2.0)

    val norm = spark.sql("SELECT vec_normalize(1, array(3.0F, 4.0F))")
      .head().getSeq[Float](0)
    assert(norm === Seq(0.6f, 0.8f))

    // packed-f32 binary layout: roundtrip + in-place distance from SQL
    val rt = spark.sql(
      "SELECT vec_unpack_f32(vec_pack_f32(array(1.5F, -2.25F, 0.0F)))")
      .head().getSeq[Float](0)
    assert(rt === Seq(1.5f, -2.25f, 0.0f))
    val bd = spark.sql("""
      SELECT vec_binary_distance('inner_product',
        vec_pack_f32(array(1.0F, 2.0F)), array(3.0F, 4.0F))""").head().getDouble(0)
    assert(bd === 11.0)

    // non-foldable query side: both operands are per-row columns
    val bdCol = spark.sql("""
      SELECT id, vec_binary_distance('inner_product',
        vec_pack_f32(vector), vector) AS selfdot
      FROM vecs ORDER BY id""").collect()
    assert(bdCol.map(_.getDouble(1)).toSeq === Seq(1.0, 1.0, 1.0))

    // ADC lookup: codes X'0001' with stride 2 -> table[0*2+0] + table[1*2+1]
    val adc = spark.sql("""
      SELECT vec_adc_distance(X'0001', array(10.0D, 20.0D, 30.0D, 40.0D), 2)""")
      .head().getDouble(0)
    assert(adc === 50.0)
  }

  test("text_nfc + canonicalize: NFD==NFC keys, case/space fold, null-safe, idempotent") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.text.TextAnalysis
    val nfd = "CAFE\u0301  touche\u0301" // E + combining acute, doubled space
    val nfc = "caf\u00e9 touch\u00e9"
    // SQL surface: NFC composes the combining pair
    val viaSql = spark.sql(s"SELECT text_nfc('$nfd') AS t").head().getString(0)
    assert(viaSql === "CAF\u00c9  touch\u00e9")
    // canonical keys collapse encoding + case + spacing accidents
    val keys = Seq(("a", nfd), ("b", " " + nfc + " "), ("c", "other text"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.canonicalize(col("text")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(keys("a") === keys("b"))
    assert(keys("a") === nfc)
    assert(keys("c") === "other text")
    // idempotent; null stays null
    val again = Seq(keys("a")).toDF("text")
      .select(TextAnalysis.canonicalize(col("text"))).head().getString(0)
    assert(again === keys("a"))
    val n = Seq[Option[String]](None).toDF("text")
      .select(TextAnalysis.nfc(col("text"))).head()
    assert(n.isNullAt(0))
  }

  test("web surface: text_strip_html / text_link_density / url_* from pure SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql("""SELECT
      text_strip_html('<p>Hi &amp; <b>bye</b></p><script>x</script>') AS t,
      text_link_density('<a>four</a> and more') AS d,
      url_host('https://u@www.Ex.co.uk:81/a/b?q#f') AS h,
      url_domain('https://u@www.Ex.co.uk:81/a/b?q#f') AS dom,
      url_path('https://u@www.Ex.co.uk:81/a/b?q#f') AS p,
      url_canonicalize('https://WWW.Ex.com/a/?utm_source=x&b=2&a=1#f') AS c""").head()
    assert(r.getString(0) === "Hi & bye")
    assert(r.getDouble(1) === 4.0 / 13)
    assert(r.getString(2) === "www.ex.co.uk")
    assert(r.getString(3) === "ex.co.uk")
    assert(r.getString(4) === "/a/b")
    assert(r.getString(5) === "ex.com/a?a=1&b=2")
  }
}
