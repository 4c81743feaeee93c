package graft
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions.{col, expr}
class ScratchSpec extends SparkSpec {
  implicit val sqlCtx = spark.sqlContext
  import spark.implicits._
  def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
  test("C: exact replica of failing spec") {
    val leftRows = Seq(("u", ts(0), "a"), ("u", ts(500), "b"), ("w", ts(0), "c"))
    val rightRows = Seq(("u", ts(10), "x"), ("u", ts(100), "y"),
      ("u", ts(101), "z"), ("v", ts(10), "q"))
    val lIn = MemoryStream[(String, java.sql.Timestamp, String)]
    val rIn = MemoryStream[(String, java.sql.Timestamp, String)]
    val lDf = lIn.toDS().toDF("lkey", "lts", "lid").withWatermark("lts", "5 seconds")
    val rDf = rIn.toDS().toDF("rkey", "rts", "rid").withWatermark("rts", "5 seconds")
    val joined = lDf.join(rDf, expr(
      "lkey = rkey AND rts >= lts AND rts <= lts + interval 100 seconds"))
      .select(col("lid"), col("rid"))
    val q = joined.writeStream.format("memory").queryName("sc_band")
      .outputMode(OutputMode.Append()).start()
    try {
      lIn.addData(leftRows.take(2): _*); rIn.addData(rightRows.take(2): _*)
      q.processAllAvailable()
      println("RESULT_C1=" + spark.table("sc_band").count())
      lIn.addData(leftRows.drop(2): _*); rIn.addData(rightRows.drop(2): _*)
      q.processAllAvailable()
      println("RESULT_C2=" + spark.table("sc_band").count())
      lIn.addData(("hb", ts(100000), "hb")); rIn.addData(("hb2", ts(100000), "hb"))
      q.processAllAvailable()
      println("RESULT_C3=" + spark.table("sc_band").count())
      spark.table("sc_band").show(false)
    } finally q.stop()
  }
}
