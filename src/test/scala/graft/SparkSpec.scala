package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session; >1 shuffle partition on purpose so ordering
  * nondeterminism would surface (SURVEY §7.4 point 4). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def embeddingRows(rows: Seq[(String, Array[Float])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType))))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, v) => Row(id, v.toSeq) }: _*),
      schema).repartition(4)
  }

  def multiVectorRows(rows: Seq[(String, Seq[Array[Float]])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("vectors", ArrayType(ArrayType(FloatType)))))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, vs) => Row(id, vs.map(_.toSeq)) }: _*),
      schema).repartition(4)
  }
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
