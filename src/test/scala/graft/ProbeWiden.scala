package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** One-off: does the Spark 4.1 parquet reader upcast widened types
  * (int32 file read as LONG etc.)? */
object ProbeWiden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = "/tmp/probe_widen_" + System.nanoTime()
    spark.range(0, 100).selectExpr("CAST(id AS INT) AS a",
      "CAST(id AS FLOAT) AS b", "CAST(id AS DECIMAL(9,2)) AS c",
      "CAST(id AS SMALLINT) AS d")
      .write.parquet(p)
    def tryRead(label: String, sch: StructType): Unit =
      try {
        val r = spark.read.schema(sch).parquet(p)
          .selectExpr("sum(a)", "sum(b)", "sum(c)", "sum(d)").head()
        println(s"[widen] $label OK: $r")
      } catch { case e: Throwable =>
        println(s"[widen] $label FAIL: " +
          e.getMessage.linesIterator.next()) }
    tryRead("int->long, float->double, dec(9,2)->dec(14,2), short->int",
      StructType(Seq(StructField("a", LongType),
        StructField("b", DoubleType),
        StructField("c", DecimalType(14, 2)),
        StructField("d", IntegerType))))
    tryRead("int->double", StructType(Seq(StructField("a", DoubleType),
      StructField("b", DoubleType), StructField("c", DecimalType(9, 2)),
      StructField("d", ShortType))))
    tryRead("int->dec(10,0)", StructType(Seq(
      StructField("a", DecimalType(10, 0)),
      StructField("b", FloatType), StructField("c", DecimalType(9, 2)),
      StructField("d", ShortType))))
    // vectorized off path too
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    tryRead("non-vectorized int->long", StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType),
      StructField("c", DecimalType(14, 2)),
      StructField("d", IntegerType))))
    spark.stop()
  }
}
