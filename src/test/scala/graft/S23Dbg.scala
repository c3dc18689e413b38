package graft
import org.apache.spark.sql.functions._
class S23Dbg extends SparkSpec {
  test("debug s23 v2") {
    val s = Tables.tune(spark)
    val dir = Tables.scratchDir("s23dbg2_csv", sf)
    Tables.nation(s, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .coalesce(1).write.mode("overwrite").csv(dir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "zz_bad.csv"),
      "notanint,BADLAND,alsobad\nx1,BADTWO,9\n")
    s.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")
    val perm = s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
    println("PERM_AGG " + perm.agg(count(col("n_name")), count(col("_corrupt_record"))).collect()(0))
    val drop = s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .option("mode", "DROPMALFORMED").csv(dir)
    println("DROP_AGG " + drop.agg(count(col("n_name"))).collect()(0))
    println("DROP_SEL " + drop.select(col("n_nationkey"), col("n_name"), col("n_regionkey")).collect().length)
    drop.agg(count(col("n_name"))).explain(true)
  }
}
