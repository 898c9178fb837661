package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print Spark-side schemas of the testdata tables. */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build(4, "schema-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- graft.Tables.all) {
      val df = graft.Tables.load(spark, "/root/testdata/sf0.001", t)
      println(s"== $t: ${df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    spark.stop()
  }
}
