package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArrowIpc, ArrowIpcSource}

class ArrowIpcSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val format = classOf[ArrowIpcSource].getName

  test("DSv2 source reads back IPC files with schema inference") {
    val dir = Files.createTempDirectory("graft_ipc_src").toString
    val df = Seq(
      (1L, "ann", 2.5, Seq(1.0f, 2.0f)),
      (2L, "bob", -0.5, Seq(3.0f)),
      (3L, null.asInstanceOf[String], 0.0, Seq.empty[Float])
    ).toDF("id", "name", "score", "vec").repartition(2)
    ArrowIpc.writeIpcFiles(df, dir)
    val back = spark.read.format(format).load(dir)
    // source reports everything nullable (Arrow vectors are) — compare
    // names and base types
    assert(back.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq)
    assert(back.rdd.getNumPartitions == 2)   // one partition per file
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("source composes with SQL: filter + aggregate over the DSv2 scan") {
    val dir = Files.createTempDirectory("graft_ipc_sql").toString
    val nodes = SparkEntry.graph(spark, "/root/testdata/sf0.001").nodeScan()
      .select(col("ID").as("id"), element_at(col("LABELS"), 1).as("label"))
    ArrowIpc.writeIpcFiles(nodes.repartition(3), dir)
    val back = spark.read.format(format).load(dir)
    val got = back.where(col("label") === "Customer").count()
    val want = nodes.where(col("label") === "Customer").count()
    assert(got == want && got > 0)
  }

  test("empty directory fails fast at schema inference") {
    val dir = Files.createTempDirectory("graft_ipc_empty").toString
    val ex = intercept[IllegalArgumentException](
      spark.read.format(format).load(dir))
    assert(ex.getMessage.contains("no Arrow IPC files"))
  }
}
