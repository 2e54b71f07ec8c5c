package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Sessions

/** Runnable demo of the streaming inverted-index maintenance
  * ([[IndexStream]]): replays a testdata `documents` table as a file
  * stream in >=2 micro-batches and prints summary stats of the final
  * per-term segments — the state IndexStreamSpec proves equal to the
  * batch q_inverted_index build.
  *
  * Usage: runMain graft.streaming.IndexStreamMain [sfDir]
  */
object IndexStreamMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.build("graft-index-stream")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    try {
      val root = Files.createTempDirectory("index-stream-demo").toString
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      docs.filter(col("doc_id") % 2 === 0).repartition(1)
        .write.mode("append").parquet(s"$root/in")
      docs.filter(col("doc_id") % 2 =!= 0).repartition(1)
        .write.mode("append").parquet(s"$root/in")
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$root/in")
        .as[(Long, String)]
      val q = IndexStream.segments(spark, stream)
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = spark.read.parquet(s"$root/out")
      val finals = rows
        .join(rows.groupBy("term").agg(max("df").as("df")), Seq("term", "df"))
        .distinct()
      val agg = finals.agg(
        count(lit(1)).as("terms"),
        sum("total_tf").as("tokens"),
        max("df").as("max_df")).collect().head
      println(
        s"[index-stream] terms=${agg.getAs[Long]("terms")} " +
          s"tokens=${agg.getAs[Long]("tokens")} max_df=${agg.getAs[Long]("max_df")} " +
          s"emissions=${rows.count()}")
      finals.orderBy(col("df").desc, col("term")).limit(5).collect().foreach { r =>
        println(
          s"[index-stream] term=${r.getAs[String]("term")} df=${r.getAs[Long]("df")} " +
            s"total_tf=${r.getAs[Long]("total_tf")} md5=${r.getAs[String]("postings_md5")}")
      }
    } finally spark.stop()
  }
}
