package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.RunGuard.BatchMsg

/** File-based control topic — the Pub/Sub work-queue re-expressed
  * (SURVEY §2.1 "message sink/source", reference publish:
  * app/cloud-sql-query-runner/main.py:59-65, consume:
  * app/cloud-sql-exporter/main.py:29-33).
  *
  * Message format parity: the payload is base64 of the comma-joined table
  * list (the reference's wire encoding) plus string attributes batch_no /
  * max_batches, one message per file. Batch consumption is LIFO per the
  * exporter's `pop()` loop; streaming consumption is a checkpointed
  * `readStream.text` over the topic directory — Spark's new-file
  * detection IS the object-finalize trigger semantics.
  */
object MessageQueue {

  /** The wire encoding shared by EVERY transport (file topic, socket
    * push): base64 of the comma-joined table list + string attrs —
    * the reference's Pub/Sub message shape.
    */
  def encode(msg: BatchMsg): String = {
    val b64 = Base64.getEncoder.encodeToString(msg.payload.getBytes(StandardCharsets.UTF_8))
    s"$b64,${msg.batchNo},${msg.maxBatches}"
  }

  /** Publish a batch message to a topic directory (one file per message,
    * monotonically named so arrival order is recoverable).
    */
  def publish(topicDir: String, msg: BatchMsg): String = {
    Files.createDirectories(Paths.get(topicDir))
    val name = f"msg-${System.nanoTime()}%020d.txt"
    Files.writeString(Paths.get(s"$topicDir/$name"), encode(msg))
    name
  }

  /** Decode one wire line back to a BatchMsg (base64 payload + attrs). */
  def decode(line: String): BatchMsg = {
    val Array(b64, no, max) = line.split(",", 3)
    val payload = new String(Base64.getDecoder.decode(b64), StandardCharsets.UTF_8)
    BatchMsg(payload.split(",").toSeq.filter(_.nonEmpty), no.toInt, max.toInt)
  }

  /** Peek all pending messages WITH their file names, oldest first;
    * tables within each message in LIFO order (reference pop()
    * semantics). No ack — pair with [[ack]] after successful processing
    * so a crash mid-batch leaves the messages for an idempotent replay.
    */
  def peekAll(topicDir: String): Seq[(String, BatchMsg)] = {
    val dir = Paths.get(topicDir)
    if (!Files.exists(dir)) Seq.empty
    else {
      val stream = Files.list(dir)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, BatchMsg)]
      try {
        val files = stream.iterator()
        while (files.hasNext) {
          val f = files.next()
          if (f.getFileName.toString.startsWith("msg-"))
            buf += ((f.getFileName.toString, decode(Files.readString(f))))
        }
      } finally stream.close() // Files.list holds a directory fd until closed
      buf.sortBy(_._1).map { case (n, m) => (n, m.copy(tables = m.tables.reverse)) }.toSeq
    }
  }

  /** Ack EXACTLY the named message files by moving them to a SIBLING
    * `<topicDir>.processed` directory (sibling, not subdir, so
    * `readStreamed`'s file listing over the topic never sees them).
    * Acking by name closes the publish window: a message that arrived
    * after the peek stays on the topic for the next run.
    */
  def ack(topicDir: String, names: Seq[String]): Unit =
    if (names.nonEmpty) {
      val dir = Paths.get(topicDir)
      val processed = dir.resolveSibling(dir.getFileName.toString + ".processed")
      Files.createDirectories(processed)
      names.foreach { name =>
        val src = dir.resolve(name)
        if (Files.exists(src))
          Files.move(src, processed.resolve(name),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

  /** Batch-consume all pending messages: peek + (when ack=true) ack those
    * same files — at-most-once drain. `ack` is deliberately REQUIRED: a
    * default once flipped silently from read-only to destructive drain,
    * so every caller must now state which they mean.
    */
  def consumeAll(topicDir: String, ack: Boolean): Seq[BatchMsg] = {
    val peeked = peekAll(topicDir)
    if (ack) this.ack(topicDir, peeked.map(_._1))
    peeked.map(_._2)
  }

  /** Streaming consume: checkpointed file stream over the topic dir —
    * each new message file becomes a row (payload decoded, attrs split).
    */
  def readStreamed(spark: SparkSession, topicDir: String): DataFrame =
    spark.readStream
      .format("text")
      .load(topicDir)
      .select(split(col("value"), ",", 3).as("parts"))
      .select(
        unbase64(col("parts").getItem(0)).cast("string").as("payload"),
        col("parts").getItem(1).cast("int").as("batch_no"),
        col("parts").getItem(2).cast("int").as("max_batches"))

  /** Decode broker-push delivery lines `msg_id,<wire>` into
    * (msg_id, payload, batch_no, max_batches) — the transport-agnostic
    * consume projection. A push transport (Pub/Sub) attaches a broker
    * message id to every delivery BECAUSE its contract is at-least-once:
    * an unacked message is RE-DELIVERED, and the consumer's half of the
    * contract is to dedupe on the id. The file topic gets the same
    * property from file names; this is its twin for id-carrying line
    * transports.
    */
  def decodeDelivery(lines: DataFrame): DataFrame =
    lines
      .select(split(col("value"), ",", 4).as("parts"))
      .select(
        col("parts").getItem(0).as("msg_id"),
        unbase64(col("parts").getItem(1)).cast("string").as("payload"),
        col("parts").getItem(2).cast("int").as("batch_no"),
        col("parts").getItem(3).cast("int").as("max_batches"))

  /** SOCKET-transport consume (the non-file control-plane twin, round-14
    * verdict #7): `msg_id,<wire>` lines pushed over TCP, decoded by
    * [[decodeDelivery]]. Spark's socket source keeps no replayable
    * offsets of its own — which is the honest model of a broker PUSH
    * endpoint: what arrives is whatever the broker chose to send,
    * including ack-timeout re-deliveries, and exactly-once is the
    * consumer's job (dedupe on msg_id; QueueAndStateSpec's re-delivery
    * gate pins it).
    */
  def readSocket(spark: SparkSession, host: String, port: Int): DataFrame =
    decodeDelivery(
      spark.readStream.format("socket").option("host", host).option("port", port).load())
}
