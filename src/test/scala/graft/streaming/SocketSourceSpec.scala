package graft.streaming

import java.io.PrintWriter
import java.net.ServerSocket
import java.nio.file.Files

import graft.SparkSpec
import graft.adsb.Sbs

/** S1 for real: a local TCP server plays dump1090 port 30003, the
  * streaming query consumes it through `socketLines` → parse →
  * sessionize (mirrors the reference's live-socket round-trip test,
  * `src/tests/test_parser.py:26-84`). */
class SocketSourceSpec extends SparkSpec {

  test("socket source streams SBS-1 lines end-to-end") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    val lines = {
      val in = getClass.getResourceAsStream("/adsb/adsb_message_stream.txt")
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try src.getLines().take(400).toVector finally src.close()
    }
    val feeder = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
      Thread.sleep(3000)  // let the source drain before close
      sock.close(); server.close()
    })
    feeder.setDaemon(true)
    feeder.start()

    val ckpt = Files.createTempDirectory("graft-sock-ckpt").toString
    val q = AdsbStream.sessionize(
      Sbs.messages(AdsbStream.socketLines(spark, "127.0.0.1", port)))
      .writeStream
      .format("memory").queryName("sock_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    // poll until rows arrive or timeout
    val deadline = System.currentTimeMillis() + 30000
    var n = 0L
    while (n == 0 && System.currentTimeMillis() < deadline) {
      Thread.sleep(500)
      q.processAllAvailable()
      n = spark.table("sock_out").count()
    }
    q.stop()
    assert(n > 0, "no rows arrived over the socket within 30 s")
    val kinds = spark.table("sock_out").select("kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds.contains("position"))
  }
}
