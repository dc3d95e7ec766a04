package graft.streaming

import java.io.PrintWriter
import java.net.ServerSocket
import java.util.concurrent.{ExecutorService, Executors}

/** Deterministic stand-in for the reference's Reddit producer + TCP fan-out
  * server (reddit_producer.py:61-169, SURVEY.md S2/S3): serves a fixed
  * sequence of newline-JSON posts to every connecting client over a TCP
  * socket, then emits 1 Hz keepalive messages exactly like the reference
  * (reddit_producer.py:110-115) so the socket-source pipeline can be driven
  * end-to-end with no external feed.
  *
  * Unlike the reference's destructive shared queue (each post reaches only
  * one client), every client receives the full replay — broadcast, the
  * semantics a demo actually wants.
  */
object DemoProducer {

  final class Server private[DemoProducer] (
      val port: Int, socket: ServerSocket, pool: ExecutorService)
      extends AutoCloseable {
    override def close(): Unit = { socket.close(); pool.shutdownNow() }
  }

  /** Start serving; `port` 0 picks an ephemeral port (read it back from the
    * returned handle). Each client gets every line once, then keepalives. */
  def serve(lines: Seq[String], port: Int = 0, paceMs: Long = 0): Server = {
    val server = new ServerSocket(port)
    val pool = Executors.newCachedThreadPool()
    pool.submit(new Runnable {
      override def run(): Unit =
        while (!server.isClosed) {
          val client =
            try server.accept()
            catch { case _: Throwable => return }
          pool.submit(new Runnable {
            override def run(): Unit =
              try {
                val out = new PrintWriter(client.getOutputStream, true)
                for (l <- lines) {
                  out.println(l)
                  if (paceMs > 0) Thread.sleep(paceMs)
                }
                // checkError() is the ONLY disconnect signal here:
                // PrintWriter swallows IOExceptions and isClosed reflects
                // only a local close — without it each dropped client
                // leaks a thread writing to a broken pipe forever
                while (!client.isClosed && !server.isClosed && !out.checkError()) {
                  out.println(s"""{"type": "keepalive", "timestamp": ${System.currentTimeMillis() / 1000.0}}""")
                  Thread.sleep(1000)
                }
              } catch { case _: Throwable => ()
              } finally {
                // close the socket when the handler exits (disconnect or
                // shutdown) — each connect/disconnect cycle otherwise
                // leaks one fd until Server.close()
                try client.close() catch { case _: Throwable => () }
              }
          })
        }
    })
    new Server(server.getLocalPort, server, pool)
  }
}
