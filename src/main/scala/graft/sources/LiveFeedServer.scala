package graft.sources

import java.io.{OutputStreamWriter, PrintWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

/** Paced TCP replay of a capture — the serving peer of
  * [[EventSource.readLiveFeed]]. Each client that connects receives the
  * capture's lines at `paceMs` per line, reproducing the live-feed cadence
  * the reference's SignalR connection delivers (it writes lines to disk as
  * they arrive; /root/reference/extractor.py:60-80). After the last line
  * the connection is held open (a live feed goes quiet, it doesn't hang
  * up) until [[Handle.close]].
  *
  * Test/demo utility: binds an ephemeral localhost port, serves each
  * connection on a daemon thread.
  */
object LiveFeedServer {

  final class Handle(server: ServerSocket) extends AutoCloseable {
    def port: Int = server.getLocalPort
    override def close(): Unit = server.close()
  }

  def start(lines: Seq[String], paceMs: Long = 0): Handle = {
    val server = new ServerSocket(0)
    val acceptor = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          val t = new Thread(() => {
            try {
              val out = new PrintWriter(
                new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
              lines.foreach { l =>
                out.print(l); out.print('\n'); out.flush()
                if (paceMs > 0) Thread.sleep(paceMs)
              }
              // hold the connection until the server shuts down
              while (!server.isClosed && !sock.isClosed) Thread.sleep(50)
            } catch { case _: Throwable => () }
            finally { try sock.close() catch { case _: Throwable => () } }
          })
          t.setDaemon(true)
          t.start()
        }
      } catch { case _: Throwable => () } // accept() throws on close(): done
    })
    acceptor.setDaemon(true)
    acceptor.start()
    new Handle(server)
  }
}
