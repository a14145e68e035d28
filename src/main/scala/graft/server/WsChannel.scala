package graft.server

import java.io.{BufferedReader, InputStream, InputStreamReader, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

/** Minimal RFC 6455 websocket server — the push channel the reference
  * multiplexes progress, password prompts, and stop over (reference
  * server.go:19-88). The JDK's HttpServer cannot hijack a connection
  * for an Upgrade, so this listens on its own loopback port (the HTTP
  * side advertises it at GET /socket/ — the one transport divergence
  * from the reference's same-port path, noted in DIALECT.md).
  *
  * Server frames are never masked; client frames must be (RFC 6455
  * §5.1). Text frames only — the messages are small JSON objects, so
  * fragmentation/continuation is rejected rather than buffered.
  * Everything is plain blocking IO on daemon threads: the channel
  * carries a handful of console clients, not data.
  */
final class WsChannel(path: String, onMessage: String => Unit) {
  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
  @volatile private var running = true
  private var serverSocket: ServerSocket = _
  private val clients =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()

  def clientCount: Int = clients.size()

  /** Bind (ephemeral port when 0) + accept loop; returns actual port. */
  def start(port: Int = 0): Int = {
    serverSocket = new ServerSocket(port, 16, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      while (running) {
        try {
          val s = serverSocket.accept()
          val h = new Thread(() => serve(s), "graft-ws-client")
          h.setDaemon(true); h.start()
        } catch { case _: Exception if !running => () case _: Exception => () }
      }
    }, "graft-ws-accept")
    t.setDaemon(true); t.start()
    serverSocket.getLocalPort
  }

  def stop(): Unit = {
    running = false
    try serverSocket.close() catch { case _: Exception => () }
    clients.forEach(s => try s.close() catch { case _: Exception => () })
    clients.clear()
  }

  /** Send a text frame to every connected client (dead ones pruned). */
  def broadcast(text: String): Unit =
    clients.forEach { s =>
      try sendText(s.getOutputStream, text)
      catch { case _: Exception => clients.remove(s); try s.close() catch { case _: Exception => () } }
    }

  private def serve(sock: Socket): Unit = {
    try {
      val in = sock.getInputStream
      val out = sock.getOutputStream
      if (!handshake(in, out)) { sock.close(); return }
      clients.add(sock)
      frameLoop(in, out)
    } catch { case _: Exception => () }
    finally { clients.remove(sock); try sock.close() catch { case _: Exception => () } }
  }

  /** HTTP Upgrade: path must match, Sec-WebSocket-Key folded through
    * the RFC's fixed GUID + SHA-1 + base64. */
  private def handshake(in: InputStream, out: OutputStream): Boolean = {
    val r = new BufferedReader(new InputStreamReader(in, StandardCharsets.US_ASCII))
    val request = r.readLine()
    if (request == null) return false
    val target = request.split(" ").lift(1).getOrElse("")
    var key: String = null
    var line = r.readLine()
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0 && line.substring(0, i).equalsIgnoreCase("Sec-WebSocket-Key"))
        key = line.substring(i + 1).trim
      line = r.readLine()
    }
    if (key == null || target != path) {
      out.write(("HTTP/1.1 400 Bad Request\r\nConnection: close\r\n\r\n")
        .getBytes(StandardCharsets.US_ASCII))
      out.flush(); return false
    }
    val accept = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1")
        .digest((key + WsGuid).getBytes(StandardCharsets.US_ASCII)))
    out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
      s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII))
    out.flush()
    true
  }

  private def frameLoop(in: InputStream, out: OutputStream): Unit = {
    while (running) {
      val b0 = in.read(); if (b0 < 0) return
      val opcode = b0 & 0x0f
      val fin = (b0 & 0x80) != 0
      val b1 = in.read(); if (b1 < 0) return
      val masked = (b1 & 0x80) != 0
      var len: Long = b1 & 0x7f
      if (len == 126) len = (readByte(in) << 8) | readByte(in)
      else if (len == 127) {
        len = 0; var i = 0
        while (i < 8) { len = (len << 8) | readByte(in); i += 1 }
      }
      if (!masked || len > (1 << 20) || !fin) return // protocol violation / oversize
      val mask = Array.fill(4)(readByte(in).toByte)
      val payload = new Array[Byte](len.toInt)
      var off = 0
      while (off < len) {
        val n = in.read(payload, off, len.toInt - off)
        if (n < 0) return
        off += n
      }
      var i = 0
      while (i < payload.length) { payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
      opcode match {
        case 0x1 => onMessage(new String(payload, StandardCharsets.UTF_8))
        case 0x8 => sendFrame(out, 0x8, payload); return // echo close
        case 0x9 => sendFrame(out, 0xA, payload) // ping → pong
        case _ => () // pong / binary: ignored
      }
    }
  }

  private def readByte(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new java.io.EOFException("websocket stream closed mid-frame")
    b
  }

  private def sendText(out: OutputStream, text: String): Unit =
    sendFrame(out, 0x1, text.getBytes(StandardCharsets.UTF_8))

  private def sendFrame(out: OutputStream, opcode: Int, payload: Array[Byte]): Unit =
    out.synchronized {
      val n = payload.length
      out.write(0x80 | opcode)
      if (n < 126) out.write(n)
      else if (n < 65536) { out.write(126); out.write(n >> 8); out.write(n & 0xff) }
      else {
        out.write(127)
        var i = 7
        while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xff).toInt); i -= 1 }
      }
      out.write(payload)
      out.flush()
    }
}
