package graft.server

import java.io.{InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.{ArrayBlockingQueue, TimeUnit}

/** Minimal RFC 6455 websocket server — the push channel the reference
  * multiplexes progress, password prompts, and stop over (reference
  * server.go:19-88). The JDK's HttpServer cannot hijack a connection
  * for an Upgrade, so this listens on its own sidecar port (the HTTP
  * side advertises it at GET /socket/ — the one transport divergence
  * from the reference's same-port path, noted in DIALECT.md); it binds
  * the same interface scope as the HTTP side (`bindAll`).
  *
  * Server frames are never masked; client frames must be (RFC 6455
  * §5.1). Text frames only — the messages are small JSON objects, so
  * fragmentation/continuation is rejected rather than buffered.
  *
  * Each client gets ONE writer thread draining a bounded frame queue:
  * a stalled client (suspended laptop, dead TCP peer) fills its own
  * queue and is dropped, instead of its blocked socket write freezing
  * the shared 1 Hz progress pusher — and with it every other client —
  * for the TCP retransmission timeout. Control responses (pong, close
  * echo) ride the same queue, so each socket has exactly one writer.
  */
final class WsChannel(path: String, onMessage: String => Unit,
    bindAll: Boolean = false) {
  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
  @volatile private var running = true
  private var serverSocket: ServerSocket = _

  /** A connected client: its socket plus the outbound frame queue its
    * writer thread drains. `alive` flips false once either side dies;
    * the writer owns the socket close. */
  private final class Client(val sock: Socket) {
    val queue = new ArrayBlockingQueue[Array[Byte]](64)
    @volatile var alive = true
    def close(): Unit = {
      alive = false
      try sock.close() catch { case _: Exception => () }
    }
    /** Enqueue without blocking; a full queue means the peer stopped
      * draining — drop the client rather than stall the caller. */
    def offer(frame: Array[Byte]): Unit =
      if (alive && !queue.offer(frame)) { close(); clients.remove(this) }
  }
  private val clients =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Client]()

  def clientCount: Int = clients.size()

  /** Bind (ephemeral port when 0) + accept loop; returns actual port. */
  def start(port: Int = 0): Int = {
    serverSocket =
      if (bindAll) new ServerSocket(port, 16)
      else new ServerSocket(port, 16, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      while (running) {
        try {
          val s = serverSocket.accept()
          val h = new Thread(() => serve(s), "graft-ws-client")
          h.setDaemon(true); h.start()
        } catch {
          case _: Exception if !running => ()
          // persistent accept failure (fd exhaustion, socket error
          // state): back off instead of spinning a core hot
          case _: Exception => Thread.sleep(100L)
        }
      }
    }, "graft-ws-accept")
    t.setDaemon(true); t.start()
    serverSocket.getLocalPort
  }

  def stop(): Unit = {
    running = false
    try serverSocket.close() catch { case _: Exception => () }
    clients.forEach(_.close())
    clients.clear()
  }

  /** Send a text frame to every connected client. Never blocks: slow
    * consumers overflow their own queue and get dropped. */
  def broadcast(text: String): Unit = {
    lazy val frame = encodeFrame(0x1, text.getBytes(StandardCharsets.UTF_8))
    clients.forEach(_.offer(frame))
  }

  private def serve(sock: Socket): Unit = {
    val client = new Client(sock)
    try {
      val in = sock.getInputStream
      val out = sock.getOutputStream
      if (!handshake(in, out)) { sock.close(); return }
      val w = new Thread(() => writerLoop(client, out), "graft-ws-writer")
      w.setDaemon(true); w.start()
      clients.add(client)
      frameLoop(client, in)
    } catch { case _: Exception => () }
    finally {
      clients.remove(client)
      // let the writer drain queued frames (close echo, last pong)
      // briefly before tearing the socket down
      val deadline = System.nanoTime() + 500000000L
      while (!client.queue.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(10)
      client.close()
    }
  }

  private def writerLoop(client: Client, out: OutputStream): Unit =
    try {
      while (client.alive) {
        val frame = client.queue.poll(250, TimeUnit.MILLISECONDS)
        if (frame != null) { out.write(frame); out.flush() }
      }
    } catch { case _: Exception => clients.remove(client); client.close() }

  /** HTTP Upgrade: path must match, Sec-WebSocket-Key folded through
    * the RFC's fixed GUID + SHA-1 + base64. Headers are read byte-wise
    * from the raw stream — a buffered reader could pull a pipelined
    * first frame into its private buffer and desynchronize frameLoop. */
  private def handshake(in: InputStream, out: OutputStream): Boolean = {
    def readLine(): String = {
      val sb = new StringBuilder
      var b = in.read()
      while (b >= 0 && b != '\n') {
        if (b != '\r') sb += b.toChar
        if (sb.length > 8192) return null // header-line cap: no unbounded buffering from unauthenticated peers
        b = in.read()
      }
      if (b < 0 && sb.isEmpty) null else sb.toString
    }
    val request = readLine()
    if (request == null) return false
    val target = request.split(" ").lift(1).getOrElse("")
    var key: String = null
    var line = readLine()
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0 && line.substring(0, i).equalsIgnoreCase("Sec-WebSocket-Key"))
        key = line.substring(i + 1).trim
      line = readLine()
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

  private def frameLoop(client: Client, in: InputStream): Unit = {
    while (running && client.alive) {
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
        case 0x8 => client.offer(encodeFrame(0x8, payload)); return // echo close
        case 0x9 => client.offer(encodeFrame(0xA, payload)) // ping → pong
        case _ => () // pong / binary: ignored
      }
    }
  }

  private def readByte(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new java.io.EOFException("websocket stream closed mid-frame")
    b
  }

  /** One complete server frame (unmasked) as bytes. */
  private def encodeFrame(opcode: Int, payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    val header =
      if (n < 126) Array((0x80 | opcode).toByte, n.toByte)
      else if (n < 65536)
        Array((0x80 | opcode).toByte, 126.toByte, (n >> 8).toByte, (n & 0xff).toByte)
      else {
        val h = new Array[Byte](10)
        h(0) = (0x80 | opcode).toByte; h(1) = 127.toByte
        var i = 0
        while (i < 8) { h(2 + i) = ((n.toLong >> (8 * (7 - i))) & 0xff).toByte; i += 1 }
        h
      }
    header ++ payload
  }
}
