package graft.sources

/** MELSEC MC-protocol (3E frame, binary mode, Q series) codec — the
  * wire format behind the reference's `pymcprotocol.Type3E.randomread`
  * (Prensas.py:4, 480-482, 505-509), built from the publicly documented
  * frame layout. The FRAME MATH is fully implemented and golden-tested
  * (McProtocolSpec pins exact byte sequences); [[McClient]] is the thin
  * socket wrapper around it, which an offline container cannot
  * integration-test — the DSv2 simulator (PlcSimSource) remains the
  * test harness for everything downstream of the read.
  *
  * Request frame (binary 3E):
  * {{{
  *   50 00                 subheader
  *   00                    network no
  *   FF                    PC no
  *   FF 03                 request-dest module IO (0x03FF)
  *   00                    request-dest station
  *   LL LL                 request data length, LE (bytes after this field)
  *   TT TT                 monitoring timer, LE (250 ms units)
  *   <command payload>
  * }}}
  * Random read in word units: command 0x0403, subcommand 0x0000, then
  * word-count (1 byte) + dword-count (1 byte) + per device 3-byte LE
  * device number + 1-byte device code. Batch read: command 0x0401,
  * head device + 2-byte LE point count.
  *
  * Response: `D0 00`, same routing bytes, 2-byte LE data length,
  * 2-byte LE end code (0 = ok), then the data words LE. Word values
  * are returned as UNSIGNED 0..65535 (graft's decode operates on
  * unsigned words); callers needing the PLC's signed view take
  * `.toShort`.
  */
object McProtocol {

  /** Binary-mode device codes (word devices the reference uses). */
  private val DeviceCodes: Map[String, Int] = Map(
    "D" -> 0xA8, "W" -> 0xB4, "R" -> 0xAF, "ZR" -> 0xB0,
    "M" -> 0x90, "B" -> 0xA0, "X" -> 0x9C, "Y" -> 0x9D)

  /** "D3100" → (0xA8, 3100). X/Y device numbers are hexadecimal per the
    * protocol; the rest are decimal. */
  def parseDevice(addr: String): (Int, Int) = {
    val (code, numStr) =
      if (addr.startsWith("ZR")) ("ZR", addr.drop(2)) else (addr.take(1), addr.drop(1))
    val dc = DeviceCodes.getOrElse(code,
      throw new IllegalArgumentException(s"unsupported device type in '$addr'"))
    val radix = if (code == "X" || code == "Y") 16 else 10
    val n = try Integer.parseInt(numStr, radix)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"bad device number in '$addr'") }
    (dc, n)
  }

  private def header(payloadLen: Int, timer250ms: Int): Array[Byte] =
    Array[Byte](0x50, 0x00, 0x00, 0xFF.toByte, 0xFF.toByte, 0x03, 0x00,
      ((payloadLen + 2) & 0xFF).toByte, (((payloadLen + 2) >> 8) & 0xFF).toByte,
      (timer250ms & 0xFF).toByte, ((timer250ms >> 8) & 0xFF).toByte)

  private def le2(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def device4(addr: String): Array[Byte] = {
    val (code, n) = parseDevice(addr)
    Array[Byte]((n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte,
      ((n >> 16) & 0xFF).toByte, code.toByte)
  }

  /** The reference's `randomread(word_devices=…, dword_devices=[])`:
    * one request for an arbitrary address set (command 0x0403). */
  def encodeRandomRead(words: Seq[String], timer250ms: Int = 4): Array[Byte] = {
    require(words.nonEmpty && words.size <= 192, s"1..192 word devices, got ${words.size}")
    val payload = le2(0x0403) ++ le2(0x0000) ++
      Array[Byte](words.size.toByte, 0x00) ++ words.toArray.flatMap(device4)
    header(payload.length, timer250ms) ++ payload
  }

  /** Contiguous block read (command 0x0401, word subcommand) — the
    * bulk form behind `expand_block`-style layouts. */
  def encodeBatchRead(headDevice: String, count: Int, timer250ms: Int = 4): Array[Byte] = {
    require(count >= 1 && count <= 960, s"1..960 points, got $count")
    val payload = le2(0x0401) ++ le2(0x0000) ++ device4(headDevice) ++ le2(count)
    header(payload.length, timer250ms) ++ payload
  }

  /** Decode a word-read response (both commands share the shape):
    * validates subheader + end code, checks the advertised length, and
    * returns `nWords` unsigned 16-bit values. */
  def decodeWordsResponse(resp: Array[Byte], nWords: Int): Seq[Int] = {
    require(resp.length >= 11, s"truncated response: ${resp.length} bytes")
    require((resp(0) & 0xFF) == 0xD0 && resp(1) == 0x00,
      f"bad response subheader 0x${resp(0) & 0xFF}%02X${resp(1) & 0xFF}%02X")
    val dataLen = (resp(7) & 0xFF) | ((resp(8) & 0xFF) << 8)
    val endCode = (resp(9) & 0xFF) | ((resp(10) & 0xFF) << 8)
    require(endCode == 0, f"PLC returned end code 0x$endCode%04X")
    require(dataLen == 2 + 2 * nWords,
      s"length field $dataLen != ${2 + 2 * nWords} for $nWords words")
    require(resp.length >= 11 + 2 * nWords, s"payload truncated: ${resp.length} bytes")
    (0 until nWords).map(i =>
      (resp(11 + 2 * i) & 0xFF) | ((resp(12 + 2 * i) & 0xFF) << 8))
  }
}

/** Thin blocking socket client over [[McProtocol]] — the transport the
  * offline container cannot integration-test (every byte on the wire
  * comes from the golden-tested codec above; this class only moves
  * them). Single-threaded per connection, like the reference's one
  * reader task per PLC IP. */
class McClient(host: String, port: Int, timeoutMs: Int = 5000) extends AutoCloseable {
  private val socket = new java.net.Socket()
  socket.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
  socket.setSoTimeout(timeoutMs)
  private val out = socket.getOutputStream
  private val in = new java.io.DataInputStream(socket.getInputStream)

  private def exchange(frame: Array[Byte]): Array[Byte] = {
    out.write(frame); out.flush()
    val head = new Array[Byte](11)
    in.readFully(head)
    val dataLen = (head(7) & 0xFF) | ((head(8) & 0xFF) << 8)
    val rest = new Array[Byte](dataLen - 2) // end code already in head
    in.readFully(rest)
    head ++ rest
  }

  /** `Type3E.randomread(word_devices = addrs)`. */
  def randomRead(addrs: Seq[String]): Seq[Int] =
    McProtocol.decodeWordsResponse(exchange(McProtocol.encodeRandomRead(addrs)), addrs.size)

  /** Contiguous `batchread_wordunits`. */
  def batchRead(headDevice: String, count: Int): Seq[Int] =
    McProtocol.decodeWordsResponse(exchange(McProtocol.encodeBatchRead(headDevice, count)), count)

  override def close(): Unit = socket.close()
}
