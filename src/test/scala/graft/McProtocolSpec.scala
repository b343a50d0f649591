package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.McProtocol

/** Golden byte vectors for the MELSEC 3E binary frames (the wire
  * format behind the reference's randomread) — byte-for-byte against
  * the documented layout, so a reviewer can check each field without
  * running anything. */
class McProtocolSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.split("\\s+").map(b => Integer.parseInt(b, 16).toByte)

  test("randomread request: exact frame for D100, D200") {
    val got = McProtocol.encodeRandomRead(Seq("D100", "D200"))
    val want = hex(
      "50 00 00 FF FF 03 00" + // subheader + routing
      " 10 00" +               // request data length = 16
      " 04 00" +               // monitoring timer (4 × 250 ms)
      " 03 04 00 00" +         // command 0x0403, subcommand 0x0000
      " 02 00" +               // 2 word devices, 0 dword devices
      " 64 00 00 A8" +         // D100  (100 = 0x64, code D = 0xA8)
      " C8 00 00 A8")          // D200
    assert(got.toSeq == want.toSeq,
      s"got ${got.map(b => f"${b & 0xFF}%02X").mkString(" ")}")
  }

  test("batchread request: exact frame for D3100 × 4 points") {
    val got = McProtocol.encodeBatchRead("D3100", 4)
    val want = hex(
      "50 00 00 FF FF 03 00" +
      " 0C 00" +               // request data length = 12
      " 04 00" +
      " 01 04 00 00" +         // command 0x0401 (batch read), word units
      " 1C 0C 00 A8" +         // D3100 (3100 = 0x0C1C)
      " 04 00")                // 4 points
    assert(got.toSeq == want.toSeq)
  }

  test("response decode: words come back LE and unsigned") {
    val resp = hex(
      "D0 00 00 FF FF 03 00" +
      " 06 00" +               // data length = end code + 2 words
      " 00 00" +               // end code: ok
      " 39 30" +               // 0x3039 = 12345
      " D2 04")                // 0x04D2 = 1234
    assert(McProtocol.decodeWordsResponse(resp, 2) == Seq(12345, 1234))
    // values above Short.MaxValue stay unsigned (graft decode domain)
    val big = hex("D0 00 00 FF FF 03 00 04 00 00 00 FF FF")
    assert(McProtocol.decodeWordsResponse(big, 1) == Seq(65535))
  }

  test("non-zero end code is surfaced, not silently returned as data") {
    // 0xC059: classic wrong-command end code
    val resp = hex("D0 00 00 FF FF 03 00 02 00 59 C0")
    val e = intercept[IllegalArgumentException] {
      McProtocol.decodeWordsResponse(resp, 0)
    }
    assert(e.getMessage.contains("C059"))
  }

  test("length mismatches and truncation are rejected") {
    val short = hex("D0 00 00 FF FF 03 00 06 00 00 00 39 30") // claims 2 words, has 1
    intercept[IllegalArgumentException] { McProtocol.decodeWordsResponse(short, 2) }
    val wrongLen = hex("D0 00 00 FF FF 03 00 04 00 00 00 39 30 D2 04")
    intercept[IllegalArgumentException] { McProtocol.decodeWordsResponse(wrongLen, 2) }
  }

  test("device parsing: decimal vs hex devices, unsupported types refused") {
    assert(McProtocol.parseDevice("D3100") == (0xA8, 3100))
    assert(McProtocol.parseDevice("ZR100") == (0xB0, 100))
    assert(McProtocol.parseDevice("X1F") == (0x9C, 31), "X numbers are hexadecimal")
    intercept[IllegalArgumentException] { McProtocol.parseDevice("Q100") }
    intercept[IllegalArgumentException] { McProtocol.parseDevice("D1F") }
  }

  test("random-value round trip through a crafted response") {
    val words = Seq(0, 1, 32767, 32768, 54321, 65535)
    val resp = Array[Byte](0xD0.toByte, 0x00, 0x00, 0xFF.toByte, 0xFF.toByte, 0x03, 0x00) ++
      Array[Byte](((2 + 2 * words.size) & 0xFF).toByte, 0x00, 0x00, 0x00) ++
      words.toArray.flatMap(w => Array[Byte]((w & 0xFF).toByte, ((w >> 8) & 0xFF).toByte))
    assert(McProtocol.decodeWordsResponse(resp, words.size) == words)
  }
}
