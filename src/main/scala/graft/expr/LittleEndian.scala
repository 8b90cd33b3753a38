package graft.expr

/** Little-endian byte readers/writers shared by the media decoders and
  * their encode mirrors (BMP headers, RIFF/WAVE chunks — Y4M is
  * text-framed and needs none). One definition so a future fix to sign or
  * bounds handling cannot drift between copies. */
private[expr] object LittleEndian {
  def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte
    b(o + 1) = (v >> 8).toByte
  }

  def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte
    b(o + 1) = (v >> 8).toByte
    b(o + 2) = (v >> 16).toByte
    b(o + 3) = (v >> 24).toByte
  }
}
