package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** P2: byte-compatible pack/unpack of the reference's internal binary
  * encoding record `"!I{n}s"` — big-endian uint32 entity id + n raw CLK
  * bytes (`backend/entityservice/serialization.py:37-102`). Used for
  * byte-compat export/import of encoding files; inside the engine the
  * columns carry id+clk natively. */
object BinaryCodec {

  def recordSize(encodingSize: Int): Int = 4 + encodingSize

  /** Pack one (entityId, clk) to the wire record. entityId must fit
    * uint32 (reference constraint). */
  def pack(entityId: Long, clk: Array[Byte]): Array[Byte] = {
    require(entityId >= 0 && entityId <= 0xffffffffL,
      s"entity id out of uint32 range: $entityId")
    val out = new Array[Byte](4 + clk.length)
    out(0) = (entityId >>> 24).toByte
    out(1) = (entityId >>> 16).toByte
    out(2) = (entityId >>> 8).toByte
    out(3) = entityId.toByte
    System.arraycopy(clk, 0, out, 4, clk.length)
    out
  }

  /** Unpack one wire record. */
  def unpack(rec: Array[Byte]): (Long, Array[Byte]) = {
    require(rec.length > 4, s"record too short: ${rec.length}")
    val id = ((rec(0) & 0xffL) << 24) | ((rec(1) & 0xffL) << 16) |
      ((rec(2) & 0xffL) << 8) | (rec(3) & 0xffL)
    (id, java.util.Arrays.copyOfRange(rec, 4, rec.length))
  }

  /** Pack a stream of records into one buffer (file form:
    * `binary_pack_filters`). */
  def packAll(records: Iterator[(Long, Array[Byte])], encodingSize: Int): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    records.foreach { case (id, clk) =>
      require(clk.length == encodingSize,
        s"clk length ${clk.length} != $encodingSize")
      buf.write(pack(id, clk))
    }
    buf.toByteArray
  }

  /** Slice a packed buffer back into records (`binary_unpack_filters`). */
  def unpackAll(bytes: Array[Byte], encodingSize: Int): Iterator[(Long, Array[Byte])] = {
    val rs = recordSize(encodingSize)
    require(bytes.length % rs == 0,
      s"buffer length ${bytes.length} not a multiple of record size $rs")
    (0 until bytes.length / rs).iterator.map { i =>
      unpack(java.util.Arrays.copyOfRange(bytes, i * rs, (i + 1) * rs))
    }
  }
}
