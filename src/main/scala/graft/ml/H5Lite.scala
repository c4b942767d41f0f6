package graft.ml

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal pure-JVM HDF5 reader for Keras-saved weight files.
  *
  * Scope: exactly the subset h5py writes for a `model.save(...)` call with
  * default options — superblock version 0, version-1 object headers (with
  * continuation blocks), old-style symbol-table groups (v1 B-tree + SNOD
  * nodes + local heap), and CONTIGUOUS little-endian float32/float64
  * datasets (reference artifacts: the six .h5 files under
  * /root/reference/models, written at BDB_2026.ipynb cell 107). Chunked/compressed layouts, new-style groups,
  * and non-float types are out of scope and skipped.
  *
  * The whole file is read into memory (weight files are ~500 KB); tensors
  * come back row-major exactly as Keras stored them, keyed by their full
  * group path (e.g. `/model_weights/lstm_1/convergence_lstm/lstm_1/
  * lstm_cell/kernel`).
  */
object H5Lite {

  final case class Tensor(dims: Seq[Int], data: Array[Float]) {
    require(dims.product == data.length || (dims.isEmpty && data.length == 1),
      s"dims $dims vs ${data.length} values")
    def apply(i: Int, j: Int): Float = data(i * dims(1) + j)
  }

  private val Undef = -1L // HDF5 "undefined address" is all-ones; signed -1

  def readFloatTensors(path: String): Map[String, Tensor] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

    def u8(o: Long): Int = buf.get(o.toInt) & 0xFF
    def u16(o: Long): Int = buf.getShort(o.toInt) & 0xFFFF
    def u32(o: Long): Long = buf.getInt(o.toInt) & 0xFFFFFFFFL
    def u64(o: Long): Long = buf.getLong(o.toInt)

    require(bytes.length > 64 &&
      bytes.take(8).sameElements(Array[Byte](0x89.toByte, 'H', 'D', 'F',
        '\r', '\n', 0x1A, '\n')), s"$path: not an HDF5 file")
    require(u8(8) == 0, s"$path: superblock v${u8(8)} unsupported (need v0)")
    require(u8(13) == 8 && u8(14) == 8,
      s"$path: offsets/lengths must be 8 bytes")

    // Symbol table entry: name offset(8) | object header addr(8) | cache
    // type(4) | reserved(4) | scratch(16). For cached groups the scratch
    // holds the B-tree address and local heap address.
    final case class Ste(nameOff: Long, ohdr: Long, btree: Long, heap: Long)
    def parseSte(o: Long): Ste = Ste(u64(o), u64(o + 8), u64(o + 24), u64(o + 32))

    def heapName(heap: Long, nameOff: Long): String = {
      require(u32(heap) == 0x50414548L, s"bad HEAP signature @ $heap") // "HEAP"
      var d = (u64(heap + 24) + nameOff).toInt
      val sb = new StringBuilder
      while (bytes(d) != 0) { sb.append(bytes(d).toChar); d += 1 }
      sb.toString
    }

    /** v1 object header: version(1) reserved(1) nMessages(2) refCount(4)
      * headerSize(4) pad(4), then 8-byte-aligned messages
      * type(2) size(2) flags(1) reserved(3) body; 0x10 = continuation.
      */
    def messages(ohdr: Long): Seq[(Int, Long, Int)] = {
      require(u8(ohdr) == 1, s"object header v${u8(ohdr)} @ $ohdr unsupported")
      val nMsg = u16(ohdr + 2)
      val out = Seq.newBuilder[(Int, Long, Int)]
      var n = 0
      var blocks = List((ohdr + 16, u32(ohdr + 8)))
      while (blocks.nonEmpty && n < nMsg) {
        val (start, len) = blocks.head
        blocks = blocks.tail
        var o = start
        val end = start + len
        while (o + 8 <= end && n < nMsg) {
          val t = u16(o); val sz = u16(o + 2)
          val body = o + 8
          if (t == 0x10) blocks = blocks :+ ((u64(body), u64(body + 8)))
          else out += ((t, body, sz))
          n += 1
          o = body + sz
        }
      }
      out.result()
    }

    /** Children of a symbol-table group: walk the v1 B-tree down to SNOD
      * leaves; names resolve through the group's local heap. */
    def children(btree: Long, heap: Long): Seq[(String, Ste)] = {
      val out = Seq.newBuilder[(String, Ste)]
      def walk(addr: Long): Unit = {
        require(u32(addr) == 0x45455254L, s"bad TREE signature @ $addr")
        val level = u8(addr + 5); val nEnt = u16(addr + 6)
        // after sig(4) type(1) level(1) nEnt(2) left(8) right(8):
        // key0 child0 key1 child1 ... keyN — children at +32 step 16
        var o = addr + 24 + 8
        (0 until nEnt).foreach { _ =>
          val child = u64(o); o += 16
          if (level > 0) walk(child)
          else {
            require(u32(child) == 0x444F4E53L, s"bad SNOD @ $child")
            val nSym = u16(child + 6)
            var so = child + 8
            (0 until nSym).foreach { _ =>
              val ste = parseSte(so)
              out += ((heapName(heap, ste.nameOff), ste))
              so += 40
            }
          }
        }
      }
      walk(btree)
      out.result()
    }

    def readDataset(ohdr: Long): Option[Tensor] = {
      var dims: Seq[Int] = null
      var floatSize = 0
      var dataAddr = Undef
      var dataSize = 0L
      messages(ohdr).foreach {
        case (0x0001, body, _) => // dataspace
          val ver = u8(body); val rank = u8(body + 1)
          val base = body + (if (ver == 1) 8 else 4)
          dims = (0 until rank).map(i => u64(base + 8L * i).toInt)
        case (0x0003, body, _) => // datatype: low nibble of byte0 is class
          if ((u8(body) & 0x0F) == 1) floatSize = u32(body + 4).toInt
        case (0x0008, body, _) => // data layout v3, class 1 = contiguous
          if (u8(body) == 3 && u8(body + 1) == 1) {
            dataAddr = u64(body + 2); dataSize = u64(body + 10)
          }
        case _ => ()
      }
      if (dims == null || dataAddr == Undef ||
        (floatSize != 4 && floatSize != 8)) None
      else {
        val n = math.max(1, dims.product)
        require(dataSize >= n.toLong * floatSize, s"dataset truncated @ $ohdr")
        val arr = new Array[Float](n)
        var i = 0
        while (i < n) {
          arr(i) =
            if (floatSize == 4) buf.getFloat((dataAddr + 4L * i).toInt)
            else buf.getDouble((dataAddr + 8L * i).toInt).toFloat
          i += 1
        }
        Some(Tensor(dims, arr))
      }
    }

    val out = Map.newBuilder[String, Tensor]
    def walk(path: String, ste: Ste): Unit = {
      val msgs = messages(ste.ohdr)
      msgs.find(_._1 == 0x0011) match { // symbol table message -> group
        case Some((_, body, _)) =>
          children(u64(body), u64(body + 8)).foreach { case (name, c) =>
            walk(s"$path/$name", c)
          }
        case None =>
          if (msgs.exists(_._1 == 0x0008)) // has a data layout -> dataset
            readDataset(ste.ohdr).foreach(t => out += (path -> t))
      }
    }
    val root = parseSte(56)
    children(root.btree, root.heap).foreach { case (n, s) => walk(s"/$n", s) }
    out.result()
  }
}
