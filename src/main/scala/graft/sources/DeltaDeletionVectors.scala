package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.roaringbitmap.RoaringBitmap

/** Delta Lake deletion-vector FORMAT codec — both directions, implemented
  * from the published protocol (delta.io PROTOCOL.md, "Deletion Vectors"):
  *
  *  - the descriptor carried on `add`/`remove` actions
  *    (`storageType` ∈ u/i/p, `pathOrInlineDv`, `offset`, `sizeInBytes`,
  *    `cardinality`);
  *  - the serialized bitmap: a 64-bit RoaringBitmapArray in the protocol's
  *    "portable" layout — magic 1681511377 (4B LE), bitmap count (8B LE),
  *    then per bitmap a 4B LE key and a standard-portable-format 32-bit
  *    RoaringBitmap (a deleted row position p lives in bitmap p >>> 32 at
  *    bit p & 0xFFFFFFFF);
  *  - the on-disk DV file: 1 version byte (=1), then per vector a 4B
  *    BIG-endian length, the bitmap bytes, and a 4B BIG-endian CRC-32 of
  *    those bytes (the descriptor's `offset` points at the length word);
  *  - Z85 (the ZeroMQ RFC 32/Z85 alphabet) for inline bitmaps and for the
  *    16-byte UUID inside a `u` path (last 20 characters; anything before
  *    is an optional directory prefix under the table root).
  *
  * Used by [[DeltaImport]] (reader feature `deletionVectors`: subtract
  * recorded positions during the scan) and [[DeltaExport]] (mirror graft's
  * positional-delete state as real Delta DVs instead of halting).
  * Bitmaps are per-FILE and bounded by that file's row count — driver-side
  * decode is the same metadata cost class as Delta's own readers pay.
  */
object DeltaDeletionVectors {

  /** The JSON descriptor attached to an add/remove action. */
  final case class Descriptor(
      storageType: String, // "u" relative file, "p" absolute file, "i" inline
      pathOrInlineDv: String,
      offset: Option[Int],
      sizeInBytes: Int,
      cardinality: Long)

  private val Magic = 1681511377

  // ------------------------------------------------------------------ Z85

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Z85-encode; input length must be a multiple of 4 (UUIDs and the
    * protocol's inline bitmaps always are — the serializer pads). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"Z85 input must be 4-byte aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input must be 5-char aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var b = 0
      while (b < 4) { out(i / 5 * 4 + b) = ((v >>> ((3 - b) * 8)) & 0xff).toByte; b += 1 }
      i += 5
    }
    out
  }

  // -------------------------------------------- RoaringBitmapArray codec

  /** Serialize sorted-or-not 64-bit positions into the protocol's portable
    * RoaringBitmapArray bytes. */
  def serializeBitmap(positions: Seq[Long]): Array[Byte] = {
    val byKey = positions.groupBy(p => (p >>> 32).toInt)
    val keys = byKey.keys.toArray.sorted
    val bitmaps = keys.map { key =>
      val rb = new RoaringBitmap()
      byKey(key).foreach(p => rb.add((p & 0xffffffffL).toInt))
      rb.runOptimize()
      rb
    }
    val size = 4 + 8 + bitmaps.map(b => 4 + b.serializedSizeInBytes()).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(keys.length.toLong)
    keys.zip(bitmaps).foreach { case (k, b) =>
      buf.putInt(k)
      b.serialize(buf)
    }
    buf.array()
  }

  /** Streaming bitmap builder for ONE file's deletion vector — positions
    * feed in one at a time (any order, duplicates dedup in the
    * containers), so the distributed DV build never materializes a
    * per-file position array: an executor task holds compressed bitmaps,
    * not 8 bytes per deleted row. */
  final class BitmapBuilder {
    private val byKey =
      scala.collection.mutable.TreeMap.empty[Int, RoaringBitmap]
    def add(p: Long): Unit =
      byKey.getOrElseUpdate((p >>> 32).toInt, new RoaringBitmap())
        .add((p & 0xffffffffL).toInt)
    def cardinality: Long =
      byKey.valuesIterator.map(_.getLongCardinality).sum
    /** Portable RoaringBitmapArray bytes — layout identical to
      * [[serializeBitmap]]. */
    def serialize(): Array[Byte] = {
      byKey.valuesIterator.foreach(_.runOptimize())
      val size = 4 + 8 +
        byKey.valuesIterator.map(b => 4 + b.serializedSizeInBytes()).sum
      val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(Magic)
      buf.putLong(byKey.size.toLong)
      byKey.foreach { case (k, b) => buf.putInt(k); b.serialize(buf) }
      buf.array()
    }
  }

  /** Decode portable RoaringBitmapArray bytes into SORTED 64-bit positions. */
  def deserializeBitmap(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic, s"deletion vector: bad magic $magic (want $Magic)")
    val n = buf.getLong
    val out = Array.newBuilder[Long]
    var i = 0L
    while (i < n) {
      val key = buf.getInt.toLong
      val rb = new RoaringBitmap()
      rb.deserialize(buf)
      buf.position(buf.position() + rb.serializedSizeInBytes())
      rb.forEach(new org.roaringbitmap.IntConsumer {
        override def accept(v: Int): Unit =
          out += (key << 32) | (v.toLong & 0xffffffffL)
      })
      i += 1
    }
    out.result().sorted
  }

  private def decodeKeyed(bytes: Array[Byte]): Seq[(Int, RoaringBitmap)] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic, s"deletion vector: bad magic $magic")
    val n = buf.getLong
    val out = Seq.newBuilder[(Int, RoaringBitmap)]
    var i = 0L
    while (i < n) {
      val key = buf.getInt
      val rb = new RoaringBitmap()
      rb.deserialize(buf)
      buf.position(buf.position() + rb.serializedSizeInBytes())
      out += key -> rb
      i += 1
    }
    out.result()
  }

  private def serializeKeyed(byKey: Seq[(Int, RoaringBitmap)]): Array[Byte] = {
    val size = 4 + 8 + byKey.map { case (_, b) => 4 + b.serializedSizeInBytes() }.sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(byKey.size.toLong)
    byKey.foreach { case (k, b) => buf.putInt(k); b.serialize(buf) }
    buf.array()
  }

  /** `a \ b` over SERIALIZED portable bytes, computed and returned in
    * compressed form (None when empty / `a` absent) — the CDF importer's
    * DV-delta primitive: position-set differences never materialize as
    * 8-bytes-per-row long arrays, driver or task. */
  def differenceBytes(a: Option[Array[Byte]],
      b: Option[Array[Byte]]): Option[Array[Byte]] = {
    val aKeyed = a.map(decodeKeyed).getOrElse(return None)
    val bKeyed = b.map(decodeKeyed).getOrElse(Nil).toMap
    val out = aKeyed.flatMap { case (k, rb) =>
      val d = bKeyed.get(k) match {
        case Some(other) => RoaringBitmap.andNot(rb, other)
        case None => rb
      }
      if (d.isEmpty) None else { d.runOptimize(); Some(k -> d) }
    }
    if (out.isEmpty) None else Some(serializeKeyed(out))
  }

  /** A deletion vector as a MEMBERSHIP STRUCTURE over its serialized
    * portable bytes: the compressed form travels (driver plan reference,
    * task deserialization), never an 8-bytes-per-row position array —
    * the scan-side filter for a billion-deletion table costs what the
    * roaring bitmaps cost, on both sides. Deserialization is lazy and
    * per-JVM (`@transient`), lookups are one hash probe + one container
    * probe. */
  final class PositionSet(val bytes: Array[Byte]) extends Serializable {
    @transient private lazy val byKey: java.util.HashMap[Integer, RoaringBitmap] = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val magic = buf.getInt
      require(magic == Magic, s"deletion vector: bad magic $magic")
      val n = buf.getLong
      val m = new java.util.HashMap[Integer, RoaringBitmap]()
      var i = 0L
      while (i < n) {
        val key = buf.getInt
        val rb = new RoaringBitmap()
        rb.deserialize(buf)
        buf.position(buf.position() + rb.serializedSizeInBytes())
        m.put(key, rb)
        i += 1
      }
      m
    }
    def contains(p: Long): Boolean = {
      val rb = byKey.get((p >>> 32).toInt)
      rb != null && rb.contains((p & 0xffffffffL).toInt)
    }
  }

  // ------------------------------------------------------------ file IO

  /** Absolute path of a `u`/`p` descriptor's DV file. */
  def filePathOf(desc: Descriptor, tablePath: String): Path = desc.storageType match {
    case "p" => new Path(desc.pathOrInlineDv)
    case "u" =>
      val enc = desc.pathOrInlineDv
      require(enc.length >= 20, s"u-descriptor too short: '$enc'")
      val prefix = enc.dropRight(20)
      val uuidBytes = z85Decode(enc.takeRight(20))
      val bb = ByteBuffer.wrap(uuidBytes)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new Path(tablePath, name)
      else new Path(new Path(tablePath, prefix), name)
    case other => throw new IllegalArgumentException(
      s"deletion vector storageType '$other' has no file")
  }

  /** Read a descriptor's deleted positions (sorted). */
  def readPositions(desc: Descriptor, tablePath: String,
      conf: Configuration): Array[Long] =
    deserializeBitmap(readBitmapBytes(desc, tablePath, conf))

  /** Read a descriptor's SERIALIZED bitmap bytes (CRC-verified for file
    * storage) without materializing positions — what [[PositionSet]] and
    * the scan-side membership filter consume. */
  def readBitmapBytes(desc: Descriptor, tablePath: String,
      conf: Configuration): Array[Byte] = desc.storageType match {
    case "i" => z85Decode(desc.pathOrInlineDv)
    case "u" | "p" =>
      val p = filePathOf(desc, tablePath)
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      try {
        val off = desc.offset.getOrElse(1)
        in.seek(off.toLong)
        val len = in.readInt() // big-endian
        require(len == desc.sizeInBytes,
          s"$p @$off: stored size $len != descriptor sizeInBytes ${desc.sizeInBytes}")
        val data = new Array[Byte](len)
        in.readFully(data)
        val storedCrc = in.readInt()
        val crc = new CRC32(); crc.update(data)
        require(storedCrc == crc.getValue.toInt,
          s"$p @$off: CRC mismatch — corrupt deletion vector")
        data
      } finally in.close()
    case other => throw new IllegalArgumentException(
      s"unknown deletion vector storageType '$other'")
  }

  /** Write one DV FILE under `tablePath` holding a bitmap per entry of
    * `dvByKey` (insertion order); returns the per-key `u` descriptors.
    * The file name embeds a deterministic UUID derived from `seedName` so
    * an idempotent re-export converges on the same file. */
  def writeFile(dvByKey: Seq[(String, Seq[Long])], tablePath: String,
      seedName: String, conf: Configuration): Map[String, Descriptor] =
    writeSerializedFile(dvByKey.map { case (key, positions) =>
      (key, serializeBitmap(positions), positions.distinct.size.toLong)
    }, tablePath, seedName, conf)

  /** [[writeFile]]'s core over ALREADY-SERIALIZED bitmaps — the task-side
    * half of the distributed DV build: each executor task serializes the
    * bitmaps of the files its shuffle partition owns and writes ONE DV
    * file; only the (file-count-sized) descriptors travel back to the
    * driver. Same on-disk layout and write-once deterministic naming, so
    * an idempotent re-run (task retry included) converges on the same
    * file. */
  def writeSerializedFile(entries: Seq[(String, Array[Byte], Long)],
      tablePath: String, seedName: String,
      conf: Configuration): Map[String, Descriptor] = {
    val uuid = java.util.UUID.nameUUIDFromBytes(
      s"graft-dv-$seedName".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val encUuid = z85Encode(bb.array())
    val target = new Path(tablePath, s"deletion_vector_$uuid.bin")
    val fs = target.getFileSystem(conf)

    val out = Map.newBuilder[String, Descriptor]
    val bytesOut = new java.io.ByteArrayOutputStream()
    bytesOut.write(1) // format version byte
    var offset = 1
    entries.foreach { case (key, data, cardinality) =>
      val head = ByteBuffer.allocate(4).putInt(data.length).array() // big-endian
      val crc = new CRC32(); crc.update(data)
      val tail = ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
      bytesOut.write(head); bytesOut.write(data); bytesOut.write(tail)
      out += key -> Descriptor("u", encUuid, Some(offset), data.length,
        cardinality)
      offset += 4 + data.length + 4
    }
    // Write-once, CRASH-SAFE: this now also runs inside executor tasks
    // (the distributed DV build), where a killed attempt must never
    // leave a truncated file a retry would silently trust. The bytes
    // land in a tmp sibling and RENAME into place — a file at the
    // target name is therefore always complete; a pre-existing one of
    // the wrong length (a pre-atomic writer's crash residue) is
    // replaced rather than reused.
    val bytes = bytesOut.toByteArray
    def complete(): Boolean =
      try fs.getFileStatus(target).getLen == bytes.length.toLong
      catch { case _: java.io.FileNotFoundException => false }
    if (!complete()) {
      val tmp = new Path(target.getParent,
        s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")
      val stream = fs.create(tmp, false)
      try stream.write(bytes) finally stream.close()
      // Rename FIRST, never delete-then-rename: a zombie duplicate
      // attempt must not remove a rival's already-published (possibly
      // already-committed) complete file. POSIX rename atomically
      // replaces the destination with IDENTICAL bytes (harmless); an
      // HDFS-style refusal falls through to the checks below.
      if (!fs.rename(tmp, target)) {
        if (complete()) fs.delete(tmp, false) // rival published — reuse
        else {
          // wrong-length residue: only a PRE-atomic writer's crash could
          // leave one, and such a file is referenced by no commit (its
          // writer died before committing) — replace it
          fs.delete(target, false)
          if (!fs.rename(tmp, target)) {
            fs.delete(tmp, false)
            require(complete(),
              s"deletion-vector publish failed for $target")
          }
        }
      }
    }
    out.result()
  }
}
