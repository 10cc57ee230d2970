package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** [[DeltaDeletionVectors]] — the Delta DV codec: Z85, the portable
  * RoaringBitmapArray layout, and the on-disk DV file format, round-tripped
  * byte-level (no Spark needed). */
class DeltaDeletionVectorsSpec extends AnyFunSuite {

  test("Z85 round-trips arbitrary 4-aligned bytes, including UUIDs") {
    val rnd = new scala.util.Random(11)
    for (len <- Seq(4, 8, 16, 40)) {
      val bytes = Array.fill(len)(rnd.nextInt().toByte)
      val enc = DeltaDeletionVectors.z85Encode(bytes)
      assert(enc.length === len / 4 * 5)
      assert(DeltaDeletionVectors.z85Decode(enc).toSeq === bytes.toSeq)
    }
    // the ZeroMQ spec's own test vector
    assert(DeltaDeletionVectors.z85Encode(
      Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b).map(_.toByte))
      === "HelloWorld")
  }

  test("portable bitmap round-trips positions, including above 2^32") {
    val cases = Seq(
      Seq(0L),
      Seq(0L, 1L, 2L, 63L, 1000000L),
      (0L until 10000L by 7L).toSeq,
      Seq(5L, (1L << 32) + 3L, (1L << 33) + 17L), // spans multiple 32-bit keys
      Seq((1L << 31) + 1L)) // high bit of the low word (unsigned 32-bit)
    cases.foreach { ps =>
      val bytes = DeltaDeletionVectors.serializeBitmap(ps)
      val back = DeltaDeletionVectors.deserializeBitmap(bytes)
      assert(back.toSeq === ps.distinct.sorted, s"case $ps")
    }
  }

  test("DV file write/read round-trips descriptors for several files") {
    val dir = java.nio.file.Files.createTempDirectory("dvspec").toString
    val conf = new org.apache.hadoop.conf.Configuration()
    val dvs = Seq(
      "a.parquet" -> Seq(0L, 5L, 9L),
      "sub/b.parquet" -> (100L until 100000L by 13L).toSeq)
    val descs = DeltaDeletionVectors.writeFile(dvs, dir, "v7", conf)
    assert(descs.keySet === Set("a.parquet", "sub/b.parquet"))
    dvs.foreach { case (k, ps) =>
      val d = descs(k)
      assert(d.storageType === "u")
      assert(d.cardinality === ps.distinct.size.toLong)
      val back = DeltaDeletionVectors.readPositions(d, dir, conf)
      assert(back.toSeq === ps.sorted)
    }
    // deterministic: same seed name → same file, write-once reuse
    val again = DeltaDeletionVectors.writeFile(dvs, dir, "v7", conf)
    assert(again("a.parquet").pathOrInlineDv === descs("a.parquet").pathOrInlineDv)
    // corrupting the payload trips the CRC
    val f = java.nio.file.Paths.get(
      DeltaDeletionVectors.filePathOf(descs("a.parquet"), dir).toUri.getPath)
    val bytes = java.nio.file.Files.readAllBytes(f)
    bytes(7) = (bytes(7) ^ 0x1).toByte
    java.nio.file.Files.write(f, bytes)
    // either OUR payload CRC or Hadoop's local-FS sidecar checksum trips —
    // both are "corruption detected loudly", which is the contract
    val e = intercept[Exception] {
      DeltaDeletionVectors.readPositions(descs("a.parquet"), dir, conf)
    }
    assert(e.isInstanceOf[IllegalArgumentException] ||
      e.isInstanceOf[org.apache.hadoop.fs.ChecksumException], e.toString)
  }

  test("inline descriptors decode (the 'i' storage delta-spark writes for tiny DVs)") {
    val ps = Seq(1L, 4L, 6L)
    var data = DeltaDeletionVectors.serializeBitmap(ps)
    // delta pads inline payloads to 4-byte alignment before Z85
    if (data.length % 4 != 0) data = data ++ new Array[Byte](4 - data.length % 4)
    val d = DeltaDeletionVectors.Descriptor(
      "i", DeltaDeletionVectors.z85Encode(data), None, data.length, 3L)
    val back = DeltaDeletionVectors.readPositions(d, "/nowhere",
      new org.apache.hadoop.conf.Configuration())
    assert(back.toSeq === ps)
  }
}
