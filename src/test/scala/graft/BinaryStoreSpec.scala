package graft

import graft.sources.BinaryStore

import java.nio.file.Files

/** Binary store (stage PUT + directory-table scan, SURVEY.md §2.1 S7/S8)
  * and the filename sanitizer (F5). */
class BinaryStoreSpec extends SparkSuite {

  test("sanitizer strips forbidden chars, underscores spaces, truncates") {
    assert(BinaryStore.sanitizeFilename("""a<b>c:d"e/f\g|h?i*j k""") ==
      "abcdefghij_k")
    assert(BinaryStore.sanitizeFilename("x" * 300).length == 200)
    // idempotent
    val once = BinaryStore.sanitizeFilename("""My Product* 10%?.pdf""")
    assert(BinaryStore.sanitizeFilename(once) == once)
  }

  test("paths with spaces, metacharacters, and subdirectories survive") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft store+probe ").toString
    BinaryStore.put(dir, "sub dir/a file.bin", "x".getBytes)
    BinaryStore.put(dir, "plain.bin", "y".getBytes)
    val rows = BinaryStore.directoryTable(spark, dir)
      .select("relative_path").orderBy("relative_path")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("plain.bin", "sub dir/a file.bin"))
  }

  test("put + directoryTable round-trips content with correct metadata") {
    val dir = Files.createTempDirectory("graft_store_").toString
    BinaryStore.put(dir, "a.bin", "hello".getBytes("UTF-8"))
    BinaryStore.put(dir, "b.bin", "world!".getBytes("UTF-8"))
    // overwrite semantics (the reference's OVERWRITE=TRUE)
    BinaryStore.put(dir, "a.bin", "hello2".getBytes("UTF-8"))
    val df = BinaryStore.directoryTable(spark, dir)
    val rows = df.orderBy("relative_path").collect()
    assert(rows.map(_.getAs[String]("relative_path")).toSeq ==
      Seq("a.bin", "b.bin"))
    assert(rows.map(_.getAs[Long]("size")).toSeq == Seq(6L, 6L))
    val a = rows.head
    assert(new String(a.getAs[Array[Byte]]("content"), "UTF-8") == "hello2")
    // md5 column matches actual content digest
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("hello2".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(a.getAs[String]("md5") == expected)
  }
}
