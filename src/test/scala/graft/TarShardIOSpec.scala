package graft

import graft.sources.TarShardIO
import org.apache.spark.sql.functions._

class TarShardIOSpec extends SparkTestBase {

  private def tempDir() =
    java.nio.file.Files.createTempDirectory("graft-tar").toString

  test("round-trip: bytes exact, unicode keys, empty payloads, shard count") {
    val s = spark
    import s.implicits._
    val dir = tempDir()
    try {
      val rows = Seq(
        ("0001", "txt", "hello".getBytes("UTF-8")),
        ("0002", "txt", Array.empty[Byte]),
        ("naïve-键", "txt", "héllo wörld 键盘".getBytes("UTF-8")),
        ("0003", "bin", Array[Byte](0, 1, -1, 127, -128)))
      rows.toDF("k", "ext", "payload")
      TarShardIO.write(rows.toDF("k", "ext", "payload"),
        dir, "k", "ext", "payload", numShards = 2)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".tar")).map(_.getName).sorted
      assert(files.toSeq == Seq("shard-00000.tar", "shard-00001.tar"))
      assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")))
      val back = TarShardIO.read(s, dir).collect()
        .map(r => r.getString(1) -> r.getAs[Array[Byte]](2).toSeq).toMap
      assert(back.keySet ==
        Set("0001.txt", "0002.txt", "naïve-键.txt", "0003.bin"))
      assert(back("0001.txt") == "hello".getBytes("UTF-8").toSeq)
      assert(back("0002.txt").isEmpty)
      assert(back("naïve-键.txt") == "héllo wörld 键盘".getBytes("UTF-8").toSeq)
      assert(back("0003.bin") == Seq[Byte](0, 1, -1, 127, -128))
    } finally deleteRecursively(dir)
  }

  test("samples are key-adjacent and sorted within each shard (WebDataset contract)") {
    val s = spark
    import s.implicits._
    val dir = tempDir()
    try {
      // multi-entry samples: img+txt per key, written in scrambled order
      val rows = scala.util.Random.shuffle(
        (1 to 40).flatMap(i => Seq(
          (f"$i%04d", "img", Array.fill(3)(i.toByte)),
          (f"$i%04d", "txt", s"caption $i".getBytes("UTF-8")))))
      TarShardIO.write(rows.toDF("k", "ext", "payload"),
        dir, "k", "ext", "payload", numShards = 3)
      // per shard: entry names must be sorted, and every key's entries
      // contiguous; across shards: each key appears in EXACTLY one shard
      val byShard = TarShardIO.read(s, dir).collect()
        .groupBy(_.getInt(0)).view
        .mapValues(_.map(_.getString(1)).toSeq).toMap
      for ((_, names) <- byShard) assert(names == names.sorted, names)
      val keyToShards = byShard.toSeq
        .flatMap { case (sh, names) => names.map(n => n.split("\\.")(0) -> sh) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
      assert(keyToShards.values.forall(_ == 1), "a sample split across shards")
      assert(byShard.values.map(_.size).sum == 80)
    } finally deleteRecursively(dir)
  }

  test("overwrite replaces stale shards; non-binary payload refused") {
    val s = spark
    import s.implicits._
    val dir = tempDir()
    try {
      TarShardIO.write(Seq(("a", "txt", "one".getBytes("UTF-8")))
        .toDF("k", "ext", "payload"), dir, "k", "ext", "payload", 4)
      TarShardIO.write(Seq(("b", "txt", "two".getBytes("UTF-8")))
        .toDF("k", "ext", "payload"), dir, "k", "ext", "payload", 1)
      val back = TarShardIO.read(s, dir).collect().map(_.getString(1)).toSeq
      assert(back == Seq("b.txt"), s"stale shards survived: $back")
      intercept[IllegalArgumentException] {
        TarShardIO.write(Seq(("a", "txt", "not-binary")).toDF("k", "ext", "payload"),
          dir, "k", "ext", "payload", 1)
      }
    } finally deleteRecursively(dir)
  }

  test("duplicate (key, ext) rows are refused; truncated shards fail loudly") {
    val s = spark
    import s.implicits._
    val dir = tempDir()
    try {
      val dup = Seq(("a", "txt", "one".getBytes("UTF-8")),
        ("a", "txt", "two".getBytes("UTF-8"))).toDF("k", "ext", "payload")
      val e = intercept[org.apache.spark.SparkException] {
        TarShardIO.write(dup, dir, "k", "ext", "payload", 1)
      }
      assert(e.getMessage.contains("duplicate tar entry") ||
        Option(e.getCause).exists(_.getMessage.contains("duplicate tar entry")))
      // truncation: chop a valid shard mid-entry; read must throw, not
      // hand back silently short payloads
      TarShardIO.write(Seq(("b", "txt", Array.fill(4096)('x'.toByte)))
        .toDF("k", "ext", "payload"), dir, "k", "ext", "payload", 1)
      val shard = new java.io.File(dir, "shard-00000.tar")
      val full = java.nio.file.Files.readAllBytes(shard.toPath)
      java.nio.file.Files.write(shard.toPath, full.take(1024))
      val err = intercept[org.apache.spark.SparkException] {
        TarShardIO.read(s, dir).collect()
      }
      val msgs = Iterator.iterate(err: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.toString).mkString(" | ")
      assert(msgs.contains("truncated") || msgs.contains("EOF") ||
        msgs.contains("IOException"), msgs)
    } finally deleteRecursively(dir)
  }
}
