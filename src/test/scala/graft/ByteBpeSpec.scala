package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q67b/q68b: byte-level BPE with regex pre-tokenization (the
  * GPT-2/Llama shape). The value gate is the driver's DuckDB compare;
  * these pin trainer parity, the byte round-trip (incl. UTF-8
  * boundary splits), the leading-space convention, and merge
  * monotonicity.
  */
class ByteBpeSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Bpe
  import graft.sources.Tables

  lazy val docs = Tables.documents(spark, sfDir)

  /** JVM twin of the pre-tokenizer (same pattern, Java regex). */
  private def pretoks(text: String): Seq[String] = {
    if (text == null) return Nil
    val t = text.replaceAll("^\\s+|\\s+$", "")
      .toLowerCase(java.util.Locale.ROOT)
    val m = java.util.regex.Pattern.compile(Bpe.PreTokPat).matcher(t)
    val b = Seq.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  private def hexOf(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02X").mkString

  test("q67b distributed trainer == in-memory fast trainer bit-for-bit") {
    val slow = Bpe.byteBpeTrain(docs).collect().map(_.toString).sorted
    val fast = Bpe.byteBpeTrainFast(docs).collect().map(_.toString).sorted
    assert(slow.length == 24 && slow.sameElements(fast))
  }

  test("q67b rules are hex-pair symbol strings (even length, [0-9A-F])") {
    Bpe.byteBpeTrainFast(docs).collect().foreach { r =>
      for (s <- Seq(r.getString(1), r.getString(2))) {
        assert(s.matches("[0-9A-F]+") && s.length % 2 == 0, s"bad symbol '$s'")
        assert(s.length >= 2)
      }
    }
  }

  test("q68b round-trip: stripping spaces and unhexing restores the pre-token bytes") {
    val enc = Bpe.byteBpeEncode(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    raw.foreach { case (id, t) =>
      val expected = pretoks(t).map(hexOf).mkString
      assert(enc(id).replace(" ", "") == expected, s"doc $id byte stream diverged")
    }
  }

  test("q68b UTF-8 boundary: supplementary-plane bytes split and restore exactly") {
    import spark.implicits._
    // 😀 is 4 UTF-8 bytes (F0 9F 98 80); repeated so its byte pairs
    // become the top merges and MUST cross character boundaries
    val df = (Seq((1L, ("😀" * 6) + " a"), (2L, "a 😀b"),
      (3L, "plain ascii text")) ++ (4L to 20L).map(i => (i, s"filler t$i")))
      .toDF("doc_id", "text")
    val merges = 8
    val rules = Bpe.byteBpeTrainFast(df, merges = merges).collect()
    assert(rules.nonEmpty)
    val enc = Bpe.byteBpeEncode(df, merges = merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // some symbol in doc 1 is longer than one byte (a merge happened)
    assert(enc(1L)._2.split(" ").exists(_.length > 2))
    // and the byte stream still reassembles exactly
    for (id <- 1L to 3L) {
      val t = df.filter(col("doc_id") === id).head().getString(1)
      assert(enc(id)._2.replace(" ", "") == pretoks(t).map(hexOf).mkString)
    }
  }

  test("q68b merges=0 is exact byte segmentation; n_subwords monotone in merges") {
    import spark.implicits._
    val small = docs.limit(20).localCheckpoint(true)
    val n0 = Bpe.byteBpeEncode(small, merges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = small.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    raw.foreach { case (id, t) =>
      val bytes = pretoks(t).map(_.getBytes(
        java.nio.charset.StandardCharsets.UTF_8).length.toLong).sum
      assert(n0(id) == bytes, s"doc $id: merges=0 must emit one symbol per byte")
    }
    val n12 = Bpe.byteBpeEncode(small, merges = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n24 = Bpe.byteBpeEncode(small, merges = 24).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    raw.keys.foreach { id =>
      assert(n12(id) <= n0(id) && n24(id) <= n12(id),
        s"doc $id: more merges must never lengthen the encoding")
    }
  }

  test("pre-tokenizer keeps the leading space (the byte-level 'Ġ' convention)") {
    import spark.implicits._
    assert(pretoks("Hello, world 42!") ==
      Seq("hello", ",", " world", " 42", "!"))
    assert(pretoks("a,  b") == Seq("a", ",", " b"))
    // the space byte 0x20 rides inside the token at merges=0
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val enc = Bpe.byteBpeEncode(df, merges = 0).head()
    assert(enc.getString(2) == "61 20 62")
  }
}
