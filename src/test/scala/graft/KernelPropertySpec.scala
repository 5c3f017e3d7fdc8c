package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.functions.{Hll, TopKBuffer}

/** Property tests for the custom kernels: the model answer is computed
  * with plain Scala collections, the kernel must agree on arbitrary
  * inputs — insertion order, duplicates, merges, partial fills.
  * Seeded generators → deterministic, yet hundreds of adversarial
  * cases per run.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def modelTopK(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortBy { case (o, i) => (-o, i) }.take(k)

  test("TopKBuffer equals sort-based top-k for arbitrary inputs") {
    val rnd = new Random(42)
    for (_ <- 1 to 300) {
      val k = 1 + rnd.nextInt(8)
      val xs = Seq.fill(rnd.nextInt(60))(
        (rnd.nextInt(20) - 10.0, rnd.nextInt(50).toLong)) // dense: forces ties
      val buf = new TopKBuffer(k)
      xs.foreach { case (o, i) => buf.insert(o, i) }
      val got = (0 until buf.n).map(i => (buf.ords(i), buf.ids(i)))
      assert(got == modelTopK(xs, k), s"k=$k xs=$xs")
    }
  }

  test("TopKBuffer merge equals top-k of the concatenation") {
    val rnd = new Random(7)
    for (_ <- 1 to 300) {
      val k = 1 + rnd.nextInt(6)
      def mk() = Seq.fill(rnd.nextInt(40))(
        (rnd.nextInt(10) - 5.0, rnd.nextInt(30).toLong))
      val (a, b) = (mk(), mk())
      val ba = new TopKBuffer(k); a.foreach { case (o, i) => ba.insert(o, i) }
      val bb = new TopKBuffer(k); b.foreach { case (o, i) => bb.insert(o, i) }
      ba.mergeFrom(bb)
      val got = (0 until ba.n).map(i => (ba.ords(i), ba.ids(i)))
      assert(got == modelTopK(a ++ b, k), s"k=$k a=$a b=$b")
    }
  }

  private def modelTopKLex(xs: Seq[(Long, Long, String)], k: Int): Seq[(Long, Long, String)] =
    xs.sortBy { case (d, a, key) => (-d, a, key) }.take(k)

  test("TopKLexBuffer equals sort-based top-k under (desc, asc, key) for arbitrary inputs") {
    import graft.functions.TopKLexBuffer
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new Random(13)
    for (_ <- 1 to 300) {
      val k = 1 + rnd.nextInt(8)
      // dense value ranges force ties at every level of the ordering
      val xs = Seq.fill(rnd.nextInt(60))((rnd.nextInt(5).toLong,
        rnd.nextInt(5).toLong, ('a' + rnd.nextInt(4)).toChar.toString * (1 + rnd.nextInt(2))))
      val buf = new TopKLexBuffer(k)
      xs.foreach { case (d, a, key) => buf.insert(d, a, UTF8String.fromString(key)) }
      val got = (0 until buf.n).map(i => (buf.ds(i), buf.as(i), buf.keys(i).toString))
      assert(got == modelTopKLex(xs, k), s"k=$k xs=$xs")
    }
  }

  test("TopKLexBuffer merge equals top-k of the concatenation, incl. serde round-trip") {
    import graft.functions.{TopKLex, TopKLexBuffer}
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{LongType, StringType}
    val rnd = new Random(17)
    val agg = TopKLex(BoundReference(0, LongType, nullable = true),
      BoundReference(1, LongType, nullable = true),
      BoundReference(2, StringType, nullable = true), 5)
    for (_ <- 1 to 200) {
      val k = 1 + rnd.nextInt(6)
      def mk() = Seq.fill(rnd.nextInt(40))((rnd.nextInt(4).toLong,
        rnd.nextInt(4).toLong, ('a' + rnd.nextInt(3)).toChar.toString))
      val (a, b) = (mk(), mk())
      def fill(xs: Seq[(Long, Long, String)]) = {
        val buf = new TopKLexBuffer(k)
        xs.foreach { case (d, s, key) => buf.insert(d, s, UTF8String.fromString(key)) }
        buf
      }
      val ba = fill(a)
      // the merge path always crosses serde in a real exchange
      val bb = agg.deserialize(agg.serialize(fill(b)))
      ba.mergeFrom(bb)
      val got = (0 until ba.n).map(i => (ba.ds(i), ba.as(i), ba.keys(i).toString))
      assert(got == modelTopKLex(a ++ b, k), s"k=$k a=$a b=$b")
    }
  }

  test("Hll add/merge order never changes the registers") {
    val rnd = new Random(11)
    for (_ <- 1 to 50) {
      val a = Seq.fill(rnd.nextInt(500))(rnd.nextLong())
      val b = Seq.fill(rnd.nextInt(500))(rnd.nextLong())
      val ab = Hll.emptyRegisters(8); val ba = Hll.emptyRegisters(8)
      a.foreach(Hll.add(ab, _)); b.foreach(Hll.add(ab, _))
      b.foreach(Hll.add(ba, _)); a.foreach(Hll.add(ba, _))
      assert(ab.sameElements(ba))
      // merging a sketch into itself is a no-op (idempotent monoid)
      val before = ab.clone()
      Hll.merge(ab, before)
      assert(ab.sameElements(before))
      // split-then-merge equals single-pass
      val merged = Hll.emptyRegisters(8)
      val sa = Hll.emptyRegisters(8); a.foreach(Hll.add(sa, _))
      val sb = Hll.emptyRegisters(8); b.foreach(Hll.add(sb, _))
      Hll.merge(merged, sa); Hll.merge(merged, sb)
      assert(merged.sameElements(ab))
    }
  }

  test("Hll estimate tracks true cardinality within 5% + 3 at p=12") {
    for (n <- Seq(0, 1, 7, 100, 1234, 5000, 20000, 100000)) {
      val s = Hll.emptyRegisters(12)
      (0 until n).foreach(i => Hll.add(s, i.toLong * 2654435761L + 17))
      val est = Hll.estimate(s)
      assert(math.abs(est - n) <= n * 0.05 + 3, s"n=$n est=$est")
    }
  }

  test("PolyHashExpr: codegen column equals the Scala model and the q21 lambda") {
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    val rnd = new Random(5)
    val docs = Seq("", "a", "hello world", "  padded  ") ++
      Seq.fill(60)(rnd.alphanumeric.take(rnd.nextInt(120)).mkString)
    import SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = docs.toDF("text")
      .select(col("text"), graft.functions.VectorFunctions.poly_hash(col("text")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    docs.foreach(d => assert(got(d) == ref(d), s"text=$d"))
    docs.foreach(d => assert(graft.functions.PolyHashExpr.hash(d) == ref(d), s"eval: $d"))
  }

  test("L2DistExpr: codegen equals the lambda fold; unequal lengths throw") {
    import SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(21)
    val rows = (0 until 40).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextInt(1 << 21).toLong),
        Seq.fill(64)(rnd.nextInt(1 << 21).toLong)))
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      graft.functions.VectorFunctions.l2_dist(col("a"), col("b")).as("d"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x).as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
    intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
        .select(graft.functions.VectorFunctions.l2_dist(col("a"), col("b"))).collect()
    }
  }

  test("Log2Q16Expr: codegen equals the Scala model, tracks log2 within 17 ulp16, monotone") {
    import SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new Random(13)
    val xs = (Seq(1L, 2L, 3L, 4L, 7L, 65535L, 65536L, 65537L, 1L << 40, Long.MaxValue) ++
      Seq.fill(80)(math.abs(rnd.nextLong()) % 1000000 + 1)).distinct
    val got = xs.toDF("x")
      .select(col("x"), graft.functions.VectorFunctions.log2_q16(col("x")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val r = graft.functions.Log2Q16Expr.compute(x)
      assert(got(x) == r, s"codegen vs eval at $x")
      // truncation at each of 16 squarings loses < 2^-16 each: the
      // result sits in (true - 17·2^-16, true]
      val t = math.log(x.toDouble) / math.log(2.0) * 65536.0
      assert(r <= t + 1e-6 && r > t - 17, s"x=$x r=$r true=$t")
    }
    // exact at powers of two; strictly monotone on consecutive inputs
    assert(graft.functions.Log2Q16Expr.compute(1L) == 0L)
    assert(graft.functions.Log2Q16Expr.compute(1024L) == 10L * 65536)
    val seq = (1L to 3000L).map(graft.functions.Log2Q16Expr.compute)
    assert(seq.zip(seq.tail).forall { case (a, b) => a <= b })
    intercept[IllegalArgumentException](graft.functions.Log2Q16Expr.compute(0L))
  }

  test("QrhpSignatureExpr: codegen column equals the interpreted Scala model") {
    import SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.QrhpPlanes
    val rnd = new Random(9)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() / 8.0).toFloat)))
    def model(v: Array[Float], nBits: Int): Long = {
      var sig = 0L
      for (j <- 0 until nBits) {
        var acc = 0L
        for (d <- v.indices) {
          val q = math.floor(v(d).toDouble * 1048576.0 + 0.5).toLong
          acc += QrhpPlanes.weight(j, d) * q
        }
        if (acc >= 0) sig |= (1L << j)
      }
      sig
    }
    val got = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.qrhp_signature(col("embedding"), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) => assert(got(id) == model(v, 64), s"vec $id") }
  }

  test("RhpSignatureExpr offset: disjoint plane ranges, stable per-offset bits") {
    import SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new Random(13)
    val vecs = (0 until 30).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() / 8.0).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    // bits [16, 32) of a 32-bit signature == a 16-bit signature at offset 16
    val wide = df.select(col("vec_id"),
      graft.functions.VectorFunctions.rhp_signature(col("embedding"), 32).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1) >>> 16) & 0xFFFFL)).toMap
    val offs = df.select(col("vec_id"),
      graft.functions.VectorFunctions.rhp_signature(col("embedding"), 16, 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, _) => assert(wide(id) == offs(id), s"vec $id") }
  }

  test("RhpMultiSignatureExpr: element t equals rhp_signature at offset t*nBits, codegen and interpreted") {
    import SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new Random(17)
    val vecs = (0 until 30).map(i =>
      (i.toLong, Array.fill(48)((rnd.nextGaussian() / 8.0).toFloat)))
    // repartition breaks the LocalRelation collapse so the projection
    // actually executes in tasks under whole-stage codegen
    val df = vecs.toDF("vec_id", "embedding").repartition(3)
    for ((nBits, nTables) <- Seq((4, 16), (7, 5), (24, 3))) {
      val multi = df.select(col("vec_id"),
        graft.functions.VectorFunctions
          .rhp_multi_signature(col("embedding"), nBits, nTables).as("sigs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
      for (t <- 0 until nTables) {
        val single = df.select(col("vec_id"),
          graft.functions.VectorFunctions
            .rhp_signature(col("embedding"), nBits, t * nBits).as("s"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        vecs.foreach { case (id, _) =>
          assert(multi(id)(t) == single(id), s"nBits=$nBits t=$t vec=$id")
        }
      }
      // interpreted path (Expression.eval on a Literal, no codegen)
      // must agree bit-for-bit with the executed column
      vecs.take(8).foreach { case (id, v) =>
        val litArr = org.apache.spark.sql.catalyst.expressions.Literal.create(
          v, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
        val got = graft.functions.RhpMultiSignatureExpr(litArr, nBits, nTables)
          .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray.toVector
        assert(got == multi(id), s"interpreted nBits=$nBits vec=$id")
        val gotSingles = (0 until nTables).map(t =>
          graft.functions.RhpSignatureExpr(litArr, nBits, t * nBits)
            .eval(null).asInstanceOf[Long]).toVector
        assert(gotSingles == multi(id), s"interpreted single nBits=$nBits vec=$id")
      }
    }
  }

  test("SimHashLanes.pack equals the unpacked 64-parity ReplayableHash model, incl. summed lanes") {
    import graft.functions.{ReplayableHash, SimHashLanes}
    import graft.functions.SimHashLanes.{FieldBits, FieldsPerLane, MaxTokens, NLanes}
    // the q26 oracle's unpacked formulation: bit j's parity for token
    // hash h, drawn from ReplayableHash indices 64..127
    def parity(h: Long, j: Int): Long =
      ((ReplayableHash.a(64 + j) * h + ReplayableHash.b(64 + j)) % ReplayableHash.P) % 2L
    val rnd = new Random(23)
    val hashes = Seq(0L, 1L, 999999999L) ++
      Seq.fill(200)(math.abs(rnd.nextLong()) % 1000000007L)
    // per-token: each packed field is exactly that bit's parity
    hashes.foreach { h =>
      val lanes = SimHashLanes.pack(h)
      assert(lanes.length == NLanes)
      for (j <- 0 until 64) {
        val field = (lanes(j / FieldsPerLane) >>> ((j % FieldsPerLane) * FieldBits)) &
          ((1L << FieldBits) - 1)
        assert(field == parity(h, j), s"h=$h j=$j")
      }
    }
    // per-document: summing packed lanes sums every field independently
    // (the property the q26 aggregation relies on), and the recovered
    // sign bit matches the ±1-sum model, up to the documented bound
    for (_ <- 1 to 30) {
      val n = 1 + rnd.nextInt(500)
      val doc = Seq.fill(n)(hashes(rnd.nextInt(hashes.size)))
      assert(n <= MaxTokens)
      val laneSums = new Array[Long](NLanes)
      doc.foreach { h =>
        val lanes = SimHashLanes.pack(h)
        for (t <- 0 until NLanes) laneSums(t) += lanes(t)
      }
      for (j <- 0 until 64) {
        val sumP = (laneSums(j / FieldsPerLane) >>> ((j % FieldsPerLane) * FieldBits)) &
          ((1L << FieldBits) - 1)
        val model = doc.map(parity(_, j)).sum
        assert(sumP == model, s"j=$j n=$n")
        // bit set iff 2·Σp > n  ==  sign of Σ(2p−1) > 0
        val signed = doc.map(h => 2 * parity(h, j) - 1).sum
        assert((2 * sumP > n) == (signed > 0), s"sign j=$j")
      }
    }
  }

  test("TopKBuffer insertDistinct/mergeFromDistinct equal the distinct top-k model") {
    // contract: duplicates of one id always carry the IDENTICAL ord
    // (re-scored candidate pairs) — so the model is: distinct ids,
    // ranked by (ord DESC, id ASC), take k
    val rnd = new Random(31)
    for (trial <- 1 to 400) {
      val k = 1 + rnd.nextInt(6)
      val idSpace = 1 + rnd.nextInt(25)
      val ordOf: Long => Double = id => ((id * 2654435761L) % 17).toDouble - 8.0
      // heavy duplication: ids repeat, including after eviction
      val stream = Seq.fill(rnd.nextInt(80))(rnd.nextInt(idSpace).toLong)
      val model = stream.distinct.map(id => (ordOf(id), id))
        .sortBy { case (o, i) => (-o, i) }.take(k)

      val direct = new TopKBuffer(k)
      stream.foreach(id => direct.insertDistinct(ordOf(id), id))
      val gotDirect = (0 until direct.n).map(i => (direct.ords(i), direct.ids(i)))
      assert(gotDirect == model, s"trial=$trial k=$k stream=$stream")

      // partial-buffer merges: split into chunks (so the same id can
      // appear in several partials AND be evicted from some), merge in
      // shuffled order
      if (stream.nonEmpty) {
        val nChunks = 1 + rnd.nextInt(4)
        val partials = stream.grouped(math.max(1, stream.size / nChunks)).map { chunk =>
          val b = new TopKBuffer(k)
          chunk.foreach(id => b.insertDistinct(ordOf(id), id))
          b
        }.toSeq
        val merged = new TopKBuffer(k)
        rnd.shuffle(partials).foreach(merged.mergeFromDistinct)
        val gotMerged = (0 until merged.n).map(i => (merged.ords(i), merged.ids(i)))
        assert(gotMerged == model, s"merge trial=$trial k=$k stream=$stream")
      }
    }
    // the eviction edge, pinned explicitly: a duplicate arriving after
    // its first occurrence was evicted must not re-enter above rank
    val b = new TopKBuffer(2)
    b.insertDistinct(5.0, 10L)
    b.insertDistinct(6.0, 11L)
    b.insertDistinct(7.0, 12L) // evicts (5.0, 10)
    b.insertDistinct(5.0, 10L) // duplicate of the evicted entry
    assert((0 until b.n).map(i => (b.ords(i), b.ids(i))) == Seq((7.0, 12L), (6.0, 11L)))
  }

  test("CharShingleSetExpr equals the substring/xxhash64 formulation's distinct set") {
    import SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val rnd = new Random(41)
    val alphabet = "abc d\né日本語🙂  xyz"
    val docs = Seq("", " ", "x", "abcdef", "abcdefg", "日本語のテキストです", "🙂🙂🙂🙂🙂🙂🙂🙂") ++
      Seq.fill(40)((0 until rnd.nextInt(300)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "norm").repartition(3)
    for (n <- Seq(3, 7)) {
      val fused = df.select(col("id"), graft.functions.VectorFunctions
          .char_shingle_set(col("norm"), n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      // the formulation it replaced: per-position substring + xxhash64
      // (Spark's xxhash64 hashes the string's UTF-8 bytes, seed 42 —
      // the exact hash the fused kernel computes over each window)
      val old = df.select(col("id"), expr(
          s"""transform(sequence(1, greatest(length(norm) - ${n - 1}, 1)),
              i -> xxhash64(substring(norm, i, $n)))""").as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      docs.indices.foreach { i =>
        assert(fused(i.toLong) == old(i.toLong), s"n=$n doc=$i '${docs(i)}'")
      }
    }
  }

  test("CMS sketch: estimate upper-bounds the truth, merge equals single-pass, serde round-trips") {
    import graft.functions.Cms
    val rnd = new Random(61)
    val (w, d) = (256, 4)
    for (trial <- 1 to 20) {
      // zipfish key stream over a modest key space
      val keys = Seq.fill(500 + rnd.nextInt(1500))(
        math.abs(rnd.nextGaussian() * 50).toLong % 200)
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap

      val single = Cms.empty(w, d)
      keys.foreach(Cms.add(single, _, w, d))
      // estimate >= truth for EVERY key (CMS can only overestimate)
      truth.foreach { case (k, tf) =>
        assert(Cms.estimate(single, k, w, d) >= tf, s"trial=$trial key=$k")
      }
      // absent keys estimate within the eps*N collision bound, never negative
      assert(Cms.estimate(single, 999999L, w, d) >= 0L)

      // partial merge == single pass, counter-exact
      val parts = keys.grouped(math.max(1, keys.size / (1 + rnd.nextInt(5)))).map { chunk =>
        val b = Cms.empty(w, d); chunk.foreach(Cms.add(b, _, w, d)); b
      }.toSeq
      val merged = Cms.empty(w, d)
      rnd.shuffle(parts).foreach(Cms.merge(merged, _))
      assert(merged.toSeq == single.toSeq, s"trial=$trial merge mismatch")

      // serialization round-trip is identity
      assert(Cms.deserialize(Cms.serialize(single)).toSeq == single.toSeq)
    }
  }

  test("polynomial fingerprint matches an independent reference impl") {
    // mirror of the q21 expression: (h*31 + codepoint) % 1e9+7, left fold
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    val rnd = new Random(3)
    val docs = Seq("", "a", "hello world") ++
      Seq.fill(50)(rnd.alphanumeric.take(rnd.nextInt(200)).mkString)
    import SparkTestSession.spark
    import spark.implicits._
    val df = docs.toDF("text")
    val got = df.selectExpr(
      """aggregate(
           transform(sequence(1, length(text)), i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)),
           CAST(0 AS BIGINT),
           (h, c) -> (h * 31 + c) % 1000000007) AS fp""", "text")
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    docs.foreach(d => assert(got(d) == ref(d), s"text=$d"))
  }
}
