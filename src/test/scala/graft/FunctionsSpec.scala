package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** DSv2 catalog functions (`SELECT cat.cosine(a,b)`, …): each SQL
  * function must agree exactly with the Column builder it mirrors —
  * any drift would silently split the SQL and Scala surfaces. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def mkCat(): String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_fn").toString
    val cat = "gf" + scala.util.Random.alphanumeric.take(4).mkString.toLowerCase
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    cat
  }

  private val texts = Seq(
    "The quick brown fox jumps over the lazy dog",
    "  leading and   trailing   whitespace  ",
    "punctuation, heavy; text! with? marks: everywhere.",
    "short",
    "a an and of to in is on for the",
    "Ünïcode tőkens — émoji 🎉 and CJK 漢字 here")

  test("string functions agree with their Column builders") {
    val cat = mkCat()
    val df = texts.toDF("t")
    df.createOrReplaceTempView("fn_txt")
    val viaSql = spark.sql(
      s"""SELECT $cat.hash60(t) AS h, $cat.token_count(t) AS n,
         |$cat.simhash(t) AS sh, $cat.fingerprint(t) AS fp
         |FROM fn_txt""".stripMargin).collect()
    val viaCol = df.select(
      TextFunctions.hash60(col("t")).as("h"),
      TextFunctions.tokenCount(col("t")).as("n"),
      TextFunctions.simhash(col("t")).as("sh"),
      TextFunctions.fingerprint(col("t")).as("fp")).collect()
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("vector functions agree bit-for-bit with the codegen kernels") {
    val cat = mkCat()
    val vecs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(-1.0f, 0.5f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)), // zero norm
      (Array(0.1f, 0.2f, 0.3f), Array(0.1f, 0.2f, 0.3f)))
    val df = vecs.toDF("a", "b")
    df.createOrReplaceTempView("fn_vec")
    val viaSql = spark.sql(
      s"SELECT $cat.dot(a, b) AS d, $cat.cosine(a, b) AS c FROM fn_vec")
      .as[(Double, Double)].collect().toSeq
    val viaCol = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .as[(Double, Double)].collect().toSeq
    assert(viaSql == viaCol) // includes the zero-norm → 0.0 guard
  }

  test("hilbert2d matches the clustering kernel; discovery works") {
    val cat = mkCat()
    val pts = Seq((0L, 0L), (3L, 5L), (1023L, 1L), (512L, 512L))
    val df = pts.toDF("x", "y")
    df.createOrReplaceTempView("fn_pts")
    val viaSql = spark.sql(
      s"SELECT $cat.hilbert2d(x, y, 10) AS h FROM fn_pts")
      .as[Long].collect().toSeq
    val viaCol = df.select(graft.functions.expressions.Kernels
      .hilbert2d(col("x"), col("y"), 10).as("h")).as[Long].collect().toSeq
    assert(viaSql == viaCol)
    // discovery: SHOW FUNCTIONS lists the catalog surface (DESCRIBE
    // FUNCTION remains session-catalog-only in Spark 4.1 —
    // ResolveSessionCatalog rejects v2 catalogs for it)
    val shown = spark.sql(s"SHOW FUNCTIONS IN $cat").collect()
      .map(_.getString(0)).toSet
    assert(Seq("cosine", "dot", "hash60", "simhash", "fingerprint",
      "token_count", "hilbert2d").forall(f => shown.exists(_.endsWith(f))),
      shown.mkString(", "))
  }

  test("hilbert_nd and sq8 kernels work through pure SQL") {
    val cat = mkCat()
    Seq((Seq(0L, 0L, 0L), Seq(1.0f, -2.0f, 0.5f)),
        (Seq(7L, 3L, 1L), Seq(0.0f, 0.0f, 0.0f)),
        (Seq(1023L, 1L, 512L), Seq(3.25f, 4.5f, -1.0f)))
      .toDF("c", "v").createOrReplaceTempView("fn_nd")
    val viaSql = spark.sql(
      s"""SELECT $cat.hilbert_nd(c, 10) AS h,
         |$cat.sq8_dot(v, $cat.sq8(v)) AS sd FROM fn_nd""".stripMargin)
      .as[(Long, Double)].collect().toSeq
    val viaCol = spark.table("fn_nd").select(
      graft.functions.expressions.Kernels.hilbertNd(col("c"), 10).as("h"),
      graft.functions.expressions.Kernels.dotFB(col("v"),
        graft.functions.expressions.Kernels.sq8(col("v"))).as("sd"))
      .as[(Long, Double)].collect().toSeq
    assert(viaSql == viaCol)
    // float·int8 self-dots, hand-computed: q = round(v*127/maxabs)
    // (1,-2,.5)->(64,-127,32): 64+254+16; zero stays zero;
    // (3.25,4.5,-1)->(92,127,-28): 299+571.5+28
    viaSql.zip(Seq(334.0, 0.0, 898.5)).foreach { case ((_, sd), want) =>
      assert(math.abs(sd - want) < 1e-9, s"$sd vs $want") }
  }

  test("hashed_features SQL function equals the t11 Column path") {
    val cat = mkCat()
    Seq("a b a c", "", "  x  ", "a a a a")
      .toDF("text").createOrReplaceTempView("fn_hf")
    val viaSql = spark.sql(
      s"SELECT $cat.hashed_features(text, 64) AS v FROM fn_hf")
      .collect().map(_.getSeq[Long](0))
    val bks = transform(graft.functions.TextFunctions.tokens(col("text")),
      t => pmod(conv(substring(md5(t), 1, 13), 16, 10).cast("long"),
        lit(64L)))
    val viaCol = spark.table("fn_hf")
      .select(graft.functions.expressions.Kernels.bucketCounts(bks, 64)
        .as("v"))
      .collect().map(_.getSeq[Long](0))
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.forall(_.sum > 0)) // even "" yields one "" token
  }

  test("type mismatches fail loudly at bind time") {
    val cat = mkCat()
    Seq((1L, "x")).toDF("k", "s").createOrReplaceTempView("fn_bad")
    val e = intercept[Exception] {
      spark.sql(s"SELECT $cat.dot(k, s) FROM fn_bad").collect()
    }
    assert(e.getMessage.contains("dot") ||
      e.getCause != null)
  }

  test("WKB codec: MBRs of points, polygons, multi and both endians") {
    import graft.functions.Wkb
    assert(Wkb.mbr(Wkb.point(3.5, -2.0)) == ((3.5, -2.0, 3.5, -2.0)))
    assert(Wkb.mbr(Wkb.box(1, 2, 3, 4)) == ((1.0, 2.0, 3.0, 4.0)))
    // big-endian point (hand-built): order byte 0, type 1, coords
    val be = java.nio.ByteBuffer.allocate(21)
    be.put(0: Byte).putInt(1).putDouble(7.0).putDouble(8.0)
    assert(Wkb.mbr(be.array()) == ((7.0, 8.0, 7.0, 8.0)))
    // multipoint: nested full WKBs
    val mp = java.nio.ByteBuffer.allocate(9 + 2 * 21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    mp.put(1: Byte).putInt(4).putInt(2)
    mp.put(Wkb.point(-1, 0)).put(Wkb.point(5, 9))
    assert(Wkb.mbr(mp.array()) == ((-1.0, 0.0, 5.0, 9.0)))
    // EWKB SRID flag skipped
    val ew = java.nio.ByteBuffer.allocate(25)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ew.put(1: Byte).putInt(1 | 0x20000000).putInt(4326)
      .putDouble(1.0).putDouble(2.0)
    assert(Wkb.mbr(ew.array()) == ((1.0, 2.0, 1.0, 2.0)))
    // malformed input throws (predicate rewrite must leave it residual)
    intercept[Exception](Wkb.mbr(Array[Byte](1, 99)))
    // SQL-surface MBR semantics
    import graft.functions.GraftSqlFunctions._
    assert(StIntersectsBound.invoke(Wkb.point(2, 2), Wkb.box(0, 0, 5, 5)))
    assert(!StIntersectsBound.invoke(Wkb.point(9, 2), Wkb.box(0, 0, 5, 5)))
    assert(StWithinBound.invoke(Wkb.box(1, 1, 2, 2), Wkb.box(0, 0, 5, 5)))
    assert(!StWithinBound.invoke(Wkb.box(1, 1, 9, 2), Wkb.box(0, 0, 5, 5)))
  }

  test("xor64 aggregate: partition-invariant digest, content-sensitive") {
    val cat = mkCat()
    val base = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    def digests(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      df.createOrReplaceTempView("xor_probe")
      spark.sql(s"""SELECT source,
          $cat.xor64($cat.hash60($cat.fingerprint(text))) AS dg
        FROM xor_probe GROUP BY source""")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val d1 = digests(base)
    // XOR is commutative/associative: any partitioning/merge tree
    // must produce the identical digest
    val d2 = digests(base.repartition(13).sortWithinPartitions("text"))
    assert(d1 == d2, "digest changed under repartitioning")
    // flipping ONE document's content must flip its source's digest
    val tgt = base.select("source").head.getString(0)
    val mut = base.withColumn("text",
      when(col("doc_id") === base.filter(col("source") === tgt)
        .agg(min(col("doc_id"))).head.getLong(0),
        concat(col("text"), lit(" x"))).otherwise(col("text")))
    val d3 = digests(mut)
    assert(d3(tgt) != d1(tgt), "digest blind to a content change")
    assert((d1.keySet - tgt).forall(k => d3(k) == d1(k)),
      "unrelated source digests moved")
  }

  test("unicodeNormalize: NFC + accent strip + casefold + collapse") {
    import graft.functions.expressions.Kernels
    val rows = Seq(
      ("Caf\u00e9  du   Monde", "cafe du monde"),       // precomposed
      ("Cafe\u0301 du Monde", "cafe du monde"),          // combining
      ("na\u00efve \u00c9L\u00c8VE", "naive eleve"),
      ("\u00c5 ngstr\u00f6m\tT\u00fcbingen\nG\u00f6ttingen", "a ngstrom tubingen gottingen"),
      ("plain ascii  stays", "plain ascii stays"))
    val got = rows.map(_._1).toDF("t")
      .select(TextFunctions.unicodeNormalize(col("t"))).as[String].collect()
    assert(got.toSeq == rows.map(_._2))
    // both accent forms collapse to ONE dedup key
    assert(got(0) == got(1))
    // kernel null propagation
    val n = Seq[(String, Integer)]((null, 1)).toDF("t", "i")
      .select(Kernels.nfcStrip(col("t"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("deflateLen is real zlib and orders repetitive below noise") {
    import graft.functions.expressions.Kernels
    val rep = Array.fill(200)("the quick brown fox").mkString(" ")
    val noise = (0 until 64).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"noise:$i".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }.mkString(" ")
    val got = Seq(rep, noise).toDF("t")
      .select(col("t"), Kernels.deflateLen(col("t")).as("z")).collect()
    val repLen = got(0).getInt(1); val noiseLen = got(1).getInt(1)
    // independently decompress with Inflater: it IS the zlib stream
    val inf = new java.util.zip.Inflater(false)
    val out = new Array[Byte](rep.getBytes("UTF-8").length + 16)
    val d = new java.util.zip.Deflater(6, false)
    d.setInput(rep.getBytes("UTF-8")); d.finish()
    val comp = new Array[Byte](repLen); d.deflate(comp); d.end()
    inf.setInput(comp)
    val m = inf.inflate(out); inf.end()
    assert(new String(out, 0, m, "UTF-8") == rep)
    // ratio ordering with wide margins (the t16 contract)
    assert(repLen.toDouble / rep.getBytes("UTF-8").length < 0.2)
    assert(noiseLen.toDouble / noise.getBytes("UTF-8").length > 0.4)
  }

  test("unicode_normalize / compression_ratio SQL == Column builders") {
    val cat = mkCat()
    val df = (texts :+ "Cafe\u0301  DU  monde\tna\u00efve").toDF("t")
    df.createOrReplaceTempView("fn_un")
    val viaSql = spark.sql(
      s"""SELECT $cat.unicode_normalize(t) AS n,
         |$cat.compression_ratio(t) AS r FROM fn_un""".stripMargin)
      .collect()
    val viaCol = df.select(
      TextFunctions.unicodeNormalize(col("t")).as("n"),
      TextFunctions.compressionRatio(col("t")).as("r")).collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    // the combining-accent row normalized to the precomposed-form key
    assert(viaCol.last.getString(0) == "cafe du monde naive")
  }

  test("char_ngrams: kernel == HOF twin incl. astral-plane code points") {
    val cat = mkCat()
    // surrogate-pair characters (astral plane) — grams must be
    // CODE-POINT windows, where UTF-16-unit slicing would split pairs
    val samples = Seq("abcdef", "ab", "", "日本語のテキスト処理",
      "a😀b😁c😂d", "aaaaaa")
    val df = samples.toDF("t")
    df.createOrReplaceTempView("fn_cg")
    val viaSql = spark.sql(
      s"SELECT $cat.char_ngrams(t, 3) AS g FROM fn_cg")
      .collect().map(_.getSeq[String](0).toList).toList
    // declarative twin: sequence → transform → substr → array_distinct
    // (guarded: sequence(1, 0) DESCENDS in Spark — an unguarded
    // greatest(len-2, 0) twin emits bogus grams for strings under k)
    val viaHof = df.select(when(length(col("t")) >= 3,
        array_distinct(transform(
          sequence(lit(1), length(col("t")) - 2),
          i => col("t").substr(i, lit(3)))))
      .otherwise(array().cast("array<string>")).as("g"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(viaSql == viaHof)
    // and the Dedup column path is the same kernel
    val viaCol = df.select(
        graft.operators.Dedup.charShingles(col("t"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(viaCol == viaSql)
    assert(viaSql.head == List("abc", "bcd", "cde", "def"))
    assert(viaSql(1) == Nil && viaSql(2) == Nil)
    assert(viaSql.last == List("aaa"))
  }
}
