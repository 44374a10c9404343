package graft

import graft.functions.{GraftFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

/** SQL-registered native functions agree with the Column API. */
class GraftFunctionsSpec extends SparkSuite {

  test("GraftExtensions injects the graft_* functions through the " +
    "SparkSessionExtensions path") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    // drive the extension's own registration hook against a live registry,
    // exactly what session construction does with spark.sql.extensions set
    org.apache.spark.sql.GraftColumnBridge.applyExtensionFunctions(ext, spark)
    val got = spark.sql(
      "SELECT graft_hex_sign_mask('07f') AS m, graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_zorder(3, 1) AS z") // INT literals: ImplicitCast widens
      .head()
    assert(got.getLong(0) == 3L) // '0','7' set, 'f' clear
    assert(got.getDouble(1) == 11.0)
    assert(got.getLong(2) == 11L) // x=0b11 on odd bits, y=0b01 on even
  }

  test("hexSignMask equals the 32-way substring formulation bit for bit") {
    import spark.implicits._
    import graft.functions.TextFunctions.hexSignMask
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .distinct()
      .withColumn("h", md5(col("tok")))
    val viaSubstring = (0 until 32).map { b =>
      when(substring(col("h"), b + 1, 1) <= "7", lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val rows = docs.select(
        hexSignMask(col("h")).bitwiseAND(lit(0xFFFFFFFFL)).as("fast"),
        viaSubstring.as("slow"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("lshBucket native expression equals the signProjection HOF " +
    "formulation on real embeddings, all tables") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    (0 until 4).foreach { t =>
      val rows = e.select(
          VectorFunctions.lshBucket(col("v"), 6, 64, t).as("fast"),
          VectorFunctions.lshBucketHof(col("v"), 6, 64, t).as("slow"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"table $t: ${r.getLong(0)} != ${r.getLong(1)}"))
    }
    // degenerate inputs follow the HOF semantics exactly: a NULL vector
    // and a NULL element both collapse every projection's CaseWhen to
    // its otherwise(0) arm — bucket 0, never NULL (and the column stays
    // non-nullable, schema-identical to the sum-of-CaseWhen form)
    val edge = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, null),
        org.apache.spark.sql.Row(2L, Seq.tabulate(64)(i =>
          if (i == 7) null else java.lang.Double.valueOf(0.1 * i)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = true)))))
    val out = edge.select(col("id"),
      VectorFunctions.lshBucket(col("v"), 6, 64).as("b"))
    assert(!out.schema("b").nullable)
    out.collect().foreach(r => assert(r.getLong(1) == 0L))
  }

  test("graft_dot / graft_cosine callable from SQL, equal to Column API") {
    GraftFunctions.register(spark)
    Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
      .createOrReplaceTempView("emb_v")
    val viaSql = spark.sql(
      """SELECT a.vec_id AS qid, b.vec_id AS nid,
        |       graft_dot(a.v, b.v) AS d, graft_cosine(a.v, b.v) AS c
        |FROM emb_v a JOIN emb_v b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 3 AND b.vec_id < 6
        |ORDER BY qid, nid""".stripMargin).collect()
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    val a = e.as("a"); val b = e.as("b")
    val viaCol = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .filter(col("a.vec_id") < 3 && col("b.vec_id") < 6)
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"),
        VectorFunctions.dot(col("a.v"), col("b.v")).as("d"),
        VectorFunctions.cosine(col("a.v"), col("b.v")).as("c"))
      .orderBy("qid", "nid").collect()
    assert(viaSql.length == viaCol.length && viaSql.nonEmpty)
    viaSql.zip(viaCol).foreach { case (x, y) =>
      assert(x.getDouble(2) == y.getDouble(2)) // bit-exact
      assert(x.getDouble(3) == y.getDouble(3))
    }
  }

  test("normalizeText: NFC + accent strip + lowercase + whitespace collapse") {
    import spark.implicits._
    import graft.functions.TextFunctions.normalizeText
    val cases = Seq(
      // (input, expected)
      ("Café  RENÁ", "cafe rena"), // precomposed accents
      ("Café Rená", "cafe rena"), // combining-mark (NFD) form
      ("  hello \t\n world  ", "hello world"), // whitespace runs + trim
      ("Plain ASCII Text", "plain ascii text"), // ASCII fast path
      ("", ""),
      ("Über straße", "uber straße")) // U+00DF has no mark to strip
    val got = cases.map(_._1).toDF("s")
      .select(normalizeText(col("s"))).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, e) => assert(g == e) }
    // NFC- and NFD-encoded inputs converge to one fingerprint
    val Seq(a, b) = Seq("Café", "Café").toDF("s")
      .select(md5(normalizeText(col("s")))).as[String].collect().toSeq
    assert(a == b)
    // null propagates
    assert(Seq[Option[String]](None).toDF("s")
      .select(normalizeText(col("s"))).head().isNullAt(0))
  }

  test("graft_normalize_text callable from SQL, equal to Column API") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftColumnBridge.applyExtensionFunctions(ext, spark)
    val got = spark.sql(
      "SELECT graft_normalize_text('  Café  DU  MONDE ') AS n").head().getString(0)
    assert(got == "cafe du monde")
  }

  test("q85 PII regexes mask email and phone shapes before the digit-run rule") {
    import spark.implicits._
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}"
    val idRunRe = "[0-9]{4,}"
    def redact(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(regexp_replace(c,
        emailRe, "[EMAIL]"), phoneRe, "[PHONE]"), idRunRe, "[ID]")
    val cases = Seq(
      ("contact bob.smith+x@mail.example.org today",
        "contact [EMAIL] today"),
      ("call 555-867-5309 or 555.123.4567",
        "call [PHONE] or [PHONE]"),
      ("customer 123456789 bought item 42", // bare digit runs >= 4
        "customer [ID] bought item 42"),
      ("a@b.io 123-4567-8901 9999", // all three in one value
        "[EMAIL] [PHONE] [ID]"),
      ("no pii here", "no pii here"))
    val got = cases.map(_._1).toDF("s").select(redact(col("s"))).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, e) => assert(g == e) }
  }

  test("bloom semijoin: no false negatives; probe prunes most non-members") {
    import graft.functions.BloomFunctions
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val members = docs.filter(col("doc_id") % 7 === 0)
      .select(xxhash64(col("text")).as("fp"))
    val bloom = BloomFunctions.buildLongBloom(
      members, col("fp"), expectedItems = members.count(), fpp = 0.01)
    val probed = docs.select(col("doc_id"),
      BloomFunctions.mightContainLong(bloom, xxhash64(col("text"))).as("hit"))
    // every true member must survive the probe (no false negatives)
    assert(probed.filter(col("doc_id") % 7 === 0 && !col("hit")).count() == 0)
    // fpp=1% over ~430 non-members: allow generous slack, but the probe
    // must reject the overwhelming majority
    val nonMembers = probed.filter(col("doc_id") % 7 =!= 0)
    val fp = nonMembers.filter(col("hit")).count().toDouble / nonMembers.count()
    assert(fp < 0.05, s"bloom false-positive rate $fp")
  }

  test("zorder: value pins, null propagation, and codegen == expanded form") {
    import spark.implicits._
    import graft.functions.ZOrderExpr
    // hand-computed pins: interleave(x=0b11, y=0b01) = 0b1011 = 11;
    // x supplies odd bits so zorder(1,0)=2, zorder(0,1)=1
    val pins = Seq((0L, 0L, 0L), (1L, 0L, 2L), (0L, 1L, 1L), (3L, 1L, 11L),
      (255L, 255L, 65535L), (255L, 0L, 43690L), (0L, 255L, 21845L))
    pins.foreach { case (x, y, want) =>
      val got = Seq((x, y)).toDF("x", "y")
        .select(ZOrderExpr.zorder(col("x"), col("y"), 8).as("z"))
        .head().getLong(0)
      assert(got == want, s"zorder($x,$y)=$got want $want")
    }
    val nullRow = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(ZOrderExpr.zorder(col("x"), col("y"), 8).as("z")).head()
    assert(nullRow.isNullAt(0))
    // whole-column agreement with the expanded shift/mask SQL twin on
    // real data (codegen'd loop vs 16-term expression)
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select((col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
      .select(ZOrderExpr.zorder(col("x"), col("y"), 8).as("fast"),
        expr(ZOrderExpr.zorderSql("x", "y", 8)).as("slow"))
    assert(li.filter(col("fast") =!= col("slow")).count() == 0)
    // z-order locality: any 1024-wide z range confines BOTH coordinates
    // to a 32x32 tile (top 6 interleaved bits = 3 bits per axis => 2^5
    // remaining per axis)
    val tiles = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select((col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
      .select(ZOrderExpr.zorder(col("x"), col("y"), 8).as("z"), col("x"), col("y"))
      .withColumn("tile", expr("z div 1024"))
      .groupBy("tile")
      .agg(max("x") - min("x"), max("y") - min("y"))
      .collect()
    tiles.foreach { r =>
      assert(r.getLong(1) < 32 && r.getLong(2) < 32,
        s"tile ${r.getLong(0)} spans ${r.getLong(1)}x${r.getLong(2)}")
    }
  }

  test("property: graft_zorder is a bijection on 8-bit coordinates — " +
    "de-interleaving the index recovers exactly the inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(300)((rnd.nextInt(256), rnd.nextInt(256)))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.ZOrderExpr.zorder(col("x"), col("y"), 8).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getInt(0), r.getInt(1), r.getLong(2))
      var dx = 0; var dy = 0
      for (i <- 0 until 8) {
        dx |= (((z >> (2 * i + 1)) & 1L) << i).toInt
        dy |= (((z >> (2 * i)) & 1L) << i).toInt
      }
      assert(dx == x && dy == y, s"($x,$y) -> $z -> ($dx,$dy)")
    }
  }

  test("property: normalize_text is idempotent — normalizing a normalized " +
    "string is the identity") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "aA zZ\t\n éÉüÜñÑ çÇ09 -_.,!?áàâ  ÅåØø"
    val strs = Seq.fill(300)(
      (1 to rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    import graft.functions.TextFunctions.normalizeText
    val bad = strs.toDF("s")
      .select(normalizeText(col("s")).as("once"),
        normalizeText(normalizeText(col("s"))).as("twice"))
      .filter(col("once") =!= col("twice"))
    assert(bad.count() == 0, bad.collect().mkString("; "))
  }
}
