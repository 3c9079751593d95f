package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens keep empty tokens from space runs (DuckDB string_split parity)") {
    val got = Seq("a b  c").toDF("t")
      .select(TextFunctions.tokenCount($"t")).as[Int].head()
    assert(got == 4)
  }

  test("shingles: sliding word windows; short docs fall back to whole text") {
    val got = Seq("a b c d").toDF("t")
      .select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fps = Seq("alpha beta gamma", "beta alpha gamma", "alpha beta gamma")
      .toDF("t").select(TextFunctions.fingerprint($"t")).as[Long].collect()
    assert(fps(0) == fps(2))
    assert(fps(0) != fps(1))
    assert(fps.forall(f => f >= 0 && f < Hashing.Mod))
  }

  test("langId picks the language with strongest markers") {
    val got = Seq(
      "the cat is on the mat and the dog",
      "der hund und die katze ist schön",
      "el perro que es la casa los gatos").toDF("t")
      .select(TextFunctions.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es"))
  }

  test("qualityScore in [0,1] and favors longer stopword-bearing text") {
    val df = Seq(
      ("the cat and the dog of the house went to the market " * 6, 318L),
      ("zzz", 3L)).toDF("t", "n")
    val s = df.select(TextFunctions.qualityScore($"t", $"n")).as[Double].collect()
    assert(s.forall(x => x >= 0.0 && x <= 1.0))
    assert(s(0) > s(1))
  }

  test("universal hash family: portable, stable, independent") {
    val h = Seq("abc").toDF("s")
      .select(Hashing.hash64($"s"), Hashing.base31($"s"),
        Hashing.affine(Hashing.base31($"s"), 0),
        Hashing.affine(Hashing.base31($"s"), 1))
      .as[(Long, Long, Long, Long)].head()
    // md5('abc') = 900150983cd24fb0... → first 15 hex digits as int64
    assert(h._1 == java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(h._2 == h._1 % Hashing.MersenneP)
    assert(h._3 != h._4)
  }
}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot/norm/cosine compute exact double math") {
    val df = Seq((Array(1f, 2f, 2f), Array(2f, 1f, 2f))).toDF("a", "b")
    val (d, n, c) = df.select(
      VectorFunctions.dot($"a", $"b"),
      VectorFunctions.norm($"a"),
      VectorFunctions.cosine($"a", $"b")).as[(Double, Double, Double)].head()
    assert(d == 8.0)
    assert(n == 3.0)
    assert(math.abs(c - 8.0 / 9.0) < 1e-12)
  }

  test("lshBucket deterministic and within range") {
    val df = Seq(Array(1f, 0f), Array(0f, 1f), Array(1f, 0f)).toDF("v")
    val b = df.select(VectorFunctions.lshBucket($"v", planes = 4, dim = 2)).as[Int].collect()
    assert(b(0) == b(2))
    assert(b.forall(x => x >= 0 && x < 16))
  }

  test("native dot / squared-distance are bit-identical to declarative") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val pairs = emb.select($"vec_id", $"embedding".as("a"))
      .crossJoin(emb.select($"embedding".as("b")).limit(3))
    def declSq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val both = pairs.select(
      VectorFunctions.dot($"a", $"b").as("dd"),
      VectorFunctions.dotNative($"a", $"b").as("dn"),
      declSq($"a", $"b").as("sd"),
      VectorFunctions.sqDistNative($"a".cast("array<double>"),
        $"b".cast("array<double>")).as("sn"))
    assert(both.where($"dd" =!= $"dn" || $"sd" =!= $"sn").count() == 0)
  }

  test("native cosine expression is bit-identical to the declarative form") {
    // real fixture vectors (array<float>, dim 64) through BOTH the
    // codegen'd path and the interpreted eval path
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val pairs = emb.select($"vec_id", $"embedding".as("a"))
      .crossJoin(emb.select($"embedding".as("b")).limit(3))
    val both = pairs.select(
      VectorFunctions.cosine($"a", $"b").as("decl"),
      VectorFunctions.cosineNative($"a", $"b").as("nat"))
    assert(both.where($"decl" =!= $"nat").count() == 0)
    // eval (non-codegen) path: evaluate the expression directly
    val e = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f, 2f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2f, 1f, 2f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 8.0 / 9.0) < 1e-12)
    // mismatched lengths ⇒ NULL (zip_with padding semantics)
    val m = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2f, 1f, 2f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(m.eval(null) == null)
  }
}

class GraftExtensionsSpec extends graft.SparkSpec {
  test("graft_cosine is callable from plain SQL via spark.sql.extensions") {
    // a sibling session over the same SparkContext, with extensions
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        """SELECT graft_cosine(array(1.0F, 2.0F, 2.0F), array(2.0F, 1.0F, 2.0F)) AS c"""
      ).head().getDouble(0)
      assert(math.abs(r - 8.0 / 9.0) < 1e-12)
      val d = s2.sql(
        """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d"""
      ).head().getDouble(0)
      assert(d === 11.0)
      val q = s2.sql(
        """SELECT graft_sqdist(array(1.0D, 2.0D), array(3.0D, 5.0D)) AS q"""
      ).head().getDouble(0)
      assert(q === 13.0)
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
