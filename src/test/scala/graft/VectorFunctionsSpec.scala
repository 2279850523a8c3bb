package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot / sqEucDist / cosine match hand-computed values") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(
      dot($"a", $"b").as("dot"),
      sqEucDist($"a", $"b").as("sq"),
      cosine($"a", $"b").as("cos")).head()
    assert(r.getDouble(0) === 32.0)              // 4+10+18
    assert(r.getDouble(1) === 27.0)              // 9+9+9
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
  }

  test("sqEucDist of identical vectors is 0; zero-norm cosine is 0") {
    val df = Seq((Array(1f, 2f), Array(1f, 2f), Array(0f, 0f))).toDF("a", "b", "z")
    val r = df.select(sqEucDist($"a", $"b"), cosine($"a", $"z")).head()
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("floatBits distinguishes -0.0 from 0.0 and preserves NaN payloads") {
    // reference semantics: src/vector.rs:25-31 (to_bits per component)
    val nan2 = java.lang.Float.intBitsToFloat(0x7fc00001) // non-canonical NaN
    val df = Seq(
      (1L, Array(0.0f)), (2L, Array(-0.0f)),
      (3L, Array(Float.NaN)), (4L, Array(nan2))
    ).toDF("id", "v")
    val keys = df.select($"id", floatBitsKey($"v").as("k"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("k").toSeq).toMap
    assert(keys(1L) !== keys(2L), "-0.0 must differ from 0.0")
    assert(keys(3L) !== keys(4L), "NaN payloads must stay distinct")
    // and native Spark grouping would have merged them:
    assert(df.select($"v").distinct().count() < 4)
    assert(df.select(floatBitsKey($"v")).distinct().count() === 4)
  }

  test("native codegen sqEucDist matches the HOF composition bit-for-bit") {
    val df = graft.sources.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding")
    val q = df.filter($"vec_id" === 0).select($"embedding".as("q"))
    val both = df.crossJoin(q).select(
      sqEucDist($"embedding", $"q").as("native"),
      sqEucDistHof($"embedding", $"q").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() === 0)
  }

  test("SQL registration: sq_euc_dist / cosine_sim callable from spark.sql") {
    graft.GraftSession.registerFunctions(spark)
    val r = spark.sql(
      "SELECT sq_euc_dist(array(1.0F,2.0F), array(4.0F,6.0F)) AS d," +
        " cosine_sim(array(1.0F,0.0F), array(1.0F,0.0F)) AS c").head()
    assert(r.getDouble(0) === 25.0)
    assert(r.getDouble(1) === 1.0)
  }

  test("SQL registration: morton_code / redact_pii / sq8_scale callable from spark.sql") {
    graft.GraftSession.registerFunctions(spark)
    val r = spark.sql(
      "SELECT morton_code(3, 5) AS z," +
        " redact_pii('mail a@b.co now') AS red," +
        " sq8_scale(array(0.0F, -1.27F)) AS s").head()
    // x=3 fills even bit lanes 0,2 → 1+4; y=5 fills odd lanes 1,5 → 2+32
    assert(r.getLong(0) === 39L)
    assert(r.getString(1) === "mail <EMAIL> now")
    assert(r.getDouble(2) === 1.27f.toDouble / 127.0) // f32 widened, then /127
  }

  test("floatBits array form matches floatToIntBits per component") {
    val df = Seq(Tuple1(Array(1.5f, -2.25f))).toDF("v")
    val got = df.select(floatBits($"v")).head().getSeq[Int](0)
    assert(got === Seq(java.lang.Float.floatToRawIntBits(1.5f),
                       java.lang.Float.floatToRawIntBits(-2.25f)))
  }

  test("sq8 quantization: codes in [-127,127], max-magnitude hits ±127, decode error ≤ scale/2") {
    val df = Seq(
      Tuple1(Array(0.5f, -1.0f, 0.25f, 0.127f)),
      Tuple1(Array(-3.2f, 1.6f, 0.0f, 0.8f))).toDF("v")
    val r = df.select(
      sq8Scale($"v").as("s"),
      sq8Codes($"v", sq8Scale($"v")).as("c"),
      sq8Decode(sq8Codes($"v", sq8Scale($"v")), sq8Scale($"v")).as("dec"),
      $"v")
      .collect()
    r.foreach { row =>
      val s = row.getDouble(0)
      val codes = row.getSeq[Long](1)
      val dec = row.getSeq[Double](2)
      val v = row.getSeq[Float](3)
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(codes.map(math.abs).max === 127) // the max-|x| component saturates exactly
      v.zip(dec).foreach { case (x, d) =>
        assert(math.abs(x.toDouble - d) <= s / 2 + 1e-12)
      }
    }
  }
}
