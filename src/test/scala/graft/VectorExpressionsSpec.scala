package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExpressions.{doubleDot, q9Dot, quantLshBucket}

class VectorExpressionsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("DoubleDot matches the interpreted HOF formulation exactly") {
    val df = Tables(spark, sf).embeddings.limit(200)
      .select(col("vec_id"), col("embedding").as("v"))
    val hof = aggregate(
      zip_with(col("v"), col("v"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val bad = df.select((doubleDot(col("v"), col("v")) - hof).as("d"))
      .filter(abs(col("d")) > 0.0)
    assert(bad.count() == 0) // identical summation order => bit-identical
  }

  test("DoubleDot handles nulls and empty/mismatched arrays") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (Some(Seq.empty[Float]), Some(Seq(1.0f))),
      (None, Some(Seq(1.0f))))
      .toDF("a", "b")
    val got = df.select(doubleDot(col("a"), col("b")).as("d")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).contains(11.0))
    assert(got(1).contains(0.0))
    assert(got(2).isEmpty)
  }

  test("Q9Dot equals the interpreted decimal formulation bit-for-bit") {
    import org.apache.spark.sql.types.DecimalType
    val DI = DecimalType(18, 0)
    val DA = DecimalType(38, 0)
    def q9(x: org.apache.spark.sql.Column) =
      bround(x.cast("double") * lit(1e9), 0).cast(DI)
    val df = Tables(spark, sf).embeddings.limit(200)
      .select(col("embedding").as("v"))
    val decimalDot = aggregate(
      zip_with(col("v"), col("v"), (x, y) => q9(x) * q9(y)),
      lit(0).cast(DA), (acc, v) => (acc + v).cast(DA)).cast("double")
    val bad = df.select(q9Dot(col("v"), col("v")).as("a"), decimalDot.as("b"))
      .filter(col("a") =!= col("b"))
    assert(bad.count() == 0)
  }

  test("Q9Dot is the correctly-rounded double of the exact sum past 2^63") {
    // all-max-magnitude 64-dim vectors push the exact norm2 sum to
    // ~1.77e19 > Long.MaxValue — the split-accumulator must not wrap
    val big = Array.fill(64)(0.5252062f)
    val mixed = Array.tabulate(64)(i => if (i % 2 == 0) 0.5252062f else -0.5252062f)
    val df = Seq((big, big), (big, mixed)).toDF("a", "b")
    val got = df.select(q9Dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    def ref(a: Array[Float], b: Array[Float]): Double = {
      val s = a.zip(b).foldLeft(BigInt(0)) { case (acc, (x, y)) =>
        acc + BigInt(Math.rint(x.toDouble * 1e9).toLong) *
          BigInt(Math.rint(y.toDouble * 1e9).toLong)
      }
      new java.math.BigDecimal(s.bigInteger).doubleValue
    }
    assert(got(0) == ref(big, big) && got(0) > Long.MaxValue.toDouble)
    assert(got(1) == ref(big, mixed) && got(1) == 0.0)
  }

  test("QuantLshBucket matches a per-plane reference on both eval paths") {
    val planes = graft.similarity.Knn.quantPlanes(64, 6, seed = 42L)
    val df = Tables(spark, sf).embeddings.limit(100)
      .select(col("vec_id"), col("embedding").as("v"))
    def refBucket(v: Seq[Float]): Long =
      planes.zipWithIndex.foldLeft(0L) { case (acc, (w, j)) =>
        val s = v.zip(w).map { case (x, wi) =>
          Math.rint(x.toDouble * 1e9).toLong * wi }.sum
        if (s > 0) acc | (1L << j) else acc
      }
    val rows = df.select(col("vec_id"), col("v"),
      quantLshBucket(col("v"), planes).as("bucket")).collect()
    rows.foreach { r =>
      assert(r.getLong(2) == refBucket(r.getSeq[Float](1)), s"vec ${r.getLong(0)}")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val r2 = df.select(quantLshBucket(col("v"), planes)).collect().map(_.getLong(0))
      assert(r2.toSeq == rows.map(_.getLong(2)).toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("DoubleDot survives both codegen and interpreted paths") {
    val df = Tables(spark, sf).embeddings.limit(10)
    val withExpr = df.select(doubleDot(col("embedding"), col("embedding")).as("n2"))
    assert(withExpr.collect().forall(_.getDouble(0) > 0.0))
    // force interpreted eval
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(withExpr.collect().forall(_.getDouble(0) > 0.0))
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("Code16: the constant eps bound is SOUND — |code-cos − exact cos| " +
       "<= Code16CosEps on every corpus pair sampled, on both eval paths") {
    import graft.functions.VectorExpressions.{code16, code16Dot}
    val emb = Tables(spark, sf).embeddings.limit(60)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
      .withColumn("code", code16(col("vec"),
        sqrt(doubleDot(col("vec"), col("vec")))))
    val a = emb.select(col("id").as("ia"), col("vec").as("va"), col("code").as("ca"))
    val b = emb.select(col("id").as("ib"), col("vec").as("vb"), col("code").as("cb"))
    val pairs = a.crossJoin(broadcast(b)).filter(col("ia") < col("ib"))
      .select(
        graft.similarity.Knn.cosine(col("va"), col("vb")).as("exact"),
        code16Dot(col("ca"), col("cb")).as("approx"))
    def check(): Unit = {
      val viol = pairs.filter(
        abs(col("exact") - col("approx")) > graft.similarity.Knn.Code16CosEps)
      assert(viol.isEmpty, "code-cos error exceeded the sound bound:\n" +
        viol.limit(3).collect().mkString("\n"))
    }
    check()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check()
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("Code16: an adversarial axis-concentrated vector codes in range " +
       "and a zero vector codes to an all-zero payload") {
    import graft.functions.VectorExpressions.{code16, code16Dot}
    // one element carries the whole norm: x_i/nrm = ±1 must hit exactly
    // ±32767 with no wraparound
    val axis = Array.tabulate(64)(i => if (i == 3) -5.0f else 0.0f)
    val df = Seq((axis.toSeq, axis.toSeq), (Seq.fill(64)(0.0f), axis.toSeq))
      .toDF("a", "b")
    val got = df.select(
      code16Dot(code16(col("a"), sqrt(doubleDot(col("a"), col("a")))),
        code16(col("b"), sqrt(doubleDot(col("b"), col("b"))))).as("d"))
      .collect().map(_.getDouble(0))
    assert(got(0) == 1.0, s"self code-cos of an axis vector: ${got(0)}")
    assert(got(1) == 0.0)
  }
}
