package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Codegen/interpreted equivalence for the native expressions: every custom
  * Expression has two execution paths (doGenCode inside WholeStageCodegen,
  * nullSafeEval when interpreted) and they can silently drift. Each property
  * runs the SAME random inputs through a DataFrame (codegen path) and
  * through the expression's shared Scala helper (the interpreted path's
  * implementation), and requires bit-identical results. */
class NativeExpressionsPropertySpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
    1 -> Gen.oneOf('!', '.', 'Ä', '€'))).map(_.mkString)

  private def refPolyHash(s: String): Long = {
    var a = 0L; var i = 0
    while (i < s.length) { a = (a * 31L + s.charAt(i).toLong) % 1000000007L; i += 1 }
    a
  }

  test("poly_hash: codegen equals the reference fold") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(Gen.listOfN(50, textGen)) { strs =>
      val got = strs.toDF("t")
        .select(call_function("poly_hash", col("t"))).collect().map(_.getLong(0)).toSeq
      got == strs.map(refPolyHash)
    })
  }

  test("word_shingles: codegen equals the shared helper on raw strings") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(Gen.listOfN(40, textGen), Gen.choose(1, 4)) { (strs, n) =>
      val got = strs.toDF("t")
        .select(call_function("word_shingles", trim(col("t")), lit(n)))
        .collect().map(_.getSeq[String](0).toList).toSeq
      val want = strs.map { t =>
        NativeExpressions.wordShingles(UTF8String.fromString(t.trim), n)
          .toArray[UTF8String](org.apache.spark.sql.types.StringType)
          .map(_.toString).toList
      }
      got == want
    })
  }

  test("norm_text: codegen equals the shared helper") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(Gen.listOfN(50, textGen)) { strs =>
      val got = strs.toDF("t")
        .select(call_function("norm_text", col("t"))).collect().map(_.getString(0)).toSeq
      got == strs.map(t => NativeExpressions.normText(UTF8String.fromString(t)).toString)
    })
  }

  test("minhash_sig/simhash63: codegen equals the shared helpers on random hash arrays") {
    val s = spark
    import s.implicits._
    val hashesGen = Gen.nonEmptyListOf(Gen.choose(0L, 1000000006L))
    check(Prop.forAll(Gen.listOfN(30, hashesGen)) { arrays =>
      val df = arrays.toDF("h")
      val gotMin = df.select(call_function("minhash_sig", col("h"), lit(16)))
        .collect().map(_.getSeq[Long](0).toList).toSeq
      val gotSim = df.select(call_function("simhash63", col("h")))
        .collect().map(_.getLong(0)).toSeq
      val wantMin = arrays.map { a =>
        NativeExpressions.minhashSig(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray), 16)
          .toLongArray().toList
      }
      val wantSim = arrays.map { a =>
        NativeExpressions.simhash63(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray))
      }
      gotMin == wantMin && gotSim == wantSim
    })
  }

  test("dot_f64: codegen equals a sequential fold bit-for-bit") {
    val s = spark
    import s.implicits._
    val vecGen = Gen.listOfN(16, Gen.choose(-1000000, 1000000).map(_ / 1000.0))
    check(Prop.forAll(Gen.listOfN(30, Gen.zip(vecGen, vecGen))) { pairs =>
      val got = pairs.toDF("a", "b")
        .select(call_function("dot_f64", col("a"), col("b")))
        .collect().map(_.getDouble(0)).toSeq
      val want = pairs.map { case (a, b) =>
        var acc = 0.0; var i = 0
        while (i < a.length) { acc += a(i) * b(i); i += 1 }
        acc
      }
      // bit-identical, not approximately equal — the oracle depends on it
      got.map(java.lang.Double.doubleToLongBits) ==
        want.map(java.lang.Double.doubleToLongBits)
    })
  }
}
