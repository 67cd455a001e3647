package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the pipeline's hot inner loops
  * (SURVEY.md §7.3: "perf-critical built-ins as Catalyst Expressions").
  *
  * The reference code-generates all scalar work (Blink's
  * ExprCodeGenerator.scala / ScalarOperatorGens); the Spark-first analogue
  * is an Expression with doGenCode so the loop fuses into whole-stage
  * codegen. These replace interpreted higher-order-function chains
  * (transform+aggregate), which evaluate lambda per element per row —
  * measured 3-10× slower at bench scale.
  *
  * Both are deterministic sequential folds, bit-identical to the DuckDB
  * oracle's list_reduce left fold.
  */
object NativeExpressions {

  val HashMod: Long = 1000000007L

  /** poly_hash(str): fold(acc*31 + char) mod 1e9+7 over UTF-16 chars —
    * same result as ascii() per char for BMP text. */
  case class PolyHash(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"poly_hash needs STRING, got ${child.dataType}")
    override def dataType: DataType = LongType
    override def prettyName: String = "poly_hash"

    override protected def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      var a = 0L
      var i = 0
      while (i < s.length) { a = (a * 31L + s.charAt(i).toLong) % HashMod; i += 1 }
      a
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("s")
        val a = ctx.freshName("a")
        val i = ctx.freshName("i")
        s"""
           |java.lang.String $s = $c.toString();
           |long $a = 0L;
           |for (int $i = 0; $i < $s.length(); $i++) {
           |  $a = ($a * 31L + (long) $s.charAt($i)) % ${HashMod}L;
           |}
           |${ev.value} = $a;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): PolyHash =
      copy(child = newChild)
  }

  /** dot_f64(a, b): sequential dot product of two double arrays. */
  case class DoubleDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(left, right).forall(_.dataType match {
            case ArrayType(DoubleType, _) => true // either nullability
            case _ => false
          }))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"dot_f64 needs ARRAY<DOUBLE>, got ${left.dataType} / ${right.dataType}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_f64"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val i = ctx.freshName("i")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): DoubleDot =
      copy(left = newLeft, right = newRight)
  }

  /** Single-pass word-n-gram shingling over the raw string: tokens are
    * maximal non-space runs (same as split(trim(s), " +")); shingle = n
    * consecutive tokens joined by one space. Shared by interpreted eval and
    * generated code (codegen emits a call — one virtual call per row beats
    * per-token lambda interpretation by ~10×). */
  def wordShingles(str: UTF8String, n: Int): ArrayData = {
    val s = str.toString
    val words = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) words.add(s.substring(start, i))
    }
    val m = words.size - n + 1
    if (m <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      var j = 0
      while (j < m) {
        val sb = new java.lang.StringBuilder(words.get(j))
        var k = 1
        while (k < n) { sb.append(' ').append(words.get(j + k)); k += 1 }
        out(j) = UTF8String.fromString(sb.toString)
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** word_shingles(text, n): word n-grams of a document. */
  case class WordShingles(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.isInstanceOf[StringType] && right.dataType == IntegerType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"word_shingles needs (STRING, INT), got ${left.dataType} / ${right.dataType}")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      wordShingles(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.NativeExpressions.wordShingles($a, $b);")

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): WordShingles =
      copy(left = newLeft, right = newRight)
  }

  /** k-permutation MinHash signature in one pass over the hash array:
    * sig[k] = min over h of (h*(2k+1) + 7919k + 1) mod p — the same
    * universal-hash family as TextFunctions.rehash. */
  def minhashSig(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Any](k)
    var p = 0
    while (p < k) {
      val a = 2L * p + 1L
      val b = 7919L * p + 1L
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = (hashes.getLong(i) * a + b) % HashMod
        if (h < mn) mn = h
        i += 1
      }
      out(p) = mn
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** minhash_sig(hashes, k): k-entry MinHash signature. */
  case class MinhashSig(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.isInstanceOf[ArrayType] && right.dataType == IntegerType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs (ARRAY<BIGINT>, INT), got ${left.dataType} / ${right.dataType}")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      minhashSig(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.NativeExpressions.minhashSig($a, $b);")
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): MinhashSig =
      copy(left = newLeft, right = newRight)
  }

  /** 32-bit SimHash from token hashes: bit j set iff the majority of token
    * hashes have bit j set. */
  def simhash32(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** 63-bit SimHash: bit j is the majority vote of a per-bit REHASH of each
    * token hash — `((h*(2j+3) + 7919j+1) mod 1e9+7) & 1` — rather than the
    * token hash's own bit j, because the upstream poly_hash only carries
    * ~30 bits of entropy. All arithmetic stays below 2^63 and never wraps,
    * so the DuckDB oracle reproduces it with plain BIGINT math (DuckDB
    * raises on 64-bit overflow, which rules out multiplicative mixing).
    * 63 bits = 7 exact 9-bit LSH bands for the Hamming ≤ 6 pigeonhole. */
  def simhash63(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](63)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 63) {
        val b = ((h * (2L * j + 3L) + (7919L * j + 1L)) % 1000000007L) & 1L
        if (b == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 63) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** simhash63(hashes): 63-bit majority-vote signature (see [[simhash63]]). */
  case class SimHash63(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType.isInstanceOf[ArrayType]) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"simhash63 needs ARRAY<BIGINT>, got ${child.dataType}")
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash63"
    override protected def nullSafeEval(input: Any): Any =
      simhash63(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.simhash63($c);")
    override protected def withNewChildInternal(newChild: Expression): SimHash63 =
      copy(child = newChild)
  }

  /** simhash32(hashes): 32-bit majority-vote signature. */
  case class SimHash32(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType.isInstanceOf[ArrayType]) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"simhash32 needs ARRAY<BIGINT>, got ${child.dataType}")
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash32"
    override protected def nullSafeEval(input: Any): Any =
      simhash32(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.simhash32($c);")
    override protected def withNewChildInternal(newChild: Expression): SimHash32 =
      copy(child = newChild)
  }

  /** Single-pass text normalization: lowercase, keep only [a-z0-9 ],
    * collapse space runs, trim — exactly
    * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", ""), " +", " "))`
    * without java.util.regex. The regex formulation is interpreter-bound at
    * realistic per-task row counts (a 5 000-row scan split 32 ways never
    * reaches C2's compile threshold, measured 6+ s for one groupBy on the
    * normalized key); this is a branchy char loop that JITs immediately and
    * fuses into whole-stage codegen. Normalization fronts every dedup
    * pipeline, so it is hot at any corpus scale. */
  def normText(str: UTF8String): UTF8String = {
    val s = str.toString
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = Character.toLowerCase(s.charAt(i))
      if (c == ' ') {
        if (sb.length > 0) pendingSpace = true
      } else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** norm_text(str): normalized text (see [[normText]]). */
  case class NormText(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"norm_text needs STRING, got ${child.dataType}")
    override def dataType: DataType = StringType
    override def prettyName: String = "norm_text"
    override protected def nullSafeEval(input: Any): Any =
      normText(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.normText($c);")
    override protected def withNewChildInternal(newChild: Expression): NormText =
      copy(child = newChild)
  }

  /** Register into the session's FunctionRegistry; use via
    * `call_function("poly_hash", c)` / `call_function("dot_f64", a, b)`. */
  val extensions: SparkSessionExtensions => Unit = { ext =>
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (args: Seq[Expression]) => PolyHash(args.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DoubleDot].getName, "dot_f64"),
      (args: Seq[Expression]) => DoubleDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => WordShingles(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinhashSig(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (args: Seq[Expression]) => SimHash32(args.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash63"),
      new ExpressionInfo(classOf[SimHash63].getName, "simhash63"),
      (args: Seq[Expression]) => SimHash63(args.head)))
    ext.injectFunction((
      FunctionIdentifier("norm_text"),
      new ExpressionInfo(classOf[NormText].getName, "norm_text"),
      (args: Seq[Expression]) => NormText(args.head)))
  }
}
