package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native PQ encoder: quantized vector (`array<long>`, length m·dsub) ×
  * codebook literal (`array<array<array<long>>>`, m×k×dsub) → the m
  * per-subspace argmin codes (`array<int>`).
  *
  * Why a custom Catalyst Expression (SURVEY §2.9 ladder): the composable
  * HOF form — `transform(sequence(0, m−1), j → aggregate(sequence(0,
  * k−1), …argmin…))` — interprets ~m·k·dsub catalyst expression nodes
  * PER ROW. At 4-bit codebooks (k=16) that was tolerable; at the 8-bit
  * FAISS-standard k=256 it is m·k·dsub ≈ 16k interpreted evals per row —
  * measured 40 MINUTES to encode a 100k corpus, against seconds for this
  * fused loop (the encode is the one per-corpus-row stage of PQ index
  * build; everything downstream reads codes). Same integer arithmetic,
  * same strict-< first-wins argmin as the HOF form and the DuckDB oracle
  * (`ORDER BY dist, c` ties → smallest code) — results are bit-identical,
  * so the e7/e9/e10 hash gates are unaffected.
  *
  * The codebook child must be foldable (a literal): it is evaluated once
  * per task into a primitive `long[][][]`, not per row.
  */
case class PqEncode(vec: Expression, cbExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cbExpr

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (vec.dataType, cbExpr.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(ArrayType(LongType, _), _), _))
          if cbExpr.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "pq_encode needs (array<long>, foldable array<array<array<long>>>), got " +
            s"${vec.dataType} / ${cbExpr.dataType} (foldable=${cbExpr.foldable})")
    }

  @transient private lazy val cb: Array[Array[Array[Long]]] = {
    val ad = cbExpr.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { j =>
      val aj = ad.getArray(j)
      Array.tabulate(aj.numElements())(c => aj.getArray(c).toLongArray())
    }
  }

  private def encode(q: Array[Long]): Array[Int] = {
    val m = cb.length
    val dsub = q.length / m
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cbj = cb(j)
      var bestD = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < cbj.length) {
        val cc = cbj(c)
        var dist = 0L
        var i = 0
        val base = j * dsub
        while (i < dsub) { val t = q(base + i) - cc(i); dist += t * t; i += 1 }
        if (dist < bestD) { bestD = dist; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    codes
  }

  override def nullSafeEval(v: Any, b: Any): Any =
    new GenericArrayData(encode(v.asInstanceOf[ArrayData].toLongArray()))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "long[][][]")
      val q = ctx.freshName("q")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val dist = ctx.freshName("dist")
      val t = ctx.freshName("t")
      val cbj = ctx.freshName("cbj")
      val cc = ctx.freshName("cc")
      val dsub = ctx.freshName("dsub")
      s"""
         |long[] $q = $a.toLongArray();
         |int $dsub = $q.length / $cbRef.length;
         |int[] $codes = new int[$cbRef.length];
         |for (int $j = 0; $j < $cbRef.length; $j++) {
         |  long[][] $cbj = $cbRef[$j];
         |  long $bestD = Long.MAX_VALUE; int $bestC = 0;
         |  for (int $c = 0; $c < $cbj.length; $c++) {
         |    long[] $cc = $cbj[$c];
         |    long $dist = 0L;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      long $t = $q[$j * $dsub + $i] - $cc[$i];
         |      $dist += $t * $t;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $bestC = $c; }
         |  }
         |  $codes[$j] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(vec = newLeft, cbExpr = newRight)
}

object PqEncode {

  /** Register `pq_encode` on the session (SQL + Column surface). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode", exprs => {
        // wrong SQL arity must surface as an analysis-time error with the
        // expected signature, not an IndexOutOfBoundsException
        require(exprs.length == 2,
          s"pq_encode(quantized_vec, codebook) expects 2 arguments, got ${exprs.length}")
        PqEncode(exprs(0), exprs(1))
      }, "built-in")

  /** Column-API surface: `codes = pqEncode(spark, quantizedVec, typedlit(codebook))`. */
  def pqEncode(spark: SparkSession, vec: Column, codebook: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("pq_encode", vec, codebook)
  }
}
