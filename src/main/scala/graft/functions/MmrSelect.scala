package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy 3-round MMR selection over one query's candidate set
  * (r17 optimization round, guide §1.2 step 1 + r16 VERDICT item 6):
  * the per-query diversification loop of `sim_mmr` used to be built as
  * THREE chained window/anti-join/union rounds over two cached
  * DataFrames — 142 Exchanges in the executed plan for what is, per
  * query, an iteration over ≤ 8 candidates. The candidate set is
  * bounded by construction (top-8), so the whole greedy loop runs
  * inside this one expression over the per-query candidate array; the
  * corpus-scale stage (map-side scoring + bounded TopK) is unchanged.
  *
  * Input: array<struct<cid:long, qcos:double, v:array<double>,
  * nrm:double>> (one element per candidate; order irrelevant — every
  * choice below is by explicit (score DESC, cid ASC) comparison).
  * Output: array<struct<mmr_rank:long, cid:long, score:double>> with
  * min(3, n) elements.
  *
  * Exact-equivalence contract with the DataFrame formulation it
  * replaces (pinned whole-output in Round17Spec and by the oracle):
  *  - round 1 picks argmax (qcos DESC, cid ASC), score = qcos;
  *  - rounds 2..3 score each unselected candidate a as
  *      0.7 * qcos(a) − 0.3 * max over selected b of sim(a, b),
  *    sim(a, b) = round(dot(v_a, v_b) / (nrm_a · nrm_b), 9) with the
  *    same ascending-from-0.0 dot fold as [[VectorExpressions]] and
  *    Spark's own HALF_UP double rounding (BigDecimal.valueOf);
  *  - NaN ranks AS THE LARGEST value in both the argmax and the
  *    max-sim fold, matching SQL ORDER BY DESC / MAX semantics;
  *  - a query with n < 3 candidates emits n rows, exactly like the
  *    old inner-join rounds (every unselected candidate has pair rows
  *    to all selected ones, so round k exists iff n ≥ k).
  */
object MmrSelect {

  private val K = 3

  private def rankKey(s: Double): Double =
    if (s.isNaN) Double.PositiveInfinity else s

  private def round9(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  case class MmrSelectExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("mmr_rank", LongType, nullable = false),
      StructField("cid", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))), containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StructType(Array(
          StructField(_, LongType, _, _), StructField(_, DoubleType, _, _),
          StructField(_, ArrayType(DoubleType, _), _, _), StructField(_, DoubleType, _, _))), _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mmr_select requires array<struct<long,double,array<double>,double>>, got $t")
      }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val cids = new Array[Long](n)
      val qcos = new Array[Double](n)
      val vecs = new Array[Array[Double]](n)
      val nrms = new Array[Double](n)
      var i = 0
      while (i < n) {
        val r = arr.getStruct(i, 4)
        cids(i) = r.getLong(0)
        qcos(i) = r.getDouble(1)
        vecs(i) = r.getArray(2).toDoubleArray()
        nrms(i) = r.getDouble(3)
        i += 1
      }
      val selected = new Array[Int](math.min(K, n))
      val taken = new Array[Boolean](n)
      val out = new Array[AnyRef](math.min(K, n))
      var round = 0
      while (round < math.min(K, n)) {
        var best = -1
        var bestScore = 0.0
        var j = 0
        while (j < n) {
          if (!taken(j)) {
            val score =
              if (round == 0) qcos(j)
              else {
                // max over selected of round9(dot / (nrm_a * nrm_b));
                // the max is BY the NaN-as-largest ordering but keeps
                // the actual value (SQL MAX returns NaN, not +inf)
                var ms = Double.NegativeInfinity
                var msSet = false
                var k = 0
                while (k < round) {
                  val b = selected(k)
                  var acc = 0.0
                  val va = vecs(j); val vb = vecs(b)
                  val len = math.min(va.length, vb.length)
                  var d = 0
                  while (d < len) { acc += va(d) * vb(d); d += 1 }
                  val sim = round9(acc / (nrms(j) * nrms(b)))
                  if (!msSet || rankKey(sim) > rankKey(ms)) { ms = sim; msSet = true }
                  k += 1
                }
                0.7 * qcos(j) - 0.3 * ms
              }
            if (best < 0 || rankKey(score) > rankKey(bestScore) ||
              (rankKey(score) == rankKey(bestScore) && cids(j) < cids(best))) {
              best = j
              bestScore = score
            }
          }
          j += 1
        }
        selected(round) = best
        taken(best) = true
        out(round) = InternalRow((round + 1).toLong, cids(best), bestScore)
        round += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): MmrSelectExpr =
      copy(child = newChild)
  }

  def mmr_select(cands: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      MmrSelectExpr(org.apache.spark.sql.GraftBridge.expression(cands)))
}
