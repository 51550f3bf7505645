package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native HLL register-building AGGREGATE — the Catalyst extension tier
  * the expression injections (scalar: [[EwmNr]], [[DotLong]]) and the
  * planner extension ([[graft.plans.GroupTopKExec]]) do not cover: a
  * `TypedImperativeAggregate` with a typed mutable buffer, map-side
  * partial aggregation, and binary partial-state serialization.
  *
  * Semantics are EXACTLY the declarative register pipeline of
  * `a33_hll_distinct` (queries/AggQueries.scala — bucket `h % 256`,
  * sub-hash `h >> 8`, rho `25 − Σ_{k<24} [v ≥ 2^k]`, register =
  * max-rho), over the same [[graft.operators.TextOps.hash32]] input —
  * `HllAggSpec` pins bit-identical registers against that pipeline, so
  * the DuckDB SQL that replays a33 is equally this aggregate's oracle.
  *
  * Why native, when the declarative form is already hash-green: the
  * declarative register build shuffles one (group, bucket, rho) row per
  * INPUT row into a (group, bucket) hash-agg — the map-side combine
  * only collapses same-bucket collisions. This aggregate's partial
  * state is the whole 256-byte register array per group per partition,
  * so the exchange carries |groups| × 256 bytes per map task no matter
  * how many rows flow in — the sketch IS the shuffle payload, which is
  * the entire point of a sketch at 100 TB. Output is the register
  * array (array<bigint>), not the estimate: registers are the
  * persistable, max-mergeable artifact (a33b's range-merge pattern);
  * estimation stays in the shared expression both engines already run.
  */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  private val M = 256

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch_agg expects a bigint 32-bit hash column, got " +
        child.dataType.simpleString)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_sketch_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](M)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // the register arithmetic below is sound ONLY on the 32-bit hash
      // domain: a negative h makes (h % 256) a negative index, and
      // h ≥ 2^32 makes sub ≥ 2^24 so rho ≤ 0 silently leaves the
      // register at 0 — both diverge from the declarative a33 pipeline.
      // Fail loudly instead of producing a corrupt sketch.
      if (h < 0L || h > 0xFFFFFFFFL)
        throw new IllegalArgumentException(
          s"hll_sketch_agg expects a 32-bit hash in [0, 2^32), got $h — " +
            "feed it graft.operators.TextOps.hash32 output")
      val bucket = (h % M).toInt
      val sub = h >> 8
      // rho = 25 − #{k < 24 : sub ≥ 2^k} — for sub ≥ 1 that count is the
      // bit length (floor(log2)+1), for sub = 0 it is 0 (rho 25); sub is
      // < 2^24 by construction of the 32-bit hash
      val rho = if (sub == 0L) 25
        else 25 - (64 - java.lang.Long.numberOfLeadingZeros(sub))
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < M) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any =
    new GenericArrayData(buf.map(_.toLong))

  // rho ≤ 25 — one byte per register
  override def serialize(buf: Array[Int]): Array[Byte] =
    buf.map(_.toByte)

  override def deserialize(bytes: Array[Byte]): Array[Int] =
    bytes.map(_.toInt)

  override def withNewMutableAggBufferOffset(n: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}
