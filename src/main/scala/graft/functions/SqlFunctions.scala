package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The engine's scalar functions as V2 CATALOG FUNCTIONS — the SQL-facing
  * twin of the Catalyst expressions in `graft.catalyst`:
  *
  *   SELECT graft.cosine(a.emb, b.emb), graft.l2dist(a.emb, b.emb) ...
  *   SELECT graft.morton3(x, y, z) ...
  *   SELECT graft.gunzip(payload) ...
  *
  * Served through [[graft.sources.cdc.CdcCatalog]]'s `FunctionCatalog`
  * (configure `spark.sql.catalog.graft`), so pure-SQL users get the same
  * operators DataFrame callers reach via `graft.functions.VectorOps` /
  * `graft.catalyst.*` — no UDF registration per session, no lambda-HOF
  * re-derivation in every query.
  *
  * Execution shape: every function carries the MAGIC `invoke` method, so
  * Spark plans a direct `Invoke` call — inlined into whole-stage codegen
  * like a built-in, not a row-boxing UDF. `produceResult` stays as the
  * contract fallback. Argument casts are the analyzer's job: `inputTypes`
  * declares the canonical signature (e.g. `array<double>`) and Spark
  * inserts implicit casts (`array<float>` embeddings upcast losslessly).
  *
  * Numeric semantics are pinned to the Catalyst expressions they mirror
  * (CosineSimilarityExpression / L2DistanceExpression: sequential
  * accumulation, null element or length mismatch → NULL, zero vector →
  * NaN like the HOF path; Morton3Expression.interleave3 and
  * GzipCodec.gunzipOrNull are the SAME static helpers both paths call,
  * so those two can never drift). */
object SqlFunctions {

  /** name → implementation, the `graft` catalog's function registry. */
  val all: Map[String, UnboundFunction] = Map(
    "cosine"  -> CosineFn,
    "l2dist"  -> L2DistFn,
    "morton3" -> Morton3Fn,
    "gunzip"  -> GunzipFn)

  private[functions] def requireArity(
      fn: String, inputType: StructType, n: Int): Unit =
    require(inputType.length == n,
      s"$fn expects $n argument(s), got ${inputType.length}: ${inputType.catalogString}")
}

object CosineFn extends UnboundFunction {
  override def name(): String = "cosine"
  override def description(): String =
    "cosine(array<double>, array<double>) -> double: cosine similarity; " +
      "NULL on length mismatch or null element"
  override def bind(inputType: StructType): BoundFunction = {
    SqlFunctions.requireArity("cosine", inputType, 2)
    CosineBound
  }
}

object CosineBound extends ScalarFunction[java.lang.Double] {
  override def inputTypes(): Array[DataType] =
    Array(ArrayType(DoubleType), ArrayType(DoubleType))
  override def resultType(): DataType = DoubleType
  override def name(): String = "cosine"
  override def canonicalName(): String = "graft.cosine"
  override def isResultNullable: Boolean = true

  /** The magic method — same loop as CosineSimilarityExpression. Spark
    * plans magic invokes with `propagateNull = false` (the function owns
    * its null semantics), so the null guard lives HERE. */
  def invoke(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  override def produceResult(input: InternalRow): java.lang.Double =
    if (input.isNullAt(0) || input.isNullAt(1)) null
    else invoke(input.getArray(0), input.getArray(1))
}

object L2DistFn extends UnboundFunction {
  override def name(): String = "l2dist"
  override def description(): String =
    "l2dist(array<double>, array<double>) -> double: Euclidean distance; " +
      "NULL on length mismatch or null element"
  override def bind(inputType: StructType): BoundFunction = {
    SqlFunctions.requireArity("l2dist", inputType, 2)
    L2DistBound
  }
}

object L2DistBound extends ScalarFunction[java.lang.Double] {
  override def inputTypes(): Array[DataType] =
    Array(ArrayType(DoubleType), ArrayType(DoubleType))
  override def resultType(): DataType = DoubleType
  override def name(): String = "l2dist"
  override def canonicalName(): String = "graft.l2dist"
  override def isResultNullable: Boolean = true

  /** The magic method — same loop as L2DistanceExpression (null guard
    * here: magic invokes don't propagate null). */
  def invoke(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Math.sqrt(acc)
  }

  override def produceResult(input: InternalRow): java.lang.Double =
    if (input.isNullAt(0) || input.isNullAt(1)) null
    else invoke(input.getArray(0), input.getArray(1))
}

object Morton3Fn extends UnboundFunction {
  override def name(): String = "morton3"
  override def description(): String =
    "morton3(bigint, bigint, bigint) -> bigint: 3-D Morton (Z-order) interleave, " +
      "20 bits per dimension — the c18 Z-order clustering key"
  override def bind(inputType: StructType): BoundFunction = {
    SqlFunctions.requireArity("morton3", inputType, 3)
    Morton3Bound
  }
}

object Morton3Bound extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(LongType, LongType, LongType)
  override def resultType(): DataType = LongType
  override def name(): String = "morton3"
  override def canonicalName(): String = "graft.morton3"
  override def isResultNullable: Boolean = true

  // NO magic method here, deliberately: a primitive-long magic signature
  // would be invoked with propagateNull = false, so a NULL argument NPEs
  // through reflection's unboxing instead of returning NULL. The
  // produceResult path owns the null semantics; the heavy-lift Z-order
  // scans use the codegen Morton3Expression directly.
  override def produceResult(input: InternalRow): java.lang.Long =
    if (input.isNullAt(0) || input.isNullAt(1) || input.isNullAt(2)) null
    else graft.catalyst.Morton3Expression.interleave3(
      input.getLong(0), input.getLong(1), input.getLong(2))
}

object GunzipFn extends UnboundFunction {
  override def name(): String = "gunzip"
  override def description(): String =
    "gunzip(binary) -> binary: gzip decode with the A4 bomb cap; " +
      "corrupt or oversized input -> NULL (dead-letter semantics)"
  override def bind(inputType: StructType): BoundFunction = {
    SqlFunctions.requireArity("gunzip", inputType, 1)
    GunzipBound
  }
}

object GunzipBound extends ScalarFunction[Array[Byte]] {
  override def inputTypes(): Array[DataType] = Array(BinaryType)
  override def resultType(): DataType = BinaryType
  override def name(): String = "gunzip"
  override def canonicalName(): String = "graft.gunzip"
  override def isResultNullable: Boolean = true

  /** The magic method — THE GzipCodec helper GunzipExpression calls
    * (gunzipOrNull already owns the null/corrupt/bomb semantics). */
  def invoke(bytes: Array[Byte]): Array[Byte] = GzipCodec.gunzipOrNull(bytes)

  override def produceResult(input: InternalRow): Array[Byte] =
    if (input.isNullAt(0)) null else invoke(input.getBinary(0))
}
