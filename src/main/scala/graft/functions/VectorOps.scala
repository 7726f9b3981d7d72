package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector operations as pure `Column` expressions (SURVEY.md §2.D
  * D3/D4/D9). No UDFs: `zip_with` + `aggregate` are Catalyst lambda
  * built-ins, so similarity scoring stays inside whole-stage codegen and
  * Catalyst can push/prune around it.
  *
  * Determinism: `aggregate` folds the array sequentially, so the double
  * accumulation order is fixed — the same values on any cluster layout
  * produce bit-identical scores (required by the DuckDB oracle compare).
  */
object VectorOps {

  /** Elementwise dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; computed as dot/(|a|·|b|) with the exact expression
    * shape mirrored in the DuckDB oracle SQL. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Hot-path cosine via the native codegen expression
    * ([[graft.catalyst.CosineSimilarityExpression]]) — bit-identical to
    * [[cosine]] (same accumulation order), ~an order of magnitude faster
    * than the interpreted HOF lambdas. Registers the function on the
    * session idempotently. */
  def cosineNative(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    graft.catalyst.GraftExtensions.register(spark)
    call_function("graft_cosine", a, b)
  }

  /** Hot-path euclidean distance via the native codegen expression
    * ([[graft.catalyst.L2DistanceExpression]]) — bit-identical to
    * `sqrt(aggregate(zip_with(a,b,(x,y)=>(x−y)²), 0.0, _+_))` (same
    * accumulation order; law in CosineExpressionSpec). */
  def l2Native(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    graft.catalyst.GraftExtensions.register(spark)
    call_function("graft_l2dist", a, b)
  }

  /** Cast float vectors (fixture `embeddings.embedding`) to double — exact
    * widening on both Spark and DuckDB sides. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Squared Euclidean distance (monotone with L2 — rankings don't need
    * the sqrt). */
  def l2Squared(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  def euclidean(a: Column, b: Column): Column = sqrt(l2Squared(a, b))

  /** Unit-normalize a vector (zero vectors → null elements via 0/0=NaN;
    * callers filter). After normalization, dot == cosine. */
  def normalize(a: Column): Column =
    // NOT `transform(a, x => x / l2Norm(a))`: HOF lambdas are interpreted,
    // so the norm AGGREGATE inside the lambda re-evaluates for every
    // element — dim² interpreted ops per row (measured ~5× the whole
    // explode cost in the PQ sub-vector pass). The 1-element outer
    // transform is a pure-Column "let" that binds the norm once per row.
    element_at(transform(array(l2Norm(a)), n => transform(a, x => x / n)), 1)

  /** Per-vector max-abs int8 quantization scale: |x|max / 127, so the
    * largest component maps to ±127. Stored alongside the codes (one
    * double per vector). */
  def maxAbsScale(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0

  /** Symmetric int8 scalar quantization: q_i = round(x_i / scale) clipped
    * to [-127, 127], stored as `array<tinyint>` — 4x smaller than float32
    * and 8x smaller than the double working form, which at 100 TB is the
    * difference between an ANN index that fits executor memory/page cache
    * and one that doesn't. `round` is HALF_UP on both Spark and the DuckDB
    * twin, so the codes are engine-identical and oracle-checkable. */
  def quantizeI8(a: Column, scale: Column): Column =
    transform(a, x => greatest(lit(-127.0), least(lit(127.0), round(x / scale, 0))).cast("tinyint"))

  /** Dequantize int8 codes back to doubles: x̂_i = q_i · scale. Recall/
    * error laws for search over dequantized vectors live in
    * SimilaritySpec. */
  def dequantizeI8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)
}
