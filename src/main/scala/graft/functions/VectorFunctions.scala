package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns, built from Spark's
  * higher-order functions (codegen'd, no UDF — SURVEY §7.3): the dot-product
  * fold runs left-to-right per row, matching DuckDB's `list_dot_product`
  * loop for oracle-exact comparison.
  *
  * All helpers expect DOUBLE arrays — cast float embeddings first via
  * [[toDoubleArray]] so both engines do double multiplies (a float multiply
  * then double accumulate diverges from DuckDB's double-double path).
  */
object VectorFunctions {

  def toDoubleArray(c: Column): Column = transform(c, _.cast("double"))

  /** Σ aᵢ·bᵢ as a strict left fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def normSq(a: Column): Column = dot(a, a)

  /** cosine(a, b) = dot / sqrt(|a|²·|b|²) — one sqrt, one division, so both
    * engines execute the identical IEEE op sequence. Dispatches to the
    * codegen'd [[CosineSimilarity]] expression; [[cosineHof]] is the
    * higher-order-function formulation kept as the bit-exactness reference.
    */
  def cosine(a: Column, b: Column): Column = CosineSimilarity(a, b)

  /** Interpreted HOF cosine (5 array passes, CodegenFallback) — reference
    * implementation for the property test pinning [[CosineSimilarity]].
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))

  /** Deterministic pseudo-random hyperplane weight for LSH: integer formula
    * `((5·plane + 7·dim + 3) mod 11) − 5` ∈ [−5, 5] — reproducible in any
    * engine, no RNG (scripts must stay replayable), cheap to inline in
    * codegen.
    */
  def planeWeight(plane: Int, dim: Column): Column =
    (lit(5 * plane) + lit(7) * dim + lit(3)) % 11 - lit(5)

  /** `nBits`-bit sign-LSH signature of a double-array embedding: bit i is the
    * sign of the dot product with pseudo-hyperplane i. Same-bucket vectors
    * are near-duplicate candidates.
    */
  def signLsh(v: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { p =>
      // dimension index derived from the VECTOR's size, not a hardcoded
      // 64: a shorter vector zip_with a longer index range null-pads,
      // nulls the projection, and sends EVERY vector to bucket 0 — the
      // LSH self-join then degenerates to an O(N²) cross product with no
      // error raised
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, j) => x * planeWeight(p, j)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
