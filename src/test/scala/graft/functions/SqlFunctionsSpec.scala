package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for the V2 catalog scalar functions (functions/SqlFunctions.scala,
  * served via the `graft` FunctionCatalog):
  *  - SQL `graft.cosine` / `graft.l2dist` ≡ the Catalyst expressions the
  *    DataFrame API plans (VectorOps natives) — same values, same null
  *    semantics (length mismatch / null element / null array → NULL);
  *  - implicit casts: array<float> embeddings upcast to the declared
  *    array<double> signature without user-side CASTs;
  *  - `graft.morton3` / `graft.gunzip` delegate to THE same static
  *    helpers as the expressions (drift impossible), including the
  *    gunzip corrupt-input → NULL dead-letter contract;
  *  - the magic `invoke` resolves (plans an object-method Invoke, not a
  *    row-boxing ApplyFunctionExpression).
  */
class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft.cosine / graft.l2dist over SQL equal the DataFrame natives; casts implicit") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 2.0f), Array(2.0f, 1.0f, 2.0f)),
      (2L, Array(0.5f, 0.0f, -1.0f), Array(0.5f, 0.0f, -1.0f)),
      (3L, Array(3.0f, -4.0f, 0.0f), Array(0.0f, 0.0f, 5.0f))
    ).toDF("id", "a", "b")
    df.createOrReplaceTempView("vecs")
    val sql = spark.sql(
      """SELECT id, graft.cosine(a, b) AS cos, graft.l2dist(a, b) AS l2
         FROM vecs ORDER BY id""")
    val native = df.select(col("id"),
      VectorOps.cosineNative(spark, VectorOps.asDouble(col("a")),
        VectorOps.asDouble(col("b"))).as("cos"),
      VectorOps.l2Native(spark, VectorOps.asDouble(col("a")),
        VectorOps.asDouble(col("b"))).as("l2")).orderBy("id")
    assert(sql.collect().toSeq === native.collect().toSeq)
    // the magic method resolved: the ANALYZED plan carries an Invoke on
    // the bound function object, not a row-boxing ApplyFunctionExpression
    // (the optimizer then constant-folds this local-relation fixture —
    // itself proof the call is a first-class Catalyst expression)
    val exprs = sql.queryExecution.analyzed.flatMap(_.expressions)
      .flatMap(_.collect {
        case i: org.apache.spark.sql.catalyst.expressions.objects.Invoke => i })
    assert(exprs.nonEmpty, sql.queryExecution.analyzed.toString.take(1500))
  }

  test("null semantics: length mismatch, null element, null array — all NULL") {
    val rows = spark.sql(
      """SELECT
           graft.cosine(array(1.0D, 2.0D), array(1.0D)) AS mismatch,
           graft.cosine(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS nullElem,
           graft.cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS nullArr,
           graft.l2dist(array(1.0D, 2.0D), array(1.0D)) AS l2mismatch""").head()
    assert((0 until 4).forall(rows.isNullAt), rows.toString)
  }

  test("graft.morton3 ≡ the Morton3Expression static; graft.gunzip round-trips and " +
      "dead-letters corrupt input") {
    val m = spark.sql("SELECT graft.morton3(5L, 3L, 1L) AS z").as[Long].head()
    assert(m === graft.catalyst.Morton3Expression.interleave3(5L, 3L, 1L))
    val payload = "the quick brown fox".getBytes("UTF-8")
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.util.zip.GZIPOutputStream(bos)
      out.write(payload); out.close(); bos.toByteArray
    }
    val got = Seq(Tuple1(gz)).toDF("g").createOrReplaceTempView("gzv")
    val back = spark.sql("SELECT graft.gunzip(g) AS raw FROM gzv").as[Array[Byte]].head()
    assert(back.toSeq === payload.toSeq)
    val corrupt = spark.sql("SELECT graft.gunzip(CAST('nope' AS BINARY)) AS raw")
      .collect().head
    assert(corrupt.isNullAt(0), "corrupt gzip must dead-letter to NULL")
    assert(got === (), "view registration side effect only")
  }

  test("the catalog lists and loads its functions; unknown names are loud") {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.FunctionCatalog]
    val names = cat.listFunctions(Array.empty).map(_.name()).toSet
    assert(Set("bucket", "cosine", "l2dist", "morton3", "gunzip").subsetOf(names))
    intercept[Exception] { spark.sql("SELECT graft.no_such_fn(1)").collect() }
  }
}
