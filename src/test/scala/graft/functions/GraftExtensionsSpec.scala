package graft.functions

import graft.SparkSpecBase
import graft.functions.expressions.GraftExtensions

/** SQL-name access to the native expressions. (The shared test JVM
  * already holds a session, so the live-session register() path is
  * what's exercised; `new GraftExtensions` feeds the same builders to
  * withExtensions/spark.sql.extensions installs.)
  */
class GraftExtensionsSpec extends SparkSpecBase {

  test("native expressions callable from SQL by name") {
    GraftExtensions.register(spark)
    table("documents").createOrReplaceTempView("documents_ext")
    val row = spark.sql(
      """SELECT size(minhash_sig(text, 3, 64)) AS sig_len,
        |       simhash64(text) AS sh,
        |       size(shingle_hashes(text)) AS n_shingles,
        |       size(winnow_fingerprint(text)) AS fp,
        |       size(lang_scores(text)) AS n_scores
        |FROM documents_ext LIMIT 1""".stripMargin).head()
    assert(row.getInt(0) == 64)
    assert(row.getInt(2) > 0)
    assert(row.getInt(3) > 0)
    assert(row.getInt(4) == 5)
    assert(spark.sql("SELECT fold_accents('Àéîõü')").head().getString(0) == "Aeiou")
  }

  test("SQL and Column-API forms agree") {
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    table("documents").createOrReplaceTempView("documents_ext")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash64(text) AS sh FROM documents_ext ORDER BY doc_id LIMIT 10")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaCol = table("documents")
      .select(col("doc_id"),
        graft.functions.expressions.TextHashFunctions.simhash64_fast(col("text")).as("sh"))
      .orderBy(col("doc_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.sameElements(viaCol))
  }
}
