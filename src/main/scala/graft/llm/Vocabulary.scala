package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary / TF-IDF operators for a training-data pipeline
  * (north-star surface; no reference counterpart).
  *
  * Scale shape: tokenization stays codegen'd upstream of one explode of
  * slim (id, term) rows — the document payload is never carried through
  * the shuffle. Both aggregations are plain hash aggregates with
  * map-side partial combine; the per-doc ranking shuffles once on the
  * doc id. Nothing here is quadratic and no driver collect exists on
  * any path.
  */
object Vocabulary {

  /** One slim (id, term) row per token occurrence. */
  def explodedTerms(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)

  /** Corpus vocabulary: (term, df = documents containing it, tf_total =
    * occurrences). The building block of frequency-filtered vocab files.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    explodedTerms(df, idCol, textCol)
      .groupBy(col("term"))
      .agg(countDistinct(col("id")).as("df"),
        count(lit(1)).as("tf_total"))

  /** Per-(doc, term) frequency joined with document frequency and
    * smoothed TF-IDF weight `tf * ln((N+1)/(df+1))`. `nDocs` is passed
    * in (callers usually know it; counting here would add a job).
    */
  def tfIdf(df: DataFrame, idCol: String, textCol: String,
      nDocs: Long): DataFrame = {
    val terms = explodedTerms(df, idCol, textCol)
    val tf = terms.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = terms.groupBy(col("term"))
      .agg(countDistinct(col("id")).as("df"))
    tf.join(docFreq, Seq("term"))
      .withColumn("tfidf",
        col("tf") * log((lit(nDocs) + 1.0) / (col("df") + 1.0)))
      .select(col("id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Top-k distinctive terms per document, ranked by `(tf desc, df asc,
    * term asc)` — the integer-portable tf-idf-flavored order (idf is
    * strictly decreasing in df, so within a tf tie this IS the tf-idf
    * order; across tf levels it prefers frequency, which is the
    * keyword-extraction convention). Integer keys keep the ranking
    * bit-identical across engines — float tf-idf ties are not.
    */
  def topTermsPerDoc(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val terms = explodedTerms(df, idCol, textCol)
    val tf = terms.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = terms.groupBy(col("term"))
      .agg(countDistinct(col("id")).as("df"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tf").desc, col("df").asc, col("term"))
    tf.join(docFreq, Seq("term"))
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= k)
      .select(col("id"), col("rn"), col("term"), col("tf"), col("df"))
  }
}
