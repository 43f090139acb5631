package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F8 vocabulary-based spelling correction
  * (`/root/reference/query/enhancement.py:129-175,267-319`).
  *
  * The reference corrects every query word > 2 chars with TextBlob (a
  * statistical model over an English corpus) and validates against an
  * optional vocabulary set. The Spark-native analogue corrects against the
  * CORPUS vocabulary itself — the words a query can actually match — with a
  * SymSpell-style deletes-hash join:
  *
  *  1. vocabulary = distinct tokens per document, document-frequency
  *     weighted (one groupBy over the corpus; an index-like artifact that
  *     persists alongside the BM25 index at scale),
  *  2. blocking: a word's key set is itself plus its single-character
  *     deletions. Any two words at Levenshtein distance 1 share a key
  *     (insert/delete pairs share the shorter word; substitution pairs
  *     share the deletion at the substituted position), so the candidate
  *     join is key-equality — never all-pairs — and the verification
  *     `levenshtein == 1` runs only on hash-colliding pairs,
  *  3. policy: in-vocabulary and short (≤ 2 chars) tokens pass through
  *     unchanged; unknown tokens adopt the highest-df candidate
  *     (ties lexicographic); no candidate → unchanged.
  *
  * Every step is deterministic, so the whole path carries a DuckDB oracle
  * (f8_spell_correct) — unlike TextBlob, whose model isn't reproducible
  * in SQL.
  */
object Spelling {

  /** Corpus vocabulary `(word, df)` — df = number of documents containing
    * the word (distinct-per-doc, then count), the same weighting BM25's df
    * uses.
    */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(array_distinct(
        graft.functions.TextFunctions.tokenize(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("df"))

  /** SymSpell blocking keys: the word plus each single-character deletion.
    * `array_union` dedups (repeated letters produce identical deletions).
    */
  def deleteKeys(w: Column): Column =
    array_union(
      array(w),
      transform(sequence(lit(1), length(w)),
        i => concat(w.substr(lit(1), i - lit(1)), w.substr(i + lit(1), length(w)))))

  /** Correct one token table `(qid, pos, token)` against `vocab` — adds
    * `corrected`. The query side is tiny (tokens of a query batch); the
    * vocab side explodes to |V|·(avg_len+1) keys, an index-like table a
    * serving deployment precomputes once per corpus.
    */
  def correctTokens(tokens: DataFrame, qidCol: String, posCol: String,
                    tokCol: String, vocab: DataFrame): DataFrame = {
    val toks = tokens.select(
      col(qidCol).as("qid"), col(posCol).as("pos"), col(tokCol).as("tok"))
    val known = vocab.select(col("word").as("tok"), lit(1).as("in_vocab"))
    val base = toks.join(known, Seq("tok"), "left")

    // candidate generation only for unknown tokens longer than 2 chars
    val unknown = base.filter(col("in_vocab").isNull && length(col("tok")) > 2)
      .select(col("qid"), col("pos"), col("tok"),
        explode(deleteKeys(col("tok"))).as("key"))
    val vocabKeys = vocab.select(col("word"), col("df"),
      explode(deleteKeys(col("word"))).as("key"))
    val candidates = unknown.join(vocabKeys, "key")
      .filter(levenshtein(col("tok"), col("word")) === 1)
      .select(col("qid"), col("pos"), col("tok"), col("word"), col("df"))
      .distinct() // a pair can share several keys
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid", "pos")
          .orderBy(col("df").desc, col("word"))))
      .filter(col("rn") === 1)
      .select(col("qid"), col("pos"), col("word").as("best"))

    base.join(candidates, Seq("qid", "pos"), "left")
      .select(col("qid").as(qidCol), col("pos").as(posCol),
        col("tok").as(tokCol),
        coalesce(col("best"), col("tok")).as("corrected"))
  }

  /** Correct a query batch `(qid, text)` end-to-end: tokenize → correct →
    * reassemble in token order. Queries whose text tokenizes to nothing
    * come back as the empty string (kept, not dropped).
    */
  def correctQueries(queries: DataFrame, qidCol: String, textCol: String,
                     vocab: DataFrame): DataFrame = {
    val toks = queries.select(col(qidCol).as("qid"),
        posexplode_outer(graft.functions.TextFunctions.tokenize(col(textCol))))
      .toDF("qid", "pos", "tok")
    val corrected = correctTokens(toks.filter(col("tok").isNotNull),
      "qid", "pos", "tok", vocab)
    val assembled = corrected.groupBy("qid")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("corrected")))),
          s => s.getField("corrected")), " ").as("corrected"))
    queries.select(col(qidCol).as("qid"))
      .join(assembled, Seq("qid"), "left")
      .select(col("qid").as(qidCol),
        coalesce(col("corrected"), lit("")).as("corrected"))
  }
}
