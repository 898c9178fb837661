package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** BPE tokenizer induction over the document corpus — the
  * vocabulary-TRAINING side of the tokenizer story (`text_tokens`
  * counts with a fixed BPE-ish regex; this learns the merges).
  *
  * Scale shape (the standard distributed-BPE decomposition): the corpus
  * collapses ONCE to a word-frequency table (one scan + one hash agg,
  * vocabulary-sized output — millions of rows at 100 TB, never corpus-
  * sized), and every training iteration runs over THAT table: count
  * adjacent symbol pairs weighted by word frequency (explode over
  * per-word symbol arrays + one hash agg), take the argmax pair, merge
  * it inside each word's symbol array (a pure `aggregate` fold — no
  * shuffle), repeat. Driver state is the merge list (k pairs, bounded);
  * `localCheckpoint` truncates lineage each round exactly like the
  * dedup-cluster propagation loop.
  *
  * The driver-gated surface is `text_bpe_pairs` (the round-1 pair
  * count — plain SQL); the iterative trainer is deterministic
  * (integer counts, total-order tie-breaks) and pinned against a
  * sequential reference implementation in `BpeSpec`.
  */
object BpeQueries {

  private val TopPairs = 20

  /** Word-frequency table: same `[^a-z0-9]+` tokenization as
    * `text_vocab_df`; 1-char words carry no pairs and are dropped. */
  private def wordFreq(docs: DataFrame): DataFrame =
    docs
      .select(explode_outer(
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")).as("w"))
      .filter(col("w").isNotNull && length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Adjacent (a, b) symbol pairs of an array column, as structs.
    * slice+zip_with (not `sequence(1, n-1)`: Spark's `sequence(1, 0)`
    * DESCENDS to [1, 0], so 1-symbol words would index out of
    * bounds — slices just go empty). */
  private def pairsOf(symsCol: String): Column =
    expr(s"""zip_with(slice($symsCol, 1, size($symsCol) - 1),
      |         slice($symsCol, 2, size($symsCol) - 1),
      |         (a, b) -> struct(a, b))""".stripMargin)

  /** Round-1 BPE statistics: the top character-pair counts over the
    * word-frequency table. */
  def textBpePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val words = wordFreq(Tables.load(spark, sfDir, "documents"))
    words
      .select(col("freq"), explode_outer(
        expr("""transform(sequence(1, length(w) - 1),
          | i -> struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))""".stripMargin))
        .as("p"))
      .filter(col("p").isNotNull)
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(TopPairs)
  }

  val textBpePairsSql: String =
    s"""WITH words AS (
      |  SELECT w, count(*) AS freq FROM (
      |    SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                              t -> t != '')) AS w
      |    FROM documents)
      |  WHERE length(w) >= 2 GROUP BY w)
      |SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b,
      |  CAST(sum(freq) AS BIGINT) AS cnt
      |FROM words, unnest(range(1, length(w))) AS t(i)
      |GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT $TopPairs""".stripMargin

  // --- iterative trainer ----------------------------------------------

  /** Merge every left-to-right occurrence of (a, b) into `ab` inside a
    * symbol array — a pure fold, identical to the sequential BPE merge
    * step (symbols are [a-z0-9]+ substrings, so literal injection is
    * safe). */
  private[queries] def mergePair(symsCol: String, a: String, b: String): Column =
    expr(s"""aggregate($symsCol, CAST(array() AS ARRAY<STRING>), (acc, s) ->
      | CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '$a' AND s = '$b'
      |   THEN concat(slice(acc, 1, size(acc) - 1), array('$a$b'))
      |   ELSE concat(acc, array(s)) END)""".stripMargin)

  /** Train `numMerges` BPE merges over `docs`. Deterministic: integer
    * pair counts with a (count DESC, a, b) total order. Returns the
    * merge list in training order — the bounded driver-held model. */
  def trainMerges(docs: DataFrame, numMerges: Int): Seq[(String, String)] = {
    var words = wordFreq(docs)
      .select(
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"),
        col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < numMerges) {
      val top = words
        .select(col("freq"), explode_outer(pairsOf("syms")).as("p"))
        .filter(col("p").isNotNull)
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        words = words
          .withColumn("syms", mergePair("syms", a, b))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Apply trained merges to `df`'s symbol-array column in training
    * order — the spec-facing encoder (production would run the
    * equivalent linear-scan encoder over the bounded merge table). */
  private[graft] def applyMerges(df: DataFrame, symsCol: String,
      merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(df) { case (d, (a, b)) =>
      d.withColumn(symsCol, mergePair(symsCol, a, b))
    }

  // --- corpus encoder ---------------------------------------------------

  /** Encode the whole corpus with a trained merge list — the
    * tokenizer-APPLY side, decomposed the only way that scales: the M
    * chained merge folds run over the DISTINCT-WORD table (vocabulary-
    * sized — the same collapse the trainer uses), producing one
    * (word → symbols) row per vocab entry; the corpus then pays one
    * hash join of its word occurrences against that table and one
    * per-doc hash agg. Encoding cost is O(vocab × merges + corpus),
    * never O(corpus × merges) — at 100 TB the fold bill is millions of
    * words, not trillions of occurrences. Words the tokenizer drops
    * (len < 2) count one token each, so every word is represented.
    *
    * Returns (doc_id, n_words, n_tokens): trained-tokenizer token
    * counts per document — the budget `corpus_pack` style packing would
    * consume. Deterministic given the merge list; pinned against the
    * sequential per-word encoder in `BpeSpec`. */
  def encodeCorpus(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val occurrences = docs
      .select(col("doc_id"), explode_outer(
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")).as("w"))
      .filter(col("w").isNotNull && col("w") =!= "")
    val vocab = occurrences.filter(length(col("w")) >= 2)
      .select(col("w")).distinct()
      .select(col("w"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
    val encoded = applyMerges(vocab, "syms", merges)
      .select(col("w"), size(col("syms")).as("w_tokens"))
    val counted = occurrences
      .join(encoded, Seq("w"), "left") // short words: 1 token
      .select(col("doc_id"), coalesce(col("w_tokens"), lit(1)).as("w_tokens"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("w_tokens")).as("n_tokens"))
    // docs that tokenize to NOTHING (all punctuation/whitespace) still
    // get a (0, 0) row — dropping them would lose documents from any
    // downstream token-budget join
    docs.select(col("doc_id"))
      .join(counted, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }
}
