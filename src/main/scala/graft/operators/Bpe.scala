package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tokenizer-faithful BPE token counting at corpus scale
  * (SURVEY.md §2.3): the budget operators (pack / per-language budgets /
  * chunking) are only as accurate as their token counts, and real
  * curation budgets are measured in BPE tokens against a fixed merge
  * table, not whitespace splits.
  *
  * Semantics are EXACTLY [[graft.functions.TextFunctions.bpeTokenCountMerges]]
  * (rank-ordered literal " a b " → " ab " replacement over sentinel-
  * spaced characters — the Sennrich-style application order), executed
  * as batched mapPartitions with
  *
  *  - the merge table broadcast once per executor (a 50k-merge GPT-2
  *    style table is ~1 MB — never a per-task literal),
  *  - a per-partition word → count memo: natural text repeats words
  *    heavily (Zipf), so the replace chain runs once per DISTINCT word
  *    per partition, not once per occurrence.
  *
  * No shuffle — token counting stays inside the scan stage like every
  * other text kernel.
  */
object Bpe {

  /** Collect an ordered merge table from a (rank, left, right)
    * DataFrame (e.g. `spark.read.parquet(vocabPath)`). Merge tables are
    * small by construction (50k rows for GPT-2), so the collect is
    * bounded by the vocabulary — and guarded by `maxMerges` so pointing
    * this at a corpus table by mistake fails the DRIVER with a clear
    * message instead of collecting it. */
  def mergesFrom(df: DataFrame, rankCol: String = "rank",
      leftCol: String = "left", rightCol: String = "right",
      maxMerges: Int = 200000): Seq[(String, String)] = {
    val rows = df.select(col(rankCol), col(leftCol), col(rightCol))
      .orderBy(col(rankCol))
      .limit(maxMerges + 1)
      .collect()
    require(rows.length <= maxMerges,
      s"merge table exceeds maxMerges=$maxMerges rows — is this really a vocab table?")
    rows.map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** (id, n_bpe) per document. */
  def tokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(
      merges.map { case (a, b) => (s" $a $b ", s" $a$b ") }.toArray)
    val outSchema = StructType(Seq(
      StructField("id", docs.schema(idCol).dataType),
      StructField("n_bpe", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = docs.schema.fieldIndex(idCol)
    val textIdx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { rows =>
      val table = bc.value
      // word memo: bounded so an adversarial all-distinct-words corpus
      // can't grow a task's heap without limit
      val memo = new java.util.HashMap[String, java.lang.Long](1 << 16)
      val MaxMemo = 1 << 20
      def countWord(w: String): Long = {
        val hit = memo.get(w)
        if (hit != null) return hit.longValue()
        val sb = new java.lang.StringBuilder(w.length * 2 + 1)
        sb.append(' ')
        var i = 0
        while (i < w.length) { sb.append(w.charAt(i)); sb.append(' '); i += 1 }
        var s = sb.toString
        var m = 0
        while (m < table.length) {
          val (from, to) = table(m)
          if (s.contains(from)) s = s.replace(from, to)
          m += 1
        }
        // symbols are single-space separated with one sentinel each side
        var n = 0L
        var j = 0
        while (j < s.length) { if (s.charAt(j) == ' ') n += 1; j += 1 }
        val c = n - 1
        if (memo.size < MaxMemo) memo.put(w, c)
        c
      }
      rows.map { r =>
        val text = r.getString(textIdx)
        var total = 0L
        if (text != null) {
          // same pre-tokenization as TextFunctions.alnumWords
          val words = text.toLowerCase.split("[^a-z0-9]+")
          var i = 0
          while (i < words.length) {
            if (words(i).nonEmpty) total += countWord(words(i))
            i += 1
          }
        }
        Row(r.get(idIdx), total)
      }
    }(enc).withColumnRenamed("id", idCol)
  }
}
