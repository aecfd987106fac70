package graft

import graft.llm.{Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation job — the LLM-pipeline analogue of
  * [[ForecastJob]]: the composed flow a training-data pipeline runs
  * over a raw document corpus, each stage a distributed plan built
  * from the oracled operators in `graft.llm`:
  *
  *   1. exact dedup — one keeper per distinct text (min doc id);
  *   2. quality + language gates over the one-pass text stats;
  *   3. optional decontamination against an evaluation corpus
  *      (word n-gram overlap);
  *   4. context-window chunking of the surviving documents.
  *
  * Scale shape: stages 1-2 are one shuffle each (content hash;
  * nothing for the narrow stats), stage 3 is the gram semi/anti join
  * pair, stage 4 is a narrow explode. No stage ever compares
  * documents pairwise or materializes on the driver.
  */
object CurationJob {

  /** Raw docs → curated chunk frame (doc_id, chunk_id, chunk,
    * chunk_len). `evalSet` enables decontamination.
    */
  def curate(docs: DataFrame, text: String, id: String,
      minQuality: Double = 0.5, lang: String = "en",
      evalSet: Option[DataFrame] = None,
      chunkSize: Int = 200, overlap: Int = 50): DataFrame = {
    val reps = docs.groupBy(col(text))
      .agg(min(col(id)).as(id))
      .select(col(id), col(text))
    val kept = TextAnalysis.withStats(reps, text)
      .filter(col("quality") >= minQuality && col("pred_lang") === lang)
      .select(col(id), col(text))
    val clean = evalSet match {
      case Some(ev) =>
        kept.join(Dedup.decontaminate(kept, ev, text, id), Seq(id))
      case None => kept
    }
    TextAnalysis.chunkDocuments(clean, text, id, chunkSize, overlap)
  }
}
