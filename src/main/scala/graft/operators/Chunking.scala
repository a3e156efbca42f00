package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document chunking for sequence packing: split each document into
  * overlapping token-window chunks (the standard pre-training shape —
  * fixed context length, `overlap` tokens of continuity between
  * consecutive chunks).
  *
  * Pure row-local generation: tokenize once, compute the chunk count
  * arithmetically, explode a chunk-index sequence, slice the token
  * array per index. No shuffle, no UDF — everything is codegen'd
  * built-ins, and the fan-out multiplies rows inside the scan stage
  * where AQE/file splits already bound partition size.
  *
  * Chunk i covers tokens [i·stride, i·stride + chunkTokens) with
  * stride = chunkTokens − overlap; a document with ≤ chunkTokens
  * tokens is one chunk; the final chunk may be short (never empty).
  */
object Chunking {

  def chunkByTokens(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got chunkTokens=$chunkTokens overlap=$overlap")
    val stride = chunkTokens - overlap
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks)
    val nChunks = when(n <= chunkTokens, lit(1))
      .otherwise(lit(1) +
        ceil((n - chunkTokens).cast("double") / stride).cast("int"))
    docs
      .select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_idx"),
        col("__toks"))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__chunk")).as("n_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }
}
