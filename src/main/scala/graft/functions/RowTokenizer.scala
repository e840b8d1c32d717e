package graft.functions

import org.apache.spark.sql.Column

/** A trained tokenizer model usable as a map-only column transform —
  * the contract the streaming pipeline's tokenize stage rides on
  * ([[graft.streaming.CorpusPipeline]]): model state as a codegen
  * reference object, one kernel call per row, STATELESS (legal in any
  * streaming output mode). Implemented by both tokenizer families
  * ([[BpeRanks]], [[UnigramModel]]) so a persisted model of either
  * kind drops into the same pipeline slot. */
trait RowTokenizer extends Serializable {
  /** text column → ARRAY<INT> token ids. */
  def tokenIds(text: Column): Column
}
