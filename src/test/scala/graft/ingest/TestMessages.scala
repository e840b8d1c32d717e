package graft.ingest

/** Test alias for the shared sample block fixtures (moved to main as
  * [[SampleBlocks]] so the ingest bench can reuse them). */
object TestMessages {
  val meta: ProtoSchema.PMessage = SampleBlocks.meta
  val transfer: ProtoSchema.PMessage = SampleBlocks.transfer
  val output: ProtoSchema.PMessage = SampleBlocks.output
  def samplePayload(i: Long): Map[String, Any] = SampleBlocks.samplePayload(i)
}
