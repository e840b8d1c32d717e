package graft.ingest

import ProtoSchema._

/** The FIXTURES.md §B test message — exercises every branch of the schema
  * walker and wire codec (mirrors a typical substreams output module). */
object TestMessages {

  val meta: PMessage = PMessage("Meta", Seq(
    PField(1, "seconds", PInt64),
    PField(2, "nanos", PInt32)))

  val transfer: PMessage = PMessage("Transfer", Seq(
    PField(1, "from", PString, encoding = ELenDelim),
    PField(2, "to", PString, encoding = ELenDelim),
    PField(3, "amount", PUInt64),
    PField(4, "log_index", PInt32),
    PField(5, "kind", PEnum),
    PField(6, "topics", PBytes, repeated = true, encoding = ELenDelim)))

  val output: PMessage = PMessage("Output", Seq(
    PField(1, "block_hash", PString, encoding = ELenDelim),
    PField(2, "gas_used", PUInt64),
    PField(3, "transfers", transfer, repeated = true, encoding = ELenDelim),
    PField(4, "touched_accounts", PString, repeated = true, encoding = ELenDelim),
    PField(5, "balances", PMap(PString, PInt64), encoding = ELenDelim),
    PField(6, "meta", meta, encoding = ELenDelim)))

  /** A representative block payload value-map for the encoder. */
  def samplePayload(i: Long): Map[String, Any] = Map(
    "block_hash" -> s"0xhash$i",
    "gas_used" -> BigInt(i) * 1000000,
    "transfers" -> (0 until (i % 3).toInt).map(j => Map(
      "from" -> s"0xfrom${i}_$j",
      "to" -> s"0xto${i}_$j",
      "amount" -> BigInt(j + 1) * 10,
      "log_index" -> j,
      "kind" -> (j % 3),
      "topics" -> Seq(Array[Byte](1, 2), Array[Byte](3)))),
    "touched_accounts" -> Seq(s"0xacct${i}a", s"0xacct${i}b"),
    "balances" -> Map(s"0xacct${i}b" -> (i * 2), s"0xacct${i}a" -> i),
    "meta" -> Map("seconds" -> (1700000000L + i), "nanos" -> (i * 7 % 1000).toInt))
}
