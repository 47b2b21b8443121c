package graft.cometbft

import org.scalatest.funsuite.AnyFunSuite
import graft.cometbft.ProtoWire._

/** The non-consensus half of `DecodeMsgBytes` (`decoder.go:79-113`):
  * blocksync / mempool / pex / statesync wrappers decode; evidence and
  * unknown channels error. Downstream, channel-validity rejects every
  * non-consensus message (`convereter.go:46-58`), so the user-visible
  * contract — pinned here and by the unchanged pipeline goldens — is
  * decode-success followed by validity-drop.
  */
class NonConsensusDecodeSpec extends AnyFunSuite {

  private def roundTrip(m: NonConsensusMsg,
                        dec: Array[Byte] => Option[NonConsensusMsg]): Unit = {
    val bytes = encodeNonConsensusMessage(m)
    val back = dec(bytes)
    assert(back.isDefined, s"${m.typeName}: decode failed")
    assert(back.get.typeName == m.typeName)
    // byte-array fields block case-class equality; re-encode instead
    assert(encodeNonConsensusMessage(back.get).sameElements(bytes),
      s"${m.typeName}: re-encode mismatch")
  }

  test("blocksync shapes round-trip") {
    roundTrip(BsBlockRequest(42), decodeBlocksyncMessage)
    roundTrip(BsNoBlockResponse(7), decodeBlocksyncMessage)
    roundTrip(BsBlockResponse("blockbytes".getBytes, "extcommit".getBytes), decodeBlocksyncMessage)
    roundTrip(BsStatusRequest, decodeBlocksyncMessage)
    roundTrip(BsStatusResponse(100, 3), decodeBlocksyncMessage)
  }

  test("mempool txs round-trip, including multiple txs") {
    roundTrip(MpTxs(Seq("tx1".getBytes, "tx22".getBytes, Array[Byte]())), decodeMempoolMessage)
    val decoded = decodeMempoolMessage(
      encodeNonConsensusMessage(MpTxs(Seq("a".getBytes, "bb".getBytes))))
    assert(decoded.get.asInstanceOf[MpTxs].txs.map(new String(_)) == Seq("a", "bb"))
  }

  test("pex shapes round-trip") {
    roundTrip(PexRequest, decodePexMessage)
    roundTrip(PexAddrs(Seq("tcp://id1@10.0.0.1:26656", "tcp://id2@10.0.0.2:26656")), decodePexMessage)
    val decoded = decodePexMessage(
      encodeNonConsensusMessage(PexAddrs(Seq("tcp://x@h:1"))))
    assert(decoded.get.asInstanceOf[PexAddrs].urls == Seq("tcp://x@h:1"))
  }

  test("statesync shapes round-trip") {
    roundTrip(SsSnapshotsRequest, decodeStatesyncMessage)
    roundTrip(SsSnapshotsResponse(9, 2, 16, "hash".getBytes, "meta".getBytes), decodeStatesyncMessage)
    roundTrip(SsChunkRequest(9, 2, 5), decodeStatesyncMessage)
    roundTrip(SsChunkResponse(9, 2, 5, "chunk".getBytes, missing = true), decodeStatesyncMessage)
  }

  test("channel dispatch mirrors decoder.go") {
    val vote = encodeConsensusMessage(Vote(1, 5, 0,
      BlockID("h".getBytes, PartSetHeader(1, "p".getBytes)), 1L, "addr".getBytes, 0, "sig".getBytes))
    val txs = encodeNonConsensusMessage(MpTxs(Seq("t".getBytes)))

    // consensus channels route to the consensus schema
    for (ch <- Seq(Channels.State, Channels.Data, Channels.Vote, Channels.VoteSetBits))
      assert(decodeChannelMessage(ch, vote).exists(_.isRight), s"channel $ch")
    // each non-consensus family decodes on its own channel only
    assert(decodeChannelMessage(Channels.Mempool, txs)
      .exists(e => e.isLeft && e.left.exists(_.typeName == "mempool_txs")))
    assert(decodeChannelMessage(Channels.Blocksync,
      encodeNonConsensusMessage(BsStatusRequest)).exists(_.isLeft))
    assert(decodeChannelMessage(Channels.Pex,
      encodeNonConsensusMessage(PexRequest)).exists(_.isLeft))
    for (ch <- Seq(Channels.Snapshot, Channels.Chunk))
      assert(decodeChannelMessage(ch,
        encodeNonConsensusMessage(SsChunkRequest(1, 1, 1))).exists(_.isLeft), s"channel $ch")
    // a consensus Vote wrapper (oneof field 6) is NOT a mempool message
    // (oneof field 1): cross-channel bytes fail instead of mis-decoding
    assert(decodeChannelMessage(Channels.Mempool, vote).isEmpty)
    // evidence and unknown channels error in the reference; None here
    assert(decodeChannelMessage(Channels.Evidence, txs).isEmpty)
    assert(decodeChannelMessage(0x99L, vote).isEmpty)
  }

  test("truncated or garbage non-consensus bytes decode to None") {
    assert(decodeBlocksyncMessage(Array[Byte](0x0a, 0x7f)).isEmpty) // truncated len
    assert(decodeMempoolMessage(null).isEmpty)
    assert(decodePexMessage(Array.emptyByteArray).isEmpty)
    assert(decodeStatesyncMessage(Array[Byte](-1, -1, -1)).isEmpty)
  }
}
