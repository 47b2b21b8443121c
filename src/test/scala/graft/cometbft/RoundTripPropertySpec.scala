package graft.cometbft

import org.scalatest.funsuite.AnyFunSuite
import graft.cometbft.Parsers._
import graft.cometbft.ProtoWire._

/** Property-style tests in the reference's style (`lib/parse_test.go:37-121`:
  * random values → pretty-print → re-parse → compare), with a fixed seed for
  * reproducibility: vote strings, proposal strings, Go durations, and the
  * proto wire codec. */
class RoundTripPropertySpec extends AnyFunSuite {

  private val N = 200

  private def rnd(seed: Int) = new scala.util.Random(seed)
  private def hexStr(r: scala.util.Random): String =
    Seq.fill(12)("0123456789ABCDEF"(r.nextInt(16))).mkString
  private def tsNanos(r: scala.util.Random): Long =
    math.abs(r.nextLong()) % (4102444800L * 1000000000L)

  private def fmtTs(ns: Long): String = {
    val i = java.time.Instant.ofEpochSecond(ns / 1000000000L, ns % 1000000000L)
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      .withZone(java.time.ZoneOffset.UTC).format(i)
  }

  test("vote string: print-then-parse == id over random fields") {
    val r = rnd(1)
    for (_ <- 1 to N) {
      val (valIdx, valAddr) = (r.nextInt(200).toLong, hexStr(r))
      val (h, rd)           = (1L + r.nextInt(1000000), r.nextInt(100).toLong)
      val (bh, ph, total)   = (hexStr(r), hexStr(r), r.nextInt(50).toLong)
      val tsUs              = tsNanos(r) / 1000 * 1000 // printer keeps µs
      val s = f"[Vote Vote{$valIdx%d:$valAddr%s $h%d/$rd%02d/SIGNED_MSG_TYPE_PREVOTE(Prevote) $bh%s $ph%s $total%d @ ${fmtTs(tsUs)}%s}]"
      val v = parseVoteString(s).get
      assert(v.validatorIndex == valIdx && v.validatorAddress == valAddr)
      assert(v.height == h && v.round == rd)
      assert(v.blockHash == bh && v.psHash == ph && v.psTotal == total)
      assert(v.voteType == "prevote" && v.tsNs == tsUs)
    }
  }

  test("proposal string: print-then-parse == id over random fields") {
    val r = rnd(2)
    for (_ <- 1 to N) {
      val (h, rd)  = (1L + r.nextInt(1000000), r.nextInt(100).toLong)
      val (bh, ph) = (hexStr(r), hexStr(r))
      val total    = r.nextInt(64).toLong
      val pol      = r.nextInt(52).toLong - 1 // includes -1
      val sig      = hexStr(r)
      val tsUs     = tsNanos(r) / 1000 * 1000
      val s = s"Proposal{$h/$rd ($bh:$total:$ph, $pol) $sig @ ${fmtTs(tsUs)}}"
      val p = parseProposalString(s).get
      assert(p.height == h && p.round == rd && p.polRound == pol)
      assert(p.blockHash == bh && p.psTotal == total && p.psHash == ph)
      assert(p.signature == sig && p.tsNs == tsUs)
    }
  }

  test("go duration: ms render-then-parse round-trips") {
    val r = rnd(3)
    for (_ <- 1 to N) {
      val ms = math.abs(r.nextLong()) % 10000000L
      assert(parseGoDurationMs(s"${ms}ms") == ms)
    }
  }

  test("proto wire: encode-then-decode == id for random votes") {
    val r = rnd(4)
    for (_ <- 1 to N) {
      val v = Vote(1 + r.nextInt(2), 1L + r.nextInt(1000000), r.nextInt(100),
        BlockID(hexStr(r).getBytes, PartSetHeader(3, hexStr(r).getBytes)),
        tsNanos(r), "ADDR".getBytes, r.nextInt(200), Array[Byte](1, 2, 3))
      decodeConsensusMessage(encodeConsensusMessage(v)) match {
        case Some(d: Vote) =>
          assert(d.height == v.height && d.round == v.round && d.tpe == v.tpe)
          assert(d.validatorIndex == v.validatorIndex && d.tsNanos == v.tsNanos)
          assert(java.util.Arrays.equals(d.blockId.hash, v.blockId.hash))
          assert(java.util.Arrays.equals(d.blockId.psh.hash, v.blockId.psh.hash))
        case other => fail(s"decoded $other")
      }
    }
  }

  test("proto wire: encode-then-decode == id for random proposals incl. negative polRound") {
    val r = rnd(5)
    for (_ <- 1 to N) {
      val p = Proposal(32, 1L + r.nextInt(1000000), r.nextInt(100), r.nextInt(52) - 1,
        BlockID(hexStr(r).getBytes, PartSetHeader(1, "PS".getBytes)), tsNanos(r), Array[Byte](9))
      decodeConsensusMessage(encodeConsensusMessage(p)) match {
        case Some(d: Proposal) =>
          assert(d.height == p.height && d.round == p.round)
          assert(d.polRound == p.polRound && d.tsNanos == p.tsNanos)
        case other => fail(s"decoded $other")
      }
    }
  }

  test("proto wire: v1beta1 fallback equivalence — same field numbers decode identically (decoder.go:27-51)") {
    // The reference tries consensus v1, then v1beta1. Both schemas give
    // the 10 shapes the SAME oneof numbers and the same field numbers
    // inside each shape; v1beta1's types.Vote simply lacks the post-v1beta1
    // extension fields (9/10). A v1beta1 wire image is therefore exactly a
    // v1 encoding that omits those fields — which is what our writer emits
    // (no extension fields in the Vote shape at all) — and the
    // field-number-driven reader accepts it with extensions defaulted, so
    // the fallback branch needs no separate code path.
    val r = rnd(11)
    for (_ <- 1 to N) {
      val v = Vote(1 + r.nextInt(2), 1L + r.nextInt(1000000), r.nextInt(100),
        BlockID(hexStr(r).getBytes, PartSetHeader(3, hexStr(r).getBytes)),
        tsNanos(r), "ADDR".getBytes, r.nextInt(200), Array[Byte](4, 5))
      val v1beta1Bytes = encodeConsensusMessage(v) // == v1beta1 marshal of the same values
      decodeConsensusMessage(v1beta1Bytes) match {
        case Some(d: Vote) =>
          assert(d.height == v.height && d.round == v.round && d.tpe == v.tpe)
          assert(d.validatorIndex == v.validatorIndex && d.tsNanos == v.tsNanos)
        case other => fail(s"decoded $other")
      }
      // unknown higher-numbered fields (a v1 producer with extensions
      // talking to the same reader) are skipped, not fatal: rebuild the
      // SAME Vote payload with v1's extension(9, bytes) and
      // extension_signature(10, bytes) spliced in, re-wrapping both
      // length prefixes (wrapper field 1, oneof field 6), and require the
      // decode to still succeed field-for-field — this fails if readVote's
      // default skip-unknown arm is removed.
      val withExtension = {
        val psh = new Writer().vField(1, v.blockId.psh.total)
          .bField(2, v.blockId.psh.hash).result
        val bid = new Writer().bField(1, v.blockId.hash).mField(2, psh).result
        val ts  = new Writer().vField(1, v.tsNanos / 1000000000L)
          .vField(2, v.tsNanos % 1000000000L).result
        val innerPlusExt = new Writer()
          .vField(1, v.tpe).vField(2, v.height).vField(3, v.round)
          .mField(4, bid).mField(5, ts)
          .bField(6, v.validatorAddress).vField(7, v.validatorIndex)
          .bField(8, v.signature)
          .bField(9, Array[Byte](0x7e, 0x7f))   // extension
          .bField(10, Array[Byte](0x11))        // extension_signature
          .result
        new Writer().mField(6, new Writer().mField(1, innerPlusExt).result).result
      }
      decodeConsensusMessage(withExtension) match {
        case Some(d: Vote) =>
          assert(d.height == v.height && d.round == v.round && d.tpe == v.tpe)
          assert(d.validatorIndex == v.validatorIndex && d.tsNanos == v.tsNanos)
        case other => fail(s"extension splice broke the decode: $other")
      }
    }
  }

  test("proto wire: random garbage never throws") {
    val r = rnd(6)
    for (_ <- 1 to 500) {
      val bytes = Array.fill(r.nextInt(64))(r.nextInt(256).toByte)
      decodeConsensusMessage(bytes) // Option result, must not throw
    }
  }

  test("proto wire: encode-then-decode == id for random non-consensus messages") {
    val r = rnd(11)
    def bytes(n: Int) = Array.fill(1 + r.nextInt(n))(r.nextInt(256).toByte)
    def h = 1L + r.nextInt(1 << 20)
    for (_ <- 1 to 60) {
      val msgs: Seq[(NonConsensusMsg, Array[Byte] => Option[NonConsensusMsg])] = Seq(
        (BsBlockRequest(h), decodeBlocksyncMessage _),
        (BsNoBlockResponse(h), decodeBlocksyncMessage _),
        (BsBlockResponse(bytes(32), bytes(16)), decodeBlocksyncMessage _),
        (BsStatusRequest, decodeBlocksyncMessage _),
        (BsStatusResponse(h, r.nextInt(1000)), decodeBlocksyncMessage _),
        (MpTxs(Seq.fill(r.nextInt(4))(bytes(24))), decodeMempoolMessage _),
        (PexRequest, decodePexMessage _),
        (PexAddrs(Seq.fill(r.nextInt(3))(s"tcp://n${r.nextInt(99)}@10.0.0.${r.nextInt(255)}:26656")),
          decodePexMessage _),
        (SsSnapshotsRequest, decodeStatesyncMessage _),
        (SsSnapshotsResponse(h, r.nextInt(8), r.nextInt(64), bytes(20), bytes(8)),
          decodeStatesyncMessage _),
        (SsChunkRequest(h, r.nextInt(8), r.nextInt(64)), decodeStatesyncMessage _),
        (SsChunkResponse(h, r.nextInt(8), r.nextInt(64), bytes(40), r.nextBoolean()),
          decodeStatesyncMessage _))
      msgs.foreach { case (m, dec) =>
        val wire = encodeNonConsensusMessage(m)
        val back = dec(wire)
        assert(back.exists(_.typeName == m.typeName), s"${m.typeName} failed to decode")
        assert(back.exists(b => encodeNonConsensusMessage(b).sameElements(wire)),
          s"${m.typeName} re-encode mismatch")
      }
    }
  }

  test("proto wire: random garbage never throws on any non-consensus decoder") {
    val r = rnd(12)
    val decoders = Seq(decodeBlocksyncMessage _, decodeMempoolMessage _,
      decodePexMessage _, decodeStatesyncMessage _)
    for (_ <- 1 to 300; dec <- decoders) {
      dec(Array.fill(r.nextInt(48))(r.nextInt(256).toByte)) // must not throw
    }
    // every channel id, including evidence and out-of-range, on garbage
    for (_ <- 1 to 100; ch <- Seq(0x00L, 0x20L, 0x21L, 0x22L, 0x23L, 0x30L, 0x38L, 0x40L, 0x60L, 0x61L, 0x99L)) {
      decodeChannelMessage(ch, Array.fill(r.nextInt(32))(r.nextInt(256).toByte))
    }
  }

  test("block string: print-then-parse == id over random blocks (parse_test.go:47-121 style)") {
    val r = rnd(7)
    for (_ <- 1 to 50) {
      val h        = 1L + r.nextInt(100000)
      val chainId  = s"chain-${r.nextInt(100)}"
      val proposer = hexStr(r)
      val tsUs     = tsNanos(r) / 1000 * 1000
      val hashes   = Seq.fill(10)(hexStr(r))
      val txs      = Seq.fill(1 + r.nextInt(4))(hexStr(r))
      val sigAddr  = hexStr(r)
      val blockStr =
        s"""Block{
           |  Header{
           |    Version:        {11 ${r.nextInt(5)}}
           |    ChainID:        $chainId
           |    Height:         $h
           |    Time:           ${fmtTs(tsUs)}
           |    LastBlockID:    ${hashes(0)}:1:${hashes(1)}
           |    LastCommit:     ${hashes(2)}
           |    Data:           ${hashes(3)}
           |    Validators:     ${hashes(4)}
           |    NextValidators: ${hashes(5)}
           |    App:            ${hashes(6)}
           |    Consensus:      ${hashes(7)}
           |    Results:        ${hashes(8)}
           |    Evidence:       ${hashes(9)}
           |    Proposer:       $proposer
           |  }#${hashes(0)}
           |  Data{
           |${txs.map(t => s"    $t (${t.length / 2} bytes)").mkString("\n")}
           |  }#${hashes(3)}
           |  EvidenceData{
           |  }#${hashes(9)}
           |  Commit{
           |    Height:     $h
           |    Round:      ${r.nextInt(10)}
           |    BlockID:    ${hashes(0)}:1:${hashes(1)}
           |    Signatures:
           |      CommitSig{ABCD by $sigAddr on 2 @ ${fmtTs(tsUs)}}
           |      CommitSig{absent}
           |  }#${hashes(2)}
           |}#${hashes(0)}""".stripMargin
      val b = parseBlockString(blockStr).get
      assert(b.chainId == chainId && b.height == h && b.timeNs == tsUs)
      assert(b.proposerAddress == proposer)
      assert(b.lastCommitHash == hashes(2) && b.dataHash == hashes(3))
      assert(b.validatorsHash == hashes(4) && b.appHash == hashes(6))
      assert(b.txsHex == txs)
      assert(b.commitHeight == h && b.commitBlockIdHash == hashes(0))
      assert(b.signatures.map(_.flag) == Seq("2", "absent"))
      assert(b.signatures.head.validatorAddress == sigAddr)
      assert(b.blockHash == hashes(0))
    }
  }
}
