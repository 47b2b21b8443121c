package graft.cometbft

import org.scalatest.funsuite.AnyFunSuite
import graft.cometbft.Parsers._
import graft.cometbft.ProtoWire._

/** Ports of the reference's parser unit tests (`lib/parse_test.go`) plus
  * round-trip property tests for the hand-rolled proto wire codec. */
class ParsersSpec extends AnyFunSuite {

  test("ParseVoteString exact case (parse_test.go:12-35)") {
    val s = "[Vote Vote{0:14723CA68371 1/00/SIGNED_MSG_TYPE_PREVOTE(Prevote) " +
      "59E565861577 F786A527D8FA 000000000000 @ 2025-06-08T01:24:20.126787Z}]"
    val v = parseVoteString(s).get
    assert(v.voteType == "prevote")
    assert(v.height == 1L)
    assert(v.round == 0L)
    assert(v.validatorIndex == 0L)
    assert(v.validatorAddress == "14723CA68371")
    assert(v.blockHash == "59E565861577")
    assert(v.psHash == "F786A527D8FA")
    assert(v.psTotal == 0L)
    assert(v.signature == "")
    assert(v.tsNs == java.time.Instant.parse("2025-06-08T01:24:20.126787Z").toEpochMilli * 1000000L +
      java.time.Instant.parse("2025-06-08T01:24:20.126787Z").getNano % 1000000)
  }

  test("ParseVoteString with signature and extension fields") {
    val s = "Vote{3:AABB 12/01/SIGNED_MSG_TYPE_PRECOMMIT(Precommit) " +
      "DEAD BEEF 4 SIG111 EXT222 @ 2025-06-08T01:24:20.1Z}"
    val v = parseVoteString(s).get
    assert(v.voteType == "precommit")
    assert(v.height == 12L && v.round == 1L)
    assert(v.psTotal == 4L)
    assert(v.signature == "SIG111")
    assert(v.extension == "EXT222")
  }

  test("nil-Vote → None (parse_test.go nil case)") {
    assert(parseVoteString("nil-Vote").isEmpty)
    assert(parseVoteString("  nil-Vote  ").isEmpty)
  }

  test("malformed vote strings → None (parse_test.go:133-152)") {
    assert(parseVoteString("Vote{garbage}").isEmpty)
    assert(parseVoteString("NotAVote").isEmpty)
    assert(parseVoteString("Vote{0:A 1/2 X @}").isEmpty)
  }

  test("ParseProposalString (lib/parse.go:39-108 grammar)") {
    val s = "Proposal{5/1 (ABCDEF:3:FEDCBA, -1) A1B2C3 @ 2025-06-08T01:24:20.126787Z}"
    val p = parseProposalString(s).get
    assert(p.height == 5L && p.round == 1L && p.polRound == -1L)
    assert(p.blockHash == "ABCDEF" && p.psTotal == 3L && p.psHash == "FEDCBA")
    assert(p.signature == "A1B2C3")
    assert(parseProposalString("Proposal{bad}").isEmpty)
  }

  test("ParseRoundInfo + FormatStep (lib/parse.go:15-37, format.go:49-55)") {
    assert(parseRoundInfo("5/2/RoundStepPropose").contains((5L, 2L, "propose")))
    assert(parseRoundInfo("1/0/RoundStepNewHeight").contains((1L, 0L, "newHeight")))
    assert(parseRoundInfo("1/0/RoundStepPrecommitWait").contains((1L, 0L, "precommitWait")))
    assert(parseRoundInfo("x/0/RoundStepPropose").isEmpty)
    assert(parseRoundInfo("1/0").isEmpty)
    assert(formatStep("Propose") == null) // must start with RoundStep
  }

  test("parseConsensusVersion dual formats (parse_test.go:154-202)") {
    assert(parseConsensusVersion("{11 0}") == (11L, 0L))
    assert(parseConsensusVersion("{Block:11 App:2}") == (11L, 2L))
  }

  test("parseBlockId variants (parse_test.go:204-265)") {
    assert(parseBlockId("ABCD:3:EF01") == BlockIdP("ABCD", 3L, "EF01"))
    assert(parseBlockId("ABCD:{3:EF01}") == BlockIdP("ABCD", 3L, "EF01"))
  }

  test("parseCommitSig incl. absent (parse_test.go:267-331)") {
    val cs = parseCommitSig("CommitSig{ABCD by 14723CA68371 on 2 @ 2025-06-08T01:24:20.126787Z}").get
    assert(cs.signature == "ABCD" && cs.validatorAddress == "14723CA68371" && cs.flag == "2")
    assert(parseCommitSig("CommitSig{absent}").get.flag == "absent")
    assert(parseCommitSig("not a sig").isEmpty)
  }

  test("parseBlockString round-trip against the fixture block format") {
    val blockStr = Fixtures.nodeLog(1, 1).last
    // extract the embedded block string from the Committed block JSON line
    val json = ujsonExtract(blockStr, "block")
    val b = parseBlockString(json).get
    assert(b.chainId == "graft-test")
    assert(b.height == 1L)
    assert(b.txsHex == Seq("0102030405"))
    assert(b.signatures.length == 2)
    assert(b.signatures(1).flag == "absent")
    assert(b.commitHeight == 1L)
    assert(b.proposerAddress.nonEmpty)
  }

  test("nil-Block → None") {
    assert(parseBlockString("nil-Block").isEmpty)
    assert(parseBlockString("garbage").isEmpty)
  }

  test("parseGoDurationMs (timeout-analysis/processor.go:209-214)") {
    assert(parseGoDurationMs("3s") == 3000L)
    assert(parseGoDurationMs("500ms") == 500L)
    assert(parseGoDurationMs("1.5s") == 1500L)
    assert(parseGoDurationMs("1m30s") == 90000L)
    assert(parseGoDurationMs("bogus") == null)
  }

  test("formatSourcePeer / extractPeerIdOnly (format.go)") {
    assert(formatSourcePeer("Peer{MConn{127.0.0.1:57186} 1d8ff3713 in}") ==
      "1d8ff3713@127.0.0.1:57186")
    assert(extractPeerIdOnly("abc@10.0.0.1:26656") == "abc")
    assert(extractPeerIdOnly("abc") == "abc")
  }

  test("proto wire round-trip for all 10 consensus message shapes") {
    val bid = BlockID("AB".getBytes, PartSetHeader(4, "CD".getBytes))
    val msgs: Seq[ConsensusMsg] = Seq(
      NewRoundStep(10, 2, 4, 33, 1),
      NewValidBlock(11, 0, PartSetHeader(7, "EF".getBytes), BitArray(7, Seq(5L)), true),
      Proposal(32, 12, 1, -1, bid, 1717809860126787000L, Array[Byte](1, 2)),
      ProposalPOL(13, 2, BitArray(3, Seq(6L))),
      BlockPart(14, 0, 3, Array[Byte](9, 8, 7)),
      Vote(1, 15, 0, bid, 1717809860126787000L, "AD".getBytes, 2, Array[Byte](3)),
      HasVote(16, 1, 2, 3),
      VoteSetMaj23(17, 0, 1, bid),
      VoteSetBits(18, 0, 2, bid, BitArray(4, Seq(1L, 2L))),
      HasProposalBlockPart(19, 1, 2))
    msgs.foreach { m =>
      val decoded = decodeConsensusMessage(encodeConsensusMessage(m))
      assert(decoded.isDefined, s"decode failed for ${m.typeName}")
      assert(decoded.get.typeName == m.typeName)
      (m, decoded.get) match {
        case (a: Vote, b: Vote) =>
          assert(a.height == b.height && a.round == b.round && a.tpe == b.tpe)
          assert(a.tsNanos == b.tsNanos && a.validatorIndex == b.validatorIndex)
          assert(new String(b.blockId.hash) == "AB")
        case (a: Proposal, b: Proposal) =>
          assert(a.polRound == b.polRound && b.polRound == -1)
          assert(a.height == b.height)
        case (a: NewRoundStep, b: NewRoundStep) => assert(a == b)
        case (a: HasVote, b: HasVote)           => assert(a == b)
        case (a: VoteSetBits, b: VoteSetBits)   =>
          assert(a.votes.elems == b.votes.elems)
        case _ =>
      }
    }
  }

  test("proto decode rejects garbage") {
    assert(decodeConsensusMessage(Array[Byte](-1, -1, -1)).isEmpty)
    assert(decodeConsensusMessage(Array.emptyByteArray).isEmpty)
  }

  /** Tiny JSON string-field extractor for test use. */
  private def ujsonExtract(json: String, field: String): String = {
    val key = s""""$field":""""
    val i = json.indexOf(key)
    assert(i >= 0, s"field $field not in $json")
    val sb = new StringBuilder
    var j = i + key.length
    var done = false
    while (!done) {
      json.charAt(j) match {
        case '\\' =>
          json.charAt(j + 1) match {
            case 'n'  => sb += '\n'
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case c    => sb += c
          }
          j += 2
        case '"' => done = true
        case c   => sb += c; j += 1
      }
    }
    sb.toString
  }
}
