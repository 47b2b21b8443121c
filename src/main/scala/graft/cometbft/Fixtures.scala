package graft.cometbft

import java.nio.file.{Files, Paths}
import java.time.Instant
import graft.cometbft.ProtoWire._

/** Deterministic synthetic 4-node CometBFT log fixtures, shaped per
  * `types/raws.go` and the reference's `example-logs/` scenario layout
  * (FIXTURES.md §1): each node file opens with `P2P Node ID` and
  * `This node is a validator`, then emits consensus rounds with step
  * transitions, votes (send + receive with proto wire bytes), block parts,
  * timeouts, and committed blocks. Node 0 is the "slow node"
  * (`example-logs/node0-has-long-duration-config/diff.diff`): its step
  * latencies are 10x the others — the acceptance scenario is finding it.
  *
  * Deterministic: fixed seed derived per (node, height, round); no wall
  * clock.
  */
object Fixtures {

  private val nodeIds = Seq(
    "aaaa000000000000000000000000000000000001",
    "bbbb000000000000000000000000000000000002",
    "cccc000000000000000000000000000000000003",
    "dddd000000000000000000000000000000000004")
  private val valAddrs = Seq(
    "1111111111111111111111111111111111111111",
    "2222222222222222222222222222222222222222",
    "3333333333333333333333333333333333333333",
    "4444444444444444444444444444444444444444")

  private val t0Nanos = Instant.parse("2025-06-08T01:00:00Z").getEpochSecond * 1000000000L

  private def fmtTs(ns: Long): String = {
    val i = Instant.ofEpochSecond(ns / 1000000000L, ns % 1000000000L)
    // RFC3339Nano with µs precision like CometBFT logs
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(i)
  }

  private def jsonEsc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c    => c.toString
    }

  private def line(msg: String, ts: Long, fields: (String, Any)*): String = {
    val kv = (Seq("_msg" -> msg, "ts" -> fmtTs(ts), "module" -> "consensus",
      "level" -> "debug") ++ fields).map {
      case (k, v: String)  => s""""$k":"${jsonEsc(v)}""""
      case (k, v: Long)    => s""""$k":$v"""
      case (k, v: Int)     => s""""$k":$v"""
      case (k, v: Boolean) => s""""$k":$v"""
      case (k, v)          => s""""$k":"${jsonEsc(v.toString)}""""
    }
    kv.mkString("{", ",", "}")
  }

  private def hexStr(b: Array[Byte]): String = b.map("%02X".format(_)).mkString
  private def b64(b: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(b)

  private def blockHash(h: Long): String = f"B${h}%038d".take(40)
  private def psHash(h: Long): String = f"C${h}%038d".take(40)

  // Deterministic wire payloads — IDENTICAL bytes on the sender's Send line
  // and every receiver's Received-bytes line, so raw-hash matching (J4) and
  // key pairing (J1-J3) line up across node files like real gossip traffic.
  private def voteMsg(tpe: Int, h: Long, sender: Int): Array[Byte] =
    encodeConsensusMessage(Vote(tpe, h, 0,
      BlockID(blockHash(h).getBytes, PartSetHeader(1, psHash(h).getBytes)),
      t0Nanos + h * 1000000000L + sender * 1000000L + tpe,
      valAddrs(sender).getBytes, sender, Array[Byte](7, 7)))
  private def proposalMsg(h: Long): Array[Byte] =
    encodeConsensusMessage(Proposal(32, h, 0, -1,
      BlockID(blockHash(h).getBytes, PartSetHeader(1, psHash(h).getBytes)),
      t0Nanos + h * 1000000000L, Array[Byte](9, 9, 9)))
  private def blockPartMsg(h: Long): Array[Byte] =
    encodeConsensusMessage(BlockPart(h, 0, 0, Array[Byte](1, 2, 3, 4)))
  // State/vote-set-bits channel payloads: one deterministic message per
  // family per height, so every one of the 8 p2p confirmation families
  // (J3) and every wire shape (F14-F16) is exercised end-to-end.
  private def newRoundStepMsg(h: Long): Array[Byte] =
    encodeConsensusMessage(NewRoundStep(h, 0, 1, h * 2, -1))
  private def hasVoteMsg(h: Long): Array[Byte] =
    encodeConsensusMessage(HasVote(h, 0, 1, 2))
  private def voteSetMaj23Msg(h: Long): Array[Byte] =
    encodeConsensusMessage(VoteSetMaj23(h, 0, 2,
      BlockID(blockHash(h).getBytes, PartSetHeader(1, psHash(h).getBytes))))
  private def proposalPolMsg(h: Long): Array[Byte] =
    encodeConsensusMessage(ProposalPOL(h, 0, BitArray(4, Seq(0xbL))))
  private def voteSetBitsMsg(h: Long): Array[Byte] =
    encodeConsensusMessage(VoteSetBits(h, 0, 2,
      BlockID(blockHash(h).getBytes, PartSetHeader(1, psHash(h).getBytes)),
      BitArray(4, Seq(0x7L))))
  // TrySend payload (peer unknown in the log line): only raw-hash
  // fallback matching (J4 pass 2) can pair it with its receives.
  private def newValidBlockMsg(h: Long): Array[Byte] =
    encodeConsensusMessage(NewValidBlock(h, 0,
      PartSetHeader(1, psHash(h).getBytes), BitArray(1, Seq(1L)), isCommit = false))

  /** One node's log lines for `heights` consensus heights. */
  def nodeLog(node: Int, heights: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val slow = if (node == 0) 10L else 1L // node0 is the slow node
    val me = nodeIds(node)
    out += line("P2P Node ID", t0Nanos + node * 1000L, "ID" -> me, "file" -> s"node$node/key.json")
    out += line("This node is a validator", t0Nanos + node * 1000L + 500L,
      "addr" -> valAddrs(node), "pubKey" -> s"PUB${node}==")

    var ts = t0Nanos + 1000000000L + node * 2000000L
    for (h <- 1L to heights.toLong) {
      val round = 0L
      val proposer = valAddrs((h % 4).toInt)
      val stepGap = 50000000L * slow // 50ms (500ms for node0)
      out += line("Entering new round", ts, "current" -> s"$h/0/RoundStepNewHeight",
        "previous" -> s"${h - 1}/0/RoundStepCommit", "proposer" -> proposer,
        "height" -> h, "round" -> round)
      ts += stepGap
      val ourTurn = (h % 4).toInt == node
      out += line(
        if (ourTurn) "Propose step; our turn to propose" else "Propose step; not our turn to propose",
        ts, "height" -> h, "round" -> round, "proposer" -> proposer)
      ts += stepGap
      // proposal + block-part broadcast from the proposer; receipt elsewhere
      if (ourTurn) {
        for (peer <- 0 until 4 if peer != node) {
          out += line("Send", ts, "channel" -> 0x21L, "conn" -> "MConn{pipe}",
            "msgBytes" -> hexStr(proposalMsg(h)),
            "peer" -> s"${nodeIds(peer)}@10.0.0.$peer:26656")
          ts += 1000000L
          out += line("Send", ts, "channel" -> 0x21L, "conn" -> "MConn{pipe}",
            "msgBytes" -> hexStr(blockPartMsg(h)),
            "peer" -> s"${nodeIds(peer)}@10.0.0.$peer:26656")
          ts += 1000000L
          // state-channel + vote-set-bits gossip: the remaining 5 p2p
          // confirmation families, one message each per height
          for ((bytes, ch) <- Seq(
              newRoundStepMsg(h) -> 0x20L, hasVoteMsg(h) -> 0x20L,
              voteSetMaj23Msg(h) -> 0x20L, proposalPolMsg(h) -> 0x20L,
              voteSetBitsMsg(h) -> 0x23L)) {
            out += line("Send", ts, "channel" -> ch, "conn" -> "MConn{pipe}",
              "msgBytes" -> hexStr(bytes),
              "peer" -> s"${nodeIds(peer)}@10.0.0.$peer:26656")
            ts += 1000000L
          }
        }
        // TrySend without a peer id: exercises the raw-hash fallback
        // matching path (J4 pass 2) on every receiver
        out += line("TrySend", ts, "channel" -> 0x20L, "conn" -> "MConn{pipe}",
          "msgBytes" -> hexStr(newValidBlockMsg(h)), "peer" -> "")
        ts += 1000000L
        // Non-consensus channel traffic: decoded by the channel dispatcher
        // (`decoder.go:79-107`) then REJECTED at channel-validity exactly
        // like the reference converter (`convereter.go:46-58`) — these
        // lines must NEVER surface as events. Emitted at sub-millisecond
        // offsets WITHOUT advancing `ts`, so the consensus timeline — and
        // with it every pinned golden — is byte-identical with or without
        // them: the unchanged goldens ARE the drop-parity proof
        // (NonConsensusDecodeSpec + PipelineSpec pin it directly too).
        val gossipPeer = s"${nodeIds((node + 1) % 4)}@10.0.0.${(node + 1) % 4}:26656"
        out += line("Send", ts + 1000L, "channel" -> 0x30L, "conn" -> "MConn{pipe}",
          "msgBytes" -> hexStr(encodeNonConsensusMessage(MpTxs(Seq(s"tx$h".getBytes("UTF-8"))))),
          "peer" -> gossipPeer)
        out += line("Send", ts + 2000L, "channel" -> 0x40L, "conn" -> "MConn{pipe}",
          "msgBytes" -> hexStr(encodeNonConsensusMessage(BsStatusResponse(h, 1))),
          "peer" -> gossipPeer)
        out += line("Received bytes", ts + 3000L, "chID" -> 0x00L,
          "msgBytes" -> b64(encodeNonConsensusMessage(PexAddrs(Seq("tcp://peer@10.0.0.9:26656")))),
          "peer" -> gossipPeer)
        out += line("Received bytes", ts + 4000L, "chID" -> 0x60L,
          "msgBytes" -> b64(encodeNonConsensusMessage(SsChunkRequest(h, 1, 0))),
          "peer" -> gossipPeer)
        // Evidence channel: the reference's decoder returns an error
        // (`decoder.go:108-110`) — dropped at decode, not at validity.
        out += line("Received bytes", ts + 5000L, "chID" -> 0x38L,
          "msgBytes" -> b64(Array[Byte](0x0a, 0x00)),
          "peer" -> gossipPeer)
      } else {
        val proposerNode = (h % 4).toInt
        out += line("Received proposal", ts,
          "proposal" -> s"Proposal{$h/$round (${blockHash(h)}:1:${psHash(h)}, -1) 090909 @ ${fmtTs(ts)}}",
          "proposer" -> proposer)
        ts += 1000000L
        out += line("Received bytes", ts, "chID" -> 0x21L,
          "msgBytes" -> b64(proposalMsg(h)),
          "peer" -> s"${nodeIds(proposerNode)}@10.0.0.$proposerNode:26656")
        ts += 1000000L
        out += line("Received bytes", ts, "chID" -> 0x21L,
          "msgBytes" -> b64(blockPartMsg(h)),
          "peer" -> s"${nodeIds(proposerNode)}@10.0.0.$proposerNode:26656")
        ts += 1000000L
        for ((bytes, ch) <- Seq(
            newRoundStepMsg(h) -> 0x20L, hasVoteMsg(h) -> 0x20L,
            voteSetMaj23Msg(h) -> 0x20L, proposalPolMsg(h) -> 0x20L,
            voteSetBitsMsg(h) -> 0x23L,
            newValidBlockMsg(h) -> 0x20L)) {
          out += line("Received bytes", ts, "chID" -> ch,
            "msgBytes" -> b64(bytes),
            "peer" -> s"${nodeIds(proposerNode)}@10.0.0.$proposerNode:26656")
          ts += 1000000L
        }
        out += line("Received complete proposal block", ts, "hash" -> blockHash(h), "height" -> h)
      }
      ts += stepGap
      out += line("Entering prevote step", ts, "current" -> s"$h/0/RoundStepPropose",
        "height" -> h, "round" -> round)
      ts += stepGap
      // send my prevote to all peers; receive peers' prevotes
      for (peer <- 0 until 4 if peer != node) {
        out += line("Send", ts, "channel" -> 0x22L, "conn" -> "MConn{pipe}",
          "msgBytes" -> hexStr(voteMsg(1, h, node)),
          "peer" -> s"${nodeIds(peer)}@10.0.0.$peer:26656")
        ts += 500000L
      }
      for (peer <- 0 until 4 if peer != node) {
        out += line("Received bytes", ts, "chID" -> 0x22L,
          "msgBytes" -> b64(voteMsg(1, h, peer)),
          "peer" -> s"${nodeIds(peer)}@10.0.0.$peer:26656")
        ts += 700000L
      }
      // Wait-step line: the reference's first-match inference collapses it
      // into entering_prevote_step (`parsers.go:94-128`) and its timestamp
      // overwrites the prevote slot in consensus-timing — the goldens pin
      // that replicated behavior (SURVEY §7.4-3 S5).
      if (h % 3 == 0 || node == 0) {
        out += line("Entering prevote wait step", ts,
          "current" -> s"$h/0/RoundStepPrevote", "height" -> h, "round" -> round)
        ts += 1000000L
      }
      ts += stepGap
      out += line("Entering precommit step", ts, "current" -> s"$h/0/RoundStepPrevote",
        "height" -> h, "round" -> round)
      ts += stepGap
      for (peer <- 0 until 4 if peer != node) {
        out += line("Send", ts, "channel" -> 0x22L, "conn" -> "MConn{pipe}",
          "msgBytes" -> hexStr(voteMsg(2, h, node)),
          "peer" -> s"${nodeIds(peer)}@10.0.0.$peer:26656")
        ts += 500000L
      }
      for (peer <- 0 until 4 if peer != node) {
        out += line("Received bytes", ts, "chID" -> 0x22L,
          "msgBytes" -> b64(voteMsg(2, h, peer)),
          "peer" -> s"${nodeIds(peer)}@10.0.0.$peer:26656")
        ts += 700000L
      }
      // an occasional timeout (every 3rd height; node0 every height)
      if (h % 3 == 0 || node == 0) {
        out += line("Scheduled timeout", ts, "dur" -> (if (node == 0) "3s" else "1s"),
          "height" -> h, "round" -> round, "step" -> "prevote")
        ts += 2000000L
        // precommit-wait line, collapsed to entering_precommit_step (S5)
        out += line("Entering precommit wait step", ts,
          "current" -> s"$h/0/RoundStepPrecommit", "height" -> h, "round" -> round)
        ts += 1000000L
      }
      ts += stepGap
      out += line("Entering commit step", ts, "current" -> s"$h/0/RoundStepPrecommit",
        "height" -> h, "round" -> round)
      ts += stepGap
      val block =
        s"""Block{
           |  Header{
           |    Version:        {11 0}
           |    ChainID:        graft-test
           |    Height:         $h
           |    Time:           ${fmtTs(ts)}
           |    LastBlockID:    ${blockHash(h - 1)}:1:${psHash(h - 1)}
           |    LastCommit:     AA11
           |    Data:           BB22
           |    Validators:     CC33
           |    NextValidators: DD44
           |    App:            EE55
           |    Consensus:      FF66
           |    Results:        AB12
           |    Evidence:       CD34
           |    Proposer:       $proposer
           |  }#${blockHash(h)}
           |  Data{
           |    0102030405 (5 bytes)
           |  }#BB22
           |  EvidenceData{
           |  }#CD34
           |  Commit{
           |    Height:     $h
           |    Round:      0
           |    BlockID:    ${blockHash(h)}:1:${psHash(h)}
           |    Signatures:
           |      CommitSig{ABCD by ${valAddrs(0)} on 2 @ ${fmtTs(ts)}}
           |      CommitSig{absent}
           |  }#AA11
           |}#${blockHash(h)}""".stripMargin
      out += line("Committed block", ts, "block" -> block, "height" -> h)
      ts += stepGap
    }
    out.toSeq
  }

  /** Write a 4-node fixture directory; returns the dir path. */
  def writeScenario(dir: String, heights: Int = 5): String = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    for (n <- 0 until 4) {
      Files.write(p.resolve(s"node${n}_cometbft.log"),
        nodeLog(n, heights).mkString("\n").getBytes("UTF-8"))
    }
    dir
  }

  /** Two-node adversarial vote-gossip scenario exercising every edge order
    * of the J1 confirmation machine (`vote-latency/processor.go:26-65`):
    * plain confirm, send-overwrite, repeat receive, receive-only chain,
    * cross-type overwrite (VoteKey has NO vote-type field, so a precommit
    * send clobbers a prevote entry), and receive-send-receive. The q55
    * oracle for this scenario is HAND-DERIVED from the reference machine
    * on paper (CometbftQueries.q55 — NOT a gen_golden.py pin), so it
    * independently checks the machine rather than enshrining our output.
    *
    * All timestamps are explicit ns offsets from T = t0 + 5 s so the
    * expected rows can be written down directly. Node A (index 0) sends,
    * node B (index 1) receives.
    */
  def writeAdversarialVoteScenario(dir: String): String = {
    val T  = t0Nanos + 5000000000L
    val ms = 1000000L
    val a  = nodeIds(0); val b = nodeIds(1)
    def send(h: Long, tpe: Int, at: Long) =
      line("Send", at, "channel" -> 0x22L, "conn" -> "MConn{pipe}",
        "msgBytes" -> hexStr(voteMsg(tpe, h, 0)), "peer" -> s"$b@10.0.0.1:26656")
    def recv(h: Long, tpe: Int, at: Long) =
      line("Received bytes", at, "chID" -> 0x22L,
        "msgBytes" -> b64(voteMsg(tpe, h, 0)), "peer" -> s"$a@10.0.0.0:26656")

    val aLog = Seq(
      line("P2P Node ID", T, "ID" -> a, "file" -> "nodeA/key.json"),
      line("This node is a validator", T + 500L, "addr" -> valAddrs(0), "pubKey" -> "PUBA=="),
      send(101L, 1, T + 10 * ms),             // plain confirm
      send(102L, 1, T + 20 * ms),             // overwritten by...
      send(102L, 1, T + 22 * ms),             // ...this one
      send(103L, 1, T + 30 * ms),             // confirmed twice
      send(105L, 1, T + 50 * ms),             // prevote, clobbered by...
      send(105L, 2, T + 52 * ms),             // ...precommit (same VoteKey!)
      send(106L, 1, T + 62 * ms))             // lands between B's receives
    val bLog = Seq(
      line("P2P Node ID", T + 1000L, "ID" -> b, "file" -> "nodeB/key.json"),
      line("This node is a validator", T + 1500L, "addr" -> valAddrs(1), "pubKey" -> "PUBB=="),
      recv(101L, 1, T + 15 * ms),
      recv(102L, 1, T + 25 * ms),
      recv(103L, 1, T + 33 * ms),
      recv(103L, 1, T + 36 * ms),             // repeat receive re-confirms
      recv(104L, 1, T + 40 * ms),             // receive-only chain: creates entry
      recv(104L, 2, T + 43 * ms),             // confirms w/ NULL sent, prevote payload
      recv(106L, 1, T + 60 * ms),             // entry created by receive...
      recv(105L, 1, T + 55 * ms),
      recv(106L, 1, T + 65 * ms))             // ...send overwrote; this confirms

    val p = Paths.get(dir)
    Files.createDirectories(p)
    Files.write(p.resolve("nodeA_cometbft.log"), aLog.mkString("\n").getBytes("UTF-8"))
    Files.write(p.resolve("nodeB_cometbft.log"), bLog.mkString("\n").getBytes("UTF-8"))
    dir
  }

  /** Two-node adversarial block-part scenario for the J2 machine
    * (`block-parts/processor.go:43-90` — the identical pointer-aliasing
    * overwrite-on-send machine as J1, keyed by (height, round, partIndex,
    * sender, receiver)): plain confirm, send-overwrite, double-confirm
    * aliasing (two IDENTICAL rows with the LAST receive's ts), a
    * receive-created entry confirming NULL-sent, part-INDEX key isolation
    * (same height, different index: separate entries), and a send
    * overwriting a receive-created entry mid-chain. The q61 oracle rows
    * are HAND-DERIVED on paper from the reference machine — NOT a
    * gen_golden.py pin (never add q61 to its GOLDEN list). */
  def writeAdversarialBlockPartScenario(dir: String): String = {
    val T  = t0Nanos + 8000000000L
    val ms = 1000000L
    val a  = nodeIds(0); val b = nodeIds(1)
    def bp(h: Long, idx: Long): Array[Byte] =
      encodeConsensusMessage(BlockPart(h, 0, idx, Array[Byte](h.toByte, idx.toByte, 5)))
    def send(h: Long, idx: Long, at: Long) =
      line("Send", at, "channel" -> 0x21L, "conn" -> "MConn{pipe}",
        "msgBytes" -> hexStr(bp(h, idx)), "peer" -> s"$b@10.0.0.1:26656")
    def recv(h: Long, idx: Long, at: Long) =
      line("Received bytes", at, "chID" -> 0x21L,
        "msgBytes" -> b64(bp(h, idx)), "peer" -> s"$a@10.0.0.0:26656")

    val aLog = Seq(
      line("P2P Node ID", T, "ID" -> a, "file" -> "nodeA/key.json"),
      line("This node is a validator", T + 500L, "addr" -> valAddrs(0), "pubKey" -> "PUBA=="),
      send(201L, 0, T + 10 * ms),             // plain confirm
      send(202L, 0, T + 20 * ms),             // overwritten by...
      send(202L, 0, T + 22 * ms),             // ...this one
      send(203L, 0, T + 30 * ms),             // confirmed twice (aliasing)
      send(205L, 0, T + 50 * ms),             // index-0 entry; index-1 is separate
      send(206L, 0, T + 62 * ms))             // overwrites B's receive-created entry
    val bLog = Seq(
      line("P2P Node ID", T + 1000L, "ID" -> b, "file" -> "nodeB/key.json"),
      line("This node is a validator", T + 1500L, "addr" -> valAddrs(1), "pubKey" -> "PUBB=="),
      recv(201L, 0, T + 15 * ms),
      recv(202L, 0, T + 25 * ms),
      recv(203L, 0, T + 33 * ms),
      recv(203L, 0, T + 36 * ms),             // repeat receive: aliased duplicate rows
      recv(204L, 0, T + 40 * ms),             // receive-only chain: creates entry
      recv(204L, 0, T + 43 * ms),             // confirms w/ NULL sent
      recv(205L, 1, T + 52 * ms),             // DIFFERENT part index: own entry
      recv(205L, 0, T + 54 * ms),             // confirms the index-0 send
      recv(205L, 1, T + 56 * ms),             // NULL-sent confirm on the index-1 entry
      recv(206L, 0, T + 60 * ms),             // entry created by receive...
      recv(206L, 0, T + 65 * ms))             // ...send overwrote; confirms 62->65

    val p = Paths.get(dir)
    Files.createDirectories(p)
    Files.write(p.resolve("nodeA_cometbft.log"), aLog.mkString("\n").getBytes("UTF-8"))
    Files.write(p.resolve("nodeB_cometbft.log"), bLog.mkString("\n").getBytes("UTF-8"))
    dir
  }

  /** Two-node adversarial scenario for the consensus-timing analytic
    * (A1 sessionization + J5 commit lookup,
    * `consensus-timing/processor.go:33-160`), with every edge in the
    * deterministic agreement zone of the machine (events in timestamp
    * order = canonical step order; repeats adjacent), so the q73 oracle
    * derives exactly from the reference:
    *
    *  - h=401 full canonical round: every consecutive-step duration;
    *  - h=402 missing steps: durations skip to the nearest PRIOR step
    *    present (`calculateStepDuration`'s backward scan, `:110-133`);
    *  - h=403 no new-round, never committed: the round is CREATED by a
    *    step transition (start = that step), flushed at end-of-input
    *    with end = max transition (`completeRound`, `:135-151`);
    *  - h=404 TWO open rounds, one commit: the commit closes the
    *    max-round entry (the reference iterates a Go map —
    *    nondeterministic; max(round) is the repo's documented
    *    deterministic choice, SURVEY §7.4) and round 0 flushes
    *    uncommitted;
    *  - h=405 repeated step: last observation wins (map overwrite,
    *    `:84`), so the repeat's ts feeds both surrounding durations;
    *  - h=406 on node B: (node, height, round) key isolation.
    *
    * The q73 oracle rows are HAND-DERIVED on paper — NOT a gen_golden.py
    * pin (never add q73 to its GOLDEN list). */
  def writeAdversarialTimingScenario(dir: String): String = {
    val T  = t0Nanos + 11000000000L
    val ms = 1000000L
    val a  = nodeIds(0); val b = nodeIds(1)
    def newRound(h: Long, r: Long, at: Long) =
      line("Entering new round", at, "current" -> s"$h/$r/RoundStepNewHeight",
        "previous" -> s"${h - 1}/0/RoundStepCommit", "proposer" -> valAddrs(0),
        "height" -> h, "round" -> r)
    def propose(h: Long, r: Long, at: Long) =
      line("Propose step; not our turn to propose", at,
        "height" -> h, "round" -> r, "proposer" -> valAddrs(0))
    def step(msg: String, h: Long, r: Long, prev: String, at: Long) =
      line(msg, at, "current" -> s"$h/$r/$prev", "height" -> h, "round" -> r)
    def committed(h: Long, at: Long) =
      line("Committed block", at, "height" -> h,
        "block" -> s"Block{\n  Header{\n    Height: $h\n  }#${blockHash(h)}\n}#${blockHash(h)}")

    val aLog = Seq(
      line("P2P Node ID", T, "ID" -> a, "file" -> "nodeA/key.json"),
      line("This node is a validator", T + 500L, "addr" -> valAddrs(0), "pubKey" -> "PUBA=="),
      // h=401: full canonical chain
      newRound(401L, 0L, T + 10 * ms),
      propose(401L, 0L, T + 12 * ms),
      step("Entering prevote step", 401L, 0L, "RoundStepPropose", T + 15 * ms),
      step("Entering precommit step", 401L, 0L, "RoundStepPrevote", T + 19 * ms),
      step("Entering commit step", 401L, 0L, "RoundStepPrecommit", T + 24 * ms),
      committed(401L, T + 30 * ms),
      // h=402: propose and precommit never observed
      newRound(402L, 0L, T + 40 * ms),
      step("Entering prevote step", 402L, 0L, "RoundStepPropose", T + 43 * ms),
      step("Entering commit step", 402L, 0L, "RoundStepPrecommit", T + 47 * ms),
      committed(402L, T + 52 * ms),
      // h=403: created by the propose step, never committed
      propose(403L, 0L, T + 60 * ms),
      step("Entering prevote step", 403L, 0L, "RoundStepPropose", T + 63 * ms),
      step("Entering precommit step", 403L, 0L, "RoundStepPrevote", T + 67 * ms),
      // h=404: rounds 0 and 1 both open; the commit closes round 1
      newRound(404L, 0L, T + 80 * ms),
      step("Entering prevote step", 404L, 0L, "RoundStepPropose", T + 82 * ms),
      newRound(404L, 1L, T + 85 * ms),
      step("Entering prevote step", 404L, 1L, "RoundStepPropose", T + 88 * ms),
      committed(404L, T + 95 * ms),
      // h=405: propose observed twice; the later ts wins both durations
      newRound(405L, 0L, T + 100 * ms),
      propose(405L, 0L, T + 102 * ms),
      propose(405L, 0L, T + 104 * ms),
      step("Entering prevote step", 405L, 0L, "RoundStepPropose", T + 107 * ms),
      committed(405L, T + 112 * ms))
    val bLog = Seq(
      line("P2P Node ID", T + 1000L, "ID" -> b, "file" -> "nodeB/key.json"),
      line("This node is a validator", T + 1500L, "addr" -> valAddrs(1), "pubKey" -> "PUBB=="),
      newRound(406L, 0L, T + 120 * ms),
      step("Entering prevote step", 406L, 0L, "RoundStepPropose", T + 124 * ms),
      committed(406L, T + 130 * ms))

    val p = Paths.get(dir)
    Files.createDirectories(p)
    Files.write(p.resolve("nodeA_cometbft.log"), aLog.mkString("\n").getBytes("UTF-8"))
    Files.write(p.resolve("nodeB_cometbft.log"), bLog.mkString("\n").getBytes("UTF-8"))
    dir
  }

  /** Two-node adversarial scenario for the timeout-analysis machine
    * (J6 step-start join + A8 aggregate + A9 recovery flag + A10 dual-
    * predicate clusters, `timeout-analysis/processor.go:101-247`), inside
    * the machine's deterministic agreement zone (events in ts order,
    * heights non-decreasing per node — a height DROP wraps the unsigned
    * delta in the reference and breaks the cluster, an order artifact the
    * repo's signed delta rationalizes away):
    *
    *  - J6: a timeout with its step's start present gets TimeInStep;
    *    a missing step start (h501 r0, h502+) leaves it NULL; the join is
    *    per (height, round, step) — r1's start never serves r0;
    *  - A9: recovery iff >= 2 STRICTLY-EARLIER timeouts in rounds
    *    [r-2, r] of the SAME height (`isRecoveryTimeout`, `:201-208`) —
    *    covered: exactly-2 threshold, window lower edge (r6 sees nothing
    *    in [4,6]), height isolation, and round-0 underflow;
    *  - A10: one cluster chained across heights 500-502 (gaps small,
    *    deltas <= 5), broken by a height jump to 510 (delta 8), a second
    *    3-event cluster 510-512, then a 35 s gap leaving a trailing
    *    singleton that is discarded (< 3 events);
    *  - A8: per-node totals incl. integer-div average duration and the
    *    exact-double timeouts-per-round (12/2), with node B's single
    *    timeout pinning key isolation and the total_rounds=0 NULL.
    *
    * The q74/q75/q76 oracle rows are HAND-DERIVED on paper — NOT
    * gen_golden.py pins (never add them to its GOLDEN list). */
  def writeAdversarialTimeoutScenario(dir: String): String = {
    val T  = t0Nanos + 13000000000L
    val ms = 1000000L
    val a  = nodeIds(0); val b = nodeIds(1)
    def newRound(h: Long, r: Long, at: Long) =
      line("Entering new round", at, "current" -> s"$h/$r/RoundStepNewHeight",
        "previous" -> s"${h - 1}/0/RoundStepCommit", "proposer" -> valAddrs(0),
        "height" -> h, "round" -> r)
    def propose(h: Long, r: Long, at: Long) =
      line("Propose step; not our turn to propose", at,
        "height" -> h, "round" -> r, "proposer" -> valAddrs(0))
    def step(msg: String, h: Long, r: Long, prev: String, at: Long) =
      line(msg, at, "current" -> s"$h/$r/$prev", "height" -> h, "round" -> r)
    def timeout(h: Long, r: Long, st: String, dur: String, at: Long) =
      line("Scheduled timeout", at, "dur" -> dur, "height" -> h, "round" -> r, "step" -> st)

    val aLog = Seq(
      line("P2P Node ID", T, "ID" -> a, "file" -> "nodeA/key.json"),
      line("This node is a validator", T + 500L, "addr" -> valAddrs(0), "pubKey" -> "PUBA=="),
      newRound(500L, 0L, T + 8 * ms),
      propose(500L, 0L, T + 10 * ms),
      step("Entering prevote step", 500L, 0L, "RoundStepPropose", T + 14 * ms),
      timeout(500L, 0L, "prevote", "1s", T + 20 * ms),     // step start @14 -> 6ms
      timeout(500L, 0L, "precommit", "500ms", T + 22 * ms),// no precommit start -> NULL
      newRound(501L, 0L, T + 38 * ms),
      timeout(501L, 0L, "prevote", "1s", T + 40 * ms),     // r0 has no prevote start
      step("Entering prevote step", 501L, 1L, "RoundStepPropose", T + 42 * ms),
      timeout(501L, 1L, "prevote", "2s", T + 44 * ms),     // r1 start @42 -> 2ms
      timeout(501L, 2L, "prevote", "1s", T + 48 * ms),     // priors r0,r1 -> RECOVERY
      timeout(501L, 3L, "precommit", "3s", T + 52 * ms),   // priors r1,r2 -> RECOVERY
      timeout(501L, 6L, "propose", "1s", T + 56 * ms),     // window [4,6]: none
      timeout(502L, 0L, "prevote", "1s", T + 80 * ms),     // height isolation
      timeout(510L, 0L, "prevote", "1s", T + 85 * ms),     // delta 8 breaks cluster 1
      timeout(511L, 0L, "precommit", "2s", T + 87 * ms),
      timeout(512L, 0L, "prevote", "1s", T + 89 * ms),
      timeout(512L, 1L, "propose", "4s", T + 35000 * ms))  // 35 s gap: trailing singleton
    val bLog = Seq(
      line("P2P Node ID", T + 1000L, "ID" -> b, "file" -> "nodeB/key.json"),
      line("This node is a validator", T + 1500L, "addr" -> valAddrs(1), "pubKey" -> "PUBB=="),
      timeout(500L, 0L, "prevote", "1500ms", T + 100 * ms))

    val p = Paths.get(dir)
    Files.createDirectories(p)
    Files.write(p.resolve("nodeA_cometbft.log"), aLog.mkString("\n").getBytes("UTF-8"))
    Files.write(p.resolve("nodeB_cometbft.log"), bLog.mkString("\n").getBytes("UTF-8"))
    dir
  }

  /** Two-node adversarial scenario for the validator-participation
    * machine (A2+J7, `validator-participation/processor.go:10-180`),
    * self-signed votes only (relayed votes hit the reference's
    * shared-state key-mismatch bug — rationalized per SURVEY §7.4):
    *
    *  - h=601 the full shape: both step starts, two prevotes + one
    *    precommit, all latencies present;
    *  - h=602 votes with NO step start: participated without latency,
    *    on-time FALSE (never measured);
    *  - h=603 the on-time boundary AND last-vote semantics: latencies
    *    exactly 1000 (on time, `<=`) then 1005 — the flag follows the
    *    LAST vote, so it flips false while the average keeps both;
    *  - h=604 round keying: a round-1 vote measures against the round-1
    *    step start; the round-0 vote of the same height has none;
    *  - h=605 type isolation: a precommit in a prevote-only round;
    *  - node B votes against ITS OWN prevote start (@20, latency 6) —
    *    per-node step starts, the repo's documented rationalization of
    *    the reference's node-less shared map (q77 pins it).
    *
    * The q77 oracle rows are HAND-DERIVED on paper — NOT a gen_golden.py
    * pin (never add q77 to its GOLDEN list). */
  def writeAdversarialParticipationScenario(dir: String): String = {
    val T  = t0Nanos + 15000000000L
    val ms = 1000000L
    val a  = nodeIds(0); val b = nodeIds(1)
    def vMsg(tpe: Int, h: Long, r: Long, signer: Int): Array[Byte] =
      encodeConsensusMessage(Vote(tpe, h, r.toInt,
        BlockID(blockHash(h).getBytes, PartSetHeader(1, psHash(h).getBytes)),
        t0Nanos + h * 1000000L + tpe, valAddrs(signer).getBytes, signer, Array[Byte](7, 7)))
    def sendVote(from: Int, tpe: Int, h: Long, r: Long, at: Long) = {
      val peer = if (from == 0) b else a
      val ip   = if (from == 0) "10.0.0.1" else "10.0.0.0"
      line("Send", at, "channel" -> 0x22L, "conn" -> "MConn{pipe}",
        "msgBytes" -> hexStr(vMsg(tpe, h, r, from)), "peer" -> s"$peer@$ip:26656")
    }
    def step(msg: String, h: Long, r: Long, prev: String, at: Long) =
      line(msg, at, "current" -> s"$h/$r/$prev", "height" -> h, "round" -> r)

    val aLog = Seq(
      line("P2P Node ID", T, "ID" -> a, "file" -> "nodeA/key.json"),
      line("This node is a validator", T + 500L, "addr" -> valAddrs(0), "pubKey" -> "PUBA=="),
      step("Entering prevote step", 601L, 0L, "RoundStepPropose", T + 10 * ms),
      sendVote(0, 1, 601L, 0L, T + 12 * ms),    // prevote latency 2
      step("Entering precommit step", 601L, 0L, "RoundStepPrevote", T + 14 * ms),
      sendVote(0, 1, 601L, 0L, T + 16 * ms),    // prevote latency 6
      sendVote(0, 2, 601L, 0L, T + 18 * ms),    // precommit latency 4
      sendVote(0, 1, 602L, 0L, T + 30 * ms),    // no step start: no latency
      step("Entering prevote step", 603L, 0L, "RoundStepPropose", T + 40 * ms),
      step("Entering prevote step", 604L, 1L, "RoundStepPropose", T + 60 * ms),
      sendVote(0, 1, 604L, 1L, T + 63 * ms),    // round-1 latency 3
      sendVote(0, 1, 604L, 0L, T + 65 * ms),    // round 0 has no start
      step("Entering prevote step", 605L, 0L, "RoundStepPropose", T + 80 * ms),
      sendVote(0, 2, 605L, 0L, T + 85 * ms),    // precommit in prevote-only round
      sendVote(0, 1, 603L, 0L, T + 1040 * ms),  // latency exactly 1000: on time
      sendVote(0, 1, 603L, 0L, T + 1045 * ms))  // latency 1005: LAST vote late
    val bLog = Seq(
      line("P2P Node ID", T + 1000L, "ID" -> b, "file" -> "nodeB/key.json"),
      line("This node is a validator", T + 1500L, "addr" -> valAddrs(1), "pubKey" -> "PUBB=="),
      step("Entering prevote step", 601L, 0L, "RoundStepPropose", T + 20 * ms),
      sendVote(1, 1, 601L, 0L, T + 26 * ms))    // vs B's OWN start: latency 6

    val p = Paths.get(dir)
    Files.createDirectories(p)
    Files.write(p.resolve("nodeA_cometbft.log"), aLog.mkString("\n").getBytes("UTF-8"))
    Files.write(p.resolve("nodeB_cometbft.log"), bLog.mkString("\n").getBytes("UTF-8"))
    dir
  }

  /** Two-node adversarial scenario for the J4 network-latency two-pass
    * matcher (`network-latency/processor.go:122-328`) — the machine whose
    * other CORRECTNESS rows (q11/q52) are pipeline-pinned goldens. Covers,
    * per height (all payloads HasVote on the state channel; distinct h =>
    * distinct raw bytes, so each case is its own composite/raw key):
    *
    *  - h=301 plain composite match;
    *  - h=302 FIFO multiset: two identical sends, two receives — the
    *    first receive pops the OLDEST send (`:278-285`);
    *  - h=303 receive-before-send matched ON THE SEND side
    *    (`:151-177`): the send finds the single pending receive, latency
    *    = send - receive;
    *  - h=304 raw-hash fallback (`:272-328`): a TrySend (no peer) can
    *    only pair via the raw pool; the matching receive was ALREADY
    *    appended to pendingReceives and is never removed, so at finalize
    *    (`:449-476`) it STILL counts as an unmatched receive — one
    *    receive, one measurement, and one unmatched tick;
    *  - h=305 discard-at-empty: the fallback is tried once, AT THE
    *    RECEIVE'S ARRIVAL — a TrySend arriving later never looks back,
    *    so both sides end unmatched;
    *  - h=306 fallback pool FIFO: two identical TrySends, one receive —
    *    the OLDEST pops; the second TrySend ends unmatched;
    *  - h=307 composite send never received: unmatched send;
    *  - h=308 self-communication receive (`:222-225`): dropped entirely
    *    (P6) — the paired send stays unmatched, and the receive counts
    *    NOWHERE (not even total_receives).
    *
    * The q67/q69/q70 oracles over this scenario are HAND-DERIVED on paper
    * from the reference machine — NOT gen_golden.py pins (never add them
    * to its GOLDEN list). */
  def writeAdversarialNetLatScenario(dir: String): String = {
    val T  = t0Nanos + 9000000000L
    val ms = 1000000L
    val a  = nodeIds(0); val b = nodeIds(1)
    def hv(h: Long): Array[Byte] =
      encodeConsensusMessage(HasVote(h, 0, 1, 2))
    def send(h: Long, at: Long) =
      line("Send", at, "channel" -> 0x20L, "conn" -> "MConn{pipe}",
        "msgBytes" -> hexStr(hv(h)), "peer" -> s"$b@10.0.0.1:26656")
    def trySend(h: Long, at: Long) =
      line("TrySend", at, "channel" -> 0x20L, "conn" -> "MConn{pipe}",
        "msgBytes" -> hexStr(hv(h)), "peer" -> "")
    def recv(h: Long, at: Long, from: String = "") = {
      val src = if (from.isEmpty) a else from
      val ip  = if (src == a) "10.0.0.0" else "10.0.0.1"
      line("Received bytes", at, "chID" -> 0x20L,
        "msgBytes" -> b64(hv(h)), "peer" -> s"$src@$ip:26656")
    }

    val aLog = Seq(
      line("P2P Node ID", T, "ID" -> a, "file" -> "nodeA/key.json"),
      line("This node is a validator", T + 500L, "addr" -> valAddrs(0), "pubKey" -> "PUBA=="),
      send(301L, T + 10 * ms),     // plain confirm
      send(302L, T + 20 * ms),     // FIFO pair 1 (identical bytes)
      send(302L, T + 22 * ms),     // FIFO pair 2
      send(303L, T + 34 * ms),     // arrives AFTER B's receive: send-side match
      trySend(304L, T + 40 * ms),  // raw pool; fallback-popped by B's receive
      trySend(305L, T + 54 * ms),  // raw pool AFTER B's receive: never matched
      trySend(306L, T + 60 * ms),  // pool FIFO: this one pops...
      trySend(306L, T + 62 * ms),  // ...this one ends unmatched
      send(307L, T + 70 * ms),     // never received: unmatched composite send
      send(308L, T + 78 * ms))     // B's only "receive" is self-comm: unmatched
    val bLog = Seq(
      line("P2P Node ID", T + 1000L, "ID" -> b, "file" -> "nodeB/key.json"),
      line("This node is a validator", T + 1500L, "addr" -> valAddrs(1), "pubKey" -> "PUBB=="),
      recv(301L, T + 15 * ms),
      recv(302L, T + 25 * ms),     // pops the T+20 send
      recv(302L, T + 28 * ms),     // pops the T+22 send
      recv(303L, T + 30 * ms),     // BEFORE the send: pending receive
      recv(304L, T + 44 * ms),     // fallback-matches the TrySend AND stays pending
      recv(305L, T + 50 * ms),     // raw pool empty NOW: discarded, never matched
      recv(306L, T + 66 * ms),     // pops the OLDEST TrySend (T+60)
      recv(308L, T + 80 * ms, from = b)) // self-communication: dropped (P6)

    val p = Paths.get(dir)
    Files.createDirectories(p)
    Files.write(p.resolve("nodeA_cometbft.log"), aLog.mkString("\n").getBytes("UTF-8"))
    Files.write(p.resolve("nodeB_cometbft.log"), bLog.mkString("\n").getBytes("UTF-8"))
    dir
  }

  /** Two-node adversarial p2p-gossip scenario exercising the J3
    * either-order confirmation machine's nastier edges
    * (`p2p-messages/processor.go:39-341`): first-send-confirms-pending-
    * receive (negative latency), double-receive-before-send (the reference
    * would panic on the nil SentTime assertion — rationalized to a
    * NULL-sent confirmation), repeat receives re-confirming a Confirmed
    * entry as SEPARATE snapshot rows (the p2p machine allocates a fresh
    * confirmed event each time — no J1-style pointer aliasing),
    * send-overwrite, a full send-receive-send-receive cycle, and key
    * isolation both across families (has_vote vs new_round_step at the
    * same height) and within a family (different HasVote index). The q56
    * oracle for this scenario is HAND-DERIVED on paper
    * (CometbftQueries.oracleSql — NOT a gen_golden.py pin).
    *
    * All timestamps are explicit ms offsets from T = t0 + 6 s. Node A
    * (index 0) sends, node B (index 1) receives; both message shapes ride
    * the state channel 0x20 as in real CometBFT gossip.
    */
  def writeAdversarialP2pScenario(dir: String): String = {
    val T  = t0Nanos + 6000000000L
    val ms = 1000000L
    val a  = nodeIds(0); val b = nodeIds(1)
    def hv(h: Long, idx: Int): Array[Byte] =
      encodeConsensusMessage(HasVote(h, 0, 1, idx))
    def nrs(h: Long): Array[Byte] =
      encodeConsensusMessage(NewRoundStep(h, 0, 1, h * 2, -1))
    def send(msg: Array[Byte], at: Long) =
      line("Send", at, "channel" -> 0x20L, "conn" -> "MConn{pipe}",
        "msgBytes" -> hexStr(msg), "peer" -> s"$b@10.0.0.1:26656")
    def recv(msg: Array[Byte], at: Long) =
      line("Received bytes", at, "chID" -> 0x20L,
        "msgBytes" -> b64(msg), "peer" -> s"$a@10.0.0.0:26656")

    val aLog = Seq(
      line("P2P Node ID", T, "ID" -> a, "file" -> "nodeA/key.json"),
      line("This node is a validator", T + 500L, "addr" -> valAddrs(0), "pubKey" -> "PUBA=="),
      send(hv(201L, 2), T + 20 * ms),  // confirms B's pending receive (negative latency)
      send(hv(202L, 2), T + 30 * ms),  // first send after the double receive
      send(hv(203L, 2), T + 35 * ms),  // confirmed twice by separate receives
      send(hv(204L, 2), T + 50 * ms),  // overwritten by...
      send(hv(204L, 2), T + 52 * ms),  // ...this one
      send(hv(205L, 2), T + 60 * ms),  // cycle 1 send
      send(hv(205L, 2), T + 64 * ms),  // cycle 2 send (entry was Confirmed)
      send(hv(206L, 2), T + 70 * ms),  // never received: no row, and must
                                       // NOT confirm the new_round_step
                                       // receive at the same height
      send(hv(207L, 2), T + 80 * ms),  // idx 2...
      send(nrs(206L), T + 75 * ms))    // confirms B's pending nrs receive
    val bLog = Seq(
      line("P2P Node ID", T + 1000L, "ID" -> b, "file" -> "nodeB/key.json"),
      line("This node is a validator", T + 1500L, "addr" -> valAddrs(1), "pubKey" -> "PUBB=="),
      recv(hv(201L, 2), T + 15 * ms),  // receive BEFORE the send
      recv(hv(202L, 2), T + 25 * ms),  // double receive: creates entry...
      recv(hv(202L, 2), T + 28 * ms),  // ...then the reference would panic
      recv(hv(203L, 2), T + 40 * ms),
      recv(hv(203L, 2), T + 43 * ms),  // separate snapshot row, NOT aliased
      recv(hv(204L, 2), T + 55 * ms),
      recv(hv(205L, 2), T + 62 * ms),  // cycle 1 receive
      recv(hv(205L, 2), T + 66 * ms),  // cycle 2 receive
      recv(hv(207L, 3), T + 82 * ms),  // idx 3: different key, no pair
      recv(nrs(206L), T + 72 * ms))    // pending until A's nrs send

    val p = Paths.get(dir)
    Files.createDirectories(p)
    Files.write(p.resolve("nodeA_cometbft.log"), aLog.mkString("\n").getBytes("UTF-8"))
    Files.write(p.resolve("nodeB_cometbft.log"), bLog.mkString("\n").getBytes("UTF-8"))
    dir
  }
}
