package graft.cometbft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.cometbft.Parsers._

/** The converter layer (SURVEY.md §2.3, `internal/converter/convereter.go`):
  * parsed raw lines → one wide normalized events DataFrame, tagged by
  * `event_type`, with nullable per-family columns.
  *
  * Event-type tags are our canonical snake_case names (the reference's
  * constants live in an un-vendored external module; documented deviation).
  *
  * Families produced (mirroring `Convert`, `convereter.go:102-133`):
  *   - entering_new_round, entering_{prevote,precommit,commit}_step
  *     (propose dropped per P3, `convereter.go:107-110`; wait-step lines
  *     collapse into prevote/precommit per the reference's first-match
  *     inference, `parsers.go:94-128` — see stepNames below)
  *   - propose_step (is_our_turn from the two ProposeStep messages)
  *   - received_proposal (F4 string grammar), received_complete_proposal_block
  *   - committed_block (F6 block grammar), scheduled_timeout (F17 duration)
  *   - send_* / receive_packet_* ×10 (F12-F16: hex/base64 decode → proto
  *     wire decode → channel validation P4 → per-type projection)
  */
object Normalize {

  // ---------------------------------------------------------------- UDFs
  private val tsNanosU     = udf((s: String) => Option(parseTsNanos(s)).map(_.toLong))
  private val voteU        = udf((s: String) => parseVoteString(s))
  private val proposalU    = udf((s: String) => parseProposalString(s))
  private val blockU       = udf((s: String) => parseBlockString(s))
  private val durationMsU  = udf((s: String) => Option(parseGoDurationMs(s)).map(_.toLong))
  // F11 ExtractPeerIdOnly: `substring_index(peer, "@", 1)` matches the
  // grammar exactly (no '@' => whole string, null => null) and stays
  // inside whole-stage codegen on the hot send/receive path — the
  // Scala `Parsers.extractPeerIdOnly` remains as the spec'd scalar form.
  private def peerIdCol(c: Column): Column = substring_index(c, "@", 1)

  /** Decoded consensus message as a flat-ish struct (SURVEY §2.3 F14-F16). */
  final case class DecodedMsg(
      msgType: String,
      height: Option[Long], round: Option[Long], step: Option[String],
      index: Option[Long], secondsSinceStartTime: Option[Long],
      lastCommitRound: Option[Long], isCommit: Option[Boolean],
      proposalPolRound: Option[Long],
      blockIdHash: Option[String], psTotal: Option[Long], psHash: Option[String],
      bitsTotal: Option[Long], bitsElems: Option[Seq[Long]],
      partIndex: Option[Long], partBytesHex: Option[String],
      vote: Option[VoteP], proposal: Option[ProposalP])

  /** `typeslib.StepIntToString` (public CometBFT RoundStepType domain). */
  def stepIntToString(i: Int): String = i match {
    case 1 => "newHeight"
    case 2 => "newRound"
    case 3 => "propose"
    case 4 => "prevote"
    case 5 => "prevoteWait"
    case 6 => "precommit"
    case 7 => "precommitWait"
    case 8 => "commit"
    case _ => "unknown"
  }

  /** `CometSignedMsgTypeToString` (public SignedMsgType domain). */
  def signedMsgTypeToString(i: Int): String = i match {
    case 1  => "prevote"
    case 2  => "precommit"
    case 32 => "proposal"
    case _  => "unknown"
  }

  private def hex(b: Array[Byte]): String =
    b.map("%02X".format(_)).mkString

  /** The channel-dispatched decode (`decoder.go:17-113`): consensus
    * channels project into the full struct; blocksync/mempool/pex/statesync
    * decode into a type tag alone — every one of those is then rejected by
    * [[channelValid]] exactly as the reference's converter rejects them
    * (`convereter.go:46-58`), so they contribute drops, never events.
    * Evidence/unknown channels decode to None (the reference errors). */
  private[cometbft] def decodeToStruct(channel: Long, bytes: Array[Byte]): Option[DecodedMsg] =
    ProtoWire.decodeChannelMessage(channel, bytes).map {
      case Right(cm)  => consensusStruct(cm)
      case Left(ncm)  =>
        DecodedMsg(ncm.typeName, None, None, None, None, None, None, None, None,
          None, None, None, None, None, None, None, None, None)
    }

  private def consensusStruct(msg: ProtoWire.ConsensusMsg): DecodedMsg =
    msg match {
      case m: ProtoWire.NewRoundStep =>
        DecodedMsg("new_round_step", Some(m.height), Some(m.round.toLong),
          Some(stepIntToString(m.step)), None, Some(m.secondsSinceStartTime),
          Some(m.lastCommitRound.toLong), None, None, None, None, None, None, None,
          None, None, None, None)
      case m: ProtoWire.NewValidBlock =>
        DecodedMsg("new_valid_block", Some(m.height), Some(m.round.toLong), None,
          None, None, None, Some(m.isCommit), None,
          None, Some(m.psh.total), Some(hex(m.psh.hash)),
          Some(m.blockParts.bits), Some(m.blockParts.elems),
          None, None, None, None)
      case m: ProtoWire.Proposal =>
        DecodedMsg("proposal", Some(m.height), Some(m.round.toLong), None, None,
          None, None, None, None, None, None, None, None, None, None, None, None,
          Some(ProposalP(m.height, m.round.toLong, m.polRound.toLong,
            hex(m.blockId.hash), m.blockId.psh.total, hex(m.blockId.psh.hash),
            hex(m.signature), m.tsNanos)))
      case m: ProtoWire.ProposalPOL =>
        DecodedMsg("proposal_pol", Some(m.height), None, None, None, None, None,
          None, Some(m.proposalPolRound.toLong), None, None, None,
          Some(m.proposalPol.bits), Some(m.proposalPol.elems), None, None, None, None)
      case m: ProtoWire.BlockPart =>
        DecodedMsg("block_part", Some(m.height), Some(m.round.toLong), None, None,
          None, None, None, None, None, None, None, None, None,
          Some(m.index), Some(hex(m.bytes)), None, None)
      case m: ProtoWire.Vote =>
        DecodedMsg("vote", Some(m.height), Some(m.round.toLong), None, None, None,
          None, None, None, None, None, None, None, None, None, None,
          Some(VoteP(signedMsgTypeToString(m.tpe), m.height, m.round.toLong,
            hex(m.blockId.hash), hex(m.blockId.psh.hash), m.blockId.psh.total,
            m.tsNanos, hex(m.validatorAddress), m.validatorIndex.toLong,
            hex(m.signature), "")), None)
      case m: ProtoWire.HasVote =>
        DecodedMsg("has_vote", Some(m.height), Some(m.round.toLong),
          Some(signedMsgTypeToString(m.tpe)), Some(m.index.toLong), None, None,
          None, None, None, None, None, None, None, None, None, None, None)
      case m: ProtoWire.VoteSetMaj23 =>
        DecodedMsg("vote_set_maj23", Some(m.height), Some(m.round.toLong),
          Some(signedMsgTypeToString(m.tpe)), None, None, None, None, None,
          Some(hex(m.blockId.hash)), Some(m.blockId.psh.total),
          Some(hex(m.blockId.psh.hash)), None, None, None, None, None, None)
      case m: ProtoWire.VoteSetBits =>
        DecodedMsg("vote_set_bits", Some(m.height), Some(m.round.toLong),
          Some(signedMsgTypeToString(m.tpe)), None, None, None, None, None,
          Some(hex(m.blockId.hash)), Some(m.blockId.psh.total),
          Some(hex(m.blockId.psh.hash)), Some(m.votes.bits), Some(m.votes.elems),
          None, None, None, None)
      case m: ProtoWire.HasProposalBlockPart =>
        DecodedMsg("has_proposal_block_part", Some(m.height), Some(m.round.toLong),
          None, Some(m.index.toLong), None, None, None, None, None, None, None,
          None, None, None, None, None, None)
    }

  private val decodeU =
    udf((channel: Long, bytes: Array[Byte]) => decodeToStruct(channel, bytes))

  /** P4 channel-validity predicate (`convereter.go:19-100`): the decoded
    * message type must match its P2P channel. */
  val channelForMsgType: Map[String, Long] = Map(
    "vote"                    -> 0x22L,
    "proposal"                -> 0x21L,
    "block_part"              -> 0x21L,
    "new_round_step"          -> 0x20L,
    "new_valid_block"         -> 0x20L,
    "has_vote"                -> 0x20L,
    "vote_set_maj23"          -> 0x20L,
    "has_proposal_block_part" -> 0x20L,
    "proposal_pol"            -> 0x20L,
    "vote_set_bits"           -> 0x23L
  )

  private def channelValid(msgType: Column, channel: Column): Column =
    channelForMsgType.foldLeft(lit(false)) { case (acc, (t, ch)) =>
      acc || (msgType === t && channel === ch)
    }

  /** F18 channel-name lookup (`types/channels.go:18-47`). */
  val channelNames: Map[Long, String] = Map(
    0x00L -> "pex", 0x40L -> "blocksync", 0x23L -> "vote_set_bits",
    0x38L -> "evidence", 0x30L -> "mempool", 0x60L -> "snapshot",
    0x61L -> "chunk", 0x21L -> "data", 0x22L -> "vote", 0x20L -> "state")

  def channelName(channel: Column): Column =
    channelNames.foldLeft(when(lit(false), lit(null: String))) {
      case (acc, (id, name)) => acc.when(channel === id, name)
    }.otherwise("unknown")

  /** F3 as a when-chain over the 8 known step names (finite domain). */
  def formatStepCol(c: Column): Column = {
    val m = Seq(
      "RoundStepNewHeight" -> "newHeight", "RoundStepNewRound" -> "newRound",
      "RoundStepPropose" -> "propose", "RoundStepPrevote" -> "prevote",
      "RoundStepPrevoteWait" -> "prevoteWait", "RoundStepPrecommit" -> "precommit",
      "RoundStepPrecommitWait" -> "precommitWait", "RoundStepCommit" -> "commit")
    m.foldLeft(when(lit(false), lit(null: String))) { case (acc, (k, v)) =>
      acc.when(c === k, v)
    }
  }

  // ------------------------------------------------------------ normalize
  /** Full normalization: LogIngest.read output → wide events DataFrame. */
  def normalize(raw: DataFrame): DataFrame = {
    val base = raw
      .withColumn("ts_ns", tsNanosU(col("r.ts")))
      .filter(col("ts_ns").isNotNull)
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))

    def withBase(df: DataFrame, eventType: Column): DataFrame =
      df.withColumn("event_type", eventType)
        .select(
          (Seq("event_type", "ts", "ts_ns", "node_id", "validator_address", "src_file")
            .map(col) ++
            df.columns.filterNot(Seq("event_type", "ts", "ts_ns", "node_id",
              "validator_address", "src_file", "value", "msg_raw", "msg_lc", "r",
              "ch_id", "node_id_raw", "validator_addr_raw").contains).map(col)): _*)

    // --- entering_new_round (convereter.go:135-154)
    val enr = withBase(
      base.filter(col("msg_lc") === "entering new round")
        .withColumn("prev_parts", split(col("r.previous"), "/"))
        .withColumn("height", col("r.height"))
        .withColumn("round", col("r.round"))
        .withColumn("proposer", col("r.proposer"))
        .withColumn("prev_height", element_at(col("prev_parts"), 1).cast("long"))
        .withColumn("prev_round", element_at(col("prev_parts"), 2).cast("long"))
        .withColumn("prev_step", formatStepCol(element_at(col("prev_parts"), 3)))
        .filter(col("prev_height").isNotNull && col("prev_round").isNotNull &&
          col("prev_step").isNotNull)
        .drop("prev_parts"),
      lit("entering_new_round"))

    // --- entering_*_step (convereter.go:156-230; S5 step inference from _msg)
    //
    // REPLICATED REFERENCE BEHAVIOR (`parsers.go:94-128`): the reference
    // infers targetStep by first-match substring scan over the ordered list
    // [propose, prevote, prevote_wait, precommit, precommit_wait, commit]
    // and BREAKS on the first hit — "entering prevote wait step" contains
    // "prevote", so targetStep = "prevote"; likewise precommit wait →
    // "precommit". The prevote_wait / precommit_wait cases of
    // ConvertToSpecificStepEvent (`convereter.go:179-190`) are therefore
    // dead code: the reference binary NEVER emits wait-step events, and in
    // consensus-timing the wait line's timestamp OVERWRITES the
    // prevote/precommit slot (last-one-wins map, `processor.go:84`). We
    // replicate that exactly — wait-step log lines are tagged with the
    // non-wait event type (SURVEY §7.4-3). The event's curr_* fields still
    // come from the line's own `current` round-info, as in the reference.
    val stepNames = Seq(
      "entering prevote step"        -> "entering_prevote_step",
      "entering prevote wait step"   -> "entering_prevote_step",
      "entering precommit step"      -> "entering_precommit_step",
      "entering precommit wait step" -> "entering_precommit_step",
      "entering commit step"         -> "entering_commit_step")
    val stepTag = stepNames.foldLeft(when(lit(false), lit(null: String))) {
      case (acc, (m, t)) => acc.when(col("msg_lc") === m, t)
    }
    val steps = withBase(
      base.filter(col("msg_lc").isin(stepNames.map(_._1): _*))
        .withColumn("curr_parts", split(col("r.current"), "/"))
        .withColumn("height", element_at(col("curr_parts"), 1).cast("long"))
        .withColumn("round", element_at(col("curr_parts"), 2).cast("long"))
        .withColumn("step", formatStepCol(element_at(col("curr_parts"), 3)))
        .filter(col("height").isNotNull && col("round").isNotNull && col("step").isNotNull)
        .drop("curr_parts"),
      stepTag)

    // --- propose_step (convereter.go:232-264)
    val propose = withBase(
      base.filter(col("msg_lc").isin(
          "propose step; our turn to propose", "propose step; not our turn to propose"))
        .withColumn("height", col("r.height"))
        .withColumn("round", col("r.round"))
        .withColumn("proposer", col("r.proposer"))
        .withColumn("is_our_turn", col("msg_lc") === "propose step; our turn to propose"),
      lit("propose_step"))

    // --- received_proposal (convereter.go:266-281)
    val rp = withBase(
      base.filter(col("msg_lc") === "received proposal")
        .withColumn("proposal", proposalU(col("r.proposal")))
        .filter(col("proposal").isNotNull)
        .withColumn("proposer", col("r.proposer"))
        .withColumn("height", col("proposal.height"))
        .withColumn("round", col("proposal.round")),
      lit("received_proposal"))

    // --- received_complete_proposal_block (convereter.go:283-294)
    val rcpb = withBase(
      base.filter(col("msg_lc") === "received complete proposal block")
        .withColumn("hash", col("r.hash"))
        .withColumn("height", col("r.height")),
      lit("received_complete_proposal_block"))

    // --- committed_block (convereter.go tail, F6)
    val cb = withBase(
      base.filter(col("msg_lc") === "committed block")
        .withColumn("block", blockU(col("r.block")))
        .withColumn("height", col("r.height")),
      lit("committed_block"))

    // --- scheduled_timeout (F17)
    val st = withBase(
      base.filter(col("msg_lc") === "scheduled timeout")
        .withColumn("height", col("r.height"))
        .withColumn("round", col("r.round"))
        .withColumn("timeout_step", col("r.step"))
        .withColumn("duration_ms", durationMsU(col("r.dur"))),
      lit("scheduled_timeout"))

    // --- send_* / receive_packet_* (F12-F16, P4)
    val sends = base
      .filter(col("msg_lc").isin("send", "trysend"))
      .withColumn("channel", col("r.channel"))
      .withColumn("channel_name", channelName(col("r.channel")))
      .withColumn("msg_bytes", unhex(col("r.msgBytes")))
      .withColumn("decoded", decodeU(col("channel").cast("long"), col("msg_bytes")))
      .filter(col("decoded").isNotNull)
      .filter(channelValid(col("decoded.msgType"), col("channel")))
      .withColumn("recipient_peer", col("r.peer"))
      .withColumn("recipient_peer_id", peerIdCol(col("r.peer")))
      .withColumn("vote", col("decoded.vote"))
      .withColumn("proposal", col("decoded.proposal"))
    val sendsTagged = withBase(sends, concat(lit("send_"), col("decoded.msgType")))

    val recvs = base
      .filter(col("msg_lc") === "received bytes")
      .withColumn("channel", col("ch_id"))
      .withColumn("channel_name", channelName(col("ch_id")))
      .withColumn("msg_bytes", unbase64(col("r.msgBytes")))
      .withColumn("decoded", decodeU(col("channel").cast("long"), col("msg_bytes")))
      .filter(col("decoded").isNotNull)
      .filter(channelValid(col("decoded.msgType"), col("channel")))
      .withColumn("source_peer", col("r.peer"))
      .withColumn("source_peer_id", peerIdCol(col("r.peer")))
      .withColumn("vote", col("decoded.vote"))
      .withColumn("proposal", col("decoded.proposal"))
    val recvsTagged = withBase(recvs, concat(lit("receive_packet_"), col("decoded.msgType")))

    Seq(enr, steps, propose, rp, rcpb, cb, st, sendsTagged, recvsTagged)
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
