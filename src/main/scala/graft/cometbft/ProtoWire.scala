package graft.cometbft

import scala.collection.mutable

/** Minimal protobuf wire-format reader/writer for the CometBFT consensus
  * messages the reference decodes (`internal/parser/decoder.go:17-113`).
  *
  * The sandbox has no CometBFT proto jars (zero egress), so — per
  * SURVEY.md §7.4-1 — the 10 consensus message shapes of
  * `cometbft.consensus.v1.Message` are decoded with a hand-rolled varint/
  * length-delimited reader built from the public protobuf wire spec and the
  * public CometBFT `consensus/v1/types.proto` field numbering. The writer
  * half exists so tests can property-check `decode(encode(x)) == x` and so
  * fixture logs carry real wire bytes.
  *
  * Field numbers (public CometBFT API):
  *   Message oneof: 1 NewRoundStep, 2 NewValidBlock, 3 Proposal(wrapper),
  *     4 ProposalPOL, 5 BlockPart, 6 Vote(wrapper), 7 HasVote,
  *     8 VoteSetMaj23, 9 VoteSetBits, 10 HasProposalBlockPart.
  */
object ProtoWire {

  // ------------------------------------------------------------------ model
  final case class PartSetHeader(total: Long, hash: Array[Byte])
  final case class BlockID(hash: Array[Byte], psh: PartSetHeader)
  final case class BitArray(bits: Long, elems: Seq[Long])

  sealed trait ConsensusMsg { def typeName: String }
  final case class NewRoundStep(height: Long, round: Int, step: Int,
      secondsSinceStartTime: Long, lastCommitRound: Int) extends ConsensusMsg {
    val typeName = "new_round_step"
  }
  final case class NewValidBlock(height: Long, round: Int, psh: PartSetHeader,
      blockParts: BitArray, isCommit: Boolean) extends ConsensusMsg {
    val typeName = "new_valid_block"
  }
  final case class Proposal(tpe: Int, height: Long, round: Int, polRound: Int,
      blockId: BlockID, tsNanos: Long, signature: Array[Byte]) extends ConsensusMsg {
    val typeName = "proposal"
  }
  final case class ProposalPOL(height: Long, proposalPolRound: Int,
      proposalPol: BitArray) extends ConsensusMsg {
    val typeName = "proposal_pol"
  }
  final case class BlockPart(height: Long, round: Int, index: Long,
      bytes: Array[Byte]) extends ConsensusMsg {
    val typeName = "block_part"
  }
  final case class Vote(tpe: Int, height: Long, round: Int, blockId: BlockID,
      tsNanos: Long, validatorAddress: Array[Byte], validatorIndex: Int,
      signature: Array[Byte]) extends ConsensusMsg {
    val typeName = "vote"
  }
  final case class HasVote(height: Long, round: Int, tpe: Int, index: Int) extends ConsensusMsg {
    val typeName = "has_vote"
  }
  final case class VoteSetMaj23(height: Long, round: Int, tpe: Int, blockId: BlockID) extends ConsensusMsg {
    val typeName = "vote_set_maj23"
  }
  final case class VoteSetBits(height: Long, round: Int, tpe: Int, blockId: BlockID,
      votes: BitArray) extends ConsensusMsg {
    val typeName = "vote_set_bits"
  }
  final case class HasProposalBlockPart(height: Long, round: Int, index: Int) extends ConsensusMsg {
    val typeName = "has_proposal_block_part"
  }

  // ------------------------------------------------- non-consensus model
  // The reference decodes four more channel families before its converter
  // rejects them at channel-validity (`decoder.go:79-107`,
  // `convereter.go:46-58`): blocksync, mempool, pex, statesync. Shapes and
  // field numbers follow the public CometBFT API protos
  // (blocksync/v1/types.proto, mempool/v1/types.proto, p2p/v1/pex.proto,
  // statesync/v1/types.proto). The evidence channel is NOT decoded — the
  // reference returns an error there too (`decoder.go:108-110`).
  sealed trait NonConsensusMsg { def typeName: String }
  final case class BsBlockRequest(height: Long) extends NonConsensusMsg {
    val typeName = "blocksync_block_request"
  }
  final case class BsNoBlockResponse(height: Long) extends NonConsensusMsg {
    val typeName = "blocksync_no_block_response"
  }
  /** Block/ext-commit payloads stay opaque: the reference returns the whole
    * wrapper (`decoder.go:80-85`) and nothing downstream reads into it. */
  final case class BsBlockResponse(blockBytes: Array[Byte], extCommitBytes: Array[Byte])
      extends NonConsensusMsg {
    val typeName = "blocksync_block_response"
  }
  case object BsStatusRequest extends NonConsensusMsg {
    val typeName = "blocksync_status_request"
  }
  final case class BsStatusResponse(height: Long, base: Long) extends NonConsensusMsg {
    val typeName = "blocksync_status_response"
  }
  final case class MpTxs(txs: Seq[Array[Byte]]) extends NonConsensusMsg {
    val typeName = "mempool_txs"
  }
  case object PexRequest extends NonConsensusMsg {
    val typeName = "pex_request"
  }
  final case class PexAddrs(urls: Seq[String]) extends NonConsensusMsg {
    val typeName = "pex_addrs"
  }
  case object SsSnapshotsRequest extends NonConsensusMsg {
    val typeName = "statesync_snapshots_request"
  }
  final case class SsSnapshotsResponse(height: Long, format: Int, chunks: Long,
      hash: Array[Byte], metadata: Array[Byte]) extends NonConsensusMsg {
    val typeName = "statesync_snapshots_response"
  }
  final case class SsChunkRequest(height: Long, format: Int, index: Int) extends NonConsensusMsg {
    val typeName = "statesync_chunk_request"
  }
  final case class SsChunkResponse(height: Long, format: Int, index: Int,
      chunk: Array[Byte], missing: Boolean) extends NonConsensusMsg {
    val typeName = "statesync_chunk_response"
  }

  /** P2P channel IDs (`types/channels.go:5-15`). */
  object Channels {
    val Pex         = 0x00L
    val State       = 0x20L
    val Data        = 0x21L
    val Vote        = 0x22L
    val VoteSetBits = 0x23L
    val Mempool     = 0x30L
    val Evidence    = 0x38L
    val Blocksync   = 0x40L
    val Snapshot    = 0x60L
    val Chunk       = 0x61L
  }

  // ------------------------------------------------------------------ reader
  private final class Reader(buf: Array[Byte]) {
    var pos: Int = 0
    def hasMore: Boolean = pos < buf.length

    def readVarint(): Long = {
      var shift = 0; var result = 0L
      while (shift < 64) {
        if (pos >= buf.length) throw new IllegalArgumentException("truncated varint")
        val b = buf(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("varint too long")
    }

    def readTag(): (Int, Int) = {
      val key = readVarint()
      ((key >>> 3).toInt, (key & 0x7).toInt)
    }

    def readBytes(): Array[Byte] = {
      val len = readVarint().toInt
      if (len < 0 || pos + len > buf.length) throw new IllegalArgumentException("truncated bytes")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => readBytes()
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def readPartSetHeader(b: Array[Byte]): PartSetHeader = {
    val r = new Reader(b); var total = 0L; var hash = Array.emptyByteArray
    while (r.hasMore) r.readTag() match {
      case (1, 0) => total = r.readVarint()
      case (2, 2) => hash = r.readBytes()
      case (_, w) => r.skip(w)
    }
    PartSetHeader(total, hash)
  }

  private def readBlockID(b: Array[Byte]): BlockID = {
    val r = new Reader(b); var hash = Array.emptyByteArray
    var psh = PartSetHeader(0, Array.emptyByteArray)
    while (r.hasMore) r.readTag() match {
      case (1, 2) => hash = r.readBytes()
      case (2, 2) => psh = readPartSetHeader(r.readBytes())
      case (_, w) => r.skip(w)
    }
    BlockID(hash, psh)
  }

  private def readBitArray(b: Array[Byte]): BitArray = {
    val r = new Reader(b); var bits = 0L; val elems = mutable.ArrayBuffer.empty[Long]
    while (r.hasMore) r.readTag() match {
      case (1, 0) => bits = r.readVarint()
      case (2, 0) => elems += r.readVarint()
      case (2, 2) => // packed repeated
        val packed = new Reader(r.readBytes())
        while (packed.hasMore) elems += packed.readVarint()
      case (_, w) => r.skip(w)
    }
    BitArray(bits, elems.toSeq)
  }

  /** google.protobuf.Timestamp{seconds:1, nanos:2} → epoch nanos. */
  private def readTimestampNanos(b: Array[Byte]): Long = {
    val r = new Reader(b); var secs = 0L; var nanos = 0L
    while (r.hasMore) r.readTag() match {
      case (1, 0) => secs = r.readVarint()
      case (2, 0) => nanos = r.readVarint()
      case (_, w) => r.skip(w)
    }
    secs * 1000000000L + nanos
  }

  private def readVote(b: Array[Byte]): Vote = {
    val r = new Reader(b)
    var tpe = 0; var height = 0L; var round = 0; var blockId = BlockID(Array.emptyByteArray, PartSetHeader(0, Array.emptyByteArray))
    var ts = 0L; var valAddr = Array.emptyByteArray; var valIdx = 0; var sig = Array.emptyByteArray
    while (r.hasMore) r.readTag() match {
      case (1, 0) => tpe = r.readVarint().toInt
      case (2, 0) => height = r.readVarint()
      case (3, 0) => round = r.readVarint().toInt
      case (4, 2) => blockId = readBlockID(r.readBytes())
      case (5, 2) => ts = readTimestampNanos(r.readBytes())
      case (6, 2) => valAddr = r.readBytes()
      case (7, 0) => valIdx = r.readVarint().toInt
      case (8, 2) => sig = r.readBytes()
      case (_, w) => r.skip(w)
    }
    Vote(tpe, height, round, blockId, ts, valAddr, valIdx, sig)
  }

  private def readProposal(b: Array[Byte]): Proposal = {
    val r = new Reader(b)
    var tpe = 0; var height = 0L; var round = 0; var pol = 0
    var blockId = BlockID(Array.emptyByteArray, PartSetHeader(0, Array.emptyByteArray))
    var ts = 0L; var sig = Array.emptyByteArray
    while (r.hasMore) r.readTag() match {
      case (1, 0) => tpe = r.readVarint().toInt
      case (2, 0) => height = r.readVarint()
      case (3, 0) => round = r.readVarint().toInt
      // pol_round is a plain int32: negatives arrive as 10-byte
      // sign-extended varints; truncating the 64-bit value recovers them.
      case (4, 0) => pol = r.readVarint().toInt
      case (5, 2) => blockId = readBlockID(r.readBytes())
      case (6, 2) => ts = readTimestampNanos(r.readBytes())
      case (7, 2) => sig = r.readBytes()
      case (_, w) => r.skip(w)
    }
    Proposal(tpe, height, round, pol, blockId, ts, sig)
  }

  private def readPart(b: Array[Byte]): (Long, Array[Byte]) = {
    val r = new Reader(b); var idx = 0L; var bytes = Array.emptyByteArray
    while (r.hasMore) r.readTag() match {
      case (1, 0) => idx = r.readVarint()
      case (2, 2) => bytes = r.readBytes()
      case (_, w) => r.skip(w)
    }
    (idx, bytes)
  }

  /** Decode a `cometbft.consensus.v1.Message` (oneof wrapper). Returns None
    * for empty/undecodable input — callers drop the row, mirroring the
    * reference's error-return path.
    *
    * v1 / v1beta1 equivalence (`decoder.go:27-51`): the reference tries
    * consensus v1 and falls back to v1beta1. Both schemas assign the SAME
    * oneof field numbers to the same 10 message shapes and the same field
    * numbers within each shape (v1beta1 only wraps Proposal/Vote/
    * ProposalPOL/VoteSetBits payloads at identical positions), so decoding
    * by field number alone — as this reader does — accepts both wire
    * formats indistinguishably: the v1beta1 fallback branch needs no
    * separate code path. Pinned by the "v1beta1" round-trip case in
    * RoundTripPropertySpec. */
  def decodeConsensusMessage(bytes: Array[Byte]): Option[ConsensusMsg] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val r = new Reader(bytes)
      var result: Option[ConsensusMsg] = None
      while (r.hasMore) {
        r.readTag() match {
          case (1, 2) =>
            val b = new Reader(r.readBytes())
            var h = 0L; var rd = 0; var st = 0; var ssst = 0L; var lcr = 0
            while (b.hasMore) b.readTag() match {
              case (1, 0) => h = b.readVarint()
              case (2, 0) => rd = b.readVarint().toInt
              case (3, 0) => st = b.readVarint().toInt
              case (4, 0) => ssst = b.readVarint()
              case (5, 0) => lcr = b.readVarint().toInt
              case (_, w) => b.skip(w)
            }
            result = Some(NewRoundStep(h, rd, st, ssst, lcr))
          case (2, 2) =>
            val b = new Reader(r.readBytes())
            var h = 0L; var rd = 0; var psh = PartSetHeader(0, Array.emptyByteArray)
            var bp = BitArray(0, Nil); var ic = false
            while (b.hasMore) b.readTag() match {
              case (1, 0) => h = b.readVarint()
              case (2, 0) => rd = b.readVarint().toInt
              case (3, 2) => psh = readPartSetHeader(b.readBytes())
              case (4, 2) => bp = readBitArray(b.readBytes())
              case (5, 0) => ic = b.readVarint() != 0
              case (_, w) => b.skip(w)
            }
            result = Some(NewValidBlock(h, rd, psh, bp, ic))
          case (3, 2) =>
            // wrapper: Proposal{ proposal = 1 }
            val w = new Reader(r.readBytes())
            while (w.hasMore) w.readTag() match {
              case (1, 2) => result = Some(readProposal(w.readBytes()))
              case (_, wt) => w.skip(wt)
            }
          case (4, 2) =>
            val b = new Reader(r.readBytes())
            var h = 0L; var ppr = 0; var pol = BitArray(0, Nil)
            while (b.hasMore) b.readTag() match {
              case (1, 0) => h = b.readVarint()
              case (2, 0) => ppr = b.readVarint().toInt
              case (3, 2) => pol = readBitArray(b.readBytes())
              case (_, w) => b.skip(w)
            }
            result = Some(ProposalPOL(h, ppr, pol))
          case (5, 2) =>
            val b = new Reader(r.readBytes())
            var h = 0L; var rd = 0; var idx = 0L; var bts = Array.emptyByteArray
            while (b.hasMore) b.readTag() match {
              case (1, 0) => h = b.readVarint()
              case (2, 0) => rd = b.readVarint().toInt
              case (3, 2) => val (i, bb) = readPart(b.readBytes()); idx = i; bts = bb
              case (_, w) => b.skip(w)
            }
            result = Some(BlockPart(h, rd, idx, bts))
          case (6, 2) =>
            // wrapper: Vote{ vote = 1 }
            val w = new Reader(r.readBytes())
            while (w.hasMore) w.readTag() match {
              case (1, 2) => result = Some(readVote(w.readBytes()))
              case (_, wt) => w.skip(wt)
            }
          case (7, 2) =>
            val b = new Reader(r.readBytes())
            var h = 0L; var rd = 0; var t = 0; var idx = 0
            while (b.hasMore) b.readTag() match {
              case (1, 0) => h = b.readVarint()
              case (2, 0) => rd = b.readVarint().toInt
              case (3, 0) => t = b.readVarint().toInt
              case (4, 0) => idx = b.readVarint().toInt
              case (_, w) => b.skip(w)
            }
            result = Some(HasVote(h, rd, t, idx))
          case (8, 2) =>
            val b = new Reader(r.readBytes())
            var h = 0L; var rd = 0; var t = 0
            var bid = BlockID(Array.emptyByteArray, PartSetHeader(0, Array.emptyByteArray))
            while (b.hasMore) b.readTag() match {
              case (1, 0) => h = b.readVarint()
              case (2, 0) => rd = b.readVarint().toInt
              case (3, 0) => t = b.readVarint().toInt
              case (4, 2) => bid = readBlockID(b.readBytes())
              case (_, w) => b.skip(w)
            }
            result = Some(VoteSetMaj23(h, rd, t, bid))
          case (9, 2) =>
            val b = new Reader(r.readBytes())
            var h = 0L; var rd = 0; var t = 0
            var bid = BlockID(Array.emptyByteArray, PartSetHeader(0, Array.emptyByteArray))
            var votes = BitArray(0, Nil)
            while (b.hasMore) b.readTag() match {
              case (1, 0) => h = b.readVarint()
              case (2, 0) => rd = b.readVarint().toInt
              case (3, 0) => t = b.readVarint().toInt
              case (4, 2) => bid = readBlockID(b.readBytes())
              case (5, 2) => votes = readBitArray(b.readBytes())
              case (_, w) => b.skip(w)
            }
            result = Some(VoteSetBits(h, rd, t, bid, votes))
          case (10, 2) =>
            val b = new Reader(r.readBytes())
            var h = 0L; var rd = 0; var idx = 0
            while (b.hasMore) b.readTag() match {
              case (1, 0) => h = b.readVarint()
              case (2, 0) => rd = b.readVarint().toInt
              case (3, 0) => idx = b.readVarint().toInt
              case (_, w) => b.skip(w)
            }
            result = Some(HasProposalBlockPart(h, rd, idx))
          case (_, w) => r.skip(w)
        }
      }
      result
    } catch {
      case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------- non-consensus decoders
  private def decodeOneOf[T](bytes: Array[Byte])(
      f: PartialFunction[(Int, Reader), T]): Option[T] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val r = new Reader(bytes)
      var result: Option[T] = None
      while (r.hasMore) {
        val (field, wire) = r.readTag()
        if (wire == 2 && f.isDefinedAt((field, null))) {
          result = Some(f((field, new Reader(r.readBytes()))))
        } else r.skip(wire)
      }
      result
    } catch {
      case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** `cometbft.blocksync.v1.Message` (oneof: 1 BlockRequest,
    * 2 NoBlockResponse, 3 BlockResponse, 4 StatusRequest,
    * 5 StatusResponse). */
  def decodeBlocksyncMessage(bytes: Array[Byte]): Option[NonConsensusMsg] =
    decodeOneOf[NonConsensusMsg](bytes) {
      case (1, b) =>
        var h = 0L
        while (b.hasMore) b.readTag() match {
          case (1, 0) => h = b.readVarint()
          case (_, w) => b.skip(w)
        }
        BsBlockRequest(h)
      case (2, b) =>
        var h = 0L
        while (b.hasMore) b.readTag() match {
          case (1, 0) => h = b.readVarint()
          case (_, w) => b.skip(w)
        }
        BsNoBlockResponse(h)
      case (3, b) =>
        var blk = Array.emptyByteArray; var ext = Array.emptyByteArray
        while (b.hasMore) b.readTag() match {
          case (1, 2) => blk = b.readBytes()
          case (2, 2) => ext = b.readBytes()
          case (_, w) => b.skip(w)
        }
        BsBlockResponse(blk, ext)
      case (4, _) => BsStatusRequest
      case (5, b) =>
        var h = 0L; var base = 0L
        while (b.hasMore) b.readTag() match {
          case (1, 0) => h = b.readVarint()
          case (2, 0) => base = b.readVarint()
          case (_, w) => b.skip(w)
        }
        BsStatusResponse(h, base)
    }

  /** `cometbft.mempool.v1.Message` (oneof: 1 Txs{repeated bytes txs=1}). */
  def decodeMempoolMessage(bytes: Array[Byte]): Option[NonConsensusMsg] =
    decodeOneOf[NonConsensusMsg](bytes) {
      case (1, b) =>
        val txs = mutable.ArrayBuffer.empty[Array[Byte]]
        while (b.hasMore) b.readTag() match {
          case (1, 2) => txs += b.readBytes()
          case (_, w) => b.skip(w)
        }
        MpTxs(txs.toSeq)
    }

  /** `cometbft.p2p.v1.Message` from pex.proto (oneof: 1 PexRequest,
    * 2 PexAddrs{repeated PexAddress addrs=1; PexAddress{string url=1}}). */
  def decodePexMessage(bytes: Array[Byte]): Option[NonConsensusMsg] =
    decodeOneOf[NonConsensusMsg](bytes) {
      case (1, _) => PexRequest
      case (2, b) =>
        val urls = mutable.ArrayBuffer.empty[String]
        while (b.hasMore) b.readTag() match {
          case (1, 2) =>
            val addr = new Reader(b.readBytes())
            while (addr.hasMore) addr.readTag() match {
              case (1, 2) => urls += new String(addr.readBytes(), "UTF-8")
              case (_, w) => addr.skip(w)
            }
          case (_, w) => b.skip(w)
        }
        PexAddrs(urls.toSeq)
    }

  /** `cometbft.statesync.v1.Message` (oneof: 1 SnapshotsRequest,
    * 2 SnapshotsResponse, 3 ChunkRequest, 4 ChunkResponse). */
  def decodeStatesyncMessage(bytes: Array[Byte]): Option[NonConsensusMsg] =
    decodeOneOf[NonConsensusMsg](bytes) {
      case (1, _) => SsSnapshotsRequest
      case (2, b) =>
        var h = 0L; var fmt = 0; var chunks = 0L
        var hash = Array.emptyByteArray; var meta = Array.emptyByteArray
        while (b.hasMore) b.readTag() match {
          case (1, 0) => h = b.readVarint()
          case (2, 0) => fmt = b.readVarint().toInt
          case (3, 0) => chunks = b.readVarint()
          case (4, 2) => hash = b.readBytes()
          case (5, 2) => meta = b.readBytes()
          case (_, w) => b.skip(w)
        }
        SsSnapshotsResponse(h, fmt, chunks, hash, meta)
      case (3, b) =>
        var h = 0L; var fmt = 0; var idx = 0
        while (b.hasMore) b.readTag() match {
          case (1, 0) => h = b.readVarint()
          case (2, 0) => fmt = b.readVarint().toInt
          case (3, 0) => idx = b.readVarint().toInt
          case (_, w) => b.skip(w)
        }
        SsChunkRequest(h, fmt, idx)
      case (4, b) =>
        var h = 0L; var fmt = 0; var idx = 0
        var chunk = Array.emptyByteArray; var missing = false
        while (b.hasMore) b.readTag() match {
          case (1, 0) => h = b.readVarint()
          case (2, 0) => fmt = b.readVarint().toInt
          case (3, 0) => idx = b.readVarint().toInt
          case (4, 2) => chunk = b.readBytes()
          case (5, 0) => missing = b.readVarint() != 0
          case (_, w) => b.skip(w)
        }
        SsChunkResponse(h, fmt, idx, chunk, missing)
    }

  /** The channel-dispatched decoder, `DecodeMsgBytes` (`decoder.go:17-113`):
    * consensus channels try the consensus schema (v1-then-v1beta1 is one
    * field-number read here, see [[decodeConsensusMessage]]); blocksync /
    * mempool / pex / statesync decode their own wrappers; the evidence
    * channel and unknown channels return an error in the reference and
    * None here. Every non-consensus decode is subsequently REJECTED by the
    * converter's channel-validity (`convereter.go:46-58` returns false for
    * those channels) — so decode-success followed by validity-drop is the
    * reference-faithful fate of this branch, pinned by
    * NonConsensusDecodeSpec. */
  def decodeChannelMessage(channelId: Long, bytes: Array[Byte])
      : Option[Either[NonConsensusMsg, ConsensusMsg]] = channelId match {
    case Channels.State | Channels.Data | Channels.Vote | Channels.VoteSetBits =>
      decodeConsensusMessage(bytes).map(Right(_))
    case Channels.Blocksync          => decodeBlocksyncMessage(bytes).map(Left(_))
    case Channels.Mempool            => decodeMempoolMessage(bytes).map(Left(_))
    case Channels.Pex                => decodePexMessage(bytes).map(Left(_))
    case Channels.Snapshot | Channels.Chunk => decodeStatesyncMessage(bytes).map(Left(_))
    case _                           => None
  }

  // ------------------------------------------------------------------ writer
  final class Writer {
    private val out = mutable.ArrayBuffer.empty[Byte]
    def result: Array[Byte] = out.toArray

    def varint(v: Long): Writer = {
      var x = v
      while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
      out += (x & 0x7f).toByte
      this
    }
    def tag(field: Int, wire: Int): Writer = varint((field.toLong << 3) | wire)
    def vField(field: Int, v: Long): Writer = if (v != 0) { tag(field, 0); varint(v) } else this
    def bField(field: Int, b: Array[Byte]): Writer =
      if (b != null && b.nonEmpty) { tag(field, 2); varint(b.length); out ++= b; this } else this
    def mField(field: Int, m: Array[Byte]): Writer = { tag(field, 2); varint(m.length); out ++= m; this }
  }

  private def writePartSetHeader(p: PartSetHeader): Array[Byte] =
    new Writer().vField(1, p.total).bField(2, p.hash).result
  private def writeBlockID(b: BlockID): Array[Byte] =
    new Writer().bField(1, b.hash).mField(2, writePartSetHeader(b.psh)).result
  private def writeBitArray(b: BitArray): Array[Byte] = {
    val w = new Writer().vField(1, b.bits)
    b.elems.foreach { e => w.tag(2, 0).varint(e) }
    w.result
  }
  private def writeTimestamp(nanos: Long): Array[Byte] =
    new Writer().vField(1, nanos / 1000000000L).vField(2, nanos % 1000000000L).result

  def encodeConsensusMessage(msg: ConsensusMsg): Array[Byte] = {
    val w = new Writer()
    msg match {
      case m: NewRoundStep =>
        w.mField(1, new Writer().vField(1, m.height).vField(2, m.round).vField(3, m.step)
          .vField(4, m.secondsSinceStartTime).vField(5, m.lastCommitRound).result)
      case m: NewValidBlock =>
        w.mField(2, new Writer().vField(1, m.height).vField(2, m.round)
          .mField(3, writePartSetHeader(m.psh)).mField(4, writeBitArray(m.blockParts))
          .vField(5, if (m.isCommit) 1 else 0).result)
      case m: Proposal =>
        val inner = new Writer().vField(1, m.tpe).vField(2, m.height).vField(3, m.round)
          .vField(4, m.polRound.toLong).mField(5, writeBlockID(m.blockId))
          .mField(6, writeTimestamp(m.tsNanos)).bField(7, m.signature).result
        w.mField(3, new Writer().mField(1, inner).result)
      case m: ProposalPOL =>
        w.mField(4, new Writer().vField(1, m.height).vField(2, m.proposalPolRound)
          .mField(3, writeBitArray(m.proposalPol)).result)
      case m: BlockPart =>
        val part = new Writer().vField(1, m.index).bField(2, m.bytes).result
        w.mField(5, new Writer().vField(1, m.height).vField(2, m.round).mField(3, part).result)
      case m: Vote =>
        val inner = new Writer().vField(1, m.tpe).vField(2, m.height).vField(3, m.round)
          .mField(4, writeBlockID(m.blockId)).mField(5, writeTimestamp(m.tsNanos))
          .bField(6, m.validatorAddress).vField(7, m.validatorIndex).bField(8, m.signature).result
        w.mField(6, new Writer().mField(1, inner).result)
      case m: HasVote =>
        w.mField(7, new Writer().vField(1, m.height).vField(2, m.round).vField(3, m.tpe)
          .vField(4, m.index).result)
      case m: VoteSetMaj23 =>
        w.mField(8, new Writer().vField(1, m.height).vField(2, m.round).vField(3, m.tpe)
          .mField(4, writeBlockID(m.blockId)).result)
      case m: VoteSetBits =>
        w.mField(9, new Writer().vField(1, m.height).vField(2, m.round).vField(3, m.tpe)
          .mField(4, writeBlockID(m.blockId)).mField(5, writeBitArray(m.votes)).result)
      case m: HasProposalBlockPart =>
        w.mField(10, new Writer().vField(1, m.height).vField(2, m.round).vField(3, m.index).result)
    }
    w.result
  }

  /** Writer half for the non-consensus families — exists so the round-trip
    * property and fixture logs can carry real wire bytes, mirroring
    * [[encodeConsensusMessage]]. */
  def encodeNonConsensusMessage(msg: NonConsensusMsg): Array[Byte] = {
    val w = new Writer()
    msg match {
      case m: BsBlockRequest    => w.mField(1, new Writer().vField(1, m.height).result)
      case m: BsNoBlockResponse => w.mField(2, new Writer().vField(1, m.height).result)
      case m: BsBlockResponse =>
        w.mField(3, new Writer().bField(1, m.blockBytes).bField(2, m.extCommitBytes).result)
      case BsStatusRequest      => w.mField(4, Array.emptyByteArray)
      case m: BsStatusResponse  =>
        w.mField(5, new Writer().vField(1, m.height).vField(2, m.base).result)
      case m: MpTxs =>
        val inner = new Writer()
        m.txs.foreach(t => inner.mField(1, t))
        w.mField(1, inner.result)
      case PexRequest           => w.mField(1, Array.emptyByteArray)
      case m: PexAddrs =>
        val inner = new Writer()
        m.urls.foreach(u => inner.mField(1, new Writer().bField(1, u.getBytes("UTF-8")).result))
        w.mField(2, inner.result)
      case SsSnapshotsRequest   => w.mField(1, Array.emptyByteArray)
      case m: SsSnapshotsResponse =>
        w.mField(2, new Writer().vField(1, m.height).vField(2, m.format.toLong)
          .vField(3, m.chunks).bField(4, m.hash).bField(5, m.metadata).result)
      case m: SsChunkRequest =>
        w.mField(3, new Writer().vField(1, m.height).vField(2, m.format.toLong)
          .vField(3, m.index.toLong).result)
      case m: SsChunkResponse =>
        w.mField(4, new Writer().vField(1, m.height).vField(2, m.format.toLong)
          .vField(3, m.index.toLong).bField(4, m.chunk)
          .vField(5, if (m.missing) 1 else 0).result)
    }
    w.result
  }

}
