package graft.cometbft

import java.time.{Instant, OffsetDateTime}

/** Scala ports of the reference's string-grammar parsers
  * (`lib/parse.go`, `lib/format.go`): CometBFT Go pretty-printed values
  * embedded in log lines. Pure functions — wrapped as UDFs by
  * [[Normalize]], unit-tested directly against the reference's
  * `lib/parse_test.go` fixtures.
  *
  * Timestamps are returned as epoch NANOS (`Long`) — the reference keeps
  * `time.Time` at ns precision (SURVEY.md §7.4-2); Spark TimestampType
  * is µs, so exact latency math stays on the ns longs.
  */
object Parsers {

  final case class BlockIdP(hash: String, psTotal: Long, psHash: String)
  final case class VoteP(
      voteType: String, height: Long, round: Long,
      blockHash: String, psHash: String, psTotal: Long,
      tsNs: Long, validatorAddress: String, validatorIndex: Long,
      signature: String, extension: String)
  final case class ProposalP(
      height: Long, round: Long, polRound: Long,
      blockHash: String, psTotal: Long, psHash: String,
      signature: String, tsNs: Long)
  final case class CommitSigP(flag: String, validatorAddress: String, signature: String, tsNs: Long)
  final case class BlockP(
      chainId: String, height: Long, timeNs: Long,
      versionBlock: Long, versionApp: Long,
      lastBlockIdHash: String, lastCommitHash: String, dataHash: String,
      validatorsHash: String, nextValidatorsHash: String, consensusHash: String,
      appHash: String, lastResultsHash: String, evidenceHash: String,
      proposerAddress: String, txsHex: Seq[String],
      commitHeight: Long, commitRound: Long, commitBlockIdHash: String,
      signatures: Seq[CommitSigP], blockHash: String)

  /** RFC3339(Nano) → epoch nanos (`lib/time.go:5-13`); null on failure. */
  def parseTsNanos(s: String): java.lang.Long = {
    if (s == null) return null
    try {
      val i = Instant.parse(s)
      i.getEpochSecond * 1000000000L + i.getNano
    } catch {
      case _: Exception =>
        try {
          val o = OffsetDateTime.parse(s).toInstant
          o.getEpochSecond * 1000000000L + o.getNano
        } catch { case _: Exception => null }
    }
  }

  /** `"RoundStepPropose"` → `"propose"` (`lib/format.go:49-55`): strip the
    * `RoundStep` prefix, lowerCamel the rest. */
  def formatStep(step: String): String = {
    if (step == null || !step.startsWith("RoundStep")) return null
    val s = step.stripPrefix("RoundStep")
    if (s.isEmpty) null else s"${s.head.toLower}${s.tail}"
  }

  /** `"height/round/step"` → (h, r, canonical step) (`lib/parse.go:15-37`). */
  def parseRoundInfo(input: String): Option[(Long, Long, String)] = {
    if (input == null) return None
    val parts = input.split("/", -1)
    if (parts.length != 3) return None
    try {
      val h = java.lang.Long.parseUnsignedLong(parts(0))
      val r = java.lang.Long.parseUnsignedLong(parts(1))
      Option(formatStep(parts(2))).map(s => (h, r, s))
    } catch { case _: NumberFormatException => None }
  }

  private val ProposalRe =
    ("""^Proposal\{""" +
      """(\d+)/(\d+) """ +
      """\(([0-9A-F]+):(\d+):([0-9A-F]+), (-?\d+)\) """ +
      """([0-9A-F]+) @ """ +
      """(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d+Z)""" +
      """\}$""").r

  /** Go-pretty `Proposal{h/r (hash:total:psHash, polRound) sigFP @ ts}`
    * (`lib/parse.go:39-108`); None on mismatch. */
  def parseProposalString(s: String): Option[ProposalP] = s match {
    case null => None
    case ProposalRe(h, r, blockHash, psTotal, psHash, pol, sigFp, ts) =>
      Option(parseTsNanos(ts)).map { ns =>
        ProposalP(h.toLong, r.toLong, pol.toLong, blockHash, psTotal.toLong, psHash, sigFp, ns)
      }
    case _ => None
  }

  /** Tokenizer for `[Vote Vote{idx:addr h/r/Type(name) blockHash psHash
    * psTotal [sig [ext]] @ ts}]` (`lib/parse.go:110-221`).
    * `"nil-Vote"` → None. */
  def parseVoteString(raw: String): Option[VoteP] = {
    if (raw == null) return None
    var s = raw.trim
    if (s == "nil-Vote") return None
    if (s.startsWith("[") && s.endsWith("]")) s = s.substring(1, s.length - 1)
    s = s.stripPrefix("Vote ")
    if (!s.startsWith("Vote{") || !s.endsWith("}")) return None
    val body  = s.substring("Vote{".length, s.length - 1)
    val parts = body.split("\\s+").filter(_.nonEmpty)
    val atIdx = parts.indexOf("@")
    if (atIdx < 5) return None

    val viAddr = parts(0).split(":", 2)
    if (viAddr.length != 2) return None
    val validatorIndex = try viAddr(0).toLong catch { case _: NumberFormatException => return None }
    val validatorAddress = viAddr(1)

    val hrt = parts(1).split("/", 3)
    if (hrt.length != 3) return None
    val (height, round) =
      try (hrt(0).toLong, hrt(1).toLong) catch { case _: NumberFormatException => return None }
    val rawType = hrt(2)
    val voteType = {
      val i = rawType.indexOf('(')
      val j = rawType.lastIndexOf(')')
      if (i >= 0 && j > i) rawType.substring(i + 1, j) else rawType
    }

    val blockHash   = parts(2)
    val partSetHash = parts(3)
    val partTotal   = try parts(4).toLong catch { case _: NumberFormatException => return None }

    val sigExtCount = atIdx - 5
    val signature   = if (sigExtCount >= 1) parts(5) else ""
    val extension   = if (sigExtCount >= 2) parts(6) else ""

    if (atIdx + 1 >= parts.length) return None
    Option(parseTsNanos(parts(atIdx + 1))).map { ns =>
      VoteP(voteType.toLowerCase, height, round, blockHash, partSetHash, partTotal,
        ns, validatorAddress, validatorIndex, signature, extension)
    }
  }

  /** `{11 0}` or `{Block:11 App:0}` → (block, app) (`lib/parse.go:519-555`). */
  def parseConsensusVersion(v: String): (Long, Long) = {
    val inner = v.stripPrefix("{").stripSuffix("}")
    if (inner.contains("Block:")) {
      val re = """Block:(\d+)\s+App:(\d+)""".r
      inner match {
        case re(b, a) => (b.toLong, a.toLong)
        case _        => (0L, 0L)
      }
    } else {
      val parts = inner.trim.split("\\s+")
      if (parts.length == 2)
        (try parts(0).toLong catch { case _: NumberFormatException => 0L },
         try parts(1).toLong catch { case _: NumberFormatException => 0L })
      else (0L, 0L)
    }
  }

  /** `hash:total:psHash` or `hash:{total:psHash}` (`lib/parse.go:557-591`). */
  def parseBlockId(v: String): BlockIdP = {
    val braced = """([0-9A-Fa-f]*):\{(\d+):([0-9A-Fa-f]*)\}""".r
    val plain  = """([0-9A-Fa-f]*):(\d+):([0-9A-Fa-f]*)""".r
    v match {
      case braced(h, t, ph) => BlockIdP(h, t.toLong, ph)
      case plain(h, t, ph)  => BlockIdP(h, t.toLong, ph)
      case _                => BlockIdP(v, 0L, "")
    }
  }

  private val CommitSigRe =
    """CommitSig\{([0-9A-Fa-f]+) by ([0-9A-Fa-f]+) on (\d+) @ (\S+)\}""".r
  private val CommitSigAbsentRe = """CommitSig\{absent\}""".r

  /** `CommitSig{sig by addr on flag @ ts}`; absent sentinel (`lib/parse.go:616-647`). */
  def parseCommitSig(line: String): Option[CommitSigP] = {
    CommitSigRe.findFirstMatchIn(line).map { m =>
      val ns = Option(parseTsNanos(m.group(4))).map(_.toLong).getOrElse(0L)
      CommitSigP(m.group(3), m.group(2), m.group(1), ns)
    }.orElse {
      if (CommitSigAbsentRe.findFirstIn(line).isDefined)
        Some(CommitSigP("absent", "", "", 0L)) else None
    }
  }

  private val TxRe = """([0-9A-F]+) \(\d+ bytes\)""".r

  /** Multi-line Go-pretty `Block{Header{...} Data{...} EvidenceData{...}
    * Commit{...}}#hash` (`lib/parse.go:223-517`): 14 header fields, tx hex
    * extraction, commit sigs. `"nil-Block"` → None; malformed → None. */
  def parseBlockString(s: String): Option[BlockP] = {
    if (s == null || s == "nil-Block") return None
    val lines = s.split("\n").iterator
    def next(): String = if (lines.hasNext) lines.next() else throw new NoSuchElementException
    try {
      if (!next().startsWith("Block{")) return None
      if (!next().contains("Header{")) return None
      var chainId = ""; var height = 0L; var timeNs = 0L
      var vb = 0L; var va = 0L
      var lastBlockIdHash = ""; var lastCommitHash = ""; var dataHash = ""
      var validatorsHash = ""; var nextValidatorsHash = ""; var consensusHash = ""
      var appHash = ""; var lastResultsHash = ""; var evidenceHash = ""
      var proposer = ""
      for (_ <- 0 until 14) {
        val line = next().trim
        val parts = line.split(" ", 2)
        if (parts.length == 2) {
          val value = parts(1).trim
          parts(0) match {
            case "Version:"        => val (b, a) = parseConsensusVersion(value); vb = b; va = a
            case "ChainID:"        => chainId = value
            case "Height:"         => height = try value.toLong catch { case _: NumberFormatException => 0L }
            case "Time:"           => timeNs = Option(parseTsNanos(value)).map(_.toLong).getOrElse(0L)
            case "LastBlockID:"    => lastBlockIdHash = parseBlockId(value).hash
            case "LastCommit:"     => lastCommitHash = value
            case "Data:"           => dataHash = value
            case "Validators:"     => validatorsHash = value
            case "NextValidators:" => nextValidatorsHash = value
            case "App:"            => appHash = value
            case "Consensus:"      => consensusHash = value
            case "Results:"        => lastResultsHash = value
            case "Evidence:"       => evidenceHash = value
            case "Proposer:"       => proposer = value
            case _                 =>
          }
        }
      }
      next() // header closing "}#hash"
      if (!next().contains("Data{")) return None
      val txs = scala.collection.mutable.ArrayBuffer.empty[String]
      var line = next().trim
      while (!line.startsWith("}#")) {
        if (line.contains(" bytes)"))
          TxRe.findFirstMatchIn(line).foreach(m => txs += m.group(1))
        line = next().trim
      }
      if (!next().contains("EvidenceData{")) return None
      line = next().trim
      while (!line.startsWith("}#")) line = next().trim
      if (!next().contains("Commit{")) return None
      var commitHeight = 0L; var commitRound = 0L; var commitBlockIdHash = ""
      val sigs = scala.collection.mutable.ArrayBuffer.empty[CommitSigP]
      line = next().trim
      while (!line.startsWith("}#")) {
        val parts = line.split(" ", 2)
        if (parts.length == 2) {
          val value = parts(1).trim
          parts(0) match {
            case "Height:"     => commitHeight = try value.toLong catch { case _: NumberFormatException => 0L }
            case "Round:"      => commitRound = try value.toLong catch { case _: NumberFormatException => 0L }
            case "BlockID:"    => commitBlockIdHash = parseBlockId(value).hash
            case "Signatures:" =>
            case _             => parseCommitSig(line).foreach(sigs += _)
          }
        } else parseCommitSig(line).foreach(sigs += _)
        line = next().trim
      }
      val closing = next()
      val blockHash = if (closing.startsWith("}#")) closing.stripPrefix("}#") else return None
      Some(BlockP(chainId, height, timeNs, vb, va, lastBlockIdHash, lastCommitHash,
        dataHash, validatorsHash, nextValidatorsHash, consensusHash, appHash,
        lastResultsHash, evidenceHash, proposer, txs.toSeq,
        commitHeight, commitRound, commitBlockIdHash, sigs.toSeq, blockHash))
    } catch {
      case _: NoSuchElementException => None
    }
  }

  /** Go duration string → milliseconds (`timeout-analysis/processor.go:209-214`):
    * supports ns/us/µs/ms/s/m/h with decimal values, e.g. "3s", "500ms",
    * "1.5s", "1m30s". */
  def parseGoDurationMs(s: String): java.lang.Long = {
    if (s == null || s.isEmpty) return null
    val re = """(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)""".r
    val ms = re.findAllMatchIn(s).map { m =>
      val v = m.group(1).toDouble
      m.group(2) match {
        case "ns"        => v / 1e6
        case "us" | "µs" => v / 1e3
        case "ms"        => v
        case "s"         => v * 1000
        case "m"         => v * 60000
        case "h"         => v * 3600000
      }
    }.sum
    if (re.findFirstIn(s).isEmpty) null else java.lang.Long.valueOf(math.round(ms))
  }

  /** `Peer{MConn{addr} peerID dir}` → `peerID@addr` (`lib/format.go:15-47`). */
  def formatSourcePeer(s: String): String = {
    if (s == null) return null
    val prefix = "Peer{MConn{"
    if (!s.startsWith(prefix) || !s.endsWith("}")) return null
    val body  = s.substring(prefix.length, s.length - 1)
    val parts = body.split("\\}", 2)
    if (parts.length != 2) return null
    val addr   = parts(0)
    val fields = parts(1).trim.split("\\s+").filter(_.nonEmpty)
    if (fields.isEmpty) return null
    s"${fields(0)}@$addr"
  }

  /** `"id@host:port"` → `"id"` (`lib/format.go:57-62`). */
  def extractPeerIdOnly(pid: String): String = {
    if (pid == null) return null
    val at = pid.indexOf('@')
    if (at >= 0) pid.substring(0, at) else pid
  }
}
